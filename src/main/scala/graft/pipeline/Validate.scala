package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Cleaning

/** Rule-based post-hoc validation (reference cleaning/validate_fields.py;
  * SURVEY.md §2.3 F4/F5, §2.5 A7): evaluate per-row rules, emit one row per
  * (record, error) — a derived dataset, not a side effect — plus the
  * critical/data-quality exit-policy split (validate_fields.py:144-162).
  *
  * Plan shape: a single projection building an array of conditional error
  * strings, then `explode` — no UDFs, one pass over the scan.
  */
object Validate {

  case class ValidationError(row_id: Long, field: String, error: String,
      value: String)

  /** Error strings mirroring validate_fields.py:87-116. */
  val MissingFirstName = "Missing first name"
  val MissingLastName = "Missing last name"
  val MissingEmail = "Missing email address"
  val InvalidEmail = "Invalid email format"
  val MissingPhone = "Missing phone number"
  val InvalidPhone = "Invalid phone number"

  /** Critical errors fail the pipeline; data-quality errors only warn
    * (validate_fields.py:144-157). */
  val CriticalErrors: Set[String] = Set(InvalidEmail)

  private def err(cond: Column, field: String, error: String, value: Column): Column =
    when(cond, struct(lit(field).as("field"), lit(error).as("error"),
      coalesce(value.cast("string"), lit("")).as("value")))

  /** Validation errors for a master-shaped frame carrying `row_id` and
    * (case-insensitively resolved) FIRSTNAME/LASTNAME/EMAIL/MOBILE columns.
    * Rows where all identity fields are missing are skipped (F4,
    * validate_fields.py:76-85). */
  def errors(df: DataFrame): DataFrame = {
    def c(role: String): Column =
      Roles.exact(df, role).map(n => col(n).cast("string"))
        .getOrElse(lit(null).cast("string"))
    val first = c("FIRSTNAME"); val last = c("LASTNAME")
    val email = c("EMAIL"); val phone = c("MOBILE")

    val skip = Cleaning.isMissing(first) && Cleaning.isMissing(last) &&
      Cleaning.isMissing(email) && Cleaning.isMissing(phone)

    val checks = array(
      err(Cleaning.isMissing(first), "FIRSTNAME", MissingFirstName, first),
      err(Cleaning.isMissing(last), "LASTNAME", MissingLastName, last),
      err(Cleaning.isMissing(email), "EMAIL", MissingEmail, email),
      err(Cleaning.isPresent(email) && !Cleaning.validEmail(email),
        "EMAIL", InvalidEmail, email),
      err(Cleaning.isMissing(phone), "MOBILE", MissingPhone, phone),
      err(Cleaning.isPresent(phone) && !Cleaning.validPhone(phone),
        "MOBILE", InvalidPhone, phone))

    df.filter(!skip)
      .select(col("row_id"), explode(filter(checks, x => x.isNotNull)).as("e"))
      .select(col("row_id"), col("e.field").as("field"),
        col("e.error").as("error"), col("e.value").as("value"))
  }

  /** Error-type rollup, top-N (A7; run.py:135-146). */
  def summary(errs: DataFrame, topN: Int = 5): DataFrame =
    errs.groupBy("error").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("error").asc).limit(topN)

  /** Exit policy: true = pass (no critical errors). */
  def passes(errs: DataFrame): Boolean =
    errs.filter(col("error").isin(CriticalErrors.toSeq: _*)).isEmpty
}
