package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Cleaning

/** Field cleaning & standardization stage — the Spark re-expression of
  * reference cleaning/clean_contacts.py `clean_fields` (lines 88-155):
  * unused-field nullification (P1), email cleaning (F1), phone digit
  * normalization (C3), name title-casing (C5), Y/N boolean standardization,
  * and lenient timestamp parsing (C8). One `select` — every rule is a
  * codegen'd column expression, so the whole stage fuses into the scan.
  *
  * Divergence ledger (SURVEY.md §1.4 / C9): the reference's `astype(str)`
  * pollutes data with "nan"/"Nan" strings — intended semantics keep nulls
  * null; role matching is case-insensitive here (intended) rather than the
  * observed silent no-op.
  */
object Clean {

  /** The 25 explicitly-unused fields nulled by the cleaner
    * (clean_contacts.py:16-23). */
  val UnusedFields: Seq[String] = Seq(
    "SALUTATION", "TITLE", "DIRECTFAX", "HOMEPHONE", "ADVERTSOURCE",
    "CAMPAIGN_WAVE_SEQNO", "MSN_ID", "YAHOO_ID", "SKYPE_ID", "LINKEDIN",
    "TWITTER", "FACEBOOK", "SYNC_CONTACTS", "LATITUDE", "LONGITUDE",
    "GEOCODE_STATUS", "X_REGION", "X_XS_LOGIN", "X_XS_PASSWORD",
    "X_XS_SECURITY_GROUP", "X_TT_CUSTOMER_GROUP", "X_STORE", "X_PHONE4",
    "X_PHONE5", "X_EMAIL3")

  /** Boolean Y/N columns (clean_contacts.py:129: ISACTIVE, OPTOUT_EMARKETING,
    * SUB1..SUB26). */
  val BoolFields: Seq[String] =
    Seq("ISACTIVE", "OPTOUT_EMARKETING") ++ (1 to 26).map(i => s"SUB$i")

  val NameFields: Seq[String] = Seq("FIRSTNAME", "LASTNAME", "FULLNAME", "TITLE")

  /** Apply all cleaning rules. Roles are resolved case-insensitively against
    * the actual columns; absent columns are untouched (presence checks mirror
    * clean_contacts.py:131 `if col in df.columns`). */
  def apply(df: DataFrame): DataFrame = {
    val unused = UnusedFields.flatMap(Roles.exact(df, _)).toSet
    val bools = BoolFields.flatMap(Roles.exact(df, _)).toSet
    val names = NameFields.flatMap(Roles.exact(df, _)).toSet -- unused
    val emails = Roles.bySubstring(df, "EMAIL").toSet -- unused
    val phones = Roles.bySubstring(df, "PHONE", "MOBILE").toSet -- unused
    val lastUpdated = Roles.exact(df, "LAST_UPDATED").toSet

    val cleaned: Seq[Column] = df.columns.toSeq.map { c =>
      val v = col(c)
      val expr: Column =
        if (unused(c)) lit(null).cast("string")           // P1
        else if (emails(c)) Cleaning.cleanEmail(v)        // F1 + C1
        else if (phones(c)) Cleaning.digitsOnly(v.cast("string")) // C3
        else if (names(c)) Cleaning.pyTitle(trim(v.cast("string"))) // C5
        else if (bools(c)) Cleaning.ynFlag(v)             // booleans
        else if (lastUpdated(c)) Cleaning.parseTs(v.cast("string")) // C8
        else v
      expr.as(c)
    }
    df.select(cleaned: _*)
  }
}
