package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** The 25 explicitly-unused fields nulled by the cleaner — the
    * reference's exact UNUSED_FIELDS list (clean_contacts.py:16-23),
    * byte-for-byte. An earlier transcription drifted (it nullified
    * TITLE/ADVERTSOURCE/X_XS_* which the reference keeps, and missed
    * DIRECTPHONE/X_EMAIL2/X_PHONE1-3/X_TT_EXTENSION which it nulls);
    * the tools/parity.py field diff against the reference's own run
    * caught it — TITLE is a NAME field (title-cased), never nulled. */
  val UnusedFields: Seq[String] = Seq(
    "SALUTATION", "DIRECTPHONE", "DIRECTFAX", "HOMEPHONE",
    "MSN_ID", "YAHOO_ID", "SKYPE_ID", "SYNC_CONTACTS", "LINKEDIN",
    "TWITTER", "FACEBOOK", "CAMPAIGN_WAVE_SEQNO", "LATITUDE", "LONGITUDE",
    "GEOCODE_STATUS", "X_STORE", "X_EMAIL2", "X_EMAIL3",
    "X_PHONE1", "X_PHONE2", "X_PHONE3", "X_PHONE4", "X_PHONE5",
    "X_TT_EXTENSION", "X_REGION")

  /** Boolean Y/N columns (clean_contacts.py:129: ISACTIVE, OPTOUT_EMARKETING,
    * SUB1..SUB26). */
  val BoolFields: Seq[String] =
    Seq("ISACTIVE", "OPTOUT_EMARKETING") ++ (1 to 26).map(i => s"SUB$i")

  val NameFields: Seq[String] = Seq("FIRSTNAME", "LASTNAME", "FULLNAME", "TITLE")

  /** Apply all cleaning rules. Roles are resolved case-insensitively against
    * the actual columns; absent columns are untouched (presence checks mirror
    * clean_contacts.py:131 `if col in df.columns`).
    *
    * Deliberate extension beyond the reference's substring convention: MOBILE
    * is cleaned as a phone field. The reference's "contains PHONE" match
    * (clean_contacts.py:113) accidentally skips the primary `mobile` column
    * even though every other stage (fill keys, dedup fallback key,
    * validation) treats it as a phone — another intended-vs-observed call,
    * recorded here. */
  def apply(df: DataFrame): DataFrame = {
    // "_"-prefixed columns are the pipeline's own normalized match keys
    // (_name/_email/_phone, Fill.withMatchKeys) — the substring role match
    // must not rewrite them (cleanEmail would null an invalid _email key)
    def notHelper(cols: Seq[String]): Seq[String] =
      cols.filterNot(_.startsWith("_"))
    val unused = UnusedFields.flatMap(Roles.exact(df, _)).toSet
    val bools = BoolFields.flatMap(Roles.exact(df, _)).toSet
    val names = NameFields.flatMap(Roles.exact(df, _)).toSet -- unused
    val emails = notHelper(Roles.bySubstring(df, "EMAIL")).toSet -- unused
    val phones = notHelper(Roles.bySubstring(df, "PHONE", "MOBILE")).toSet -- unused
    // address/postcode strip (clean_contacts.py:123-126); names take
    // precedence (disjoint on the real schema — defensive only)
    val addresses = notHelper(Roles.bySubstring(df, "ADDRESS", "POST_CODE"))
      .toSet -- unused -- names -- emails -- phones
    val lastUpdated = Roles.exact(df, "LAST_UPDATED").toSet

    val cleaned: Seq[Column] = df.columns.toSeq.map { c =>
      val v = col(s"`$c`")
      val expr: Column =
        if (unused(c)) lit(null).cast("string")           // P1
        else if (emails(c)) Cleaning.cleanEmail(v)        // F1 + C1
        else if (phones(c)) Cleaning.digitsOnly(v.cast("string")) // C3
        // C5: title() THEN strip(), the reference's order, with Python's
        // Unicode strip set (an NBSP-led name must come out stripped)
        else if (names(c)) Cleaning.pyStrip(Cleaning.pyTitle(v.cast("string")))
        else if (addresses(c)) Cleaning.pyStrip(v.cast("string"))
        else if (bools(c)) Cleaning.ynFlag(v)             // booleans
        else if (lastUpdated(c)) Cleaning.parseTs(v.cast("string")) // C8
        else v
      expr.as(c)
    }
    df.select(cleaned: _*)
  }

  /** Nullable-integer conversion (SURVEY.md §1.2 + A5,
    * clean_contacts.py:32-50): double columns whose non-null values are all
    * whole numbers become LongType (pandas `Int64`), as do the explicit ID
    * columns SEQNO / SALESNO / COMPANY_ACCNO. The whole-number check is ONE
    * aggregate pass over all candidate columns (A5: `max(abs(col % 1)) == 0`
    * folded into a single job), then a driver-side schema decision. */
  val IdFields: Seq[String] = Seq("SEQNO", "SALESNO", "COMPANY_ACCNO")

  def integerize(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val doubleCols = df.schema.fields
      .filter(_.dataType == DoubleType).map(_.name).toSeq
    val whole: Set[String] =
      if (doubleCols.isEmpty) Set.empty
      else {
        val checks = doubleCols.map(c =>
          max(abs(col(c) % 1.0)).as(c))
        val row = df.agg(checks.head, checks.tail: _*).head()
        doubleCols.zipWithIndex
          .filter { case (_, i) => row.isNullAt(i) || row.getDouble(i) == 0.0 }
          .map(_._1).toSet
      }
    val ids = IdFields.flatMap(Roles.exact(df, _)).toSet
    df.select(df.columns.toSeq.map { c =>
      if (whole(c) || ids(c)) col(s"`$c`").cast("long").as(c)
      else col(s"`$c`")
    }: _*)
  }

  /** SUB-column heuristic sequence reset (P9, clean_contacts.py:66-84): if a
    * SUB1..26 column IS numeric (every non-null value casts — a pandas
    * object column with any text is ineligible), has more than one distinct
    * value, and its max is at most 2N, overwrite it with 1..N in `order`.
    * The eligibility stats for ALL sub columns come from one aggregate pass
    * (A6). The reference used the implicit pandas row order; a distributed
    * plan needs the explicit sort key — assigned once via the scale-safe
    * [[RowIds.denseByOrder]] (no single-task global window) and copied into
    * every eligible column. */
  def resetSubSequences(df: DataFrame, order: Seq[Column]): DataFrame = {
    val subs = (1 to 26).map(i => s"SUB$i").flatMap(Roles.exact(df, _))
    if (subs.isEmpty) return df
    val n = df.count()
    def casted(c: String) = expr(s"try_cast(cast(`$c` as string) as double)")
    val aggCols =
      subs.map(c => countDistinct(col(s"`$c`")).as(s"d_$c")) ++
        subs.map(c => max(casted(c)).as(s"m_$c")) ++
        subs.map(c => count(col(s"`$c`")).as(s"n_$c")) ++
        subs.map(c => count(casted(c)).as(s"c_$c"))
    val stats = df.agg(aggCols.head, aggCols.tail: _*).head()
    val eligible = subs.filter { c =>
      val d = stats.getAs[Long](s"d_$c")
      val mIdx = stats.fieldIndex(s"m_$c")
      val allNumeric = stats.getAs[Long](s"n_$c") == stats.getAs[Long](s"c_$c")
      allNumeric && d > 1 && !stats.isNullAt(mIdx) &&
        stats.getDouble(mIdx) <= 2.0 * n
    }.toSet
    if (eligible.isEmpty) df
    else {
      val seqCol = "__graft_sub_seq"
      val withSeq = RowIds.denseByOrder(df, seqCol, order)
      withSeq.select(df.columns.toSeq.map { c =>
        if (eligible(c)) col(seqCol).as(c) else col(s"`$c`")
      }: _*)
    }
  }
}
