package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level cleaning / standardization functions.
  *
  * Re-expresses the reference's row-wise pandas lambdas as codegen-friendly
  * Catalyst column expressions (SURVEY.md §2.8; reference:
  * cleaning/clean_contacts.py:106-151, cleaning/fill_missing_contacts.py:8-32,
  * cleaning/merge_contacts_kindaworks.py:22-38, cleaning/validate_fields.py:8-22).
  *
  * Everything here is a pure `Column => Column` function so Catalyst can fold,
  * push down, and whole-stage-codegen it — zero black-box UDFs on the hot path.
  */
object Cleaning {

  /** Null-ish sentinel zoo: the reference's explicit list
    * (clean_contacts.py:206: values excluded from the golden-record merge)
    * PLUS the realistic subset of pandas' default `na_values` — every
    * reference stage reads through `pd.read_csv`, which nulls "N/A",
    * "NA", "NULL", "#N/A", "<NA>" (etc.) BEFORE any code runs, so these
    * strings are missing under reference semantics even though no line of
    * reference code names them. Caught by the tools/parity.py fill lane:
    * real export rows carry literal "N/A" names that the reference can
    * never observe but a naive string reader would copy around as data.
    * Matching is exact-after-trim (pandas' list is case-sensitive:
    * "Null" is data, "NULL" is not). */
  val MissingSentinels: Seq[String] = Seq("", "nan", "None", "NaN",
    "N/A", "n/a", "NA", "#N/A", "NULL", "null", "<NA>")

  /** True when a value is missing under reference semantics: SQL null, empty /
    * whitespace-only string, or a string null-sentinel (clean_contacts.py:206,
    * fill_missing_contacts.py:120). */
  def isMissing(c: Column): Column =
    c.isNull || trim(c) === "" || trim(c).isin(MissingSentinels.tail: _*)

  def isPresent(c: Column): Column = !isMissing(c)

  /** Trim + collapse internal whitespace runs to one space
    * (fill_missing_contacts.py:12 `re.sub(r'\s+', ' ', ...)`). */
  def normWhitespace(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** Normalized name key: lowercase, trimmed, whitespace-collapsed
    * (fill_missing_contacts.py:8-12, merge_contacts_kindaworks.py:22-25). */
  def normName(c: Column): Column = lower(normWhitespace(c))

  /** Strip all non-digits (clean_contacts.py:114 `re.sub(r"\D", "", ...)`). */
  def digitsOnly(c: Column): Column = regexp_replace(c, "[^0-9]", "")

  /** Normalized phone key: digits only; keep last 10 digits when >= 10
    * (fill_missing_contacts.py:14-21). */
  def normPhone(c: Column): Column = {
    val d = digitsOnly(c)
    when(length(d) >= 10, substring(d, -10, 10)).otherwise(d)
  }

  /** Normalized email key: lowercase + trim (clean_contacts.py:106). */
  def normEmail(c: Column): Column = lower(trim(c))

  /** Email validity regex. The reference uses `re.match` which anchors at the
    * start only (clean_contacts.py:107, validate_fields.py:8); `rlike` is
    * unanchored, hence the explicit `^` and no `$`. */
  val EmailRegex = "^[^@]+@[^@]+\\.[^@]+"

  def validEmail(c: Column): Column = normEmail(c).rlike(EmailRegex)

  /** Clean an email column: normalized value when valid, else null
    * (clean_contacts.py:103-108). */
  def cleanEmail(c: Column): Column =
    when(validEmail(c), normEmail(c)).otherwise(lit(null).cast("string"))

  /** Phone validity: digits-only length in [7, 15] (validate_fields.py:18-22). */
  def validPhone(c: Column): Column = length(digitsOnly(c)).between(7, 15)

  /** Tri-state Y/N boolean standardization (clean_contacts.py:137-142):
    * strip + uppercase, then keep ONLY the literals "Y"/"N" — everything
    * else (including "yes"/"true"/"1"/"0" spellings) becomes null,
    * exactly like the reference's `x if x in ["Y","N"] else pd.NA`. An
    * earlier version mapped common boolean spellings onto Y/N — a silent
    * deviation the full-master parity run caught (a raw "0" cell: null
    * in the reference, "N" here). Kept as StringType {Y, N, null} for
    * byte-exact TSV round-trips (SURVEY.md §1.2). */
  def ynFlag(c: Column): Column = {
    val u = upper(trim(c.cast("string")))
    when(u.isin("Y", "N"), u).otherwise(lit(null).cast("string"))
  }

  /** Lenient timestamp parse = pandas `to_datetime(errors="coerce")`
    * (clean_contacts.py:151). Observed formats: `yyyy-MM-dd HH:mm:ss[.SSS]`
    * (reference output/MergedDatabase.tsv:2). try_* keeps ANSI mode happy. */
  def parseTs(c: Column): Column = coalesce(
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss.SSS")),
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
    try_to_timestamp(c, lit("yyyy-MM-dd")))

  /** Full-name derivation: `first + " " + last`, falling back to an existing
    * full-name column, then a generic name column, else ""
    * (merge_contacts_kindaworks.py:27-38, fill_missing_contacts.py:23-32). */
  def fullName(first: Column, last: Column, full: Column, generic: Column): Column = {
    val fl = normWhitespace(concat_ws(" ",
      coalesce(first, lit("")), coalesce(last, lit(""))))
    when(fl =!= "", fl)
      .when(isPresent(full), normWhitespace(full))
      .when(isPresent(generic), normWhitespace(generic))
      .otherwise(lit(""))
  }

  /** Python `str.title()` parity (clean_contacts.py:117-119): uppercases a
    * letter after ANY non-letter (`o'brien` -> `O'Brien`), unlike Spark's
    * whitespace-only `initcap`. See [[graft.expressions.PyTitleCase]]. */
  def pyTitle(c: Column): Column = graft.expressions.PyTitleCase.column(c)

  /** Python `str.strip()` parity: strips the characters `str.isspace()`
    * accepts — Unicode whitespace including NBSP (U+00A0), NEL (U+0085),
    * the U+2000-200A block, and the file/group/record/unit separators —
    * where Spark's `trim` strips ASCII 0x20 only. The reference's name
    * and address cleaning both end in `.str.strip()`, and real CRM
    * exports carry NBSP-led names (caught by the tools/parity.py field
    * diff against the reference's own run). */
  private val PyWs = "[\\t\\n\\u000B\\f\\r\\u001C-\\u001F \\u0085\\u00A0" +
    "\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]"
  def pyStrip(c: Column): Column =
    regexp_replace(c, s"^$PyWs+|$PyWs+$$", "")

  /** Dedup key (clean_contacts.py:164-179): lower(email) when present, else
    * lower(fullname) + "-" + mobile. Implements the INTENDED semantics with
    * case-insensitive role resolution (the observed run no-ops due to the
    * header-case hazard — SURVEY.md §1.4 divergence ledger). */
  def dedupKey(email: Column, fullname: Column, mobile: Column): Column = {
    val e = when(isPresent(email), normEmail(email)).otherwise(lit(""))
    val fallback = concat_ws("-",
      when(isPresent(fullname), normName(fullname)).otherwise(lit("")),
      when(isPresent(mobile), normPhone(mobile)).otherwise(lit("")))
    when(e =!= "", e).otherwise(fallback)
  }

  /** >= k-of-n exact-match predicate (fill_missing_contacts.py:34-45
    * `has_matching_fields`), as a join-condition builder: each pair matches
    * when both sides are present and equal; accept when at least `k` pairs
    * match. Keeps the fill join an equi-join-friendly conjunction of cheap
    * integer sums instead of a nested loop (SURVEY.md §2.3 F7). */
  def matchesAtLeast(k: Int, pairs: (Column, Column)*): Column = {
    val matchCounts = pairs.map { case (a, b) =>
      when(isPresent(a) && isPresent(b) && a === b, lit(1)).otherwise(lit(0))
    }
    matchCounts.reduce(_ + _) >= k
  }
}
