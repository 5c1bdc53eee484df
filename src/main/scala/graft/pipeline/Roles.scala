package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Convention-based schema-role resolution (SURVEY.md §1.4).
  *
  * The reference resolves column *roles* three ways; all are reproduced here
  * but made case-insensitive throughout — the intended semantics. (The
  * observed reference behavior diverges: merge_contacts_kindaworks.py:56-57
  * persists lowercase headers which silently no-op the downstream exact
  * UPPERCASE matches; see the SURVEY.md §1.4 divergence ledger.)
  */
object Roles {

  /** Substring match, case-insensitive (reference clean_contacts.py:103,113,123):
    * all columns whose name contains any of the fragments. */
  def bySubstring(df: DataFrame, fragments: String*): Seq[String] = {
    // Locale.ROOT: default-locale casing breaks 'i'/'I' matching under a
    // Turkish JVM locale (exact() is already locale-safe via equalsIgnoreCase)
    val frags = fragments.map(_.toUpperCase(java.util.Locale.ROOT))
    df.columns.filter(c =>
      frags.exists(c.toUpperCase(java.util.Locale.ROOT).contains)).toSeq
  }

  /** Candidate-list match (fill_missing_contacts.py:188-192): first column
    * whose name equals any candidate, case-insensitive, candidate order wins. */
  def byCandidates(df: DataFrame, candidates: Seq[String]): Option[String] = {
    val byLower = df.columns
      .groupBy(_.toLowerCase(java.util.Locale.ROOT)).view.mapValues(_.head)
    candidates.iterator
      .flatMap(c => byLower.get(c.toLowerCase(java.util.Locale.ROOT)))
      .nextOption()
  }

  /** Exact-name match made case-insensitive (clean_contacts.py:129,150,167). */
  def exact(df: DataFrame, name: String): Option[String] =
    df.columns.find(_.equalsIgnoreCase(name))

  // The reference's source-file probing conventions
  // (fill_missing_contacts.py:188-192, merge_contacts_kindaworks.py:48-57):
  val FirstNameCandidates = Seq("First Name", "FirstName", "firstname", "first_name")
  val LastNameCandidates = Seq("Last Name", "LastName", "lastname", "last_name")
  val FullNameCandidates = Seq("Full Name", "FullName", "fullname", "name")
  val EmailCandidates = Seq("email address", "Email Address", "EMAIL", "email", "x_email2")
  val PhoneCandidates = Seq("Phone Number", "phone", "PHONE", "mobile", "MOBILE", "number")

  /** Resolved roles for a source file. A file lacking both a name role and an
    * email/phone role is skipped, not an error (fill_missing_contacts.py:195-197). */
  case class SourceRoles(first: Option[String], last: Option[String],
      full: Option[String], email: Option[String], phone: Option[String]) {
    def hasName: Boolean = full.isDefined || (first.isDefined && last.isDefined)
    def usable: Boolean = hasName || email.isDefined || phone.isDefined
  }

  def resolve(df: DataFrame): SourceRoles = SourceRoles(
    first = byCandidates(df, FirstNameCandidates),
    last = byCandidates(df, LastNameCandidates),
    full = byCandidates(df, FullNameCandidates),
    email = byCandidates(df, EmailCandidates),
    phone = byCandidates(df, PhoneCandidates))
}
