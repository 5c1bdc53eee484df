package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy risk audit over quasi-identifiers — k-anonymity (Sweeney 2002)
  * and distinct-l-diversity (Machanavajjhala et al. 2007). The training-
  * data angle: before a corpus with person-linked attributes is released
  * or trained on, every combination of quasi-identifier columns (the
  * attributes an adversary can join from outside — region, segment,
  * coarse account bucket) must be shared by at least k rows, or those
  * rows are re-identifiable; and the sensitive attribute must take at
  * least l distinct values inside each group, or membership alone leaks
  * it. This audit FINDS the violating groups; the remediation
  * (generalize buckets, suppress rows) is the caller's policy. Redaction
  * of directly-identifying strings is the separate row-local pass
  * (redact_pii, q56).
  *
  * Scale posture: one hash aggregate keyed on the quasi-identifier tuple
  * (map-side combined, |combos| output rows) computing group size and
  * distinct-sensitive count together; the flags are arithmetic over the
  * combo frame. Nothing corpus-sized shuffles twice. */
object Privacy {

  /** Per quasi-identifier combination: group size, distinct sensitive
    * values, and the k/l verdicts. Output: quasi cols + (group_size,
    * l_distinct, k_anonymous, l_diverse). */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        count_distinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("k_anonymous", col("group_size") >= k)
      .withColumn("l_diverse", col("l_distinct") >= l)
}
