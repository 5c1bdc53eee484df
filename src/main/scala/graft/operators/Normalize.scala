package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source quantile normalization (the microarray-era technique,
  * Bolstad 2003, applied to corpus quality scores) — map each
  * source's score distribution onto the POOLED distribution by rank,
  * so a score is comparable across sources whose scorers drift (one
  * crawl's length distribution runs long, one quality model is
  * systematically generous). After normalization the p-th percentile
  * of every source carries the same value, so a single global
  * threshold (keep top-X%) cuts every source fairly — the alternative
  * per-source thresholds are exactly what q76-style quality sampling
  * has to hand-tune.
  *
  * Determinism: the target index is computed in INTEGER arithmetic —
  * idx = ⌊(r−1)(N−1)/(n_h−1)⌋ + 1 via integer multiply-then-divide
  * (a float product of the same rationals lands on either side of an
  * integer boundary depending on the engine); rank() gives tied
  * scores the same rank and therefore the same normalized value.
  *
  * Scale posture: NO per-source window either — sources are few and
  * huge, so `rank().over(Window.partitionBy(source))` would push each
  * source through ONE task; instead the per-source rank of a row is
  * its source's strictly-smaller count + 1, read off the per-source
  * distinct-value ladder built with [[Budget.groupedCumulativeSum]]
  * (a GLOBAL parallel prefix over (source, score) minus broadcast
  * per-source offsets) and joined back on (source, score). The pooled
  * distinct-value ladder's cumulative counts come from
  * [[Budget.cumulativeSum]]'s two-phase distributed prefix sum (the
  * ladder is distinct-value-sized — corpus-sized for a continuous
  * score — so NO unpartitioned window and NO broadcast of it is
  * allowed), and the idx→value lookup is a bucketed equi-join: probe
  * rows key on idx div B, ladder spans replicate onto the ≤ span/B+1
  * buckets they cover, and the exact (cum_lo, cum_hi] containment
  * filters after the bucket match. Nothing corpus-derived is
  * broadcast, windowed globally or per-group, or collected. */
object Normalize {

  /** Bucket width for the idx→ladder-span equi-join: spans replicate
    * once per B-wide bucket they cover, so build-side inflation is
    * ≤ N/B + |ladder| rows while each bucket's join stays local. */
  private val BucketWidth = 65536L

  /** Output: (idCol, groupCol, score, norm_score) — norm_score is the
    * idx-th smallest pooled score. Groups of size 1 map to the pooled
    * median index (N+1)/2. */
  def quantileNormalize(df: DataFrame, groupCol: String,
      scoreCol: String, idCol: String): DataFrame = {
    val s = df.select(col(idCol), col(groupCol),
      col(scoreCol).cast("long").as("score"))
    // per-source rank without a per-source window: rank() of a row ==
    // (count of strictly smaller scores in its source) + 1, which is the
    // source-local cum_lo of its distinct-value ladder entry
    val perGroupVal = s.groupBy(col(groupCol), col("score").as("pv"))
      .agg(count(lit(1)).as("gc"))
    val gLadder = Budget.groupedCumulativeSum(perGroupVal, groupCol,
        Seq(col("pv")), col("gc"), "g_hi")
      .select(col(groupCol), col("pv").as("score"),
        (col("g_hi") - col("gc") + 1).as("r"))
    val nh = perGroupVal.groupBy(col(groupCol))
      .agg(sum(col("gc")).as("n_h"))
    val ranked = s
      .join(gLadder, Seq(groupCol, "score"))
      .join(broadcast(nh), Seq(groupCol))
    val nPool = s.agg(count(lit(1)).as("n_pool"))
    // pooled distinct-value ladder; cumulative counts via the two-phase
    // distributed prefix sum (ladder may be corpus-sized)
    val ladder = Budget.cumulativeSum(
        s.groupBy(col("score").as("pv")).agg(count(lit(1)).as("c")),
        Seq(col("pv")), col("c"), "cum_hi")
      .withColumn("cum_lo", col("cum_hi") - col("c"))
      .select(col("pv"), col("cum_lo"), col("cum_hi"))
    val ix = ranked.crossJoin(broadcast(nPool))
      .withColumn("idx",
        when(col("n_h") === 1, expr("(n_pool + 1) div 2"))
          .otherwise(
            expr("(r - 1) * (n_pool - 1) div (n_h - 1)") + 1))
      .withColumn("__pb", expr(s"(idx - 1) div $BucketWidth"))
    // span (cum_lo, cum_hi] covers idx-1 in [cum_lo, cum_hi-1] — one
    // replica per covered bucket
    val spans = ladder.withColumn("__lb",
      explode(sequence(expr(s"cum_lo div $BucketWidth"),
        expr(s"(cum_hi - 1) div $BucketWidth"))))
    ix.join(spans, col("__pb") === col("__lb")
        && col("idx") > col("cum_lo") && col("idx") <= col("cum_hi"))
      .select(col(idCol), col(groupCol), col("score"),
        col("pv").as("norm_score"))
  }
}
