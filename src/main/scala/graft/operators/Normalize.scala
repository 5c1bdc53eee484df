package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Scale posture: per-source rank is a group-partitioned window; the
  * pooled lookup table is built over DISTINCT score values (one hash
  * aggregate + a prefix window over the distinct-value frame — the
  * operator assumes a discrete or pre-bucketed score; quantize first
  * if it is continuous) and broadcast for the range join. Nothing
  * global touches corpus-sized data. */
object Normalize {

  /** Output: (idCol, groupCol, score, norm_score) — norm_score is the
    * idx-th smallest pooled score. Groups of size 1 map to the pooled
    * median index (N+1)/2. */
  def quantileNormalize(df: DataFrame, groupCol: String,
      scoreCol: String, idCol: String): DataFrame = {
    val s = df.select(col(idCol), col(groupCol),
      col(scoreCol).cast("long").as("score"))
    val wSrc = Window.partitionBy(col(groupCol)).orderBy(col("score"))
    val wSrcN = Window.partitionBy(col(groupCol))
    val ranked = s
      .withColumn("r", rank().over(wSrc))
      .withColumn("n_h", count(lit(1)).over(wSrcN))
    val nPool = s.agg(count(lit(1)).as("n_pool"))
    // pooled distinct-value ladder with cumulative counts
    val wVal = Window.orderBy(col("pv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ladder = s.groupBy(col("score").as("pv"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum_hi", sum(col("c")).over(wVal))
      .withColumn("cum_lo", col("cum_hi") - col("c"))
      .select(col("pv"), col("cum_lo"), col("cum_hi"))
    val ix = ranked.crossJoin(broadcast(nPool))
      .withColumn("idx",
        when(col("n_h") === 1, expr("(n_pool + 1) div 2"))
          .otherwise(
            expr("(r - 1) * (n_pool - 1) div (n_h - 1)") + 1))
    ix.join(broadcast(ladder),
        col("idx") > col("cum_lo") && col("idx") <= col("cum_hi"))
      .select(col(idCol), col(groupCol), col("score"),
        col("pv").as("norm_score"))
  }
}
