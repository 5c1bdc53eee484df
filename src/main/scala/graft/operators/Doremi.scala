package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Loss-driven domain reweighting — the DoReMi recipe (Xie et al. 2023,
  * "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
  * Pretraining"): domains where the proxy model's loss exceeds a reference
  * get their sampling weight boosted by an exponentiated-gradient step,
  * then smoothed with uniform mass. Complements [[Mix]]: temperature
  * mixing sets rates from SIZES, this sets rates from LOSSES — the two
  * compose (DoReMi's output is exactly the `weights` input a sampler
  * consumes).
  *
  * One relational EG step (the paper re-estimates per training step; the
  * data-side computation per step is this):
  *
  *   excess_d = max(0, mean_loss_d - ref_loss_d)
  *   w_d ∝ exp(eta * excess_d)
  *   weight_d = (1 - smoothing) * w_d / Z + smoothing / k
  *
  * `ref` defaults to the corpus-wide (doc-weighted) mean loss; a per-domain
  * reference-model loss column slots into `refLoss` when one exists (the
  * paper's setting).
  *
  * Scale posture (100 TB): one corpus scan -> domain-keyed hash aggregate
  * (shuffle = |domains| rows, map-side combined); the reference and
  * normalizer are 1-row broadcasts; everything downstream is arithmetic on
  * the |domains|-sized frame. No window, no collect, nothing iterative over
  * the corpus.
  *
  * Determinism: losses are quantized to 4 decimals and summed as exact
  * scaled integers, so each mean is ONE IEEE division of exact longs —
  * bit-identical under any partitioning or engine. (A plain avg-then-round
  * is NOT safe here: averaging already-quantized values lands exactly on
  * 6-decimal rounding boundaries often — discrete sums over small counts —
  * and summation order then flips the rounded mean; caught by
  * DeterminismSpec.) Final weights round to 6 after the exp.
  */
object Doremi {

  /** Per-domain EG reweighting over `df` grouped by `domainCol` with
    * per-row proxy `loss`. Returns one row per domain:
    * (domain, n_docs, mean_loss, excess, weight), weight summing to ~1
    * (6-decimal rounding), n_docs counting rows with non-null loss. */
  def domainReweight(df: DataFrame, domainCol: String, loss: Column,
      eta: Double = 1.0, smoothing: Double = 0.01): DataFrame = {
    // 4-decimal quantized loss as an exact integer: the sums are exact,
    // each mean is one IEEE division — partitioning/engine-independent
    val withLoss = df.select(col(domainCol),
      round(loss * 10000).cast("long").as("li"))
    def mean6(s: Column, n: Column): Column =
      round(s.cast("double") / (n * 10000.0), 6)
    val byDom = withLoss.groupBy(col(domainCol)).agg(
      count(col("li")).as("n_docs"),
      mean6(sum(col("li")), count(col("li"))).as("mean_loss"))
    val ref = withLoss.agg(
      mean6(sum(col("li")), count(col("li"))).as("ref_loss"))
    val ex = byDom.crossJoin(broadcast(ref))
      .withColumn("excess",
        round(greatest(col("mean_loss") - col("ref_loss"), lit(0.0)), 6))
      .withColumn("ew", exp(lit(eta) * col("excess")))
    val norm = ex.agg(sum(col("ew")).as("z"),
      count(lit(1)).as("k"))
    ex.crossJoin(broadcast(norm))
      .select(col(domainCol), col("n_docs"), col("mean_loss"), col("excess"),
        round(lit(1.0 - smoothing) * col("ew") / col("z")
          + lit(smoothing) / col("k"), 6).as("weight"))
  }
}
