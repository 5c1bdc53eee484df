package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-based corpus mixing — the multilingual sampling-rate rule of
  * mT5 / XLM-R (Conneau et al. 2020 §3.1; Raffel et al. 2020 §3.4.3 use the
  * same exponent form): a domain with natural share p_i of the corpus is
  * sampled with probability q_i proportional to p_i^alpha, alpha in (0, 1].
  * alpha = 1 reproduces natural sampling; alpha -> 0 approaches uniform;
  * the papers' alpha = 0.3 boosts low-resource domains without flattening
  * the head. Complements [[Budget]]'s hard per-domain token caps (q60):
  * temperature mixing sets the RATES, budget selection enforces the caps.
  *
  * Scale posture (100 TB): one corpus scan -> hash aggregate keyed on the
  * domain (shuffle = |domains| rows, map-side combined); everything after
  * the aggregate is arithmetic over the domain-sized frame (|domains| is
  * metadata-sized — tens to thousands). The normalizer sum(p^alpha) is a
  * single-row aggregate broadcast back as a literal column; no window, no
  * collect.
  */
object Mix {

  /** Per-domain temperature-sampling weights over `df` grouped by
    * `domainCol`, sized by `weight` (e.g. a token count — pass `lit(1L)`
    * for doc-count shares). Returns one row per domain:
    * (domain, n_weight, nat_share, temp_share, budget_rows) where
    * nat_share = p_i, temp_share = q_i ~ p_i^alpha (both rounded to 6),
    * and budget_rows = round(q_i * budget) — the number of
    * tokens/documents to draw from each domain under a total budget. */
  def temperatureWeights(df: DataFrame, domainCol: String, weight: Column,
      alpha: Double = 0.3, budget: Long = 1000000L): DataFrame = {
    val byDom = df.groupBy(col(domainCol))
      .agg(sum(weight).as("n_weight"))
    val tot = byDom.agg(sum(col("n_weight")).as("n_total"))
    val shares = byDom.crossJoin(broadcast(tot))
      .select(col(domainCol), col("n_weight"),
        (col("n_weight").cast("double") / col("n_total")).as("p"))
      .withColumn("p_a", pow(col("p"), lit(alpha)))
    val norm = shares.agg(sum(col("p_a")).as("z"))
    shares.crossJoin(broadcast(norm))
      .select(col(domainCol), col("n_weight"),
        round(col("p"), 6).as("nat_share"),
        round(col("p_a") / col("z"), 6).as("temp_share"),
        round(col("p_a") / col("z") * lit(budget.toDouble), 0)
          .cast("long").as("budget_rows"))
  }
}
