package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal prediction calibration (Vovk et al.; Papadopoulos
  * 2002) — the distribution-free coverage machinery for putting honest
  * error bars on ANY model's scores: on a held-out calibration split,
  * take the ⌈(n+1)(1−α)⌉-th smallest nonconformity score as the
  * threshold q̂; the conformal guarantee says a fresh exchangeable
  * point's score is ≤ q̂ with probability ≥ 1−α. The pipeline use is
  * the coverage AUDIT: empirical test coverage per group ≈ 1−α when
  * the data is exchangeable, and a group whose coverage collapses has
  * drifted from calibration — a model-agnostic shift detector that
  * complements the score-distribution tests ([[Drift]]).
  *
  * Scale posture: q̂ is an exact order statistic — one group-keyed
  * prefix window over the calibration split (per-group sort, the same
  * cost class as any exact quantile; swap to approx_percentile at
  * extreme scale, the audit tolerates sketch error); coverage is one
  * broadcast-size join of the |groups|-row threshold frame against
  * the test split plus a group-keyed aggregate. */
object Conformal {

  /** Per-group conformal audit. `cal` and `test`: (groupCol, scoreCol)
    * nonconformity scores (caller computes them — model-agnostic;
    * pre-round for engine parity). Output per group: n_cal, n_test,
    * qhat (the ⌈(n_cal+1)(1−α)⌉-th smallest cal score, capped at the
    * max), coverage (rounded 6), covered (coverage ≥ 1−α−slack). */
  def splitConformal(cal: DataFrame, test: DataFrame, groupCol: String,
      scoreCol: String, alpha: Double = 0.1,
      slack: Double = 0.05): DataFrame = {
    val wAll = Window.partitionBy(col(groupCol))
    val wOrd = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).asc)
    val qhat = cal
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__rn", row_number().over(wOrd))
      // ties on the score leave the k-th VALUE well-defined whatever
      // order row_number gives the tied rows
      .filter(col("__rn") === least(
        ceil((col("__n") + 1) * lit(1.0 - alpha)).cast("long"),
        col("__n")))
      .select(col(groupCol), col(scoreCol).as("qhat"),
        col("__n").as("n_cal"))
    test
      .join(broadcast(qhat), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(first(col("n_cal")).as("n_cal"),
        count(lit(1)).as("n_test"),
        first(col("qhat")).as("qhat"),
        round(sum(when(col(scoreCol) <= col("qhat"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("coverage"))
      .withColumn("covered",
        col("coverage") >= lit(1.0 - alpha - slack))
  }
}
