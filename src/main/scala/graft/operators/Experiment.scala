package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUPED variance-reduced A/B analysis (Deng, Xu, Kohavi & Walker,
  * WSDM 2013 — "Improving the Sensitivity of Online Controlled
  * Experiments by Utilizing Pre-Experiment Data") — the standard
  * large-scale experimentation trick: a user's pre-period activity X
  * predicts their post-period metric Y, so the adjusted metric
  * Y' = Y − θ(X − x̄) with θ = cov(X,Y)/var(X) keeps the same mean
  * (unbiased uplift) while shedding the between-user variance X
  * explains — typically 30–60% tighter intervals for free. The
  * data-engine angle: this is pure relational algebra (two period
  * aggregates, a 1-row pooled fit, a per-arm rollup), and the engine
  * must make the numbers REPRODUCIBLE — θ and x̄ are frozen at 6
  * decimals before the adjustment (the q163 frozen-fit stance), so
  * every engine subtracts identical constants and the per-row Y' is
  * bit-deterministic.
  *
  * Scale posture: per-user period metrics are one user-keyed
  * aggregate; the (θ, x̄) fit is a 1-row aggregate broadcast back;
  * the arm rollup is a |arms|-row aggregate. Nothing quadratic,
  * nothing collected beyond the 1-row fit. */
object Experiment {

  /** `users`: one row per subject with armCol, preCol (X), postCol
    * (Y). Output one row per arm: n_users, mean_pre, mean_post,
    * mean_adj, var_post, var_adj (rounded 6) plus the pooled theta
    * and var_reduction (1 − var_adj/var_post, pooled) repeated. */
  def cuped(users: DataFrame, armCol: String, preCol: String,
      postCol: String): DataFrame = {
    val fit = users.agg(
      round(covar_pop(col(preCol), col(postCol))
        / nullif(var_pop(col(preCol)), lit(0.0)), 6).as("theta"),
      round(avg(col(preCol)), 6).as("xbar"))
    val adj = users.crossJoin(broadcast(fit))
      .withColumn("__yadj", col(postCol)
        - col("theta") * (col(preCol) - col("xbar")))
    val pooled = adj.agg(
      round(lit(1.0) - var_pop(col("__yadj"))
        / nullif(var_pop(col(postCol)), lit(0.0)), 6)
        .as("var_reduction"))
    adj.groupBy(col(armCol))
      .agg(count(lit(1)).as("n_users"),
        round(avg(col(preCol)), 6).as("mean_pre"),
        round(avg(col(postCol)), 6).as("mean_post"),
        round(avg(col("__yadj")), 6).as("mean_adj"),
        round(var_pop(col(postCol)), 6).as("var_post"),
        round(var_pop(col("__yadj")), 6).as("var_adj"),
        first(col("theta")).as("theta"))
      .crossJoin(broadcast(pooled))
  }
}
