package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier 1958) — the
  * right-censoring-aware estimate of "what fraction of subjects
  * survive past t". Pipeline uses: time-to-churn / time-to-first-
  * conversion with subjects still active at the observation cutoff
  * (censored — we know they survived AT LEAST this long, not when
  * they fail), job/feed time-to-failure where most runs are still
  * healthy. Dropping censored subjects biases survival down; counting
  * them as failures biases it up; KM is the standard correction:
  * S(t) = Π_{t_i ≤ t} (1 − d_i / n_i) over event times t_i, with
  * d_i failures at t_i and n_i the at-risk count (duration ≥ t_i,
  * censored included until they leave).
  *
  * Scale posture: one (group, duration)-keyed hash aggregate reduces
  * the subject frame to distinct-duration rows (map-side combined);
  * the running product rides [[Budget.groupedRunning]] prefix passes
  * in log space (exp Σ ln(1 − d/n)) — the two-phase distributed
  * prefix over the composite (group, duration) sort, so NO per-group
  * window exists: a group-partitioned window would put each cohort's
  * whole duration ladder in one task, which for fine-grained
  * durations at 100 TB (distinct durations ~ subjects) is the
  * single-task shape the q167/q180 rewrites removed. Per-group
  * totals are a |groups|-row aggregate broadcast back. */
object Survival {

  /** KM curve per `groupCol` from one row per subject:
    * `durationCol` (numeric time-to-event-or-censor) and `eventCol`
    * (true = event observed, false = right-censored). Output one row
    * per (group, event time): n_risk, n_event, n_censored (at that
    * exact time), survival (rounded 6). Censor-only times reduce the
    * risk set but emit no row, per KM convention. */
  def kaplanMeier(subjects: DataFrame, groupCol: String,
      durationCol: String, eventCol: String): DataFrame = {
    val perT = subjects.groupBy(col(groupCol), col(durationCol).as("t"))
      .agg(sum(when(col(eventCol), 1L).otherwise(0L)).as("n_event"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("n_censored"))
    val totals = perT.groupBy(col(groupCol))
      .agg(sum(col("n_event") + col("n_censored")).as("__tot"))
    // pass 1: running (event + censor) count up to t -> at-risk set
    // (at risk at t = subjects with duration >= t). Integer sums — the
    // two-phase prefix is bit-exact vs the sequential window.
    val withRisk = Budget.groupedRunning(perT, groupCol, Seq(col("t")),
        Seq(Budget.RunSum(col("n_event") + col("n_censored"), "__cum")))
      .join(broadcast(totals), Seq(groupCol))
      .withColumn("n_risk",
        col("__tot") - col("__cum") + col("n_event") + col("n_censored"))
    // pass 2 (n_risk is now a plain column): the log-space survival
    // prefix and the curve-hit-zero flag. Once n_event == n_risk the
    // curve is exactly 0; flagging it (instead of riding ln(0) = -Inf
    // through exp) keeps the log-sum finite and the arithmetic portable.
    Budget.groupedRunning(withRisk, groupCol, Seq(col("t")),
        Seq(
          Budget.RunMax(
            when(col("n_event") >= col("n_risk"), 1).otherwise(0),
            "__dead"),
          Budget.RunSum(
            when(col("n_event") > 0 && col("n_event") < col("n_risk"),
              log(lit(1.0) - col("n_event") / col("n_risk")))
              .otherwise(lit(0.0)),
            "__lsum")))
      .withColumn("survival", when(col("__dead") === 1, lit(0.0))
        .otherwise(round(exp(col("__lsum")), 6)))
      .filter(col("n_event") > 0)
      .select(col(groupCol), col("t"), col("n_risk"), col("n_event"),
        col("n_censored"), col("survival"))
  }
}
