package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CUSUM mean-shift detection (Page 1954) — the sequential changepoint
  * monitor that complements the distributional drift score ([[Drift]]):
  * PSI says "the histogram moved between two slices", CUSUM says "the
  * level moved at time t" and localizes t. The corpus-ops use: an
  * ingested metric feed (docs/hour, mean quality score, event values)
  * whose level steps — a writer change, a unit change, an upstream
  * regression — must alarm with the step's position, not just a
  * whole-slice verdict.
  *
  * Formulation (standardized two-sided CUSUM): z_t = (v_t − μ)/σ with
  * μ, σ from an in-control reference slice; x_t = z_t − slack; the
  * one-sided statistic
  * is the max-reset recursion S_t = max(0, S_{t−1} + x_t). The
  * recursion looks inherently sequential, but it has the closed form
  *
  *   S_t = C_t − min(0, min_{j≤t} C_j),   C_t = Σ_{i≤t} x_i
  *
  * (subtracting the running minimum of the cumulative sum re-creates
  * every reset), so the whole detector is prefix aggregates over a
  * (group, time) sort — no UDF, no driver loop, no state store. Both
  * the cumulative sum and its running minimum ride ONE
  * [[Budget.groupedRunning]] pass (the `RunSumWithMin` shape): the
  * two-phase distributed prefix over the composite (group, time)
  * sort, so NO per-group window exists — a group-partitioned window
  * would put each monitored series entirely in one task, the
  * single-task scale shape the q167/q180 rewrites removed (event
  * types are few; series are corpus-sized). The mirrored statistic
  * with x_t = −z_t − slack catches downward shifts.
  *
  * Alarm: S exceeds threshold h (conventional h=5, slack k=0.5 — the
  * "detect 1σ shifts" tuning). The changepoint estimate is the first
  * alarming row. Determinism: z is rounded to 6 before the prefix sums
  * (identical addend sequences in any engine), S to 4 before the
  * threshold test and argmax — the repo-wide rounded-window stance
  * (q39/q83). */
object Changepoint {

  /** Per-group CUSUM summary of `current(keyCol, orderCol, valueCol)`
    * standardized against `baseline`'s per-group mean/stddev — the
    * in-control reference (a known-good window or slice; the same
    * baseline/current split [[Drift.psi]] uses). Standardizing against
    * the MONITORED series' own pooled stats is deliberately not offered:
    * a mid-series step drags the pooled mean, making BOTH one-sided
    * statistics alarm (the pre-step segment sits above the contaminated
    * mean) — the reference window is what gives CUSUM its one-sided
    * localization.
    *
    * Output per group: n, mu, sigma, max_s_pos, max_s_neg (rounded 4),
    * alarm_pos/alarm_neg, and cp_pos/cp_neg — the orderCol value of the
    * FIRST row whose statistic crosses `h` (null when no alarm).
    * Constant-baseline groups (σ=0) are dropped: every deviation there
    * is infinitely surprising and the caller should gate on exact
    * inequality instead (the [[Outliers]] MAD=0 stance). */
  def cusum(baseline: DataFrame, current: DataFrame, keyCol: String,
      orderCol: String, valueCol: String, slack: Double = 0.5,
      h: Double = 5.0): DataFrame = {
    val stats = baseline.groupBy(col(keyCol)).agg(
      avg(col(valueCol)).as("__mu"),
      stddev_pop(col(valueCol)).as("__sigma"))
    val z = current.join(broadcast(stats), Seq(keyCol))
      .filter(col("__sigma") > 0)
      .select(col(keyCol), col(orderCol), col("__mu"), col("__sigma"),
        round((col(valueCol) - col("__mu")) / col("__sigma"), 6)
          .as("__z"))
    // one grouped-prefix pass computes both one-sided cumulative sums
    // AND their running minima (the RunSumWithMin shape — windows cannot
    // nest, but the segment algebra can). Null-valued rows must carry the
    // statistic forward unchanged (the window-sum null-skip semantics this
    // closed form replaces): RunSum requires non-null addends, so a null
    // z contributes 0 to BOTH sides — no slack charge, no reset movement —
    // and the row still counts in n and can never be a first-crossing of
    // its own (its s equals its predecessor's).
    def addend(x: Column): Column =
      when(col("__z").isNotNull, x).otherwise(lit(0.0))
    val withC = Budget.groupedRunning(z, keyCol, Seq(col(orderCol)),
      Seq(
        Budget.RunSumWithMin(addend(col("__z") - lit(slack)),
          "__cpos", "__mpos"),
        Budget.RunSumWithMin(addend(-col("__z") - lit(slack)),
          "__cneg", "__mneg")))
    def side(c: String, m: String, name: String) =
      round(col(c) - least(lit(0.0), col(m)), 4).as(name)
    val scored = withC.select(col(keyCol), col(orderCol), col("__mu"),
      col("__sigma"), side("__cpos", "__mpos", "s_pos"),
      side("__cneg", "__mneg", "s_neg"))
    scored.groupBy(col(keyCol)).agg(
        count(lit(1)).as("n"),
        round(first(col("__mu")), 6).as("mu"),
        round(first(col("__sigma")), 6).as("sigma"),
        max(col("s_pos")).as("max_s_pos"),
        max(col("s_neg")).as("max_s_neg"),
        min(when(col("s_pos") > h, col(orderCol))).as("cp_pos"),
        min(when(col("s_neg") > h, col(orderCol))).as("cp_neg"))
      .withColumn("alarm_pos", col("cp_pos").isNotNull)
      .withColumn("alarm_neg", col("cp_neg").isNotNull)
  }
}
