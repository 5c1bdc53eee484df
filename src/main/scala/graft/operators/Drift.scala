package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring — Population Stability Index between a
  * baseline slice and a current slice of the same metric (the standard
  * scorecard-monitoring statistic; PSI = Σ_b (p_cur − p_base) ·
  * ln(p_cur/p_base), read against the conventional 0.1 / 0.25
  * watch/alarm cuts). The corpus-ops use: a feed whose value
  * distribution drifts (new writer, unit change, upstream bug) should
  * trip an alarm BEFORE retraining consumes it — the distributional
  * counterpart of the row-local quality rules (q63) and the robust
  * outlier flags ([[Outliers]]).
  *
  * Binning: `bins` equal-width buckets over the BASELINE's [min, max]
  * (fixed-from-baseline on purpose — the bin edges must not move with
  * the current slice, or drift hides itself); current values outside
  * the baseline range clamp into the edge bins, which is where novel
  * mass shows up. Shares are Laplace-smoothed ((n + 0.5)/(N + bins/2))
  * so an empty bin contributes finite, bounded evidence instead of
  * ln(0).
  *
  * Scale posture: one 1-row min/max aggregate on the baseline
  * (broadcast), one |bins|-keyed hash aggregate per slice (map-side
  * combined), and |bins|-row arithmetic after — the data is scanned
  * once per slice, nothing corpus-sized shuffles or sorts. */
object Drift {

  /** Per-bin PSI decomposition for `valueCol`, grouped by `keyCol`
    * (e.g. event_type — each group gets its own baseline range and its
    * own PSI). Output per (key, bin): n_base, n_cur, p_base, p_cur,
    * contrib (rounded 6), psi (the group total, repeated — a
    * |bins|-row windowed constant). */
  def psi(baseline: DataFrame, current: DataFrame, keyCol: String,
      valueCol: String, bins: Int = 10): DataFrame = {
    val range = baseline.groupBy(col(keyCol)).agg(
      min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
    def binned(df: DataFrame, side: String): DataFrame =
      df.join(broadcast(range), Seq(keyCol))
        .select(col(keyCol),
          when(col("__hi") === col("__lo"), lit(0L))
            .otherwise(least(greatest(floor(
              (col(valueCol) - col("__lo")) / (col("__hi") - col("__lo"))
                * bins).cast("long"), lit(0L)), lit(bins - 1L)))
            .as("bin"))
        .groupBy(col(keyCol), col("bin"))
        .agg(count(lit(1)).as(s"n_$side"))
    val grid = range.select(col(keyCol))
      .crossJoin(spark_range_bins(baseline, bins))
    val joined = grid
      .join(binned(baseline, "base"), Seq(keyCol, "bin"), "left")
      .join(binned(current, "cur"), Seq(keyCol, "bin"), "left")
      .na.fill(0L, Seq("n_base", "n_cur"))
    val w = Window.partitionBy(col(keyCol))
    val smooth = joined
      .withColumn("p_base",
        (col("n_base") + lit(0.5))
          / (sum(col("n_base")).over(w) + lit(bins * 0.5)))
      .withColumn("p_cur",
        (col("n_cur") + lit(0.5))
          / (sum(col("n_cur")).over(w) + lit(bins * 0.5)))
    smooth
      .withColumn("contrib",
        round((col("p_cur") - col("p_base"))
          * log(col("p_cur") / col("p_base")), 6))
      .withColumn("psi", round(sum(col("contrib")).over(w), 6))
      .select(col(keyCol), col("bin"), col("n_base"), col("n_cur"),
        round(col("p_base"), 6).as("p_base"),
        round(col("p_cur"), 6).as("p_cur"), col("contrib"), col("psi"))
  }

  /** Two-sample Kolmogorov–Smirnov test per `keyCol` — the exact,
    * binning-free complement to [[psi]]: D = sup_x |F_base(x) −
    * F_cur(x)| over the two empirical CDFs, with the scaled statistic
    * ks = √(n_b·n_c/(n_b+n_c))·D read against the asymptotic 5%
    * critical value c(0.05) = 1.358 (Smirnov). PSI sees only what its
    * bins resolve and moves with the smoothing; KS is
    * distribution-shape-exact and parameter-free, so it is the
    * arbiter when a PSI alarm is disputed.
    *
    * Implementation: both slices reduce to per-(key, distinct value)
    * counts in ONE union + hash aggregate (map-side combined; ties
    * collapse here, so the prefix input is distinct values, not
    * rows). Both ECDFs then ride ONE [[Budget.groupedRunning]] pass —
    * the two-phase distributed prefix sum over the composite
    * (key, value) sort, so NO per-key window exists: a key-partitioned
    * window would funnel each key's whole ladder through one task,
    * which for a CONTINUOUS metric at 100 TB (distinct values ~ rows)
    * is the single-task scale-killer the q167/q180 rewrites removed.
    * Per-key totals are a |keys|-row aggregate broadcast back. For
    * right-continuous step ECDFs the sup is attained at a data point,
    * so the max over those rows is the exact D; counts are integers,
    * so the two-phase sums are bit-exact.
    *
    * Output one row per key: n_base, n_cur, d_stat (rounded 6),
    * ks_stat (rounded 4), reject_05. */
  def ksTest(baseline: DataFrame, current: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val tagged = baseline.select(col(keyCol), col(valueCol).as("v"),
        lit(1L).as("b"), lit(0L).as("c"))
      .unionByName(current.select(col(keyCol), col(valueCol).as("v"),
        lit(0L).as("b"), lit(1L).as("c")))
    val perV = tagged.groupBy(col(keyCol), col("v"))
      .agg(sum(col("b")).as("nb"), sum(col("c")).as("nc"))
    val totals = perV.groupBy(col(keyCol))
      .agg(sum(col("nb")).as("n_base"), sum(col("nc")).as("n_cur"))
    Budget.groupedRunning(perV, keyCol, Seq(col("v")),
        Seq(Budget.RunSum(col("nb"), "__cb"),
          Budget.RunSum(col("nc"), "__cc")))
      .join(broadcast(totals), Seq(keyCol))
      .withColumn("diff", abs(
        col("__cb") / col("n_base") - col("__cc") / col("n_cur")))
      .groupBy(col(keyCol))
      .agg(first(col("n_base")).as("n_base"),
        first(col("n_cur")).as("n_cur"),
        max(col("diff")).as("__d"))
      .select(col(keyCol), col("n_base"), col("n_cur"),
        round(col("__d"), 6).as("d_stat"),
        round(sqrt(col("n_base") * col("n_cur")
          / (col("n_base") + col("n_cur"))) * col("__d"), 4)
          .as("ks_stat"),
        (sqrt(col("n_base") * col("n_cur")
          / (col("n_base") + col("n_cur"))) * col("__d") > 1.358)
          .as("reject_05"))
  }

  /** The dense 0..bins-1 bin axis — generated, never scanned. */
  private def spark_range_bins(df: DataFrame, bins: Int): DataFrame =
    df.sparkSession.range(bins).select(col("id").as("bin"))
}
