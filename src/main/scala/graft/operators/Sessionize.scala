package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream (batch form): assign every
  * event to a session that closes after `gap` of inactivity per key.
  *
  * Classic two-window formulation — lag to flag session starts, running sum
  * to number them. ONE shuffle (hash partition by user), both windows reuse
  * the same partitioning, and the plan stays fully parallel: no state larger
  * than a partition sort. The streaming twin is
  * `session_window(ts, gap)` / `flatMapGroupsWithState` — same semantics.
  */
object Sessionize {

  /** Events + `session_id` (1..N per key, in time order) + `session_start`
    * flag. Ties on ts are ordered by `tieBreak` for determinism. */
  def withSessions(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
      gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(ts.asc, tieBreak.asc)
    val prevTs = lag(ts, 1).over(byKey)
    // gap compare in microseconds: second-truncation would shift boundaries
    val isStart = when(prevTs.isNull ||
      unix_micros(ts) - unix_micros(prevTs) > gapSeconds * 1000000L, 1)
      .otherwise(0)
    df.withColumn("__is_start", isStart)
      .withColumn("session_id",
        sum(col("__is_start")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__is_start")
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessionStats(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
      value: Column, gapSeconds: Long): DataFrame =
    withSessions(df, key, ts, tieBreak, gapSeconds)
      .groupBy(key.as("key"), col("session_id"))
      .agg(
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(value), 2).as("total_value"))

  /** Per-session ordered event trajectory — the sequence-assembly primitive
    * of event-log training data (agent traces, clickstream/session
    * pretraining, conversation-turn datasets): every session collapses to
    * ONE row carrying its `token`s joined in (ts, tieBreak) order.
    * `collect_list` is order-nondeterministic under partial aggregation, so
    * the collected structs are `array_sort`ed on the total order before
    * joining — partitioning can never leak into the string (the
    * DeterminismSpec stance). One hash aggregate after the sessionization
    * window; trajectory size is bounded by session length, which the gap
    * rule bounds in turn. */
  def trajectories(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
      token: Column, gapSeconds: Long): DataFrame =
    withSessions(df, key, ts, tieBreak, gapSeconds)
      .groupBy(key.as("key"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        concat_ws(" ", transform(array_sort(collect_list(
            struct(ts.as("t"), tieBreak.as("tb"), token.as("tok")))),
          s => s.getField("tok"))).as("trajectory"))

  /** Inter-arrival traffic-model audit: per group, fit an exponential
    * to the per-subject event gaps (MLE λ̂ = 1/mean) and test the fit
    * with a one-sample Kolmogorov–Smirnov statistic against the fitted
    * CDF 1 − e^(−λx). The pipeline use: capacity models, synthetic
    * load generators, and anomaly baselines all assume Poisson
    * arrivals — this measures where that assumption actually holds
    * (bursty/sessionized traffic rejects it). Classic caveat applies:
    * testing against a FITTED λ makes the KS threshold conservative
    * (Lilliefors); the cut is still the standard comparison bar.
    *
    * Determinism: gaps are exact integer microseconds converted by a
    * /1e6 terminating division; λ̂ freezes at 6 decimals before the
    * CDF (the q163 stance); ECDF rides group-partitioned prefix
    * windows over DISTINCT gap values (q157's shape).
    *
    * Output per group: n_gaps, mean_gap_s, lambda, d_stat (rounded 6),
    * ks_stat (√n·D, rounded 4), exp_ok (ks ≤ 1.358). */
  def interArrivalExpFit(df: DataFrame, groupCol: String, key: Column,
      ts: Column, tieBreak: Column): DataFrame = {
    val wSeq = Window.partitionBy(col(groupCol), key)
      .orderBy(ts.asc, tieBreak.asc)
    val gaps = df
      .withColumn("__gap_us",
        unix_micros(ts) - lag(unix_micros(ts), 1).over(wSeq))
      .filter(col("__gap_us").isNotNull && col("__gap_us") > 0)
      .select(col(groupCol), col("__gap_us").as("gus"))
    // mean from EXACT integer-microsecond sums — a float mean's
    // summation order would put the 6-dp round at engine mercy
    val fit = gaps.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_gaps"), sum(col("gus")).as("__sus"))
      .withColumn("mean_gap_s",
        round(col("__sus") / (col("n_gaps") * lit(1e6)), 6))
      .withColumn("lambda", round(lit(1.0) / col("mean_gap_s"), 6))
      .drop("__sus")
    val perV = gaps.groupBy(col(groupCol), col("gus"))
      .agg(count(lit(1)).as("c"))
    // per-type ECDF without per-type windows: event types are FEW and
    // HUGE, so a type-partitioned prefix window funnels each type's
    // distinct-gap ladder through one task; the grouped two-phase
    // prefix sum keeps it fully parallel. The lagged ECDF needs no lag
    // either: F_emp at the previous distinct gap == cum_lo/n.
    //
    // One-sample KS needs BOTH sides of each ECDF jump: D⁺ from the
    // step top |F_emp(x_i) − F(x_i)| and D⁻ from the left limit
    // |F(x_i) − F_emp(x_{i−1})| (F_emp before the first jump is 0) —
    // step tops alone understate D by up to 1/n and over-accept
    val cum = graft.operators.Budget.groupedCumulativeSum(perV, groupCol,
      Seq(col("gus")), col("c"), "cum_hi")
    val d = cum
      .join(broadcast(fit.select(col(groupCol),
        col("n_gaps").cast("double").as("n"), col("lambda"))),
        Seq(groupCol))
      .withColumn("femp", col("cum_hi") / col("n"))
      .withColumn("femp_prev", (col("cum_hi") - col("c")) / col("n"))
      .withColumn("fmod", lit(1.0)
        - exp(-col("lambda") * (col("gus") / 1e6)))
      .groupBy(col(groupCol))
      .agg(max(greatest(abs(col("femp") - col("fmod")),
        abs(col("fmod") - col("femp_prev")))).as("__d"))
    fit.join(d, Seq(groupCol))
      .select(col(groupCol), col("n_gaps"), col("mean_gap_s"),
        col("lambda"), round(col("__d"), 6).as("d_stat"),
        round(sqrt(col("n_gaps")) * col("__d"), 4).as("ks_stat"),
        (sqrt(col("n_gaps")) * col("__d") <= 1.358).as("exp_ok"))
  }

  /** Arrival burstiness — the index of dispersion (Fano factor)
    * var/mean of per-bucket event counts, the one-number complement to
    * [[interArrivalExpFit]]: a Poisson stream scores ≈ 1, clumped
    * traffic (flash crowds, batch replays, scraper bursts) scores ≫ 1,
    * clockwork (metronomic bots) ≪ 1. Buckets are fixed-width windows
    * on a dense integer grid INCLUDING empty buckets — deriving
    * buckets only from observed events silently drops the zeros and
    * understates the variance.
    *
    * Fully integer-deterministic: fano = (n·Σc² − (Σc)²)/(n·Σc) from
    * exact long aggregates; both engines divide identical doubles.
    *
    * Scale posture: one bucket-keyed count aggregate over the stream;
    * the dense grid is |groups|·|buckets| generated rows (sequence
    * explode off a 1-row min/max aggregate — never a scan); the stats
    * are a |groups|-row rollup. */
  def burstiness(df: DataFrame, groupCol: String, tsCol: String,
      bucketSeconds: Long = 3600L, threshold: Double = 1.5): DataFrame = {
    val busUs = bucketSeconds * 1000000L
    val mn = df.agg(min(unix_micros(col(tsCol))).as("t0"),
      max(unix_micros(col(tsCol))).as("t1"))
    val counts = df.crossJoin(broadcast(mn))
      .select(col(groupCol),
        expr(s"(unix_micros($tsCol) - t0) div ${busUs}L").as("h"))
      .groupBy(col(groupCol), col("h")).agg(count(lit(1)).as("c"))
    val hours = mn.select(explode(sequence(lit(0L),
      expr(s"(t1 - t0) div ${busUs}L"))).as("h"))
    val grid = df.select(col(groupCol)).distinct().crossJoin(hours)
    val st = grid.join(counts, Seq(groupCol, "h"), "left")
      .na.fill(0L, Seq("c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_buckets"), sum(col("c")).as("n_events"),
        sum(col("c") * col("c")).as("__s2"))
    val fano = ((col("n_buckets").cast("double") * col("__s2")
      - col("n_events").cast("double") * col("n_events"))
      / (col("n_buckets").cast("double") * col("n_events")))
    st.select(col(groupCol), col("n_buckets"), col("n_events"),
      round(col("n_events").cast("double") / col("n_buckets"), 6)
        .as("mean_per_bucket"),
      round(fano, 6).as("fano"), (fano > threshold).as("bursty"))
  }
}
