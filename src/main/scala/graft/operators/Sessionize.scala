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
}
