package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe dense row-id assignment (P7, SURVEY.md §2.3).
  *
  * The naive plan — `row_number().over(Window.orderBy(...))` with no
  * `partitionBy` — forces every row through ONE task: the defining
  * scale-killer at 100 TB. The scale-safe plan is the classic two-phase
  * partition-offset assignment (the same scheme as `RDD.zipWithIndex`,
  * kept inside Catalyst):
  *
  *   1. `monotonically_increasing_id()` already encodes
  *      `(partitionId << 33) | localIndex` with `localIndex` dense from 0
  *      within each partition — so local ranks are free, no sort at all.
  *   2. Per-partition row counts are METADATA (one row per partition, a few
  *      thousand rows at cluster scale), so the cumulative prefix offsets
  *      are computed with a window over that tiny aggregate — the only
  *      unpartitioned window in the plan runs over #partitions rows, not
  *      #data rows.
  *   3. Offsets broadcast-join back on partition id; the final id is
  *      `offset(pid) + localIndex + 1` — a map-side projection.
  *
  * The result is byte-identical to the old single-task plan (ordering by
  * mono id IS ordering by (pid, local)), with no data-sized shuffle and no
  * single-partition exchange.
  */
object RowIds {

  private val MonoCol = "__graft_mono"
  private[graft] val PidCol = "__graft_pid"
  private val CntCol = "__graft_cnt"
  private[graft] val OffCol = "__graft_off"
  private val LocalMask = (1L << 33) - 1

  /** Exclusive prefix sum over a METADATA-sized per-partition frame
    * `(PidCol, valueCol)` -> `(PidCol, OffCol)`. The unpartitioned window is
    * safe precisely because the input is one row per partition. Shared by
    * [[denseInPartitionOrder]] and [[graft.operators.Budget.cumulativeSum]]. */
  private[graft] def prefixOffsets(perPartition: DataFrame,
      valueCol: String): DataFrame =
    perPartition.withColumn(OffCol,
      coalesce(
        sum(col(valueCol)).over(
          Window.orderBy(col(PidCol))
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(PidCol), col(OffCol))

  /** Dense 1..N ids in current partition order (partition index major, row
    * position within the partition minor). For file scans this is file
    * order — the P7 contract. No global sort, no single-partition window.
    * Re-applying over an existing `idCol` replaces it (withColumn
    * semantics), never duplicates it.
    *
    * Contract: `df`'s partition layout must be DETERMINISTIC across the two
    * executions this plan performs (the per-partition count branch and the
    * data branch both re-derive from `df`). File scans satisfy this; a
    * sampled exchange (repartitionByRange) does not — [[denseByOrder]] pins
    * one with persist() before calling here. */
  def denseInPartitionOrder(df: DataFrame, idCol: String): DataFrame = {
    val withMono = df.withColumn(MonoCol, monotonically_increasing_id())
      .withColumn(PidCol, shiftright(col(MonoCol), 33))
    // one row per partition — metadata-sized, safe for a global window
    val counts = withMono.groupBy(col(PidCol)).agg(count(lit(1)).as(CntCol))
    val newId =
      (col(OffCol) + col(MonoCol).bitwiseAND(lit(LocalMask)) + lit(1L))
        .cast("long").as(idCol)
    // replace an existing idCol IN PLACE (withColumn semantics: same
    // position, no duplicate); append otherwise
    val projected =
      if (df.columns.contains(idCol))
        df.columns.toSeq.map(n => if (n == idCol) newId else col(s"`$n`"))
      else df.columns.toSeq.map(n => col(s"`$n`")) :+ newId
    withMono
      .join(broadcast(prefixOffsets(counts, CntCol)), Seq(PidCol))
      .select(projected: _*)
  }

  /** Dense 1..N ids in a caller-specified global order, without a global
    * single-task sort: range-repartition on the sort key (equal keys land
    * in one partition), sort within partitions, then partition-offset ids.
    * Equivalent to `row_number().over(Window.orderBy(order))` — including
    * its nondeterminism when `order` has ties — at any scale. */
  def denseByOrder(df: DataFrame, idCol: String, order: Seq[Column]): DataFrame = {
    // Range partitioning samples its bounds; pin the layout so the count
    // branch and the data branch inside denseInPartitionOrder cannot see
    // two different partitionings when exchange reuse is off (see the
    // [[denseInPartitionOrder]] determinism contract). persist, not
    // localCheckpoint: lazy under AQE (no construction-time jobs), lineage
    // kept (executor loss recomputes through the already-bound partitioner
    // instead of failing on a missing checkpoint block), subtree still
    // visible to explain(); released by [[Pins.flush]] at run boundaries.
    val sorted = Pins.pin(
      df.repartitionByRange(order: _*).sortWithinPartitions(order: _*))
    denseInPartitionOrder(sorted, idCol)
  }

  /** `dense_rank().over(Window.orderBy(keys))` at scale, computed IN PLACE
    * on a frame that may repeat keys — no pre-distinct, no join-back (the
    * denseByOrder-over-distinct-keys route costs two extra key-partitioned
    * exchanges when the ranks must be mapped back onto the data).
    *
    *   1. range-partition on the keys (equal keys land in ONE partition —
    *      the range partitioner's contract — so no tie straddles a
    *      boundary), pinned for the same two-consumer determinism reason
    *      as [[denseByOrder]];
    *   2. per-partition dense ranks from a PARTITIONED window (frame
    *      bounded by the partition, never global);
    *   3. per-partition distinct-key counts are metadata-sized; their
    *      prefix sum offsets the local ranks.
    *
    * Keys must be non-null (range partitioning orders nulls first, which
    * is fine, but callers here never rank null keys). */
  def denseRankByOrder(df: DataFrame, idCol: String,
      keys: Seq[Column]): DataFrame = {
    val lrk = "__graft_lrk"
    val sorted = Pins.pin(df.repartitionByRange(keys: _*))
    val withPid = sorted.withColumn(PidCol,
      shiftright(monotonically_increasing_id(), 33))
    // pid-partitioned window: frames bounded by the exchange's partitions
    val local = withPid.withColumn(lrk, dense_rank()
      .over(Window.partitionBy(col(PidCol)).orderBy(keys: _*))
      .cast("long"))
    // per-partition distinct-key count IS the max local dense rank — no
    // countDistinct (which would reject .desc-decorated key expressions)
    val counts = local.groupBy(col(PidCol)).agg(max(col(lrk)).as(CntCol))
    local
      .join(broadcast(prefixOffsets(counts, CntCol)), Seq(PidCol))
      .withColumn(idCol, (col(OffCol) + col(lrk)).cast("long"))
      .drop(PidCol, OffCol, lrk)
  }
}
