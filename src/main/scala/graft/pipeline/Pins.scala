package graft.pipeline

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Run-scoped registry for operator-internal persist pins.
  *
  * Several operators pin an intermediate frame because two consumers must
  * observe ONE physical layout (RowIds/Budget: range partitioning samples
  * its bounds, so un-pinned re-execution could partition the two branches
  * differently) or because a frame feeds several joins (Dedup postings,
  * classifier vocab tables). Those pins are correctness- or cost-bearing,
  * but they have no caller-visible lifecycle: a long-lived session
  * composing many such operators accumulates cache entries until the
  * executors evict under pressure.
  *
  * Every such internal pin routes through [[pin]], and the run boundaries
  * (Verify/Bench per-query cleanup, [[Pipeline.RunResult.release]], or any
  * library caller at its own batch boundary) call [[flush]] to unpersist
  * exactly the operator-internal scratch — without `catalog.clearCache()`'s
  * collateral drop of the caller's OWN cached frames.
  *
  * Scope: the registry is process-global (one pipeline run at a time — the
  * driver model of this engine); a flush releases every pin created since
  * the last flush. Unpersisting a frame another plan still references is
  * safe in Spark (the dependent plan recomputes through the pinned
  * lineage), so a too-early flush costs recomputation, never correctness —
  * except between the two consumers of a sampled-exchange pin, which is
  * why flush sits at run boundaries, never inside an operator. */
object Pins {

  private val active = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` at the Dataset default level (MEMORY_AND_DISK — the same
    * level `.cache()` uses) and register it for the next [[flush]]. */
  def pin[T](ds: Dataset[T]): Dataset[T] = pin(ds, StorageLevel.MEMORY_AND_DISK)

  /** Persist `ds` at `level` and register it for the next [[flush]]. */
  def pin[T](ds: Dataset[T], level: StorageLevel): Dataset[T] = {
    ds.persist(level)
    active.add(ds)
    ds
  }

  /** Unpersist (non-blocking) every pin registered since the last flush. */
  def flush(): Unit = {
    var d = active.poll()
    while (d != null) {
      d.unpersist(blocking = false)
      d = active.poll()
    }
  }

  /** Pins currently registered and not yet flushed (diagnostic). */
  def activeCount: Int = active.size()
}
