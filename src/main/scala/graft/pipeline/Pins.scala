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
  * why flush sits at run boundaries, never inside an operator.
  *
  * The single-run scope is ENFORCED, not just documented: pins record the
  * driver thread that created them, and a pin from a second LIVE thread
  * while another thread holds unflushed pins fails loudly — a library
  * caller composing e.g. a streaming query with a concurrent batch run
  * would otherwise risk one flow's boundary flush unpersisting the other
  * flow's sampled-exchange pin mid-consumption (the one correctness-
  * sensitive case above). A DEAD owner's pins are orphaned scratch from a
  * completed flow (e.g. a finished stream-execution thread), so the next
  * flow adopts the registry instead of deadlocking on it; the adopted
  * pins release at that flow's own flush. */
object Pins {

  private val active = new ConcurrentLinkedQueue[Dataset[_]]()
  private var owner: Thread = null

  /** Persist `ds` at the Dataset default level (MEMORY_AND_DISK — the same
    * level `.cache()` uses) and register it for the next [[flush]]. */
  def pin[T](ds: Dataset[T]): Dataset[T] = pin(ds, StorageLevel.MEMORY_AND_DISK)

  /** Persist `ds` at `level` and register it for the next [[flush]].
    * Throws IllegalStateException on a concurrent second flow (see the
    * scope note above). */
  def pin[T](ds: Dataset[T], level: StorageLevel): Dataset[T] = {
    synchronized {
      val me = Thread.currentThread()
      if (owner != null && owner != me && owner.isAlive && !active.isEmpty)
        throw new IllegalStateException(
          s"Pins: concurrent pin from thread '${me.getName}' while " +
            s"'${owner.getName}' holds ${active.size} unflushed pin(s) — " +
            "the registry scopes ONE run at a time; flush() at the " +
            "current flow's boundary before starting another")
      owner = me
      ds.persist(level)
      active.add(ds)
    }
    ds
  }

  /** Unpersist (non-blocking) every pin registered since the last flush.
    * Throws IllegalStateException when a DIFFERENT live thread's pins are
    * still registered — that flush would be the mid-consumer unpersist the
    * scope note above calls out; only the owning flow (or a flow adopting
    * a dead owner's orphans) may release. */
  def flush(): Unit = synchronized {
    val me = Thread.currentThread()
    if (owner != null && owner != me && owner.isAlive && !active.isEmpty)
      throw new IllegalStateException(
        s"Pins: flush from thread '${me.getName}' while '${owner.getName}' " +
          s"holds ${active.size} unflushed pin(s) — a cross-flow flush " +
          "would unpersist another run's in-flight pins; flush at that " +
          "flow's own boundary instead")
    var d = active.poll()
    while (d != null) {
      d.unpersist(blocking = false)
      d = active.poll()
    }
    owner = null
  }

  /** Pins currently registered and not yet flushed (diagnostic). */
  def activeCount: Int = active.size()
}
