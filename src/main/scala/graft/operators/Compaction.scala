package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the lakehouse OPTIMIZE / bin-packing
  * pass. A 100-TB table ingested incrementally (the q144 MERGE / q100
  * incremental-dedup path) accretes millions of small files; scan cost is
  * then dominated by per-file open/footer overhead, not bytes. The fix is
  * periodic compaction: group small files into ~target-sized merge bins
  * and rewrite each bin as one file (Delta OPTIMIZE, Iceberg
  * rewrite_data_files — public semantics; this is the PLANNER, emitting
  * the bin assignment a rewriter would execute).
  *
  * Packing rule (deterministic and closed-form, so it is expressible as
  * one window formula and twin-checkable in SQL): within a table
  * partition, files below the `skipFrac * target` "already big enough"
  * threshold are ordered (bytes desc, file id asc — a total order) and
  * the ordered stream is cut into target-sized slabs of the EXCLUSIVE
  * running sum: bin = floor((cumsum - bytes) / target). Files at or above
  * the threshold keep bin = -1 (left in place — rewriting a
  * nearly-full file wastes IO; the real OPTIMIZE minFileSize rule).
  * The greedy accumulate-then-reset variant packs marginally tighter but
  * is inherently sequential per partition; the slab rule is one window
  * over the MANIFEST (file-level metadata — millions of rows at 100 TB,
  * never the data), keeps every bin >= target except the last per
  * partition, and two engines agree on it bit-for-bit.
  */
object Compaction {

  /** Assign merge bins over `manifest(partCol, fileCol, bytesCol)`.
    * Output: manifest columns + `bin` (−1 = keep in place). */
  def planBins(manifest: DataFrame, partCol: String, fileCol: String,
      bytesCol: String, targetBytes: Long,
      skipFrac: Double = 0.75): DataFrame = {
    val small = col(bytesCol) < lit((targetBytes * skipFrac).toLong)
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(bytesCol).desc, col(fileCol).asc)
    val cumExcl = sum(when(small, col(bytesCol)).otherwise(0L)).over(w) -
      when(small, col(bytesCol)).otherwise(0L)
    manifest.withColumn("bin",
      when(small, (cumExcl / targetBytes).cast("long")).otherwise(-1L))
  }

  /** Roll the plan up to one row per (partition, bin): file count, total
    * bytes, and the verdict a rewrite executor acts on (`merge` bins with
    * >= 2 files, `noop` single-file bins, `keep` for bin −1). */
  def binSummary(plan: DataFrame, partCol: String, bytesCol: String): DataFrame =
    plan.groupBy(col(partCol), col("bin")).agg(
        count(lit(1)).as("n_files"),
        sum(col(bytesCol)).as("bytes_total"))
      .withColumn("action",
        when(col("bin") === -1L, lit("keep"))
          .when(col("n_files") >= 2, lit("merge"))
          .otherwise(lit("noop")))
}
