package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC MERGE (SCD1 upsert/delete) — apply a change batch to a corpus
  * snapshot: the lakehouse `MERGE INTO` primitive (Delta/Iceberg/Hudi
  * copy-on-write semantics) that every incremental 100-TB pipeline sits
  * on, expressed as pure DataFrame algebra. Complements the history-
  * preserving SCD2 intervals (q79) and the ingest-side incremental LSH
  * dedup (q100): SCD2 answers "what did the row look like at t", MERGE
  * answers "what is the corpus NOW after this batch".
  *
  * Semantics: `changes(keyCols..., opCol in {upsert, delete}, seqCol,
  * payload...)`. Per key the HIGHEST seq wins (callers guarantee seq is
  * unique per key — a CDC log position is); a winning `upsert` replaces
  * the snapshot row (or inserts if the key is new), a winning `delete`
  * drops it. Changes superseded within the same batch never touch the
  * snapshot — multi-change keys collapse batch-side first.
  *
  * Scale posture (100 TB snapshot, GB-sized batch): the window that
  * collapses the batch to latest-per-key partitions by key over the
  * BATCH only — batch-sized state, never snapshot-sized. The snapshot
  * is touched exactly once, by one left-anti hash join on the key
  * (AQE broadcasts the collapsed batch side when it is small — the
  * common CDC shape, so the 100-TB side never shuffles); the surviving
  * upserts append with a union. Nothing sorts the snapshot, nothing
  * collects. (A real lakehouse additionally prunes untouched FILES via
  * min/max stats — the q129 Z-order layout is what makes that pruning
  * effective; this operator is the row-level semantics those engines
  * apply inside each rewritten file.)
  */
object Merge {

  /** Apply `changes` to `snapshot` (schemas: snapshot = keyCols ++
    * payload; changes = keyCols ++ (opCol, seqCol) ++ payload). Returns
    * the post-merge snapshot (snapshot schema). */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], opCol: String = "op",
      seqCol: String = "seq"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", seqCol)
    val upserts = latest.filter(col(opCol) === lit("upsert")).drop(opCol)
    // both deletes and replaced keys leave the snapshot; one anti join
    snapshot
      .join(latest.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(upserts.select(snapshot.columns.map(c => col(c)): _*))
  }
}
