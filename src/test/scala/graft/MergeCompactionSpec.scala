package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Compaction, Merge}

/** CDC MERGE (q144) and compaction planning (q145): hand-built change
  * batches / manifests with known outcomes, partitioning-independence,
  * and empty-input degradation. */
class MergeCompactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "v", "price")

  test("merge: latest-per-key wins, delete drops, new key inserts") {
    val changes = Seq(
      (1L, "upsert", 1L, "a1", 11.0), // superseded
      (1L, "upsert", 2L, "a2", 12.0), // wins
      (2L, "upsert", 1L, "ghost", 0.0), // superseded by delete
      (2L, "delete", 2L, null, 0.0),
      (9L, "upsert", 1L, "new", 90.0))
      .toDF("k", "op", "seq", "v", "price")
    val out = Merge.applyChanges(snap, changes, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a2", 12.0), (3L, "c", 30.0), (9L, "new", 90.0)))
  }

  test("merge: empty batch is identity; empty snapshot takes only upserts") {
    val empty = snap.filter(lit(false))
    val idOut = Merge.applyChanges(snap,
      Seq.empty[(Long, String, Long, String, Double)]
        .toDF("k", "op", "seq", "v", "price"), Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(idOut == Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    val fromEmpty = Merge.applyChanges(empty, Seq(
      (5L, "upsert", 1L, "x", 1.0), (6L, "delete", 1L, "y", 2.0))
      .toDF("k", "op", "seq", "v", "price"), Seq("k"))
      .as[(Long, String, Double)].collect().toSeq
    assert(fromEmpty == Seq((5L, "x", 1.0)))
  }

  test("merge result is partitioning-independent") {
    val changes = Seq(
      (1L, "upsert", 2L, "a2", 12.0), (2L, "delete", 1L, null, 0.0))
      .toDF("k", "op", "seq", "v", "price")
    val a = Merge.applyChanges(snap.repartition(7), changes.repartition(3),
      Seq("k")).orderBy("k").collect().toSeq
    val b = Merge.applyChanges(snap.coalesce(1), changes.coalesce(1),
      Seq("k")).orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("compaction: slab rule packs small files, keeps big ones in place") {
    // part p: files 900 (>= 750 -> keep), then 600+500 fill slab 0
    // ([0,1000) of the exclusive cumsum), 400+300 start at 1100/1500 ->
    // slab 1, 100 at 1800 -> slab 1.
    val manifest = Seq(
      ("p", 1L, 900L), ("p", 2L, 600L), ("p", 3L, 500L),
      ("p", 4L, 400L), ("p", 5L, 300L), ("p", 6L, 100L))
      .toDF("part", "file", "bytes")
    val plan = Compaction.planBins(manifest, "part", "file", "bytes", 1000L)
      .orderBy("file").select("file", "bin")
      .as[(Long, Long)].collect().toSeq
    assert(plan == Seq((1L, -1L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)))
    val su = Compaction.binSummary(
      Compaction.planBins(manifest, "part", "file", "bytes", 1000L),
      "part", "bytes").orderBy("bin")
      .select("bin", "n_files", "bytes_total", "action")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(su == Seq((-1L, 1L, 900L, "keep"), (0L, 2L, 1100L, "merge"),
      (1L, 3L, 800L, "merge")))
  }

  test("compaction: ties on bytes break by file id; empty manifest ok") {
    val m = Seq(("p", 2L, 100L), ("p", 1L, 100L)).toDF("part", "file", "bytes")
    val plan = Compaction.planBins(m, "part", "file", "bytes", 150L)
      .orderBy("file").select("file", "bin").as[(Long, Long)].collect().toSeq
    // file 1 first (bytes tie, id asc): cumExcl 0 -> bin 0; file 2 at 100
    // -> bin 0 (100/150 floors to 0)
    assert(plan == Seq((1L, 0L), (2L, 0L)))
    val empty = m.filter(lit(false))
    assert(Compaction.binSummary(
      Compaction.planBins(empty, "part", "file", "bytes", 150L),
      "part", "bytes").count() == 0L)
  }
}
