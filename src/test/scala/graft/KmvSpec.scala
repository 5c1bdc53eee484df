package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.Kmv
import graft.functions.Text

/** KMV distinct-value sketch (Beyer et al. SIGMOD'07): sketch content,
  * merge/partitioning invariance, estimator behavior on both the
  * underfilled (exact) and filled (estimating) paths, sketch composition
  * (union/Jaccard), SQL registration, and null/empty degradation. */
class KmvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sketch keeps exactly the k smallest distinct values") {
    val df = Seq(50L, 10L, 30L, 10L, 40L, 20L, 30L, 60L).toDF("h")
    val sk = df.agg(Kmv.column(col("h"), 4)).head().getSeq[Long](0)
    assert(sk == Seq(10L, 20L, 30L, 40L))
  }

  test("sketch is partitioning-invariant (merge path) and ignores nulls") {
    val df = (1L to 5000L).map(i => Text.P31 - i * 7919L).toDF("x")
      .select(when(col("x") % 3 =!= 0, col("x")).as("h")) // nulls mixed in
    val a = df.repartition(1).agg(Kmv.column(col("h"), 32))
      .head().getSeq[Long](0)
    val b = df.repartition(13, col("h")).agg(Kmv.column(col("h"), 32))
      .head().getSeq[Long](0)
    assert(a == b && a.length == 32)
    assert(a == a.sorted, "sketch must be sorted ascending")
  }

  test("estimate: exact below k, within KMV error bounds above k") {
    // underfilled: 20 distinct values, k = 64 -> exact count
    val small = (1L to 20L).toDF("v").select(Text.md5Long(col("v")).as("h"))
    val sEst = small.agg(Kmv.column(col("h"), 64).as("sk"))
      .select(Kmv.estimate(col("sk"), 64)).head().getDouble(0)
    assert(sEst == 20.0)

    // filled: 5000 distinct md5-hashed values, k = 256 ->
    // relative error well inside 4/sqrt(k) = 25%
    val big = (1L to 5000L).toDF("v").select(Text.md5Long(col("v")).as("h"))
    val bEst = big.agg(Kmv.column(col("h"), 256).as("sk"))
      .select(Kmv.estimate(col("sk"), 256)).head().getDouble(0)
    assert(math.abs(bEst - 5000.0) / 5000.0 < 0.25,
      s"estimate $bEst too far from 5000")
  }

  test("union sketch and Jaccard estimate compose from the two sketches") {
    // A = 1..3000, B = 2001..5000: jaccard = 1000/5000 = 0.2
    val all = (1L to 5000L).toDF("v")
      .select(col("v"), Text.md5Long(col("v")).as("h"))
    val row = all.agg(
        Kmv.column(when(col("v") <= 3000, col("h")), 128).as("a"),
        Kmv.column(when(col("v") >= 2001, col("h")), 128).as("b"))
      .select(
        Kmv.estimate(Kmv.unionSketch(col("a"), col("b"), 128), 128)
          .as("u"),
        Kmv.jaccard(col("a"), col("b"), 128).as("j"))
      .head()
    assert(math.abs(row.getDouble(0) - 5000.0) / 5000.0 < 0.35)
    assert(math.abs(row.getDouble(1) - 0.2) < 0.15,
      s"jaccard ${row.getDouble(1)} too far from 0.2")
  }

  test("all-null and empty inputs degrade to an empty sketch, estimate 0") {
    val empty = Seq.empty[Long].toDF("h")
    assert(empty.agg(Kmv.column(col("h"), 8)).head().getSeq[Long](0).isEmpty)
    val nulls = Seq(1L, 2L).toDF("x").select(lit(null).cast("long").as("h"))
    val row = nulls.agg(Kmv.column(col("h"), 8).as("sk"))
      .select(col("sk"), Kmv.estimate(col("sk"), 8)).head()
    assert(row.getSeq[Long](0).isEmpty && row.getDouble(1) == 0.0)
  }
}
