package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Baskets

/** Pair association rules: hand-computed measures, the mega-basket guard's
  * whole-basket exclusion semantics, membership dedup, and degradation. */
class BasketsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 4 baskets: {x,y} {x,y} {x,z} {y}
  // cnt: x=3, y=3, z=1; pairs: (x,y)=2, (x,z)=1
  private def baskets = Seq(
    (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
    (3L, "x"), (3L, "z"), (4L, "y"))
    .toDF("bk", "it")

  private def run(df: org.apache.spark.sql.DataFrame, minPair: Long = 1,
      maxSz: Int = 100, topK: Int = 100) =
    Baskets.pairRules(df, "bk", "it", minPair, maxSz, topK)

  test("support, confidence, lift match hand computation") {
    val rows = run(baskets).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    // (x,y): pair=2, support=2/4, conf_ab=2/3, conf_ba=2/3, lift=2*4/9
    assert(rows(("x", "y")) ==
      Seq(2L, 3L, 3L, 0.5, 0.666667, 0.666667, 0.888889))
    // (x,z): pair=1, support=1/4, conf_ab=1/3, conf_ba=1/1, lift=1*4/3
    assert(rows(("x", "z")) ==
      Seq(1L, 3L, 1L, 0.25, 0.333333, 1.0, 1.333333))
  }

  test("minPairCount filters and topK truncates in lift order") {
    val one = run(baskets, minPair = 2).collect()
    assert(one.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("x", "y")))
    val top = run(baskets, topK = 1).collect()
    // lift order: (x,z) 1.333 > (x,y) 0.889
    assert(top.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("x", "z")))
  }

  test("mega-baskets are excluded whole, including from supports") {
    val withMega = baskets.unionByName(
      (1 to 20).map(i => (9L, s"m$i")).toDF("bk", "it"))
    val got = run(withMega, maxSz = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    val base = run(baskets).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    assert(got == base) // N stays 4, counts unchanged
  }

  test("duplicate membership rows do not inflate counts") {
    val dup = baskets.unionByName(Seq((1L, "x"), (1L, "x")).toDF("bk", "it"))
    assert(run(dup).collect().toSeq == run(baskets).collect().toSeq)
  }

  test("empty input degrades to empty output with the full schema") {
    val empty = Seq.empty[(Long, String)].toDF("bk", "it")
    val out = run(empty)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("item_a", "item_b", "pair_cnt",
      "cnt_a", "cnt_b", "support", "conf_ab", "conf_ba", "lift"))
  }
}
