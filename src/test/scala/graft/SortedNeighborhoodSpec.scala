package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fuzzy

/** Sorted-neighborhood candidate generation: hand-computed windows,
  * equivalence with the global-window definition, partitioning
  * invariance, and the end-typo recall case equality blocking misses. */
class SortedNeighborhoodSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def recs = Seq(
    (10L, "alpha"), (20L, "beta"), (30L, "bete"), (40L, "delta"),
    (50L, "zeta")).toDF("id", "name")

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b", "gap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("window=3 emits exactly the gap-1 and gap-2 pairs in sort order") {
    // sort order by name: alpha(1) beta(2) bete(3) delta(4) zeta(5)
    val got = pairSet(Fuzzy.sortedNeighborhood(recs, "id", col("name"), 3))
    val want = Set((10L, 20L, 1L), (20L, 30L, 1L), (30L, 40L, 1L),
      (40L, 50L, 1L), (10L, 30L, 2L), (20L, 40L, 2L), (30L, 50L, 2L))
    assert(got == want)
  }

  test("matches the global-window row_number definition at any window") {
    val big = (1 to 200).map(i => (i.toLong, s"k${(i * 37) % 100}%03d-$i"))
      .toDF("id", "name")
    for (w <- Seq(2, 5, 11)) {
      val got = pairSet(Fuzzy.sortedNeighborhood(big, "id", col("name"), w))
      val rk = big.withColumn("rn",
        row_number().over(Window.orderBy(col("name"), col("id"))))
      val want = pairSet(rk.as("a").join(rk.as("b"),
          col("b.rn") > col("a.rn") && col("b.rn") - col("a.rn") < w)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          (col("b.rn") - col("a.rn")).cast("long").as("gap")))
      assert(got == want, s"window $w")
    }
  }

  test("pair set is invariant to input partitioning") {
    val big = (1 to 300).map(i => (i.toLong, s"v${(i * 13) % 50}-$i"))
      .toDF("id", "name")
    val one = pairSet(Fuzzy.sortedNeighborhood(
      big.repartition(1), "id", col("name"), 4))
    val many = pairSet(Fuzzy.sortedNeighborhood(
      big.repartition(7, col("id")), "id", col("name"), 4))
    assert(one == many)
  }

  test("catches end-of-key typos that prefix blocking misses") {
    val d = Seq((1L, "cust0042"), (2L, "cust0042x"), (3L, "cust0099"))
      .toDF("id", "name")
    val snm = pairSet(Fuzzy.sortedNeighborhood(d, "id", col("name"), 2))
    assert(snm.contains((1L, 2L, 1L)))
    // the suffix-block pass (q33's key) splits this pair
    val blocked = Fuzzy.blockedPairs(d, "id", "name",
      substring(col("name"), -4, 4), maxDist = 1)
    assert(blocked.count() == 0)
  }

  test("window=1 is rejected; empty input degrades to empty output") {
    intercept[IllegalArgumentException] {
      Fuzzy.sortedNeighborhood(recs, "id", col("name"), 1)
    }
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    assert(Fuzzy.sortedNeighborhood(empty, "id", col("name"), 3).count() == 0)
  }
}
