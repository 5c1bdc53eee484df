package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.TopK

/** Bounded top-k aggregate: bit-equal to the window formulation (incl.
  * heavy ties), partitioning-invariant, null-safe, and its physical plan
  * never sorts the input — the O(k)-state property that replaces the
  * full per-group sort at scale. */
class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // heavy ties: scores collapse to i % 7, ids unique
  private def data = (1L to 2000L).map(i => (s"g${i % 5}", (i % 7).toDouble, i))
    .toDF("g", "s", "id")

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("s").desc, col("id").asc)
    data.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("g"), col("rnk").cast("long"), col("s"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g")).agg(TopK.column(col("s"), col("id"), k).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("i", "e")))
      .select(col("g"), (col("i") + 1).cast("long"),
        col("e.score"), col("e.id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet

  test("equals the window formulation under heavy ties, any partitioning") {
    assert(viaAgg(data, 10) == viaWindow(10))
    assert(viaAgg(data.repartition(1), 10) == viaWindow(10))
    assert(viaAgg(data.repartition(17, col("id")), 10) == viaWindow(10))
  }

  test("k larger than the group returns the whole group, best-first") {
    val tiny = Seq(("a", 1.0, 10L), ("a", 3.0, 11L), ("a", 3.0, 9L))
      .toDF("g", "s", "id")
    val out = tiny.groupBy(col("g"))
      .agg(TopK.column(col("s"), col("id"), 50).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.score"), col("e.id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out == Seq((3.0, 9L), (3.0, 11L), (1.0, 10L)))
  }

  test("null scores/ids are ignored; empty input gives empty array") {
    val df = Seq((Some(1.0), Some(1L)), (None, Some(2L)),
      (Some(9.0), None)).toDF("s", "id")
    val out = df.agg(TopK.column(col("s"), col("id"), 3))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(out.map(r => (r.getDouble(0), r.getLong(1))) == Seq((1.0, 1L)))
    assert(df.limit(0).agg(TopK.column(col("s"), col("id"), 3))
      .head().getSeq[Any](0).isEmpty)
  }

  test("plan aggregates without sorting the input") {
    val plan = data.groupBy(col("g"))
      .agg(TopK.column(col("s"), col("id"), 10).as("t"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected object hash aggregate:\n$plan")
    assert(!plan.contains("Sort "),
      s"top-k aggregate must not sort the input:\n$plan")
  }
}
