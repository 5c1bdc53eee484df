package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulTotals
import graft.streaming.StatefulTotals.{Event, UserTotal}

/** mapGroupsWithState custom state: totals must accumulate ACROSS
  * micro-batches (state survives), driven by a MemoryStream. */
class Streaming2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("mapGroupsWithState running totals accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StatefulTotals.runningTotals(input.toDS())
      .writeStream.format("memory").queryName("totals")
      .outputMode(StatefulTotals.RequiredOutputMode)
      .start()
    try {
      input.addData(Event(1L, 10.0), Event(1L, 5.0), Event(2L, 1.0))
      q.processAllAvailable()
      input.addData(Event(1L, 2.0), Event(3L, 7.0))
      q.processAllAvailable()
      // Update mode appends one row per updated key per batch; the row with
      // the highest count per user carries the accumulated state
      val last = spark.table("totals").as[UserTotal].collect()
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n) }
      assert(last(1L).n == 3 && last(1L).total == 17.0)
      assert(last(2L).n == 1 && last(2L).total == 1.0)
      assert(last(3L).n == 1 && last(3L).total == 7.0)
    } finally q.stop()
  }
}
