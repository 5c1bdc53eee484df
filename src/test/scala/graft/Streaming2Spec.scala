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

  test("flatMapGroupsWithState emits closed sessions after watermark + gap") {
    import graft.streaming.SessionEmitter
    import graft.streaming.SessionEmitter.{ClosedSession, Ev}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[Ev]
    val q = SessionEmitter.closedSessions(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1L, ts("2024-01-01 10:00:00"), 1.0),
        Ev(1L, ts("2024-01-01 10:10:00"), 2.0),
        Ev(2L, ts("2024-01-01 10:05:00"), 5.0))
      q.processAllAvailable()
      assert(spark.table("closed_sessions").isEmpty) // nothing closed yet
      // far-future event advances the watermark past both sessions' gaps
      input.addData(Ev(3L, ts("2024-01-01 14:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(Ev(3L, ts("2024-01-01 14:00:01"), 0.0))
      q.processAllAvailable() // extra batch lets timeouts fire post-watermark
      val closed = spark.table("closed_sessions").as[ClosedSession]
        .collect().map(c => c.user_id -> ((c.n_events, c.total_value))).toMap
      assert(closed(1L) == ((2L, 3.0)), s"user1: $closed")
      assert(closed(2L) == ((1L, 5.0)), s"user2: $closed")
      assert(!closed.contains(3L)) // still open
    } finally q.stop()
  }

  test("foreachBatch contacts ingest cleans micro-batches like the batch stage") {
    import java.nio.file.Files
    val in = Files.createTempDirectory("ingest-in")
    val out = Files.createTempDirectory("ingest-out").toString + "/staged"
    val ckpt = Files.createTempDirectory("ingest-ckpt").toString
    val tsv = "FIRSTNAME\tEMAIL\tISACTIVE\n" +
      "  jo  \tJO@X.COM junk\tyes\n" +
      "bo\tnot-an-email\t0\n"
    Files.writeString(in.resolve("batch1.tsv"), tsv)

    val schema = graft.streaming.ContactsStream.schemaOf(
      spark, in.resolve("batch1.tsv").toString)
    graft.streaming.ContactsStream.cleanIngest(
      spark, in.toString, schema, out, ckpt)

    val staged = spark.read.parquet(out)
      .orderBy("FIRSTNAME").collect()
    assert(staged.length == 2)
    // Clean applied: title-cased name, validated+normalized email, Y/N flag
    assert(staged(1).getAs[String]("FIRSTNAME") == "Jo")
    assert(staged(1).getAs[String]("EMAIL") == "jo@x.com junk")
    assert(staged(1).getAs[String]("ISACTIVE") == "Y")
    assert(staged(0).getAs[String]("EMAIL") == null) // invalid -> null
    assert(staged(0).getAs[String]("ISACTIVE") == "N")
  }
}
