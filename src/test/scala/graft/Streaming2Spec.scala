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
