package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Structured Streaming: the AvailableNow drain of the events directory must
  * compute exactly the batch rollup (stream/batch equivalence). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming hourly rollup == batch rollup (AvailableNow drain)") {
    val dir = "/root/testdata/sf0.001"
    // file-stream sources require a directory: stage the file into one
    val streamDir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    EventStream.drainToMemory(spark, streamDir.toString, "stream_hourly")
    val streamed = spark.table("stream_hourly")
      .orderBy("hour", "event_type").collect().map(_.toSeq).toSeq

    val batch = EventStream.hourlyRollup(
      graft.queries.Tables(spark, dir, "events"))
      .orderBy("hour", "event_type").collect().map(_.toSeq).toSeq

    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
