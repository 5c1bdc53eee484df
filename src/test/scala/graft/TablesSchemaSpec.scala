package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Tables

/** Schema-evolution pin for the events loader (the round-7 corpus
  * regeneration broke 15 queries because the old loader hard-coded one
  * writer's physical `ts` encoding). A 100-TB lake has mixed writers:
  * `Tables.events` must produce BIT-IDENTICAL rows whether the parquet
  * carries ts as int64 epoch-nanos, TIMESTAMP_NTZ (timestamp[us] with
  * isAdjustedToUTC=false — what pyarrow writes by default), or
  * session-tz TimestampType. This spec writes the same logical rows in
  * all three encodings and asserts the loader's outputs are equal, so
  * the next corpus change cannot silently regress the reader again. */
class TablesSchemaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("Tables.events normalizes all three ts encodings to identical rows") {
    val dir = Files.createTempDirectory("graft-tsenc").toString

    // logical rows: micro-precision instants (what every encoding can hold)
    val micros = Seq(
      (1L, 1700000000000000L, 10L, "view", 1.5, "{}"),
      (2L, 1700000123456789L, 11L, "click", 2.5, "{}"),
      (3L, 1700009999999999L, 10L, "view", 0.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")

    // (a) TimestampType writer (Spark default: INT64 micros, adjusted to UTC)
    micros.select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/tstype.parquet")

    // (b) TIMESTAMP_NTZ writer (pyarrow timestamp[us] default — the
    // regenerated corpus's encoding)
    micros.select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/ntz.parquet")

    // (c) raw int64 epoch-nanos (what the nanosAsLong legacy conf yields
    // for TIMESTAMP(NANOS) parquet — Spark cannot write NANOS, so the
    // LongType branch is exercised directly, which is exactly the dtype
    // the loader's nanos path sees after the conf kicks in)
    micros.select(col("event_id"), (col("us") * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/nanos.parquet")

    val rows = Seq("tstype", "ntz", "nanos").map { enc =>
      val df = Tables.events(spark, s"$dir/$enc.parquet")
      assert(df.schema("ts").dataType == TimestampType,
        s"$enc: loader must normalize to session-tz TimestampType")
      enc -> df.orderBy("event_id")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .collect().toSeq
    }.toMap

    assert(rows("ntz") == rows("tstype"),
      "NTZ encoding must decode to the same instants as TimestampType")
    assert(rows("nanos") == rows("tstype"),
      "int64-nanos encoding must decode to the same instants as TimestampType")
  }
}
