package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Test-corpus table loader (TESTDATA.md): TPC-H-ish star schema + events +
  * documents + embeddings, one parquet per table under the sf dir. */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, s"$dir/$name.parquet")
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Schema-adaptive events reader. A 100-TB lake has mixed writers and
    * mixed physical encodings; the corpus generator has shipped `ts` as
    * both TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts
    * as raw int64 via the `nanosAsLong` legacy conf) and timestamp[us]
    * (which Spark reads natively as TIMESTAMP_NTZ). Branch on the scanned
    * dtype instead of hard-coding one writer's choice, and normalize every
    * encoding to the same session-tz TimestampType (session tz is UTC
    * repo-wide), truncated to micros — the same value DuckDB sees, so
    * oracle hashes agree across encodings. */
  def events(spark: SparkSession, path: String): DataFrame =
    normalizeTs(rawEvents(spark, path))

  /** Raw scan that tolerates TIMESTAMP(NANOS) parquet: plain read first;
    * if schema inference rejects the nanos type, set the legacy conf and
    * retry (the conf is session-wide and deliberately NOT restored — the
    * plan is lazy, so the flag must still hold when the scan executes). */
  private[graft] def rawEvents(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: Throwable if messageChain(e).contains("NANOS") =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path)
    }

  /** Normalize whatever `ts` encoding the writer used to TimestampType:
    * int64 nanos -> truncate to micros; TIMESTAMP_NTZ -> reinterpret in
    * the (UTC) session tz; TimestampType -> as-is. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other")
    }

  private def messageChain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
}
