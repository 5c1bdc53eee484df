package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-corpus table loader (TESTDATA.md): TPC-H-ish star schema + events +
  * documents + embeddings, one parquet per table under the sf dir. */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
      // reader rejects; read the raw int64 nanos and truncate to micros —
      // the same truncation DuckDB applies, so oracle hashes agree.
      // NOTE: this conf is session-wide and deliberately NOT restored — the
      // plan is lazy, so the flag must still hold when the scan executes;
      // after the first events read, raw reads of nanos parquet in the same
      // session return LongType instead of throwing.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
