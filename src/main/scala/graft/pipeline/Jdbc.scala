package graft.pipeline

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Generic JDBC staging connector — the Spark capability that subsumes the
  * reference's SQLite out-of-core path (SURVEY.md §2.1 S9-S11: stage to
  * `merged_data`, indexed probe, point UPDATE, dedup export).
  *
  * On Spark, out-of-core execution is native (shuffle + spill), so the JDBC
  * layer survives only as an integration surface: stage a DataFrame into any
  * JDBC database and read it back, with predicate pushdown doing what the
  * reference's secondary indexes did. Point UPDATEs (S11) have no Spark
  * analogue by design — the fill re-derives columns via join + coalesce
  * (Fill), which is the scalable rewrite.
  *
  * Parallelism: reads accept a partition column + bounds so the scan splits
  * into `numPartitions` concurrent range queries instead of one connection.
  */
object Jdbc {

  /** Stage a DataFrame into a JDBC table (S9). */
  def write(df: DataFrame, url: String, table: String,
      props: Properties = new Properties(),
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  /** Read a JDBC table; filters/projections push down to the database. */
  def read(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel read (the 100-TB-posture variant): split on
    * a numeric column into `numPartitions` concurrent range scans. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)
}
