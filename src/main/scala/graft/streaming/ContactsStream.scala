package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.pipeline.Clean

/** Incremental contacts ingest (SURVEY.md §2.10 extension): watch a
  * directory for newly-dropped contact TSVs, run the SAME batch cleaning
  * transforms on each micro-batch, and append to a parquet staging area via
  * foreachBatch. The golden-record merge stays a periodic batch compaction
  * over the staging table — a holistic group-by, deliberately not
  * incrementalized (a per-key stateful merge would hold every golden record
  * in the state store forever; at 100 TB the compaction IS the cheaper
  * plan).
  *
  * File-source streaming requires an explicit schema: contact exports vary
  * per source, so the caller resolves it once from a sample file
  * (`schemaOf`) — the same convention-over-declaration stance as the batch
  * reader. */
object ContactsStream {

  /** All-string schema probed from an existing sample file. */
  def schemaOf(spark: SparkSession, samplePath: String): StructType =
    graft.pipeline.Tsv.readAllString(spark, samplePath).schema

  def readContacts(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream
      .option("sep", "\t").option("header", true)
      .option("quote", "\"").option("escape", "\"")
      .schema(schema)
      .csv(dir)

  /** Clean each micro-batch with the batch `Clean` stage and append to
    * parquet. AvailableNow drains what's present and stops; a production
    * deployment uses the default continuous trigger + checkpointing. */
  def cleanIngest(spark: SparkSession, inDir: String, schema: StructType,
      outDir: String, checkpointDir: String): StreamingQuery = {
    val q = readContacts(spark, inDir, schema)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // idempotent per-batch landing: a batch replayed after a crash
        // between write and checkpoint commit OVERWRITES its own directory
        // instead of appending duplicates (batch= is a partition column, so
        // spark.read.parquet(outDir) still sees one logical table)
        Clean(batch).write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming golden-record maintenance: [[graft.pipeline.GoldenRecord
    * .upsertIncremental]] as the foreachBatch core. Each micro-batch is
    * cleaned with the batch `Clean` stage and merged into the golden
    * table by dedup key — only groups TOUCHED by the batch re-merge;
    * untouched golden rows pass through (the broadcast semi/anti joins of
    * the batch operator, unchanged).
    *
    * The golden table is a series of versioned parquet snapshots
    * (`v=<batchId>`): a batch reads the latest snapshot committed BEFORE
    * its own id and overwrites only its own version directory, so a
    * batch replayed after a crash between write and checkpoint commit
    * reads the same predecessor state and lands the same result —
    * exactly-once by idempotence, the same stance as [[cleanIngest]]'s
    * per-batch landing. Old snapshots are time-travel state; prune them
    * with any retention sweep (they are never read once superseded).
    *
    * Rows must carry a unique `rowIdCol` (the dedupe tie-break);
    * uniqueness across batches is the caller's ingest contract. */
  def goldenUpsertStream(spark: SparkSession, inDir: String,
      schema: StructType, goldenDir: String, checkpointDir: String,
      rowIdCol: String,
      lastUpdatedCol: Option[String] = None): StreamingQuery = {
    val q = readContacts(spark, inDir, schema)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val incoming = Clean(batch)
        val existing = latestVersionBefore(goldenDir, batchId) match {
          case Some(v) => spark.read.parquet(s"$goldenDir/v=$v")
          case None => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            incoming.schema)
        }
        graft.pipeline.GoldenRecord
          .upsertIncremental(existing, incoming, rowIdCol, lastUpdatedCol)
          .write.mode("overwrite").parquet(s"$goldenDir/v=$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Highest committed snapshot version strictly below `beforeBatchId` —
    * the replay-idempotence anchor (a re-run batch resolves the same
    * predecessor it resolved the first time). */
  def latestVersionBefore(goldenDir: String,
      beforeBatchId: Long): Option[Long] = {
    val d = new java.io.File(goldenDir)
    Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .filter(_ < beforeBatchId)
      .sorted.lastOption
  }

  /** The current golden table (latest snapshot), if any batch committed. */
  def currentGolden(spark: SparkSession,
      goldenDir: String): Option[DataFrame] =
    latestVersionBefore(goldenDir, Long.MaxValue)
      .map(v => spark.read.parquet(s"$goldenDir/v=$v"))
}
