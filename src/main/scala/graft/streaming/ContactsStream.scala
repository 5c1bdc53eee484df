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
}
