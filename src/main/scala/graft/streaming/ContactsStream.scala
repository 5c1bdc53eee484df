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

  /** `maxFilesPerTrigger` is the file-source backpressure bound: each
    * micro-batch admits at most that many files, so one giant directory
    * drop cannot balloon a single batch's state/merge work — the batch
    * size stays operator-chosen at any backlog (AvailableNow respects the
    * bound too, draining the backlog as a SEQUENCE of bounded batches
    * instead of one unbounded one). */
  def readContacts(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
      .option("sep", "\t").option("header", true)
      .option("quote", "\"").option("escape", "\"")
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.schema(schema).csv(dir)
  }

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
      lastUpdatedCol: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val q = readContacts(spark, inDir, schema, maxFilesPerTrigger)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val incoming = Clean(batch)
        val existing = latestVersionBefore(spark, goldenDir, batchId) match {
          case Some(v) => spark.read.parquet(s"$goldenDir/v=$v")
          case None => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            incoming.schema)
        }
        graft.pipeline.GoldenRecord
          .upsertIncremental(existing, incoming, rowIdCol, lastUpdatedCol)
          .write.mode("overwrite").parquet(s"$goldenDir/v=$batchId")
        // commit marker the STREAM controls: the committer's _SUCCESS
        // depends on mapreduce.fileoutputcommitter.marksuccessfuljobs
        // (commonly disabled on object stores), and with it off every
        // snapshot would read back as uncommitted — the silent golden
        // reset the marker filter exists to prevent. Writing our own
        // sentinel AFTER the parquet job returns makes commitment
        // independent of committer configuration.
        writeCommitMarker(spark, s"$goldenDir/v=$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Highest COMMITTED snapshot version strictly below `beforeBatchId` —
    * the replay-idempotence anchor (a re-run batch resolves the same
    * predecessor it resolved the first time).
    *
    * Snapshots resolve through the Hadoop FileSystem API, so the scheme the
    * snapshot was written with (HDFS/S3/abfs/local) is the scheme it is
    * read with — a `java.io.File` listing returns null for every non-local
    * URI, which would silently read as "no snapshots" and let the next
    * micro-batch merge against an EMPTY golden frame (a silent golden-table
    * reset). Only a MISSING directory maps to None (the legitimate
    * first-batch state); any other filesystem failure raises — the
    * raise-don't-poison stance of Preference/Bootstrap.
    *
    * Commitment: the parquet overwrite is not atomic, so a `v=N` directory
    * alone may be a partial crash artifact. Only directories carrying a
    * commit marker — the stream's own `_GRAFT_COMMIT` sentinel, or the
    * committer's `_SUCCESS` for pre-sentinel snapshots — count as
    * committed; a half-written snapshot is never resolved (the replaying
    * batch overwrites it).
    *
    * If snapshot directories exist below `beforeBatchId` but NONE carries
    * a marker, this RAISES instead of returning None: under the stream's
    * own write protocol at most the single newest snapshot can be torn
    * (a batch never starts before its predecessor's marker landed), so
    * "every predecessor is uncommitted" means the markers were stripped
    * or the directory is foreign — and returning None would silently
    * merge the next batch against an EMPTY golden frame, resetting the
    * table. None is reserved for a truly empty/missing goldenDir (the
    * legitimate first-batch state). */
  def latestVersionBefore(spark: SparkSession, goldenDir: String,
      beforeBatchId: Long): Option[Long] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(goldenDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val entries =
      try fs.listStatus(root).toSeq
      catch { case _: java.io.FileNotFoundException => Seq.empty }
    // strict v=<digits> match: a partial rename or junk dir like v=tmp
    // must be ignored, not NumberFormatException the micro-batch
    val candidates = entries
      .filter(st => st.isDirectory && st.getPath.getName.matches("v=\\d+"))
      .map(st => (st.getPath.getName.stripPrefix("v=").toLong, st.getPath))
      .filter(_._1 < beforeBatchId)
    val committed = candidates.collect {
      case (v, p) if fs.exists(new Path(p, CommitMarker)) ||
        fs.exists(new Path(p, "_SUCCESS")) => v
    }
    if (candidates.nonEmpty && committed.isEmpty)
      throw new IllegalStateException(
        s"goldenDir $goldenDir has ${candidates.size} snapshot " +
          s"director(ies) below v=$beforeBatchId but none carries a " +
          s"commit marker ($CommitMarker or _SUCCESS) — refusing to " +
          "resolve an empty golden state over existing snapshots")
    committed.sorted.lastOption
  }

  /** Commit-marker filename for golden snapshots (see
    * [[latestVersionBefore]]). */
  val CommitMarker = "_GRAFT_COMMIT"

  private def writeCommitMarker(spark: SparkSession, dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir, CommitMarker)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(p, true).close()
  }

  /** Keep-last-N snapshot retention: delete every COMMITTED golden
    * snapshot except the `keepLast` newest, plus any uncommitted
    * (marker-less) crash artifact older than the oldest kept version.
    * Returns the deleted versions.
    *
    * `keepLast >= 2` is a correctness floor, not a tuning default: the
    * newest batch may have written its snapshot and crashed before its
    * CHECKPOINT committed, and its replay resolves the latest committed
    * snapshot strictly below its own id — prune that predecessor and the
    * replay would raise (or, pre-markers, silently reset). Uncommitted
    * directories at or above the kept range are left alone: the newest
    * one may be an in-flight write. */
  def pruneSnapshots(spark: SparkSession, goldenDir: String,
      keepLast: Int): Seq[Long] = {
    require(keepLast >= 2,
      s"keepLast must be >= 2 (replay of the newest batch resolves the " +
        s"second-newest committed snapshot); got $keepLast")
    import org.apache.hadoop.fs.Path
    val root = new Path(goldenDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val entries =
      try fs.listStatus(root).toSeq
      catch { case _: java.io.FileNotFoundException => return Seq.empty }
    val versioned = entries // strict v=<digits>: see latestVersionBefore
      .filter(st => st.isDirectory && st.getPath.getName.matches("v=\\d+"))
      .map(st => (st.getPath.getName.stripPrefix("v=").toLong, st.getPath))
    val committed = versioned.collect {
      case (v, p) if fs.exists(new Path(p, CommitMarker)) ||
        fs.exists(new Path(p, "_SUCCESS")) => v
    }.sorted
    if (committed.size <= keepLast) return Seq.empty
    val keptFloor = committed.takeRight(keepLast).head
    val doomed = versioned.filter { case (v, p) =>
      v < keptFloor // committed beyond keepLast, or stale crash artifacts
    }
    doomed.foreach { case (_, p) => fs.delete(p, true) }
    doomed.map(_._1).sorted
  }

  /** The current golden table (latest committed snapshot), if any. */
  def currentGolden(spark: SparkSession,
      goldenDir: String): Option[DataFrame] =
    latestVersionBefore(spark, goldenDir, Long.MaxValue)
      .map(v => spark.read.parquet(s"$goldenDir/v=$v"))
}
