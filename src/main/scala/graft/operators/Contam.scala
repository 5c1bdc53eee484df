package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.pipeline.Pins

/** PERSISTED benchmark-contamination index: the GPT-3 appendix-C
  * decontamination scheme (find training documents sharing any N-gram
  * with an evaluation benchmark) as a production index, not a one-shot
  * join — the r12/r13 LSH/ANN index argument applied to decontamination:
  * at 100 TB the training corpus is probed against the SAME benchmark
  * set for every ingest batch, so the benchmark's grams must persist
  * pre-bucketed on the join key and never re-shuffle.
  *
  * Layout under `path` ([[IndexGen]] discipline — generations, commit
  * markers, tombstones, shared with the LSH and ANN indexes):
  *   - `{name}_grams` (gram BIGINT, id BIGINT): the benchmark's DISTINCT
  *     per-document N-gram digests, bucketed by gram into `numBuckets`
  *     files — the probe join's index side scans pre-partitioned on
  *     exactly its join key;
  *   - `meta.json`: (n, numBuckets), so later sessions can only probe
  *     with the gram family the index was built with.
  *
  * Grams are [[Text.md5Long]] digests of space-joined lowercase token
  * N-grams ([[Text.wordShingles]] — whole-document fallback for
  * shorter-than-N documents): 60-bit md5 prefixes, the repo's portable
  * hash, so the DuckDB oracle can restate every digest.
  */
object Contam {

  case class NgramIndexMeta(n: Int, numBuckets: Int)

  case class NgramIndex(name: String, path: String, meta: NgramIndexMeta,
      gen: Int = 0) {
    def gramsTable: String = s"${name}_grams"
    def gramsDir: String = IndexGen.dirFor(path, "grams", gen)
  }

  /** DISTINCT (id, gram-digest) rows for a document frame. */
  private[graft] def gramDigests(df: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        explode(Text.wordShingles(col(textCol), n)).as("__g"))
      .select(col("id"), Text.md5Long(col("__g")).as("gram"))
      .distinct()

  /** Build (or overwrite) the index from the benchmark frame. */
  def writeNgramIndex(benchmark: DataFrame, idCol: String, textCol: String,
      path: String, name: String, n: Int = 13,
      numBuckets: Int = 32): NgramIndex = {
    require(benchmark.schema(benchmark.schema.fieldIndex(idCol)).dataType ==
      org.apache.spark.sql.types.LongType,
      "persisted index ids must be BIGINT (cross-session DDL)")
    val spark = benchmark.sparkSession
    val meta = NgramIndexMeta(n, numBuckets)
    val idx = NgramIndex(name, path, meta)
    spark.sql(s"DROP TABLE IF EXISTS ${idx.gramsTable}")
    IndexGen.cleanAll(spark, path, Seq("grams"))
    gramDigests(benchmark, idCol, textCol, n)
      .write.mode("overwrite")
      .bucketBy(numBuckets, "gram")
      .option("path", idx.gramsDir)
      .saveAsTable(idx.gramsTable)
    IndexGen.commitManifest(spark, idx.gramsDir)
    writeMeta(spark, s"$path/meta.json", meta)
    idx
  }

  /** Open a persisted index at its newest COMMITTED generation and
    * register the bucketed external table in THIS session's catalog. */
  def readNgramIndex(spark: SparkSession, path: String,
      name: String): NgramIndex = {
    val idx = NgramIndex(name, path, readMeta(spark, s"$path/meta.json"),
      gen = IndexGen.resolveGen(spark, path))
    // open-time recovery: drop a torn batch append's leftover files
    IndexGen.repairToManifest(spark, idx.gramsDir)
    registerTable(spark, idx)
    idx
  }

  private def registerTable(spark: SparkSession, idx: NgramIndex): Unit =
    IndexGen.ensureTable(spark, idx.gramsTable, idx.gramsDir,
      s"""CREATE TABLE ${idx.gramsTable} (id BIGINT, gram BIGINT)
         |USING parquet
         |CLUSTERED BY (gram) INTO ${idx.meta.numBuckets} BUCKETS
         |LOCATION '${idx.gramsDir}'""".stripMargin)

  /** Per-document contamination of `batch` against the indexed benchmark:
    * (idCol, n_grams, n_hits, n_sources) — distinct grams, distinct grams
    * matching the index, distinct benchmark documents matched. The probe
    * join reads the index pre-bucketed on `gram` with NO index-side
    * exchange; only the batch shuffles. Retracted benchmark ids are
    * hidden via the broadcast anti-join ([[IndexGen.live]] — tombstones
    * are retraction-sized metadata, the bucketed scan shape is
    * unchanged). Caller contract: batch ids disjoint from benchmark ids
    * (a benchmark doc probed against itself is trivially contaminated).
    * Every batch document gets a row, hit or not. */
  def probeNgramIndex(index: NgramIndex, batch: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = batch.sparkSession
    val tombs = IndexGen.tombstones(spark, index.path)
    val idxGrams = IndexGen.live(spark.table(index.gramsTable), tombs)
      .select(col("gram"), col("id").as("__src"))
    val bGrams = Pins.pin(
      gramDigests(batch, idCol, textCol, index.meta.n))
    val hits = bGrams.join(idxGrams, Seq("gram"))
      .groupBy(col("id"))
      .agg(countDistinct(col("gram")).as("n_hits"),
        countDistinct(col("__src")).as("n_sources"))
    bGrams.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_sources"), lit(0L)).as("n_sources"))
  }

  /** Decontamination as an ACTION (the GPT-3 appendix-C screen composed
    * into a corpus filter, the way q118 composes curation verdicts):
    * probe `corpus` against the indexed benchmark and split it on
    * `hit_frac = n_hits / n_grams`. Returns
    *
    *   - `kept`: the corpus rows (ALL original columns) whose hit_frac
    *     ≤ `maxHitFrac` — the training-safe survivors, carried through a
    *     broadcast-friendly anti-join on the dropped ids (drop sets are
    *     contamination-sized, not corpus-sized);
    *   - `dropped`: the provenance dataset (idCol, n_grams, n_hits,
    *     n_sources, hit_frac) for every REMOVED document — the X6
    *     change-log pattern: a curation decision nobody can audit later
    *     is a decision that did not happen.
    *
    * The decision boundary compares the raw IEEE division (both sides of
    * any oracle compute the identical double); the emitted hit_frac is
    * rounded to 6 dp for display only. maxHitFrac = 0.0 is the paper's
    * conservative screen (any shared 13-gram drops the doc). */
  def decontaminate(index: NgramIndex, corpus: DataFrame, idCol: String,
      textCol: String, maxHitFrac: Double): (DataFrame, DataFrame) = {
    val stats = probeNgramIndex(index, corpus, idCol, textCol)
      .withColumn("__cf",
        col("n_hits").cast("double") / col("n_grams").cast("double"))
    val dropped = stats.filter(col("__cf") > maxHitFrac)
      .select(col(idCol), col("n_grams"), col("n_hits"), col("n_sources"),
        round(col("__cf"), 6).as("hit_frac"))
    val kept = corpus.join(dropped.select(col(idCol)), Seq(idCol),
      "left_anti")
    (kept, dropped)
  }

  /** Absorb NEW benchmark documents (e.g. a fresh eval suite) into the
    * index. Bucketed append: one file per bucket per append — the probe
    * keeps its exchange-free shape; [[maybeCompactNgramIndex]] bounds the
    * file growth. Caller contract: appended ids disjoint from indexed.
    * Holds the [[IndexGen.withWriterLock]] lease — a concurrent append's
    * half-written files would otherwise be legitimized by this one's
    * manifest commit.
    *
    * `batchTag` makes a RETRIED append exactly-once (tag committed
    * atomically with the manifest; a retry whose tag already heads the
    * newest manifest appends nothing). Unlike the LSH/ANN families this
    * is a size/scan concern only: [[probeNgramIndex]] aggregates with
    * countDistinct on both the gram and the source id, so duplicated
    * gram rows cannot change any probe answer — the tag just keeps a
    * replay from doubling the benchmark's physical footprint. */
  def appendToNgramIndex(index: NgramIndex, benchmark: DataFrame,
      idCol: String, textCol: String,
      batchTag: Option[String] = None): Unit = {
    val spark = benchmark.sparkSession
    IndexGen.withWriterLock(spark, index.path) {
      // manifest protocol (IndexGen): a torn append's files are repaired
      // at the next open/append; commit only after the data write
      // completes
      IndexGen.repairToManifest(spark, index.gramsDir)
      val done = batchTag.isDefined &&
        IndexGen.manifestTag(spark, index.gramsDir) == batchTag
      if (!done) {
        gramDigests(benchmark, idCol, textCol, index.meta.n)
          .write.mode("append")
          .bucketBy(index.meta.numBuckets, "gram")
          .option("path", index.gramsDir)
          .saveAsTable(index.gramsTable)
        IndexGen.commitManifest(spark, index.gramsDir, batchTag)
      }
    }
  }

  /** Retract benchmark documents (id tombstones; probes hide them
    * immediately, the next compaction folds them into the files).
    * Leased: a tombstone landing between a compaction's tombstones read
    * and its clearTombstones would be silently dropped. */
  def retractFromNgramIndex(index: NgramIndex, ids: DataFrame,
      idCol: String): Unit =
    IndexGen.withWriterLock(ids.sparkSession, index.path) {
      IndexGen.appendTombstones(index.path, ids, idCol)
    }

  /** Rewrite the grams table into the next generation — one file per
    * bucket, tombstones applied and cleared. Same crash-safety contract
    * as [[Dedup.compactLshIndex]] (commit marker, then idempotent
    * housekeeping). */
  def compactNgramIndex(spark: SparkSession, index: NgramIndex)
      : NgramIndex =
    IndexGen.withWriterLock(spark, index.path) {
      val bases = Seq("grams")
      val next = index.copy(
        gen = IndexGen.nextGen(spark, index.path, bases, index.gen))
      IndexGen.fs(spark, index.path)
        .delete(new org.apache.hadoop.fs.Path(next.gramsDir), true)
      val tombs = IndexGen.tombstones(spark, index.path)
      IndexGen.rewriteBucketed(spark, index.gramsDir, next.gramsDir,
        s"${index.name}_grams_compacting", index.meta.numBuckets,
        Seq("gram"), tombs)
      IndexGen.writeMarker(spark, index.path, next.gen)
      spark.sql(s"DROP TABLE IF EXISTS ${index.gramsTable}")
      registerTable(spark, next)
      IndexGen.clearTombstones(spark, index.path)
      IndexGen.sweepOld(spark, index.path, bases, next.gen)
      next
    }

  /** Compact when append cadence has fragmented any bucket past the bar. */
  def maybeCompactNgramIndex(spark: SparkSession, index: NgramIndex,
      maxFilesPerBucket: Int): NgramIndex =
    if (IndexGen.maxFilesPerBucket(spark, index.gramsDir) > maxFilesPerBucket)
      compactNgramIndex(spark, index)
    else index

  /** Filesystem resolution through the session conf ([[IndexGen.fs]]) —
    * the [[readMeta]]/writeAnnMeta contract; a default Configuration()
    * could write meta.json to a different filesystem than probes read. */
  private def writeMeta(spark: SparkSession, file: String,
      m: NgramIndexMeta): Unit = {
    val p = new org.apache.hadoop.fs.Path(file)
    val out = IndexGen.fs(spark, file).create(p, true)
    try out.write(
      s"""{"n":${m.n},"numBuckets":${m.numBuckets}}""".getBytes("UTF-8"))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, file: String): NgramIndexMeta = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val raw =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def f(k: String): String =
      raw.split(s""""$k":""")(1).takeWhile(c => c.isDigit || c == '-')
    NgramIndexMeta(f("n").toInt, f("numBuckets").toInt)
  }
}
