package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Contam, Dedup, IndexGen, Similarity}
import graft.pipeline.Pins

/** Crash-safety of BATCH appends across the persisted-index family (the
  * r13 verdict's last gap): each table directory's `_manifest` names its
  * committed files; a torn append — simulated here by re-installing the
  * pre-append manifest after a REAL append, i.e. a crash anywhere before
  * the manifest commit — must be repaired at the next open so probes
  * answer as if the append never happened. Plus the single-writer lease:
  * a second concurrent compaction raises instead of corrupting. */
class IndexCrashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("idxcrash").toString

  // manifest snapshot/restore through the Hadoop fs (the local fs keeps
  // CRC sidecars — a raw java.nio write would fail the checksum on read)
  private def readManifest(dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir, "_manifest")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def writeManifest(dir: String, body: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, "_manifest")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  // ------------------------------------------------------------------ LSH

  private def corpus = (0L until 30L).map { i =>
    (i, (0 until 12).map(k => s"w${(i * 7 + k * 3) % 50}").mkString(" "))
  }.toDF("doc_id", "text")

  private def variantBatch(shift: Long) = corpus
    .filter(col("doc_id") % 4 === 0)
    .select((col("doc_id") + shift).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))

  private def lshPairs(idx: Dedup.LshIndex, b: DataFrame) = {
    val got = Dedup.probeLshIndex(idx, b, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e6))).sorted.toSeq
    Pins.flush()
    got
  }

  test("LSH: a torn batch append is repaired — probes answer as before") {
    val path = tmp()
    val idx = Dedup.writeLshIndex(corpus, "doc_id", "text", path,
      "crash_lsh", shingleSize = 3, numHashes = 64, bands = 16,
      numBuckets = 4)
    val batchA = variantBatch(1000)
    val batchB = variantBatch(2000)
    val basePairs = lshPairs(idx, batchB)
    assert(basePairs.nonEmpty)
    val mBands = readManifest(idx.bandsDir)
    val mPosts = readManifest(idx.postsDir)

    // torn append: the data files land but NEITHER manifest commits
    Dedup.appendToLshIndex(idx, batchA, "doc_id", "text")
    writeManifest(idx.bandsDir, mBands)
    writeManifest(idx.postsDir, mPosts)
    val reopened = Dedup.readLshIndex(spark, path, "crash_lsh")
    assert(lshPairs(reopened, batchB) == basePairs,
      "after repair the probe must not see any of batchA")
    // and batchB finds no batchA partners at all
    assert(!lshPairs(reopened, batchB).exists(p =>
      p._1 >= 1000 && p._1 < 2000))
  }

  test("LSH: bands-committed/posts-torn leaves probes unchanged; a retry " +
      "append lands the batch exactly once") {
    val path = tmp()
    val idx = Dedup.writeLshIndex(corpus, "doc_id", "text", path,
      "crash_lsh2", shingleSize = 3, numHashes = 64, bands = 16,
      numBuckets = 4)
    val batchA = variantBatch(1000)
    val batchB = variantBatch(2000)
    val basePairs = lshPairs(idx, batchB)
    val mPosts = readManifest(idx.postsDir)

    // crash BETWEEN the two manifest commits: bands committed (ghost
    // rows), posts torn — the documented benign asymmetry
    Dedup.appendToLshIndex(idx, batchA, "doc_id", "text")
    writeManifest(idx.postsDir, mPosts)
    val reopened = Dedup.readLshIndex(spark, path, "crash_lsh2")
    assert(lshPairs(reopened, batchB) == basePairs,
      "ghost bands rows must not change the rescored pair set")

    // the retry (streaming replay path): batchA must land exactly once —
    // probe equals a scratch-built index with the same one append
    Dedup.appendToLshIndex(reopened, batchA, "doc_id", "text")
    val got = lshPairs(reopened, batchB)
    val refPath = tmp()
    val ref = Dedup.writeLshIndex(corpus, "doc_id", "text", refPath,
      "crash_lsh2_ref", shingleSize = 3, numHashes = 64, bands = 16,
      numBuckets = 4)
    Dedup.appendToLshIndex(ref, batchA, "doc_id", "text")
    assert(got == lshPairs(ref, batchB))
    assert(got.exists(p => p._1 >= 1000 && p._1 < 2000),
      "the retried append must be visible (batchA partners batchB)")
  }

  // ------------------------------------------------------------------ ANN

  private val Dim = 16

  private lazy val vecs: DataFrame = spark.range(0, 120).toDF("vec_id")
    .select(col("vec_id"),
      transform(sequence(lit(0), lit(Dim - 1)),
        i => sin(col("vec_id") * 0.37 + i * 1.13)
          + cos(col("vec_id") % 5 * 2.1 - i * 0.5)).as("vec"))

  private def annTopk(idx: Similarity.AnnIndex) = {
    val q = vecs.filter(col("vec_id") % 30 === 0)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    val got = Similarity.probeAnnIndex(idx, q, "qid", "qvec", k = 5,
        nprobe = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).sorted.toSeq
    Pins.flush()
    got
  }

  test("ANN: a torn batch append is repaired — probes answer as before") {
    val path = tmp()
    val idx = Similarity.writeAnnIndex(vecs, "vec_id", "vec", path,
      "crash_ann", m = 4, k = 8, nlist = 8, numBuckets = 4)
    val base = annTopk(idx)
    assert(base.nonEmpty)
    val m0 = readManifest(idx.listsDir)
    val batch = vecs.filter(col("vec_id") < 20)
      .select((col("vec_id") + 500).as("vec_id"), col("vec"))
    Similarity.appendToAnnIndex(idx, batch, "vec_id", "vec")
    writeManifest(idx.listsDir, m0)
    val reopened = Similarity.readAnnIndex(spark, path, "crash_ann")
    assert(annTopk(reopened) == base,
      "after repair no appended vector may appear in any top-k")
  }

  // ---------------------------------------------------------------- ngram

  private def bench = (0L until 6L).map { i =>
    (i, (0 until 8).map(k => s"b${(i * 5 + k) % 40}").mkString(" "))
  }.toDF("doc_id", "text")

  private def probeBatch = (0L until 8L).map { i =>
    (i + 1000L, (0 until 8).map(k => s"b${(i * 5 + k) % 40}").mkString(" "))
  }.toDF("doc_id", "text")

  private def contamMap(idx: Contam.NgramIndex) = {
    val got = Contam.probeNgramIndex(idx, probeBatch, "doc_id", "text")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    Pins.flush()
    got
  }

  test("ngram: a torn batch append is repaired — probes answer as before") {
    val path = tmp()
    val idx = Contam.writeNgramIndex(bench, "doc_id", "text", path,
      "crash_ng", n = 4, numBuckets = 4)
    val base = contamMap(idx)
    val m0 = readManifest(idx.gramsDir)
    val extra = bench.select((col("doc_id") + 100).as("doc_id"),
      concat(col("text"), lit(" zz zz zz")).as("text"))
    Contam.appendToNgramIndex(idx, extra, "doc_id", "text")
    writeManifest(idx.gramsDir, m0)
    val reopened = Contam.readNgramIndex(spark, path, "crash_ng")
    assert(contamMap(reopened) == base,
      "after repair the appended benchmark docs must be invisible")
  }

  test("ngram: dropping ONE bucket file of a torn append still repairs") {
    // the verdict's literal scenario: a crash that leaves only SOME of
    // the append's files — delete one new file, keep the rest, no
    // manifest commit; repair removes the remainder too
    val path = tmp()
    val idx = Contam.writeNgramIndex(bench, "doc_id", "text", path,
      "crash_ng2", n = 4, numBuckets = 4)
    val base = contamMap(idx)
    val m0 = readManifest(idx.gramsDir)
    val before = new java.io.File(idx.gramsDir.stripPrefix("file:"))
      .listFiles.map(_.getName).filter(_.endsWith(".parquet")).toSet
    Contam.appendToNgramIndex(idx,
      bench.select((col("doc_id") + 100).as("doc_id"), col("text")),
      "doc_id", "text")
    writeManifest(idx.gramsDir, m0)
    val dir = new java.io.File(idx.gramsDir.stripPrefix("file:"))
    val fresh = dir.listFiles.map(_.getName)
      .filter(n => n.endsWith(".parquet") && !before(n))
    assert(fresh.nonEmpty)
    assert(new java.io.File(dir, fresh.head).delete())
    val reopened = Contam.readNgramIndex(spark, path, "crash_ng2")
    assert(contamMap(reopened) == base)
    // repair removed every other torn file as well
    val after = dir.listFiles.map(_.getName)
      .filter(_.endsWith(".parquet")).toSet
    assert(after == before)
  }

  // ----------------------------------------------------------- writer lock

  test("a second concurrent compaction raises; stale leases expire") {
    val path = tmp()
    val idx = Contam.writeNgramIndex(bench, "doc_id", "text", path,
      "crash_lock", n = 4, numBuckets = 4)
    val lock = new java.io.File(path, "_writer_lock")
    assert(lock.createNewFile(), "simulated concurrent writer")
    val e = intercept[IllegalStateException] {
      Contam.compactNgramIndex(spark, idx)
    }
    assert(e.getMessage.contains("single-writer"))
    // a crashed holder's lease expires by age and is broken
    assert(lock.setLastModified(
      System.currentTimeMillis() - 2L * 60 * 60 * 1000))
    val c1 = Contam.compactNgramIndex(spark, idx)
    assert(c1.gen > idx.gen)
    assert(!lock.exists, "the lease is released after the rewrite")
    // and the lease is reusable: a later compaction acquires it again
    val c2 = Contam.compactNgramIndex(spark, c1)
    assert(c2.gen > c1.gen)
    assert(contamMap(c2) == contamMap(idx))
  }
}
