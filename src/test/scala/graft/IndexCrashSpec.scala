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

  // manifest snapshot/restore through IndexGen (version-aware since the
  // r15 `_manifest.N` scheme; goes through the Hadoop fs because the
  // local fs keeps CRC sidecars — a raw java.nio write would fail the
  // checksum on read)
  private def readManifest(dir: String): (String, String) =
    IndexGen.manifestSnapshot(spark, dir)

  private def writeManifest(dir: String, snap: (String, String)): Unit =
    IndexGen.restoreManifest(spark, dir, snap)

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

  test("a second concurrent APPEND raises instead of cross-committing") {
    // commitManifest snapshots the directory's CURRENT file set, so two
    // concurrent appends would have each other's half-written files
    // legitimized by whichever commit lands last — since r15 every batch
    // append holds the writer lease and the second one fails loudly
    val path = tmp()
    val idx = Dedup.writeLshIndex(corpus, "doc_id", "text", path,
      "crash_applock", shingleSize = 3, numHashes = 64, bands = 16,
      numBuckets = 4)
    val lock = new java.io.File(path, "_writer_lock")
    assert(lock.createNewFile(), "simulated concurrent writer")
    val e = intercept[IllegalStateException] {
      Dedup.appendToLshIndex(idx, variantBatch(1000), "doc_id", "text")
    }
    assert(e.getMessage.contains("single-writer"))
    // no partial state: the locked-out append wrote nothing
    val reopened = Dedup.readLshIndex(spark, path, "crash_applock")
    assert(!lshPairs(reopened, variantBatch(2000)).exists(p =>
      p._1 >= 1000 && p._1 < 2000))
    // released lock: the append goes through and is visible
    assert(lock.delete())
    Dedup.appendToLshIndex(reopened, variantBatch(1000), "doc_id", "text")
    assert(!lock.exists, "the append lease is released")
    assert(lshPairs(reopened, variantBatch(2000)).exists(p =>
      p._1 >= 1000 && p._1 < 2000))
  }

  test("ngram: the same append lease guards the single-table family") {
    val path = tmp()
    val idx = Contam.writeNgramIndex(bench, "doc_id", "text", path,
      "crash_applock2", n = 4, numBuckets = 4)
    val lock = new java.io.File(path, "_writer_lock")
    assert(lock.createNewFile())
    intercept[IllegalStateException] {
      Contam.appendToNgramIndex(idx,
        bench.select((col("doc_id") + 100).as("doc_id"), col("text")),
        "doc_id", "text")
    }
    assert(lock.delete())
  }

  // ----------------------------------------------------- manifest versions

  private def manifestNames(dir: String): Seq[String] =
    new java.io.File(dir.stripPrefix("file:")).listFiles.map(_.getName)
      .filter(n => n == "_manifest" || n.matches("_manifest\\.\\d+"))
      .toSeq.sorted

  test("versioned manifests: no crash point leaves repair disabled") {
    // the r14 single-name commit deleted the old manifest BEFORE renaming
    // the new one in — a crash between the two silently disabled repair.
    // The versioned commit never deletes on the read path: a fresh name
    // is renamed in first, superseded versions swept after.
    val path = tmp()
    val idx = Contam.writeNgramIndex(bench, "doc_id", "text", path,
      "crash_mver", n = 4, numBuckets = 4)
    assert(manifestNames(idx.gramsDir).size == 1,
      "exactly one committed version after the initial write")
    Contam.appendToNgramIndex(idx,
      bench.select((col("doc_id") + 100).as("doc_id"), col("text")),
      "doc_id", "text")
    assert(manifestNames(idx.gramsDir).size == 1,
      "the commit sweeps superseded versions after the rename")
    val appended = contamMap(Contam.readNgramIndex(spark, path,
      "crash_mver"))

    // crash between the tmp write and the rename of a LATER commit:
    // stray _manifest.tmp + a torn data file; the surviving committed
    // version still drives repair
    val dir = new java.io.File(idx.gramsDir.stripPrefix("file:"))
    val fw = new java.io.FileWriter(new java.io.File(dir, "_manifest.tmp"))
    try fw.write("part-torn.parquet") finally fw.close()
    val torn = new java.io.FileWriter(
      new java.io.File(dir, "part-torn.parquet"))
    try torn.write("not parquet") finally torn.close()
    val reopened = Contam.readNgramIndex(spark, path, "crash_mver")
    assert(!new java.io.File(dir, "part-torn.parquet").exists,
      "repair must use the surviving committed version")
    assert(contamMap(reopened) == appended)

    // legacy fixed-name `_manifest` (a pre-versioning index) still reads
    // as version 0, and the next commit migrates it to a versioned name
    val cur = manifestNames(idx.gramsDir)
      .filter(_.matches("_manifest\\.\\d+"))
    assert(cur.nonEmpty)
    val legacySnap = IndexGen.manifestSnapshot(spark, idx.gramsDir)
    IndexGen.restoreManifest(spark, idx.gramsDir,
      ("_manifest", legacySnap._2))
    assert(contamMap(Contam.readNgramIndex(spark, path, "crash_mver"))
      == appended, "legacy manifests must keep driving repair")
    IndexGen.commitManifest(spark, idx.gramsDir)
    val after = manifestNames(idx.gramsDir)
    assert(after.size == 1 && after.head.matches("_manifest\\.\\d+"),
      s"the next commit must migrate off the legacy name, got $after")
  }

  test("LSH: compaction dedupes the retried append's ghost band rows") {
    // bands-committed/posts-torn crash + retry: the retried BANDS land a
    // second time (documented in appendToLshIndex); probes stay correct
    // but the duplication must not survive compaction
    val path = tmp()
    val idx = Dedup.writeLshIndex(corpus, "doc_id", "text", path,
      "crash_bdup", shingleSize = 3, numHashes = 64, bands = 16,
      numBuckets = 4)
    val batchA = variantBatch(1000)
    val batchB = variantBatch(2000)
    val mPosts = readManifest(idx.postsDir)
    Dedup.appendToLshIndex(idx, batchA, "doc_id", "text")
    writeManifest(idx.postsDir, mPosts) // crash between the two commits
    val reopened = Dedup.readLshIndex(spark, path, "crash_bdup")
    Dedup.appendToLshIndex(reopened, batchA, "doc_id", "text") // retry
    val bands = spark.table(reopened.bandsTable)
    assert(bands.count() > bands.distinct().count(),
      "the retry duplicates the batch's committed band rows (the honest " +
        "pre-compaction state)")
    val compacted = Dedup.compactLshIndex(spark, reopened)
    val b2 = spark.table(compacted.bandsTable)
    assert(b2.count() == b2.distinct().count(),
      "compaction must fold the duplicated band rows")
    // and the compacted index equals a scratch build + one clean append
    val refPath = tmp()
    val ref = Dedup.writeLshIndex(corpus, "doc_id", "text", refPath,
      "crash_bdup_ref", shingleSize = 3, numHashes = 64, bands = 16,
      numBuckets = 4)
    Dedup.appendToLshIndex(ref, batchA, "doc_id", "text")
    assert(b2.count() == spark.table(ref.bandsTable).count())
    assert(lshPairs(compacted, batchB) == lshPairs(ref, batchB))
  }

  // ------------------------------------------------------ stale-lock break

  private def writeLock(dir: String, token: String): Unit = {
    val f = IndexGen.fs(spark, dir)
    val out = f.create(new org.apache.hadoop.fs.Path(dir, "_writer_lock"),
      true)
    try out.write(token.getBytes("UTF-8")) finally out.close()
  }

  private def lockToken(dir: String): Option[String] =
    IndexGen.readLockToken(IndexGen.fs(spark, dir),
      new org.apache.hadoop.fs.Path(dir, "_writer_lock"))

  test("breakStaleLock is token-identified: a same-mtime re-created lock " +
      "is never stolen") {
    val dir = tmp()
    val f = IndexGen.fs(spark, dir)
    val lock = new org.apache.hadoop.fs.Path(dir, "_writer_lock")
    // 1) genuine stale lease: observed TOKEN matches -> broken
    writeLock(dir, "T0-crashed-holder")
    IndexGen.breakStaleLock(f, lock, "T0-crashed-holder")
    assert(!f.exists(lock), "a genuinely stale lease must be broken")
    // 2) the r15 coarse-mtime hazard: between this breaker's age check
    // and its break, another breaker broke the same stale lease and
    // re-acquired — possibly within the SAME filesystem timestamp. The
    // fresh lock carries a different token, so the break must not touch
    // it no matter what the mtimes say.
    writeLock(dir, "T1-live-winner")
    val stale = System.currentTimeMillis() - 2L * 60 * 60 * 1000
    assert(new java.io.File(dir, "_writer_lock").setLastModified(stale))
    IndexGen.breakStaleLock(f, lock, "T0-crashed-holder")
    assert(lockToken(dir).contains("T1-live-winner"),
      "a re-created lock is LIVE regardless of mtime — keep it")
    // no stray broken-rename leftovers in either case
    val leftovers = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.startsWith("_writer_lock.broken"))
    assert(leftovers.isEmpty, s"leftover break files: ${leftovers.toSeq}")
    f.delete(lock, false)
  }

  test("breakStaleLock race seams: a lock swapped after the token read is " +
      "restored; with a third writer the breaker raises and the winner's " +
      "lock survives") {
    val dir = tmp()
    val f = IndexGen.fs(spark, dir)
    val lock = new org.apache.hadoop.fs.Path(dir, "_writer_lock")
    // (a) swap after the read, rename-back SUCCEEDS: the stolen fresh
    // lock is restored for its holder and nothing is broken
    writeLock(dir, "T0-stale")
    IndexGen.breakStaleLock(f, lock, "T0-stale",
      raceAfterRead = () => writeLock(dir, "T1-fresh-holder"))
    assert(lockToken(dir).contains("T1-fresh-holder"),
      "the stolen fresh lock must be renamed back for its live holder")
    f.delete(lock, false)

    // (b) the TRIPLE race: stale break in flight, the lock re-created by
    // a fresh holder after the token read (so the rename steals a LIVE
    // lock), and a THIRD writer locking before the rename-back — the
    // breaker must RAISE naming the stranded lease (r15 deleted it,
    // leaving the fresh holder silently lockless and its release
    // deleting the third writer's lock), and the third writer's lock
    // must survive untouched.
    writeLock(dir, "T0-stale")
    val e = intercept[IllegalStateException] {
      IndexGen.breakStaleLock(f, lock, "T0-stale",
        raceAfterRead = () => writeLock(dir, "T1-fresh-holder"),
        raceAfterRename = () => writeLock(dir, "T2-third-writer"))
    }
    assert(e.getMessage.contains("stranded"))
    assert(lockToken(dir).contains("T2-third-writer"),
      "the third writer's (winner's) lock must remain intact")
    val stranded = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.startsWith("_writer_lock.broken"))
    assert(stranded.size == 1,
      "the stolen lease must be preserved for manual resolution, not deleted")
  }

  test("release verifies ownership: a stolen lease raises loudly and " +
      "never deletes the next holder's lock") {
    val dir = tmp()
    // the holder acquires normally; mid-body a misbehaving breaker
    // deletes its lease and a different writer re-locks — release must
    // throw (this holder's writes raced an unknown writer) and leave the
    // new holder's lock in place, not silently delete it (r15's
    // unverified finally-delete)
    val e = intercept[IllegalStateException] {
      IndexGen.withWriterLock(spark, dir) {
        writeLock(dir, "T9-next-holder") // overwrite = steal + re-lock
      }
    }
    assert(e.getMessage.contains("lease was broken mid-run"))
    assert(lockToken(dir).contains("T9-next-holder"),
      "the next holder's lock must survive the verified release")
  }

  test("release failure does not mask the body's own exception") {
    val dir = tmp()
    val e = intercept[RuntimeException] {
      IndexGen.withWriterLock(spark, dir) {
        writeLock(dir, "T9-next-holder")
        throw new RuntimeException("body failed first")
      }
    }
    assert(e.getMessage == "body failed first")
    assert(e.getSuppressed.exists(
      _.getMessage.contains("lease was broken mid-run")),
      "the release failure must ride along as a suppressed exception")
    assert(lockToken(dir).contains("T9-next-holder"))
  }

  test("heartbeat keeps a legitimately long-running lease live past " +
      "staleMs") {
    val dir = tmp()
    val staleMs = 600L
    IndexGen.withWriterLock(spark, dir, staleMs = staleMs) {
      // body runs 3x the stale bar: without the heartbeat a contender
      // would see an expired lease, break it, and acquire concurrently
      Thread.sleep(3 * staleMs)
      val e = intercept[IllegalStateException] {
        IndexGen.withWriterLock(spark, dir, staleMs = staleMs) { fail() }
      }
      assert(e.getMessage.contains("another writer holds"),
        s"the heartbeat must keep the lease younger than $staleMs ms; " +
          s"got: ${e.getMessage}")
    }
    assert(lockToken(dir).isEmpty, "released after the body")
  }

  // ---------------------------------------------------- tagged exactly-once

  test("LSH: a TAGGED replay of a fully-committed append is exactly-once " +
      "(the commit-to-marker crash window)") {
    // the streaming absorb writes its _absorbed_ marker AFTER the append;
    // a crash in between replays a batch whose manifests already
    // committed. Untagged, the whole batch lands twice — and duplicated
    // POSTINGS are not benign: jaccardRescore counts rows, so every pair
    // touching the batch doubles one side of its intersection/size
    // counts. The batch tag commits atomically with each manifest and
    // the replay appends nothing.
    val path = tmp()
    val idx = Dedup.writeLshIndex(corpus, "doc_id", "text", path,
      "crash_tag", shingleSize = 3, numHashes = 64, bands = 16,
      numBuckets = 4)
    val batchA = variantBatch(1000)
    val batchB = variantBatch(2000)
    Dedup.appendToLshIndex(idx, batchA, "doc_id", "text",
      batchTag = Some("absorb_7"))
    val bands1 = spark.table(idx.bandsTable).count()
    val posts1 = spark.table(idx.postsTable).count()
    val pairs1 = lshPairs(idx, batchB)
    assert(pairs1.exists(p => p._1 >= 1000 && p._1 < 2000))
    // the replay: same batch, same tag — nothing may land
    Dedup.appendToLshIndex(idx, batchA, "doc_id", "text",
      batchTag = Some("absorb_7"))
    assert(spark.table(idx.bandsTable).count() == bands1,
      "replayed tagged append must not duplicate band rows")
    assert(spark.table(idx.postsTable).count() == posts1,
      "replayed tagged append must not duplicate posting rows")
    assert(lshPairs(idx, batchB) == pairs1,
      "probe results (jaccard values included) must be unchanged")
    // a DIFFERENT tag is a new batch and does append
    Dedup.appendToLshIndex(idx, variantBatch(3000), "doc_id", "text",
      batchTag = Some("absorb_8"))
    assert(spark.table(idx.postsTable).count() > posts1)
  }

  test("LSH: a TAGGED retry of a bands-committed/posts-torn crash lands " +
      "the batch exactly once — no ghost band rows at all") {
    val path = tmp()
    val idx = Dedup.writeLshIndex(corpus, "doc_id", "text", path,
      "crash_tag2", shingleSize = 3, numHashes = 64, bands = 16,
      numBuckets = 4)
    val batchA = variantBatch(1000)
    val batchB = variantBatch(2000)
    val mPosts = readManifest(idx.postsDir)
    Dedup.appendToLshIndex(idx, batchA, "doc_id", "text",
      batchTag = Some("absorb_3"))
    writeManifest(idx.postsDir, mPosts) // crash between the two commits
    val reopened = Dedup.readLshIndex(spark, path, "crash_tag2")
    Dedup.appendToLshIndex(reopened, batchA, "doc_id", "text",
      batchTag = Some("absorb_3")) // the replay
    // equal to a scratch build + ONE clean append — bands included
    // (the untagged path duplicates them until compaction)
    val refPath = tmp()
    val ref = Dedup.writeLshIndex(corpus, "doc_id", "text", refPath,
      "crash_tag2_ref", shingleSize = 3, numHashes = 64, bands = 16,
      numBuckets = 4)
    Dedup.appendToLshIndex(ref, batchA, "doc_id", "text")
    val bands = spark.table(reopened.bandsTable)
    assert(bands.count() == spark.table(ref.bandsTable).count(),
      "the tagged retry must skip the committed bands directory")
    assert(bands.count() == bands.distinct().count(), "no duplicates")
    assert(lshPairs(reopened, batchB) == lshPairs(ref, batchB))
  }

  test("ANN: a TAGGED replay appends nothing — no neighbor holds two " +
      "top-k ranks") {
    val path = tmp()
    val idx = Similarity.writeAnnIndex(vecs, "vec_id", "vec", path,
      "crash_tagann", m = 4, k = 8, nlist = 8, numBuckets = 4)
    val batch = vecs.filter(col("vec_id") < 20)
      .select((col("vec_id") + 500).as("vec_id"), col("vec"))
    Similarity.appendToAnnIndex(idx, batch, "vec_id", "vec",
      batchTag = Some("absorb_1"))
    val lists1 = spark.table(idx.listsTable).count()
    val topk1 = annTopk(idx)
    Similarity.appendToAnnIndex(idx, batch, "vec_id", "vec",
      batchTag = Some("absorb_1"))
    assert(spark.table(idx.listsTable).count() == lists1,
      "replayed tagged append must not duplicate list rows")
    assert(annTopk(idx) == topk1)
  }

  test("ngram: a TAGGED replay appends nothing (probe was already immune " +
      "via countDistinct; the tag bounds physical size)") {
    val path = tmp()
    val idx = Contam.writeNgramIndex(bench, "doc_id", "text", path,
      "crash_tagng", n = 4, numBuckets = 4)
    val g0 = spark.table(idx.gramsTable).count()
    val extra = bench.select((col("doc_id") + 100).as("doc_id"),
      col("text"))
    Contam.appendToNgramIndex(idx, extra, "doc_id", "text",
      batchTag = Some("absorb_1"))
    val grams1 = spark.table(idx.gramsTable).count()
    val extraGrams = grams1 - g0
    val probe1 = contamMap(idx)
    // double-append UNTAGGED first to prove the probe immunity claim…
    Contam.appendToNgramIndex(idx, extra, "doc_id", "text")
    assert(spark.table(idx.gramsTable).count() == grams1 + extraGrams,
      "sanity: an untagged re-append duplicates the batch's rows")
    assert(contamMap(idx) == probe1,
      "countDistinct makes the ngram probe immune to duplicated rows")
    // …then a tagged replay on a fresh index appends nothing
    val path2 = tmp()
    val idx2 = Contam.writeNgramIndex(bench, "doc_id", "text", path2,
      "crash_tagng2", n = 4, numBuckets = 4)
    Contam.appendToNgramIndex(idx2, extra, "doc_id", "text",
      batchTag = Some("absorb_1"))
    val g2 = spark.table(idx2.gramsTable).count()
    Contam.appendToNgramIndex(idx2, extra, "doc_id", "text",
      batchTag = Some("absorb_1"))
    assert(spark.table(idx2.gramsTable).count() == g2)
  }

  test("absorbOnce closes the commit-to-marker window end-to-end") {
    // simulate the exact crash: the append committed (tagged) but the
    // process died before the _absorbed_ marker landed; the streaming
    // replay re-enters absorbOnce, which must recognize the committed
    // tag, append nothing, and write the marker
    val path = tmp()
    val idx = Dedup.writeLshIndex(corpus, "doc_id", "text", path,
      "crash_absorb", shingleSize = 3, numHashes = 64, bands = 16,
      numBuckets = 4)
    val batchA = variantBatch(1000)
    Dedup.appendToLshIndex(idx, batchA, "doc_id", "text",
      batchTag = Some("absorb_0")) // absorbOnce's tag for batchId 0
    val posts1 = spark.table(idx.postsTable).count()
    assert(!new java.io.File(path, "_absorbed_0").exists)
    val ran = graft.streaming.DocStream.absorbOnce(idx, batchA, 0L)
    assert(ran, "the replay runs the (no-op) append and writes the marker")
    assert(new java.io.File(path, "_absorbed_0").exists)
    assert(spark.table(idx.postsTable).count() == posts1,
      "the replayed absorb must not re-append the committed batch")
    // and the NEXT replay short-circuits on the marker
    assert(!graft.streaming.DocStream.absorbOnce(idx, batchA, 0L))
  }

  test("retract holds the lease: a tombstone cannot race a compaction") {
    // the lost-update race: a tombstone appended between a compaction's
    // tombstones read and its clearTombstones is cleared WITHOUT being
    // folded into the files — the retracted ids resurface. All three
    // retract entry points are leased; a concurrent writer makes them
    // raise with nothing written.
    val path = tmp()
    val idx = Contam.writeNgramIndex(bench, "doc_id", "text", path,
      "crash_retract", n = 4, numBuckets = 4)
    val lock = new java.io.File(path, "_writer_lock")
    assert(lock.createNewFile(), "simulated concurrent compaction")
    intercept[IllegalStateException] {
      Contam.retractFromNgramIndex(idx,
        bench.select(col("doc_id")), "doc_id")
    }
    assert(!new java.io.File(path, "tombstones").exists,
      "the locked-out retract must not have appended tombstones")
    assert(lock.delete())
    // and with the lease free the retract lands and probes hide the ids
    Contam.retractFromNgramIndex(idx, bench.select(col("doc_id")),
      "doc_id")
    assert(!lock.exists, "the retract lease is released")
    assert(contamMap(idx).values.forall { case (_, hits, srcs) =>
      hits == 0L && srcs == 0L },
      "tombstoned benchmark docs must stop contaminating probes")
  }
}
