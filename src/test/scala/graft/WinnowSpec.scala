package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Winnow}

/** Winnowing fingerprints (q159) and template-collapse dedup (q160). */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val K = 5
  private val W = 4

  test("winnowing guarantee: shared substring >= w+k-1 shares a fingerprint") {
    // 12-char common substring inside otherwise-disjoint texts, at
    // different offsets — w+k-1 = 8, so >= 1 identical fingerprint is
    // guaranteed by the paper's coverage argument.
    val common = "zqxjkvbwpfyg"
    val docs = Seq(
      (1L, s"aaaa bbbb cccc $common dddd"),
      (2L, s"totally different preamble here $common"))
      .toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", K, W)
    val shared = Winnow.sharedFingerprintPairs(fps, "doc_id",
      minShared = 1, dfCap = 100)
    assert(shared.count() == 1L)
  }

  test("every full window contains a selected position (coverage)") {
    val text = "the quick brown fox jumps over the lazy dog again"
    val fps = Winnow.fingerprints(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", K, W)
      .select("pos").as[Long].collect().toSet
    val nGrams = text.length - K + 1
    for (i <- 1 to nGrams - W + 1)
      assert((i until i + W).exists(p => fps.contains(p.toLong)),
        s"window starting at $i has no selected fingerprint")
    // density: paper expects ~2/(w+1) of positions selected, far
    // fewer than all grams
    assert(fps.size < nGrams)
  }

  test("all-equal hashes select the rightmost of each window") {
    val text = "aaaaaaaaaa" // every 5-gram is "aaaaa"
    val out = Winnow.fingerprints(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", K, W)
      .select("pos").as[Long].collect().toSet
    val nGrams = text.length - K + 1 // 6
    assert(out == (W.toLong to nGrams.toLong).toSet)
  }

  test("xxhash64 production swap satisfies the same selection invariants") {
    // hashSql is the documented production swap for the md5-per-char
    // allocator (q159's adjudicated hot loop); the selection logic is
    // hash-agnostic, so the paper's invariants must hold verbatim under
    // xxhash64 (VERDICT r12 item 4)
    def fp(docs: org.apache.spark.sql.DataFrame) =
      Winnow.fingerprints(docs, "doc_id", "text", K, W,
        hashSql = "xxhash64")
    // (a) coverage: every full window contains a selected position
    val text = "the quick brown fox jumps over the lazy dog again"
    val sel = fp(Seq((1L, text)).toDF("doc_id", "text"))
      .select("pos").as[Long].collect().toSet
    val nGrams = text.length - K + 1
    for (i <- 1 to nGrams - W + 1)
      assert((i until i + W).exists(p => sel.contains(p.toLong)),
        s"xxhash64: window starting at $i has no selected fingerprint")
    assert(sel.size < nGrams)
    // (b) rightmost-min determinism: all-equal hashes select exactly the
    // rightmost position of each full window
    val eq = fp(Seq((1L, "aaaaaaaaaa")).toDF("doc_id", "text"))
      .select("pos").as[Long].collect().toSet
    assert(eq == (W.toLong to 6L).toSet)
    // (c) self-match / shared-substring guarantee through the pair join
    val common = "zqxjkvbwpfyg"
    val docs = Seq(
      (1L, s"aaaa bbbb cccc $common dddd"),
      (2L, s"totally different preamble here $common"))
      .toDF("doc_id", "text")
    val shared = Winnow.sharedFingerprintPairs(fp(docs), "doc_id",
      minShared = 1, dfCap = 100)
    assert(shared.count() == 1L)
    // (d) determinism across partitionings (a fixed-seed hash, not a
    // per-JVM-seeded one)
    val a = fp(docs).collect().map(_.toSeq.map(String.valueOf))
      .sortBy(_.mkString("|")).toSeq
    val b = fp(docs.repartition(3)).collect().map(_.toSeq.map(String.valueOf))
      .sortBy(_.mkString("|")).toSeq
    assert(a == b)
  }

  test("short text yields no fingerprints; dfCap drops hot grams") {
    assert(Winnow.fingerprints(Seq((1L, "abc")).toDF("doc_id", "text"),
      "doc_id", "text", K, W).count() == 0L)
    // 5 docs all containing the same hot substring: dfCap=4 kills the
    // bucket, so no pairs survive
    val docs = (1 to 5).map(i => (i.toLong, s"prefix$i zqxjkvbwpfyg"))
      .toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", K, W)
    val hot = Winnow.sharedFingerprintPairs(fps, "doc_id", 1, dfCap = 4)
    val ok = Winnow.sharedFingerprintPairs(fps, "doc_id", 1, dfCap = 5)
    assert(hot.count() == 0L && ok.count() >= 10L)
  }

  test("template collapse: digit-varied docs unify, exact dedup misses them") {
    val docs = Seq(
      (10L, "a", "Receipt #101 total 55 cents"),
      (11L, "b", "Receipt #202 total 7 cents"),
      (12L, "a", "Receipt #33 total 5512 cents"),
      (13L, "a", "completely organic text with no twin 1"),
      (14L, "a", "completely organic text with no twin 2"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.templateCollapse(docs, "doc_id", "text", "source")
      .select("n_docs", "n_sources", "exemplar_id", "template_head")
      .as[(Long, Long, Long, String)].collect()
    assert(out.length == 2)
    val receipt = out.find(_._1 == 3L).get
    assert(receipt._2 == 2L && receipt._3 == 10L
      && receipt._4 == "Receipt ## total # cents")
    // the organic pair differs only in its trailing digit -> same
    // template; raw texts are all distinct so exactText keeps all 5
    assert(out.find(_._3 == 13L).get._1 == 2L)
    assert(Dedup.exactText(docs, "text", "doc_id").count() == 5L)
  }
}
