package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** Unit net for the sparse-retrieval family (q88/q91's operators): BM25
  * against hand-computed scores on a 3-doc corpus, TF-IDF likewise, RRF
  * tie-breaking / c-parameter / inner-join semantics, and equivalence of
  * the convenience entry points with the shared-scan *Of variants.
  *
  * Hand-computed fixture (k1=1.2, b=0.75, Lucene positive IDF):
  *   doc1 "apple banana apple" (dl=3), doc2 "apple cherry" (dl=2),
  *   doc3 "durian durian kiwi" (dl=3); N=3, avgdl=8/3.
  *   query 1 = {apple, banana}: df(apple)=2, df(banana)=1.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "durian durian kiwi")).toDF("doc_id", "text")

  private def terms = Seq((1L, "apple"), (1L, "banana")).toDF("query_id", "term")

  test("bm25Scores matches hand-computed scores on the 3-doc corpus") {
    val out = Retrieval.bm25Scores(corpus, "doc_id", "text", terms)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    // doc1: apple idf=ln(1.6), tf=2, denom=2+1.2*(0.25+0.75*3/(8/3))=3.3125
    //   -> round(0.47000362924573563*4.4/3.3125, 6) = 0.624307
    //   banana idf=ln(8/3), tf=1, denom=2.3125 -> 0.933113; sum=1.55742
    // doc2: apple tf=1, denom=1+1.2*(0.25+0.75*2/(8/3))=1.975 -> 0.523548
    // doc3: no query term -> absent (candidate pruning, not a zero row)
    assert(out == Seq((1L, 1.55742, 2L), (2L, 0.523548, 1L)))
  }

  test("bm25 n_terms_hit counts distinct matched terms, not occurrences") {
    // doc1 has apple twice but n_terms_hit=2 comes from {apple, banana}
    val out = Retrieval.bm25Scores(corpus, "doc_id", "text", terms)
      .filter(col("doc_id") === 1L).select("n_terms_hit").as[Long].head()
    assert(out == 2L)
  }

  test("empty term set yields an empty result, not a failure") {
    val none = Seq.empty[(Long, String)].toDF("query_id", "term")
    assert(Retrieval.bm25Scores(corpus, "doc_id", "text", none).count() == 0L)
    assert(Retrieval.tfidfScores(corpus, "doc_id", "text", none).count() == 0L)
  }

  test("tfidfScores matches hand-computed tf*ln(N/df)") {
    val out = Retrieval.tfidfScores(corpus, "doc_id", "text", terms)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    // doc1: 2*ln(3/2)=0.810930 + 1*ln(3/1)=1.098612 -> 1.909542
    // doc2: 1*ln(3/2) -> 0.405465
    assert(out == Seq((1L, 1.909542), (2L, 0.405465)))
  }

  test("rrfFuse breaks score ties by doc_id asc and fuses 1/(c+r) terms") {
    val a = Seq((1L, 10L, 5.0), (1L, 20L, 5.0), (1L, 30L, 1.0))
      .toDF("query_id", "doc_id", "score")
    val b = Seq((1L, 10L, 9.0), (1L, 20L, 3.0))
      .toDF("query_id", "doc_id", "score")
    val out = Retrieval.rrfFuse(a, b, c = 60).orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
      .toSeq
    // a ties 10/20 at 5.0 -> ranks 1,2 by doc_id asc; doc 30 rank 3
    // b ranks: 10->1, 20->2; doc 30 one-sided -> dropped by the inner join
    // rrf(10)=1/61+1/61=0.032787, rrf(20)=1/62+1/62=0.032258
    assert(out == Seq((10L, 1, 1, 0.032787), (20L, 2, 2, 0.032258)))
  }

  test("rrfFuse honors the c parameter") {
    val a = Seq((1L, 10L, 2.0), (1L, 20L, 1.0)).toDF("query_id", "doc_id", "score")
    val b = Seq((1L, 10L, 2.0), (1L, 20L, 1.0)).toDF("query_id", "doc_id", "score")
    val out = Retrieval.rrfFuse(a, b, c = 0).orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getDouble(4))).toSeq
    // c=0: doc10 rank 1 both sides -> 1/1+1/1=2.0; doc20 -> 1/2+1/2=1.0
    assert(out == Seq((10L, 2.0), (20L, 1.0)))
  }

  test("shared-scan *Of variants equal the convenience entry points") {
    val dtf = Retrieval.docTermFreq(corpus, "doc_id", "text", terms)
    val stats = Retrieval.corpusStats(corpus, "text")
    val bmOf = Retrieval.bm25ScoresOf(dtf, stats, terms)
      .orderBy("doc_id").collect().toSeq
    val bm = Retrieval.bm25Scores(corpus, "doc_id", "text", terms)
      .orderBy("doc_id").collect().toSeq
    assert(bmOf == bm)
    val tiOf = Retrieval.tfidfScoresOf(dtf, stats, terms)
      .orderBy("doc_id").collect().toSeq
    val ti = Retrieval.tfidfScores(corpus, "doc_id", "text", terms)
      .orderBy("doc_id").collect().toSeq
    assert(tiOf == ti)
  }

  test("conjunctiveTruth: docs containing EVERY query term") {
    val corpus = Seq((1L, "a b c"), (2L, "a c"), (3L, "b"))
      .toDF("doc_id", "text")
    val q = Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("query_id", "term")
    val dtf = Retrieval.docTermFreq(corpus, "doc_id", "text", q)
    val truth = Retrieval.conjunctiveTruth(dtf, q)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth == Set((1L, 1L), (2L, 1L), (2L, 2L)))
  }

  test("evalRanking: hand-computed recall@k and reciprocal rank") {
    val ranked = Seq((1L, 5L, 1L), (1L, 2L, 2L), (1L, 9L, 3L),
      (1L, 3L, 4L), (2L, 7L, 1L)).toDF("query_id", "doc_id", "rank")
    val truth = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 8L))
      .toDF("query_id", "doc_id")
    val out = Retrieval.evalRanking(ranked, truth, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // q1: relevant {1,2,3}; top-3 = {5,2,9} -> hit d2 at rank 2:
    // recall 1/3, rr 1/2. q2: relevant {8}, no hit -> zeros.
    assert(out(1L) == ((3L, 1L, 0.333333, 0.5)))
    assert(out(2L) == ((1L, 0L, 0.0, 0.0)))
  }

  test("phraseSearch: positional matches, overlaps, repeated terms") {
    val docs = Seq((1L, "a a a b"), (2L, "b a b"), (3L, "c"))
      .toDF("doc_id", "text")
    val phrases = Seq((10L, "a a"), (20L, "a b"), (30L, "b a b"),
      (40L, "c"), (50L, "a c")).toDF("phrase_id", "phrase")
    val out = Retrieval.phraseSearch(docs, "doc_id", "text", phrases)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      (10L, 1L) -> 2L,  // "a a" overlaps twice in "a a a"
      (20L, 1L) -> 1L,  // "a b" once in doc 1
      (20L, 2L) -> 1L,  // and once in doc 2
      (30L, 2L) -> 1L,  // repeated-term 3-gram exact
      (40L, 3L) -> 1L)) // single-token phrase
    // (50,"a c"): adjacency required — "a" and "c" never adjacent, no row
  }
}
