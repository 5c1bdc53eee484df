package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Sparse keyword retrieval over a document corpus — the query-side
  * complement to the corpus-side text operators (TF-IDF q71 ranks terms
  * per source; these rank DOCS per keyword query).
  *
  * Shared plan shape (the 100-TB posture): ONE token-stream scan; the
  * broadcast query-term set prunes the stream BEFORE the (term, doc)
  * partial aggregate, so the aggregate is candidate-sized (docs matching
  * at least one query term), never vocabulary- or corpus-sized; document
  * lengths ride the same scan; corpus-level stats (N, avgdl) are a 1-row
  * broadcast. Scores round to 6 before ranking — ln() differs across
  * engines in the last ulp (q71 stance).
  *
  * Reference: Robertson & Zaragoza, "The Probabilistic Relevance
  * Framework: BM25 and Beyond" (2009); IDF is Lucene's positive variant
  * ln(1 + (N - df + 0.5)/(df + 0.5)).
  */
object Retrieval {

  /** Per-(query, candidate-doc) BM25 scores.
    *
    * Convenience wrapper: derives [[docTermFreq]] and [[corpusStats]]
    * itself. The dtf subtree is referenced twice (the per-term df
    * aggregate and the scoring join), so an unpersisted call re-scans the
    * token stream; callers fusing multiple scorers — or running on a
    * large corpus — should compute `docTermFreq(...).persist()` +
    * `corpusStats(...).persist()` once and use [[bm25ScoresOf]] /
    * [[tfidfScoresOf]] (the q91 shape).
    *
    * @param terms (query_id, term) — one row per query keyword; must be
    *              small enough to broadcast (it is the user's query set)
    * @return (query_id, doc_id, score, n_terms_hit) — score is the
    *         round-6 sum of round-6 per-term BM25 contributions
    */
  def bm25Scores(docs: DataFrame, docIdCol: String, textCol: String,
      terms: DataFrame, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25ScoresOf(docTermFreq(docs, docIdCol, textCol, terms),
      corpusStats(docs, textCol), terms, k1, b)

  /** BM25 from a precomputed candidate [[docTermFreq]] frame and a 1-row
    * [[corpusStats]] frame — the shared-scan entry point. */
  def bm25ScoresOf(dtf: DataFrame, stats: DataFrame, terms: DataFrame,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val dfF = dtf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    dtf
      .join(broadcast(dfF), "term")
      .join(broadcast(terms), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("tscore",
        round(col("idf") * (col("tf") * lit(k1 + 1))
          / (col("tf")
            + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))),
          6))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("tscore")), 6).as("score"),
        count(lit(1)).as("n_terms_hit"))
  }

  /** Per-(query, candidate-doc) TF-IDF scores (the classic
    * sum-of-tf-times-log-idf, no length normalization) — a deliberately
    * DIFFERENT ranker from [[bm25Scores]] over the SAME candidate set, so
    * the two can be rank-fused. Same scan/broadcast shape; same
    * persist-before-fusing guidance as [[bm25Scores]]. */
  def tfidfScores(docs: DataFrame, docIdCol: String, textCol: String,
      terms: DataFrame): DataFrame =
    tfidfScoresOf(docTermFreq(docs, docIdCol, textCol, terms),
      corpusStats(docs, textCol), terms)

  /** TF-IDF from precomputed [[docTermFreq]] + [[corpusStats]] frames
    * (only `n_docs` is read; `avgdl` rides along so one stats frame
    * serves both scorers). */
  def tfidfScoresOf(dtf: DataFrame, stats: DataFrame,
      terms: DataFrame): DataFrame = {
    val dfF = dtf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    dtf
      .join(broadcast(dfF), "term")
      .join(broadcast(terms), "term")
      .crossJoin(broadcast(stats.select("n_docs")))
      .withColumn("tscore",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("tscore")), 6).as("score"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    * rankings over the same (query_id, doc_id) candidates:
    * rrf = 1/(c + rank_a) + 1/(c + rank_b). Ranks are integers, so the
    * two-term sum is commutative-exact and the fused score is portable
    * across engines before any rounding (rounded to 6 anyway for the
    * grading canon). Both inputs must carry (query_id, doc_id, score);
    * ranks are dense per query by (score desc, doc_id asc). */
  def rrfFuse(a: DataFrame, b: DataFrame, c: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(df: DataFrame, rankCol: String) = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id").asc)
      df.select(col("query_id"), col("doc_id"),
        row_number().over(w).as(rankCol))
    }
    ranked(a, "rank_a").join(ranked(b, "rank_b"), Seq("query_id", "doc_id"))
      .withColumn("rrf",
        round(lit(1.0) / (lit(c) + col("rank_a"))
          + lit(1.0) / (lit(c) + col("rank_b")), 6))
  }

  /** Corpus-level stats both scorers need, from ONE scan:
    * (n_docs, avgdl) as a single broadcastable row. */
  def corpusStats(docs: DataFrame, textCol: String): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      avg(Text.tokenCount(col(textCol))).as("avgdl"))

  /** One token-stream scan shared by both scorers: candidate (term,
    * doc, tf, dl) rows — the broadcast term set prunes before the
    * aggregate, dl rides along from the same scan. */
  def docTermFreq(docs: DataFrame, docIdCol: String,
      textCol: String, terms: DataFrame): DataFrame =
    docs
      .select(col(docIdCol).as("doc_id"), Text.tokens(col(textCol)).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("double").as("dl"),
        explode(col("tk")).as("term"))
      .join(broadcast(terms.select("term").distinct()), "term")
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))

  /** Boolean-AND relevance: the docs containing EVERY term of each query
    * — the classic graded-retrieval ground truth when no human labels
    * exist. Built from the same [[docTermFreq]] frame the rankers score,
    * so the token stream is scanned once across ranking AND truth. */
  def conjunctiveTruth(dtf: DataFrame, queries: DataFrame): DataFrame = {
    val qn = queries.groupBy(col("query_id"))
      .agg(countDistinct(col("term")).as("__qn"))
    dtf.join(broadcast(queries.select("query_id", "term").distinct()),
        "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(countDistinct(col("term")).as("__nt"))
      .join(broadcast(qn), "query_id")
      .filter(col("__nt") === col("__qn"))
      .select(col("query_id"), col("doc_id"))
  }

  /** Exact phrase search via a positional inverted index — the algorithm
    * a search engine runs on its positions file (Manning et al., IR 2008
    * §2.4.2, public): tokenize docs WITH positions, join the posting
    * stream against the (term, offset) rows of each phrase, shift every
    * hit to its implied phrase START (pos - offset), and a start having
    * ALL the phrase's offsets present is a match. Overlapping matches
    * count ("a a a" contains "a a" twice); repeated phrase terms work
    * because (pos, offset) hit pairs are distinct.
    *
    * Returns (phrase_id, doc_id, n_matches), matched docs only.
    *
    * Scale posture: ONE posting-stream shuffle on term (the join), one
    * partial agg on (phrase, doc, start), one on (phrase, doc); the
    * phrase table is query-sized and broadcasts. No per-phrase text
    * re-scan — the doc stream is tokenized exactly once for any number
    * of phrases. */
  def phraseSearch(docs: DataFrame, docIdCol: String, textCol: String,
      phrases: DataFrame): DataFrame = {
    val pterms = phrases.select(col("phrase_id"),
      posexplode(Text.tokens(col("phrase"))))
      .withColumnRenamed("pos", "off").withColumnRenamed("col", "term")
    val plen = pterms.groupBy(col("phrase_id"))
      .agg(count(lit(1)).as("__plen"))
    val postings = docs
      .select(col(docIdCol).as("doc_id"),
        posexplode(Text.tokens(col(textCol))))
      .withColumnRenamed("col", "term")
    postings.join(broadcast(pterms), "term")
      .select(col("phrase_id"), col("doc_id"),
        (col("pos") - col("off")).as("start"))
      .filter(col("start") >= 0)
      .groupBy(col("phrase_id"), col("doc_id"), col("start"))
      .agg(count(lit(1)).as("__nhit"))
      .join(broadcast(plen), "phrase_id")
      .filter(col("__nhit") === col("__plen"))
      .groupBy(col("phrase_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Per-query ranking-quality metrics of `ranked(query_id, doc_id,
    * rank)` against a relevance set `truth(query_id, doc_id)`:
    * (query_id, n_relevant, hits_at_k, recall_at_k, rr_at_k) — rr is the
    * reciprocal rank of the first relevant hit within the top k (0 when
    * none); macro-MRR/mean-recall are one tiny agg away. Two partial-agg
    * shuffles on (query, doc)-sized frames; queries with an empty
    * relevance set report zeros rather than dividing by zero. */
  def evalRanking(ranked: DataFrame, truth: DataFrame,
      k: Int = 10): DataFrame = {
    val hits = ranked.filter(col("rank") <= k)
      .join(truth, Seq("query_id", "doc_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("hits_at_k"),
        min(col("rank")).as("__first"))
    truth.groupBy(col("query_id")).agg(count(lit(1)).as("n_relevant"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_relevant"),
        coalesce(col("hits_at_k"), lit(0L)).as("hits_at_k"),
        when(col("n_relevant") > 0,
          round(coalesce(col("hits_at_k"), lit(0L)).cast("double")
            / col("n_relevant"), 6)).otherwise(0.0).as("recall_at_k"),
        coalesce(round(lit(1.0) / col("__first"), 6), lit(0.0))
          .as("rr_at_k"))
  }
}
