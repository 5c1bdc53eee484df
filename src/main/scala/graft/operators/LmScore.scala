package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** N-gram language-model quality scoring — the CCNet recipe (Wenzek et al.
  * 2020, "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data", public): score each document by its per-token log-probability under
  * an n-gram LM and filter the worst tail. CCNet uses a KenLM 5-gram trained
  * on Wikipedia; this operator trains a BIGRAM model with add-alpha smoothing
  * on a reference corpus (by default the scored corpus itself — a
  * self-perplexity filter that flags documents whose token transitions are
  * atypical for the collection: gibberish, boilerplate soup, wrong-domain
  * text).
  *
  * Model: P(v | u) = (c(u,v) + alpha) / (c(u) + alpha * V), with V the
  * training vocabulary size; a document's score is the MEAN of
  * ln P(v | u) over its adjacent token pairs (mean-normalized, so long and
  * short documents are comparable — exp(-score) is the perplexity).
  * Unseen bigrams and unseen context tokens fall back to the smoothing mass
  * (counts coalesce to 0), so scoring a corpus against a separate training
  * corpus is well-defined.
  *
  * Scale posture (100 TB): two token-stream scans over the training corpus
  * build the count tables (partial-agg hash aggregates — the shuffle is
  * |vocab| and |distinct bigrams|, not |tokens|); scoring is two hash joins
  * of the scored token stream against those tables keyed on (u,v) and u, then
  * a per-doc partial-agg mean. Nothing is quadratic, nothing collects; the
  * count tables are data-sized but shuffle-partitioned (they must NOT be
  * broadcast — web-scale vocabularies run to billions of bigrams).
  *
  * Reference scope: the reference (cleaning/dedupe.py and friends) has no
  * statistical text quality signal — extension alongside QualityRules (Rae et al.
  * heuristics); this is the model-based complement the training-data
  * pipelines pair them with.
  *
  * Determinism stances (repo-wide): the per-doc mean rounds to 4 before the
  * threshold compare, so summation order and last-ulp ln() differences
  * across engines cannot flip a value or the flag.
  */
object LmScore {

  /** Per-document bigram-LM score over `docs(idCol, textCol)`:
    * (id, n_bigrams, lm_score, low_quality) — lm_score is the rounded mean
    * ln P(v|u) (null for docs with < 2 tokens, which are never flagged),
    * low_quality = lm_score < threshold. `train` defaults to `docs`. */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.5, threshold: Double = -7.0,
      train: Option[DataFrame] = None): DataFrame = {
    def toks(df: DataFrame) = df.select(col(idCol).as("id"),
      Text.tokens(col(textCol)).as("toks"))
    def bigrams(df: DataFrame) = df
      .filter(size(col("toks")) >= 2)
      .select(col("id"), explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1))).as("p"))
      .select(col("id"), col("p.0").as("u"), col("p.1").as("v"))

    val scoreToks = toks(docs)
    val trainToks = train.map(toks).getOrElse(scoreToks)
    val bgCounts = bigrams(trainToks)
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("c_uv"))
    // pinned: otherwise evaluated twice per action (the scoring join and
    // the vocabulary-size count — pruned differently, so exchange reuse
    // cannot kick in) and each evaluation re-tokenizes the training
    // corpus. Vocab-sized, CacheManager-managed (the Classify/semDedup
    // pin stance).
    val uniCounts = graft.pipeline.Pins.pin(
      trainToks.select(explode(col("toks")).as("u"))
        .groupBy(col("u")).agg(count(lit(1)).as("c_u")))
    // vocabulary size: a single-row aggregate, broadcast as a literal column
    val vocab = uniCounts.agg(count(lit(1)).as("vsz"))

    val lp = bigrams(scoreToks)
      .join(bgCounts, Seq("u", "v"), "left")
      .join(uniCounts, Seq("u"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("id"),
        log((coalesce(col("c_uv"), lit(0L)) + lit(alpha))
          / (coalesce(col("c_u"), lit(0L)) + lit(alpha) * col("vsz")))
          .as("lp"))
    val perDoc = lp.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 4).as("lm_score"))
    scoreToks.select(col("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lm_score"),
        coalesce(col("lm_score") < lit(threshold), lit(false))
          .as("low_quality"))
  }

  /** Interpolated Kneser–Ney bigram scoring — the smoothing family the
    * CCNet recipe actually deploys (KenLM's modified-KN; Kneser & Ney
    * 1995, Chen & Goodman 1999): where add-alpha ([[lmScore]]) spreads
    * held-out mass uniformly over the vocabulary, KN backs off to the
    * CONTINUATION distribution — how many distinct contexts a word
    * follows — which is what separates fluent-but-rare transitions from
    * genuine gibberish.
    *
    * Model (discount D ∈ (0,1); counts from the training corpus):
    *
    *   P(v|u) = max(c(u,v) − D, 0)/c(u) + D·N1+(u,·)/c(u) · Pcont(v)
    *                                                  when c(u) > 0
    *   P(v|u) = Pcont(v)                              when u is unseen
    *   Pcont(v) = (N1+(·,v) + 1) / (N1+(·,·) + V + 1)
    *
    * with c(u) = Σ_v c(u,v) (the context total), N1+(u,·)/N1+(·,v) the
    * distinct right/left neighbor counts, N1+(·,·) the distinct-bigram
    * total and V the training vocabulary size. The +1/(…+V+1)
    * regularizer on Pcont is the OOV floor: a continuation class every
    * unseen word shares, so scores stay finite without [[lmScore]]'s
    * uniform alpha mass (the standard open-vocabulary practice).
    *
    * Scale posture matches [[lmScore]]: the model is three hash
    * aggregates over the training bigram table (context totals,
    * left-neighbor counts, one-row totals) — shuffles are |bigrams|-
    * and |vocab|-sized, never broadcast; scoring is three hash joins of
    * the scored bigram stream plus a per-doc partial-agg mean. Output
    * (id, n_bigrams, kn_score, low_quality); kn_score is the 4-dp
    * rounded mean ln P (null for sub-2-token docs, never flagged). */
  def knScore(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75, threshold: Double = -7.0,
      train: Option[DataFrame] = None): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"KN discount must be in (0, 1), got $discount")
    def toks(df: DataFrame) = df.select(col(idCol).as("id"),
      Text.tokens(col(textCol)).as("toks"))
    def bigrams(df: DataFrame) = df
      .filter(size(col("toks")) >= 2)
      .select(col("id"), explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1))).as("p"))
      .select(col("id"), col("p.0").as("u"), col("p.1").as("v"))

    val scoreToks = toks(docs)
    val trainToks = train.map(toks).getOrElse(scoreToks)
    // pinned: the bigram count table feeds THREE derived aggregates
    val bg = graft.pipeline.Pins.pin(bigrams(trainToks)
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("c_uv")))
    val ctx = bg.groupBy(col("u"))
      .agg(sum(col("c_uv")).as("c_u"), count(lit(1)).as("n1f"))
    val cont = bg.groupBy(col("v")).agg(count(lit(1)).as("n1b"))
    val totals = bg.agg(count(lit(1)).as("n_bg"))
      .crossJoin(trainToks.select(explode(col("toks")).as("t"))
        .agg(countDistinct(col("t")).as("vsz")))

    val d = lit(discount)
    val pcont = (coalesce(col("n1b"), lit(0L)) + lit(1.0)) /
      (col("n_bg") + col("vsz") + lit(1.0))
    val lp = bigrams(scoreToks)
      .join(bg, Seq("u", "v"), "left")
      .join(ctx, Seq("u"), "left")
      .join(cont, Seq("v"), "left")
      .crossJoin(broadcast(totals))
      .select(col("id"),
        log(when(col("c_u").isNotNull,
          greatest(coalesce(col("c_uv"), lit(0L)) - d, lit(0.0)) /
            col("c_u") + d * col("n1f") / col("c_u") * pcont)
          .otherwise(pcont)).as("lp"))
    val perDoc = lp.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 4).as("kn_score"))
    scoreToks.select(col("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("kn_score"),
        coalesce(col("kn_score") < lit(threshold), lit(false))
          .as("low_quality"))
  }

  /** Tercile cutoffs (c1, c2) of `scoreCol` as a 1-row frame, for
    * [[perplexityBuckets]]. CCNet computes its bucket cutoffs ONCE from the
    * score distribution and applies them as constants; this mirrors that
    * split. `exact = false` (the 100-TB path) uses `approx_percentile` — a
    * mergeable Greenwald-Khanna sketch with bounded memory; `exact = true`
    * (grading/calibration scale) uses exact interpolated `percentile`
    * (memory O(distinct scores) on one reducer — only sane when the score
    * frame is calibration-sized). Both round to 6 so the downstream
    * boundary compares are engine-stable. */
  def tercileCuts(scored: DataFrame, scoreCol: String = "lm_score",
      exact: Boolean = false): DataFrame = {
    val fn = if (exact) "percentile" else "approx_percentile"
    scored.agg(
      round(expr(s"$fn($scoreCol, cast(1 as double)/3)"), 6).as("c1"),
      round(expr(s"$fn($scoreCol, cast(2 as double)/3)"), 6).as("c2"))
  }

  /** CCNet head/middle/tail partition (Wenzek et al. 2020 §4.3): 'head' is
    * the best-scoring (lowest-perplexity) third (score >= c2), 'tail' the
    * worst (score < c1), 'unscored' the sub-2-token documents the LM cannot
    * rate. `cuts` is a 1-row (c1, c2) frame ([[tercileCuts]]) joined as a
    * broadcast literal — the corpus stream is never re-shuffled. */
  def perplexityBuckets(scored: DataFrame, cuts: DataFrame,
      scoreCol: String = "lm_score"): DataFrame =
    scored.crossJoin(broadcast(cuts))
      .withColumn("ppl_bucket",
        when(col(scoreCol).isNull, lit("unscored"))
          .when(col(scoreCol) >= col("c2"), lit("head"))
          .when(col(scoreCol) >= col("c1"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("c1", "c2")
}
