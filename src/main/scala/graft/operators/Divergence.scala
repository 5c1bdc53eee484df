package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Per-source lexical divergence — Jensen–Shannon distance between
  * each source's unigram distribution and the REST of the corpus (the
  * data-mixing literature's similarity measure: DoReMi/DSIR-style
  * domain weighting and "is this new feed actually different"
  * acquisition calls both start from exactly this number). JSD over
  * KL because it is symmetric, bounded by ln 2, and defined when
  * either side misses a word; rest-of-corpus (not whole-corpus) as
  * the reference so a large source is not compared against itself.
  *
  * JSD(p, q) = ½·KL(p‖m) + ½·KL(q‖m), m = (p+q)/2, with the
  * Drift.psi-convention Laplace smoothing ((n + 0.5) / (N + V/2))
  * over the GLOBAL vocabulary so both distributions share support.
  *
  * Scale posture: one token explode feeds the (source, word) and
  * global word tables. The evaluation DECOMPOSES by term presence —
  * jsd(s) = Σ_vocab c₀(w, s) + Σ_{w ∈ s} (c(w, s) − c₀(w, s)) where
  * c₀ is the contribution under the absent hypothesis (n_sw = 0) —
  * so the |sources|·|vocab| absent-mass never materializes as a
  * joined grid: it is a projection + map-side-combined aggregate
  * over the vocab stream crossed with the |sources|-row broadcast
  * metadata, and the ONLY word-keyed join is the real postings frame
  * (|source, word| pairs that actually occur). Even so, an UNCAPPED
  * web-scale vocabulary makes that aggregate |sources|×|vocab|-sized
  * work — distributed and map-side-combined, but unbounded — which is
  * what `maxVocab` exists for (see [[sourceJsd]]). */
object Divergence {

  /** Output per source: n_tokens, n_types (distinct words in the
    * source), jsd (rounded 6), jsd_rank (1 = most divergent; ties
    * share a rank).
    *
    * `maxVocab` (None = exact, full vocabulary) caps the evaluation to
    * the top-V words by GLOBAL count (ties to the lexicographically
    * smaller word — a total order, deterministic in any engine): the
    * q72 heavy-hitter stance, since the long tail contributes
    * negligible JSD mass but unbounded absent-hypothesis work. The
    * capped run scores each source's distribution RESTRICTED to the
    * kept vocabulary (totals, type counts and smoothing support all
    * renormalize to the kept words — a proper JSD over the capped
    * support, not a truncated sum), and reports what the cap dropped
    * in the q188 telemetry style: per source, `dropped_tokens` /
    * `dropped_types` (raw minus kept). A source with NO kept word
    * drops out of the output — its distribution has no support on the
    * capped vocabulary; at any sane V (≥ |sources| heavy hitters)
    * this does not happen. The top-V cut itself is a
    * TakeOrderedAndProject (per-partition top-V, driver merge), so V
    * must be driver-sized — thousands to low millions, the same bound
    * as any broadcast dimension. */
  def sourceJsd(docs: DataFrame, srcCol: String, textCol: String,
      maxVocab: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxVocab.forall(_ >= 1), s"maxVocab must be >= 1: $maxVocab")
    val tok = docs.select(col(srcCol).as("src"),
      explode(Text.tokens(col(textCol))).as("w"))
    val scAll = tok.groupBy(col("src"), col("w"))
      .agg(count(lit(1)).as("n_sw"))
    val gcAll = scAll.groupBy(col("w")).agg(sum(col("n_sw")).as("n_w"))
    val (sc, gc) = maxVocab match {
      case None => (scAll, gcAll)
      case Some(v) =>
        // deterministic top-V heavy hitters; V-row frame -> broadcast the
        // kept-word set into both postings restrictions (no shuffle added)
        val kept = broadcast(
          gcAll.orderBy(col("n_w").desc, col("w").asc).limit(v)
            .select(col("w")))
        (scAll.join(kept, Seq("w")), gcAll.join(kept, Seq("w")))
    }
    val vocabN = gc.agg(count(lit(1)).as("v"),
      sum(col("n_w")).as("t_all"))
    val srcTot = sc.groupBy(col("src")).agg(sum(col("n_sw")).as("t_s"),
      count(lit(1)).as("n_types"))
    // |sources|-row metadata: per-source totals + the global scalars
    val srcMeta = srcTot.select(col("src"), col("t_s"))
      .crossJoin(broadcast(vocabN))
    // the smoothed JSD contribution of word w to source s at count n_sw
    def contrib(nSw: Column): Column = {
      val p = (nSw + lit(0.5)) / (col("t_s") + col("v") * lit(0.5))
      val q = ((col("n_w") - nSw) + lit(0.5)) /
        ((col("t_all") - col("t_s")) + col("v") * lit(0.5))
      val m = (p + q) / 2
      lit(0.5) * p * log(p / m) + lit(0.5) * q * log(q / m)
    }
    // absent-hypothesis mass for EVERY (source, word): vocab stream x
    // broadcast source metadata — pure projection into a partial agg, no
    // grid-sized shuffle or join-back
    val base = gc.crossJoin(broadcast(srcMeta))
      .select(col("src"), contrib(lit(0L)).as("c0"))
      .groupBy(col("src")).agg(sum(col("c0")).as("__base"))
    // present-term correction: only the REAL postings rows join (equi on
    // the word), each swapping its absent-hypothesis term for the actual
    val corr = sc.join(gc, Seq("w"))
      .join(broadcast(srcMeta), Seq("src"))
      .select(col("src"),
        (contrib(col("n_sw")) - contrib(lit(0L))).as("dc"))
      .groupBy(col("src")).agg(sum(col("dc")).as("__corr"))
    val jsd = base.join(corr, Seq("src"))
      .select(col("src"), round(col("__base") + col("__corr"), 6).as("jsd"))
    val w = Window.orderBy(col("jsd").desc)
    val scored = srcTot.join(jsd, Seq("src"))
    val out = maxVocab match {
      case None => scored
        .select(col("src").as(srcCol), col("t_s").as("n_tokens"),
          col("n_types"), col("jsd"))
      case Some(_) =>
        // drop telemetry: raw per-source totals minus the kept totals —
        // the cap must say what it cost, never truncate silently
        val raw = scAll.groupBy(col("src")).agg(
          sum(col("n_sw")).as("__raw_tokens"),
          count(lit(1)).as("__raw_types"))
        scored.join(raw, Seq("src"))
          .select(col("src").as(srcCol), col("t_s").as("n_tokens"),
            col("n_types"), col("jsd"),
            (col("__raw_tokens") - col("t_s")).as("dropped_tokens"),
            (col("__raw_types") - col("n_types")).as("dropped_types"))
    }
    out.withColumn("jsd_rank", dense_rank().over(w))
  }
}
