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
  * (|source, word| pairs that actually occur). For web-scale
  * vocabularies, cap to the top-V words by global count first (the
  * q72 heavy-hitter stance) — the tail contributes negligible mass. */
object Divergence {

  /** Output per source: n_tokens, n_types (distinct words in the
    * source), jsd (rounded 6), jsd_rank (1 = most divergent; ties
    * share a rank). */
  def sourceJsd(docs: DataFrame, srcCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(srcCol).as("src"),
      explode(Text.tokens(col(textCol))).as("w"))
    val sc = tok.groupBy(col("src"), col("w"))
      .agg(count(lit(1)).as("n_sw"))
    val gc = tok.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
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
    srcTot.join(jsd, Seq("src"))
      .select(col("src").as(srcCol), col("t_s").as("n_tokens"),
        col("n_types"), col("jsd"))
      .withColumn("jsd_rank", dense_rank().over(w))
  }
}
