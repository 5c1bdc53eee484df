package graft.operators

import org.apache.spark.sql.DataFrame
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
  * global word tables; the per-source evaluation frame is
  * |sources|·|vocab| (vocab-bounded, never corpus-row-bounded) built
  * by crossing the source list with the vocab table and left-joining
  * the source counts; one source-keyed sum finishes. For web-scale
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
    val grid = srcTot.select(col("src"), col("t_s"))
      .crossJoin(broadcast(vocabN))
      .crossJoin(gc) // |sources| x |vocab| — the documented bound
      .join(sc, Seq("src", "w"), "left")
      .na.fill(0L, Seq("n_sw"))
    val contrib = grid
      .withColumn("p", (col("n_sw") + lit(0.5))
        / (col("t_s") + col("v") * lit(0.5)))
      .withColumn("q", ((col("n_w") - col("n_sw")) + lit(0.5))
        / ((col("t_all") - col("t_s")) + col("v") * lit(0.5)))
      .withColumn("m", (col("p") + col("q")) / 2)
      .withColumn("c", lit(0.5) * col("p") * log(col("p") / col("m"))
        + lit(0.5) * col("q") * log(col("q") / col("m")))
    val jsd = contrib.groupBy(col("src"))
      .agg(round(sum(col("c")), 6).as("jsd"))
    val w = Window.orderBy(col("jsd").desc)
    srcTot.join(jsd, Seq("src"))
      .select(col("src").as(srcCol), col("t_s").as("n_tokens"),
        col("n_types"), col("jsd"))
      .withColumn("jsd_rank", dense_rank().over(w))
  }
}
