package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference-based text overlap metrics — clipped n-gram precision
  * BLEU-2 (Papineni et al. 2002) and ROUGE-1/2 recall (Lin 2004) per
  * (candidate, reference) pair. The eval-harness primitives: grading
  * generated summaries/translations against references, and — the
  * curation use — scoring how much of a source document a derived
  * (cleaned, truncated, paraphrased) text preserves. Decontamination
  * (q62) asks "is this test item leaked?"; this asks "how much of the
  * reference does each candidate reproduce?", the graded overlap the
  * pass/fail containment check cannot see.
  *
  * Definitions: pₙ = Σ_g min(cand_count(g), ref_count(g)) / |cand
  * n-grams| (clipping stops a candidate repeating one matched gram
  * for free precision); ROUGE-n recall = same clipped mass over |ref
  * n-grams|; BP = min(1, e^(1−r/c)); BLEU-2 = BP·√(p₁p₂) via the
  * log-mean (0 when either pₙ = 0).
  *
  * Scale posture: per n-gram order, one explode per side into a
  * (pair, gram)-keyed count aggregate and one equi-join of the two
  * count frames — everything is pair- or gram-keyed, nothing global;
  * the four metric frames re-join on the pair id (|pairs| rows). */
object TextEval {

  /** `pairs`: (idCol, candCol, refCol) raw texts; tokenization is the
    * corpus-standard lowercase-whitespace split. Output per id:
    * len_c, len_r (unigram counts), p1, p2, r1, r2, bp, bleu2 — all
    * rounded 6. Pairs whose candidate or reference has no bigram
    * still report unigram stats (p2/r2 = 0). */
  def bleuRouge(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String): DataFrame = {
    import graft.functions.Text
    val base = pairs.select(col(idCol).as("id"),
      Text.tokens(col(candCol)).as("ct"),
      Text.tokens(col(refCol)).as("rt"))

    def grams(tokCol: String, n: Int) =
      if (n == 1) col(tokCol)
      else zip_with(
        slice(col(tokCol), lit(1),
          greatest(size(col(tokCol)) - (n - 1), lit(0))),
        slice(col(tokCol), lit(n),
          greatest(size(col(tokCol)) - (n - 1), lit(0))),
        (a, b) => concat_ws(" ", a, b))

    def clipped(n: Int): DataFrame = {
      val c = base.select(col("id"), explode(grams("ct", n)).as("g"))
        .groupBy(col("id"), col("g")).agg(count(lit(1)).as("nc"))
      val r = base.select(col("id"), explode(grams("rt", n)).as("g"))
        .groupBy(col("id"), col("g")).agg(count(lit(1)).as("nr"))
      c.join(r, Seq("id", "g"))
        .groupBy(col("id"))
        .agg(sum(least(col("nc"), col("nr"))).as(s"clip$n"))
    }

    val lens = base.select(col("id"), size(col("ct")).cast("long")
      .as("len_c"), size(col("rt")).cast("long").as("len_r"))
    val out = lens
      .join(clipped(1), Seq("id"), "left")
      .join(clipped(2), Seq("id"), "left")
      .na.fill(0L, Seq("clip1", "clip2"))
      .select(col("id"), col("len_c"), col("len_r"),
        when(col("len_c") > 0, col("clip1") / col("len_c"))
          .otherwise(0.0).as("p1raw"),
        when(col("len_c") > 1, col("clip2") / (col("len_c") - 1))
          .otherwise(0.0).as("p2raw"),
        when(col("len_r") > 0, col("clip1") / col("len_r"))
          .otherwise(0.0).as("r1raw"),
        when(col("len_r") > 1, col("clip2") / (col("len_r") - 1))
          .otherwise(0.0).as("r2raw"))
      .withColumn("bpraw",
        when(col("len_c") >= col("len_r") || col("len_c") === 0, 1.0)
          .otherwise(exp(lit(1.0)
            - col("len_r").cast("double") / col("len_c"))))
    out.select(col("id"), col("len_c"), col("len_r"),
      round(col("p1raw"), 6).as("p1"), round(col("p2raw"), 6).as("p2"),
      round(col("r1raw"), 6).as("r1"), round(col("r2raw"), 6).as("r2"),
      round(col("bpraw"), 6).as("bp"),
      round(when(col("p1raw") > 0 && col("p2raw") > 0,
        col("bpraw") * exp((log(col("p1raw")) + log(col("p2raw")))
          / 2)).otherwise(0.0), 6).as("bleu2"))
  }
}
