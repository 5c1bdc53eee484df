package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus vocabulary-saturation audit — Good–Turing frequency-of-
  * frequencies (Good 1953) plus a Zipf rank-frequency fit. The
  * curation question this answers: how much NOVEL vocabulary is still
  * arriving? GT's unseen-mass estimate P₀ = N₁/N (the probability the
  * next token is a never-seen type) is the principled "keep crawling
  * vs saturated" signal, and the smoothed counts r* = (r+1)·N_{r+1}/N_r
  * quantify how much raw counts overstate rare-type probabilities.
  * The Zipf log-log slope (≈ −1 for natural language) is the standard
  * sanity check that a corpus is prose and not key-value spam — a
  * far-off slope flags machine-generated or truncated content.
  *
  * Scale posture: one token explode + word-keyed hash aggregate (map-
  * side combined) is the only corpus-sized shuffle; the frequency-of-
  * frequencies table is a second aggregate over the vocabulary frame
  * and is at most |distinct counts| rows; the Zipf fit reads only the
  * top-N words via TakeOrdered (no global sort materializes) and
  * regresses 1-row-side. Output is maxR rows of metadata. */
object Vocab {

  /** One row per r = 1..maxR: n_r (types seen r times), r_star
    * (GT-smoothed count, null when N_r or N_{r+1} is absent), plus the
    * corpus constants repeated per row: p0_unseen, vocab, n_tokens,
    * zipf_slope (OLS of ln freq on ln rank over the zipfTopN most
    * frequent words; rank ties broken by word for determinism). */
  def saturation(docs: DataFrame, textCol: String, maxR: Int = 10,
      zipfTopN: Int = 100): DataFrame = {
    val spark = docs.sparkSession
    val wc = docs.select(explode(Text.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val fof = wc.groupBy(col("n").as("r")).agg(count(lit(1)).as("n_r"))
    val totals = wc.agg(sum(col("n")).as("n_tokens"),
      count(lit(1)).as("vocab"),
      sum(when(col("n") === 1, 1L).otherwise(0L)).as("n1"))

    val top = wc.orderBy(col("n").desc, col("word").asc).limit(zipfTopN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("word").asc)))
    val zipf = top.agg(
      round(regr_slope(log(col("n")), log(col("rank"))), 6)
        .as("zipf_slope"))

    val grid = spark.range(1, maxR + 1).select(col("id").as("r"))
    grid
      .join(fof, Seq("r"), "left")
      .join(fof.select((col("r") - 1).as("r"), col("n_r").as("n_r1")),
        Seq("r"), "left")
      .na.fill(0L, Seq("n_r"))
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(zipf))
      .select(col("r"), col("n_r"),
        when(col("n_r") > 0 && col("n_r1").isNotNull,
          round((col("r") + 1) * col("n_r1") / col("n_r"), 6))
          .as("r_star"),
        round(col("n1").cast("double") / col("n_tokens"), 6)
          .as("p0_unseen"),
        col("vocab"), col("n_tokens"), col("zipf_slope"))
  }
}
