package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Per-source "data card" profiling (Gebru et al., Datasheets for
  * Datasets 2018, reduced to the computable core) — ONE wide row per
  * source with the numbers every mixing/curation decision starts from:
  * volume, length distribution, exact-dup rate, dominant language and
  * its share, short-doc fraction. The reference pipeline prints
  * per-run validation reports (validate_contacts.py's JSON audit);
  * this is that idea lifted to corpus curation, and the single frame a
  * mixing planner (q113/q116/q168) would consume.
  *
  * Scale posture: one corpus scan feeds a source-keyed aggregate
  * (count/sum/percentile, map-side partial where the function allows);
  * the dominant language needs its own (source, lang) aggregate +
  * per-source top-1 window over the |sources|·|langs| frame; exact
  * dedup counts ride approx-free countDistinct on the md5 (exact at
  * calibration scale — swap HLL, q48's stance, at 100 TB). */
object DataCard {

  /** Output per source: n_docs, total_chars, mean_tok, p50_tok,
    * p90_tok, n_distinct_texts, dup_rate, pct_short, top_lang,
    * top_lang_share. */
  def sourceCards(docs: DataFrame, srcCol: String, idCol: String,
      textCol: String, langCol: String,
      shortChars: Int = 100): DataFrame = {
    val base = docs.select(col(srcCol), col(idCol),
      col(langCol).as("__lang"),
      length(col(textCol)).cast("long").as("__nc"),
      Text.tokenCount(col(textCol)).cast("long").as("__nt"),
      md5(col(textCol)).as("__md5"))
    val core = base.groupBy(col(srcCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(col("__nc")).as("total_chars"),
      round(avg(col("__nt")), 6).as("mean_tok"),
      percentile(col("__nt"), lit(0.5)).as("p50_tok"),
      percentile(col("__nt"), lit(0.9)).as("p90_tok"),
      countDistinct(col("__md5")).as("n_distinct_texts"),
      sum(when(col("__nc") < shortChars, 1L).otherwise(0L))
        .as("__n_short"))
    val langs = base.groupBy(col(srcCol), col("__lang"))
      .agg(count(lit(1)).as("__ln"))
    val wTop = Window.partitionBy(col(srcCol))
      .orderBy(col("__ln").desc, col("__lang").asc)
    val top = langs.withColumn("__rn", row_number().over(wTop))
      .filter(col("__rn") === 1)
      .select(col(srcCol), col("__lang").as("top_lang"),
        col("__ln").as("__top_n"))
    core.join(top, Seq(srcCol))
      .select(col(srcCol), col("n_docs"), col("total_chars"),
        col("mean_tok"), col("p50_tok"), col("p90_tok"),
        col("n_distinct_texts"),
        round(lit(1.0) - col("n_distinct_texts").cast("double")
          / col("n_docs"), 6).as("dup_rate"),
        round(col("__n_short").cast("double") / col("n_docs"), 6)
          .as("pct_short"),
        col("top_lang"),
        round(col("__top_n").cast("double") / col("n_docs"), 6)
          .as("top_lang_share"))
  }
}
