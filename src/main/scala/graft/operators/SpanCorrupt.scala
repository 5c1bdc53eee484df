package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** T5 span-corruption example construction (Raffel et al. 2020 §3.1.4 —
  * the denoising objective behind T5/UL2 pretraining): spans of tokens
  * are replaced by numbered sentinels in the input, and the target lists
  * each sentinel followed by the tokens it swallowed. This operator is
  * the DATA-side constructor — it materializes (input_text, target_text)
  * pairs from raw documents at corpus scale.
  *
  * Randomness is a pure content hash (the [[Text.md5Long]] convention):
  * token position i of document d starts a span iff
  * hash(d:i) < startProb * 2^60, where startProb = noiseDensity /
  * spanLen; a span covers `spanLen` consecutive positions and
  * overlapping spans merge into one run (one sentinel). Deterministic,
  * partitioning-independent, engine-checkable — and re-running with the
  * same corpus reproduces the exact same examples (the property that
  * makes training resumable mid-epoch).
  *
  * Scale posture: one explode + windows PARTITIONED BY DOCUMENT (never
  * wider), then one per-doc aggregate — the q105 trajectory shape. No
  * state crosses documents, so the plan is embarrassingly parallel at
  * any corpus size.
  */
object SpanCorrupt {

  /** (id, n_tokens, n_spans, n_masked, mask_frac, input_text,
    * target_text) per input row; empty/whitespace docs degrade to zero
    * counts and empty strings. */
  def t5SpanCorruption(df: DataFrame, idCol: String, textCol: String,
      noiseDensity: Double = 0.15, spanLen: Int = 3): DataFrame = {
    require(spanLen >= 1 && noiseDensity > 0 && noiseDensity < 1)
    val startThreshold =
      (graft.expressions.Kmv.Md5LongSpace * (noiseDensity / spanLen)).toLong

    val toks = df.select(col(idCol).as("id"),
      posexplode(Text.tokens(col(textCol))).as(Seq("pos", "tok")))
    val byPos = Window.partitionBy(col("id")).orderBy(col("pos"))

    val flagged = toks
      .withColumn("start",
        Text.md5Long(concat(col("id").cast("string"), lit(":"),
          col("pos").cast("string"))) < startThreshold)
      // covered: any span start within the last spanLen positions
      .withColumn("covered",
        max(when(col("start"), 1).otherwise(0))
          .over(byPos.rowsBetween(-(spanLen - 1), 0)) === 1)
      .withColumn("new_run",
        col("covered") &&
          coalesce(!lag(col("covered"), 1).over(byPos), lit(true)))
      .withColumn("run_id",
        sum(when(col("new_run"), 1L).otherwise(0L)).over(byPos))

    val sentinel =
      concat(lit("<extra_id_"), (col("run_id") - 1).cast("string"), lit(">"))
    val pieces = flagged.select(col("id"), col("pos"), col("covered"),
      col("new_run"),
      when(!col("covered"), col("tok"))
        .when(col("new_run"), sentinel).otherwise(lit(null)).as("in_piece"),
      when(col("covered") && col("new_run"),
          concat(sentinel, lit(" "), col("tok")))
        .when(col("covered"), col("tok")).otherwise(lit(null))
        .as("tgt_piece"))

    def joined(piece: String): Column = concat_ws(" ",
      transform(
        filter(array_sort(collect_list(struct(col("pos"), col(piece)))),
          x => x.getField(piece).isNotNull),
        x => x.getField(piece)))

    val perDoc = pieces.groupBy(col("id")).agg(
      count(lit(1)).as("n_tokens"),
      sum(when(col("new_run"), 1L).otherwise(0L)).as("n_spans"),
      sum(when(col("covered"), 1L).otherwise(0L)).as("n_masked"),
      joined("in_piece").as("input_text"),
      joined("tgt_piece").as("target_text"))

    df.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0,
          round(col("n_masked").cast("double") / col("n_tokens"), 6))
          .otherwise(0.0).as("mask_frac"),
        coalesce(col("input_text"), lit("")).as("input_text"),
        coalesce(col("target_text"), lit("")).as("target_text"))
  }
}
