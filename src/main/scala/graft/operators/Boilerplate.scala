package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Boilerplate-line removal for web-scale training corpora (the CCNet /
  * RefinedWeb line-dedup step): a line that appears in at least `minDocs`
  * distinct documents is site furniture (headers, footers, nav, cookie
  * banners), not content, and is stripped from every document.
  *
  * Scale posture: explode to (doc, pos, line), count per-line document
  * frequency with a partial-aggregable distinct count, anti-join the
  * frequent lines back, reassemble per doc. Two shuffles (line-freq agg +
  * doc regroup), both on well-distributed keys; the frequent-line set is
  * the only broadcast-sized artifact. No cross join, no per-doc loops —
  * the same plan shape at 500 docs and 100 TB.
  */
object Boilerplate {

  /** (id, pos, line) exploded view of newline-separated text. */
  def lines(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))

  /** Lines occurring in >= `minDocs` distinct documents. */
  def frequentLines(lines: DataFrame, minDocs: Long): DataFrame =
    lines.select("id", "line").distinct()
      .groupBy("line").agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)

  /** Strip boilerplate lines; returns (id, `outCol`) with surviving lines
    * re-joined by newline in original order. Documents whose every line is
    * boilerplate are retained with empty text (the id set is preserved —
    * a filter step deciding to DROP docs is a separate policy choice). */
  def strip(df: DataFrame, idCol: String, textCol: String, minDocs: Long,
      outCol: String = "clean_text"): DataFrame = {
    val ls = graft.pipeline.Pins.pin(lines(df, idCol, textCol))
    val frequent = frequentLines(ls, minDocs).select("line")
    val kept = ls.join(frequent, Seq("line"), "left_anti")
      .groupBy("id")
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line"))).as(outCol))
    val out = df.select(col(idCol).as("id"))
      .join(kept, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col(outCol), lit("")).as(outCol))
    out
  }
}
