package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Within-document repetition metrics — the Gopher repetition filters
  * (Rae et al. 2021, Table A1): heavily self-repeating documents (boiler
  * templates, keyword stuffing, generation loops) are dropped before
  * pretraining. Complements the cross-document dedup family (Dedup) —
  * this is repetition INSIDE one document, so every metric is computable
  * per-row or per-doc-key with no corpus-wide interaction.
  *
  * Metrics (all fractions rounded to 6, all in [0,1]):
  *  - dup_line_frac: duplicated lines / lines (a line = trimmed non-empty
  *    `lineSep`-split chunk);
  *  - dup_line_char_frac: characters inside duplicate line occurrences
  *    (occurrences beyond each value's first) / total line characters;
  *  - top_ngram_char_frac (n = topN): characters of the most frequent
  *    word n-gram's occurrences / characters of all n-gram occurrences
  *    (ties on count break to the lexicographically largest gram);
  *  - dup_ngram_char_frac (n = dupN): characters of n-gram occurrences
  *    whose gram occurs more than once / characters of all n-gram
  *    occurrences. (Gopher's span-union definition is approximated by
  *    occurrence-char mass — self-normalized, partitioning-independent.)
  *
  * `flagged` ORs the paper's thresholds (defaults: 0.30 / 0.20 / 0.20 for
  * top-2-gram / 0.15 for dup-5-gram).
  *
  * Scale posture (100 TB): the line metrics are pure row-wise HOF
  * arithmetic — zero shuffle, full codegen. The n-gram metrics explode
  * once per n and hash-aggregate keyed on (doc, gram) then doc — both
  * partial-agg friendly, nothing corpus-keyed, no window wider than a
  * document. Documents shorter than n tokens count one whole-doc shingle
  * (the [[Text.wordShingles]] convention shared with the dedup family).
  */
object Repetition {

  /** Per-document Gopher repetition metrics over `df(idCol, textCol)`.
    * `lineSep` is a regex (default real newlines). */
  def gopherRepetition(df: DataFrame, idCol: String, textCol: String,
      lineSep: String = "\n", topN: Int = 2, dupN: Int = 5,
      dupLineMax: Double = 0.30, dupLineCharMax: Double = 0.20,
      topNgramMax: Double = 0.20, dupNgramMax: Double = 0.15): DataFrame = {
    val id = col(idCol).as("id")

    // ---- line metrics: row-wise, shuffle-free ----
    val lines = filter(
      transform(split(col(textCol), lineSep), x => trim(x)),
      x => x =!= "")
    val distinctLines = array_distinct(lines)
    def charSum(arr: Column): Column =
      aggregate(arr, lit(0L), (acc, x) => acc + length(x))
    val nLines = size(lines).cast("long")
    val lineChars = charSum(lines)
    val distinctChars = charSum(distinctLines)
    val lineFrame = df.select(id,
      nLines.as("n_lines"),
      when(nLines > 0, round((nLines - size(distinctLines)).cast("double")
        / nLines, 6)).otherwise(0.0).as("dup_line_frac"),
      when(lineChars > 0, round((lineChars - distinctChars).cast("double")
        / lineChars, 6)).otherwise(0.0).as("dup_line_char_frac"))

    // ---- n-gram metrics: one explode per n, doc-keyed partial aggs ----
    def gramFrame(n: Int, outCol: String, top: Boolean): DataFrame = {
      val counts = df
        .select(id, explode(Text.wordShingles(col(textCol), n)).as("gram"))
        .groupBy(col("id"), col("gram")).agg(count(lit(1)).as("cnt"))
      val occChars = col("cnt") * length(col("gram"))
      val perDoc = counts.groupBy(col("id")).agg(
        sum(occChars).as("tot"),
        (if (top) max(struct(col("cnt"), col("gram"))).as("arg")
         else sum(when(col("cnt") > 1, occChars).otherwise(0L)).as("arg")))
      val num =
        if (top) col("arg.cnt") * length(col("arg.gram")) else col("arg")
      perDoc.select(col("id"),
        when(col("tot") > 0, round(num.cast("double") / col("tot"), 6))
          .otherwise(0.0).as(outCol))
    }
    val topF = gramFrame(topN, s"top_${topN}gram_char_frac", top = true)
    val dupF = gramFrame(dupN, s"dup_${dupN}gram_char_frac", top = false)

    lineFrame
      .join(topF, Seq("id"), "left").join(dupF, Seq("id"), "left")
      .na.fill(0.0, Seq(s"top_${topN}gram_char_frac",
        s"dup_${dupN}gram_char_frac"))
      .select(col("id").as(idCol), col("n_lines"), col("dup_line_frac"),
        col("dup_line_char_frac"), col(s"top_${topN}gram_char_frac"),
        col(s"dup_${dupN}gram_char_frac"),
        (col("dup_line_frac") > dupLineMax ||
          col("dup_line_char_frac") > dupLineCharMax ||
          col(s"top_${topN}gram_char_frac") > topNgramMax ||
          col(s"dup_${dupN}gram_char_frac") > dupNgramMax).as("flagged"))
  }
}
