package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line-level cleaning (Raffel et al. 2020, §2.2 — the public
  * recipe behind the C4 corpus): web-extracted pages carry menu items,
  * cookie banners, and code fragments that survive boilerplate dedup
  * because they are unique per site. The C4 pass is purely LOCAL — every
  * rule looks at one line or one page — which is what makes it the first
  * filter in a 100-TB pipeline: it runs inside the scan, before anything
  * shuffles.
  *
  * Line rules (a line is kept iff ALL hold):
  *  - ends in a terminal punctuation mark (`.` `!` `?` `"`);
  *  - has at least `minWords` whitespace words;
  *  - does not contain the word "javascript" (case-insensitive).
  * Page rules (`keep` = page survives):
  *  - at least `minKeptLines` lines survived the line rules;
  *  - page does not contain "lorem ipsum" (case-insensitive);
  *  - page does not contain a curly brace (the code-page heuristic).
  * (C4's bad-word list and its 3-sentence-span dedup are separate policy
  * hooks — the latter is this repo's Dedup/substring family.)
  *
  * Scale posture: every output column is row-wise higher-order-function
  * arithmetic over the split line array — zero shuffle, zero UDF, full
  * codegen, same plan at 500 docs and 100 TB. Reference scope anchor:
  * the reference pipeline's cleaning stage is row-local the same way
  * (cleaning scripts operate record-by-record); this operator is the
  * web-corpus analogue.
  */
object C4Filter {

  /** Per-document C4 line filtering over `df(idCol, textCol)`.
    * `lineSep` is a regex (default real newlines). Output: (id, n_lines,
    * n_kept, kept_char_frac, has_lorem, has_brace, keep, clean_text) —
    * one row per input row; clean_text re-joins surviving lines with a
    * real newline in original order. */
  def c4Lines(df: DataFrame, idCol: String, textCol: String,
      lineSep: String = "\n", minWords: Int = 5,
      minKeptLines: Int = 2): DataFrame = {
    val text = col(textCol)
    val lines = filter(
      transform(split(text, lineSep), x => trim(x)), x => x =!= "")

    def words(l: Column): Column =
      size(filter(split(l, "\\s+"), w => w =!= ""))
    def keepLine(l: Column): Column =
      l.rlike("[.!?\"]$") && words(l) >= minWords &&
        !lower(l).contains("javascript")

    val kept = filter(lines, keepLine _)
    def charSum(arr: Column): Column =
      aggregate(arr, lit(0L), (acc, x) => acc + length(x))

    val nLines = size(lines).cast("long")
    val nKept = size(kept).cast("long")
    val totalChars = charSum(lines)
    val hasLorem = lower(text).contains("lorem ipsum")
    val hasBrace = text.contains("{")

    df.select(col(idCol).as("id"),
      nLines.as("n_lines"), nKept.as("n_kept"),
      when(totalChars > 0,
        round(charSum(kept).cast("double") / totalChars, 6))
        .otherwise(0.0).as("kept_char_frac"),
      hasLorem.as("has_lorem"), hasBrace.as("has_brace"),
      (nKept >= minKeptLines && !hasLorem && !hasBrace).as("keep"),
      array_join(kept, "\n").as("clean_text"))
  }
}
