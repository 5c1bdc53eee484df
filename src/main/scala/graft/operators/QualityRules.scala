package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Gopher-style repetition / quality filter signals for training corpora
  * (Rae et al. 2021, "Scaling Language Models", Table A1 — public): a
  * document dominated by repeated tokens, one runaway n-gram, or symbol
  * noise is boilerplate or spam, not prose, and is dropped before training.
  *
  * Per document:
  *  - `dup_tok_frac`       — fraction of token occurrences that are repeats
  *                           (1 - distinct/total);
  *  - `top_2gram` / `top_2gram_cnt` / `top2gram_char_frac`
  *                         — the most frequent word 2-gram and the fraction
  *                           of the document's characters it accounts for;
  *  - `symbol_word_ratio`  — '#' and '...' occurrences per token;
  *  - `keep`               — true iff every signal is under its threshold.
  *
  * Scale posture: explode -> count on well-distributed composite keys
  * (doc, token) / (doc, 2-gram), partial aggregation on both, then a
  * metadata-light per-doc rollup — the same plan shape at 500 docs and
  * 100 TB. The per-doc top 2-gram is an order-free `max(struct(cnt, gram))`
  * aggregate, not a window, so no per-doc sort materializes. No row ever
  * holds more than one document's state.
  */
object QualityRules {

  /** Default thresholds (Gopher Table A1's line/2-gram bands, adapted to
    * the token-level signals computed here). */
  val MaxDupTokFrac = 0.30
  val MaxTop2gramCharFrac = 0.20
  val MaxSymbolWordRatio = 0.10

  /** '#' chars plus non-overlapping '...' runs — the Gopher symbol set. */
  private def symbolCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "#", ""))).cast("long") +
      ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3)
        .cast("long")

  /** Repetition/quality signals per document; keeps EVERY input id (a doc
    * with no tokens scores 0.0 on every ratio and keep = true — filtering
    * empty docs is a separate policy; a doc with < 2 tokens likewise has
    * no 2-gram signal). Output: (doc_id, n_tokens, dup_tok_frac,
    * top_2gram, top_2gram_cnt, top2gram_char_frac, symbol_word_ratio,
    * keep), one row per input row.
    *
    * Contract: `df` must be deterministic across re-execution — the plan
    * derives three branches from it (per-doc base, token stats, gram
    * stats) joined back on doc_id, the same multi-consumer contract as
    * [[graft.pipeline.RowIds.denseInPartitionOrder]]. File/table scans
    * satisfy this; pin a sampled or nondeterministic frame (persist) before
    * calling. */
  def signals(df: DataFrame, idCol: String, textCol: String,
      maxDupTokFrac: Double = MaxDupTokFrac,
      maxTop2gramCharFrac: Double = MaxTop2gramCharFrac,
      maxSymbolWordRatio: Double = MaxSymbolWordRatio): DataFrame = {
    val text = col(textCol)
    val base = df.select(col(idCol).as("doc_id"),
      coalesce(length(text), lit(0)).cast("long").as("n_chars"),
      symbolCount(coalesce(text, lit(""))).as("n_symbols"))

    val toks = df.select(col(idCol).as("doc_id"),
      explode(Text.tokens(text)).as("tok"))
    val tokStats = toks.groupBy("doc_id").agg(
      count(lit(1)).as("n_tokens"),
      count_distinct(col("tok")).as("n_distinct"))

    val grams = df.select(col(idCol).as("doc_id"),
      explode(Text.wordShingles(text, 2)).as("gram"))
    val gramCounts = grams.groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("cnt"))
    // deterministic argmax: highest count, ties -> lexicographically
    // largest gram (struct ordering), identical to the oracle's
    // ORDER BY cnt DESC, gram DESC LIMIT 1 per doc
    val topGram = gramCounts.groupBy("doc_id")
      .agg(max(struct(col("cnt"), col("gram"))).as("top"))
      .select(col("doc_id"), col("top.gram").as("top_2gram"),
        col("top.cnt").as("top_2gram_cnt"))

    def ratio(num: Column, den: Column): Column =
      round(when(den > 0, num.cast("double") / den.cast("double"))
        .otherwise(lit(0.0)), 6)

    val nTokens = coalesce(col("n_tokens"), lit(0L))
    val dupTokFrac = ratio(nTokens - coalesce(col("n_distinct"), lit(0L)), nTokens)
    // a doc with < 2 tokens HAS no 2-gram — wordShingles' whole-document
    // fallback shingle must not masquerade as one (it would score
    // top2gram_char_frac ~1.0 and wrongly drop every short doc as
    // "repetitive")
    val has2gram = nTokens >= 2
    val topFrac = when(has2gram,
      ratio(coalesce(col("top_2gram_cnt"), lit(0L)) *
        length(coalesce(col("top_2gram"), lit(""))), col("n_chars")))
      .otherwise(lit(0.0))
    val symRatio = ratio(col("n_symbols"), nTokens)
    base
      .join(tokStats, Seq("doc_id"), "left")
      .join(topGram, Seq("doc_id"), "left")
      .select(col("doc_id"), nTokens.as("n_tokens"),
        dupTokFrac.as("dup_tok_frac"),
        when(has2gram, coalesce(col("top_2gram"), lit("")))
          .otherwise(lit("")).as("top_2gram"),
        when(has2gram, coalesce(col("top_2gram_cnt"), lit(0L)))
          .otherwise(lit(0L)).as("top_2gram_cnt"),
        topFrac.as("top2gram_char_frac"),
        symRatio.as("symbol_word_ratio"),
        (dupTokFrac <= maxDupTokFrac &&
          topFrac <= maxTop2gramCharFrac &&
          symRatio <= maxSymbolWordRatio).as("keep"))
  }
}
