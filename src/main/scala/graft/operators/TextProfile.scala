package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-scale text profiling (token counts, stopword ratio, mean word
  * length, language-ID, quality score) as ONE explode -> hash-aggregate ->
  * join-back plan.
  *
  * Per-row higher-order array lambdas are interpreted by Catalyst; profiling
  * a 100-TB corpus that way burns cores on lambda dispatch. This operator
  * keeps every hot expression (regex split is per row; the per-token
  * conditionals and sums) inside whole-stage codegen: tokens are exploded
  * once, all metrics become conditional sums with map-side partial
  * aggregation (shuffle size = |docs| x ~9 ints), and docs with zero tokens
  * are restored by the left join. Results are bit-identical to the per-row
  * [[Text]] formulations (same counts, same double arithmetic order).
  */
object TextProfile {

  /** doc-level profile: n_tokens, tok_chars, n_stop, per-language marker
    * hits, lang_pred, stopword_ratio, mean_word_len, quality. */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val posts = df.select(id, explode(Text.tokens(col(textCol))).as("tok"))

    val langAggs = Text.LangMarkers.map { case (lang, words) =>
      sum(when(col("tok").isin(words: _*), 1).otherwise(0)).as(s"h_$lang")
    }
    val aggs = Seq(
      count(lit(1)).as("n_tokens"),
      sum(length(col("tok"))).as("tok_chars"),
      sum(when(col("tok").isin(Text.StopwordsEn: _*), 1).otherwise(0))
        .as("n_stop")) ++ langAggs

    val counted = posts.groupBy(idCol).agg(aggs.head, aggs.tail: _*)

    val joined = df.join(counted, Seq(idCol), "left")
    val nTok = coalesce(col("n_tokens"), lit(0L))
    val chars = coalesce(col("tok_chars"), lit(0L))
    val nStop = coalesce(col("n_stop"), lit(0L))

    // argmax with LangMarkers precedence: earlier language wins ties
    val hits = Text.LangMarkers.map { case (lang, _) =>
      lang -> coalesce(col(s"h_$lang"), lit(0L))
    }
    val best = hits.tail.foldLeft(
      struct(lit(hits.head._1).as("lang"), hits.head._2.as("hits"))) {
      case (acc, (lang, h)) =>
        when(h > acc.getField("hits"),
          struct(lit(lang).as("lang"), h.as("hits"))).otherwise(acc)
    }
    val langPred = when(best.getField("hits") > 0, best.getField("lang"))
      .otherwise(lit("und"))

    val stopRatio = when(nTok > 0,
      nStop.cast("double") / nTok.cast("double")).otherwise(lit(0.0))
    val mwl = when(nTok > 0,
      chars.cast("double") / nTok.cast("double")).otherwise(lit(0.0))

    val lenScore = least(nTok.cast("double") / 20.0, lit(1.0))
    val wordScore = when(mwl >= 3.0 && mwl <= 10.0, 1.0).otherwise(0.5)
    val stopScore = when(stopRatio > 0.01, 1.0).otherwise(0.5)
    val punctScore = when(Text.punctRatio(col(textCol)) < 0.2, 1.0).otherwise(0.5)
    val quality =
      round((lenScore + wordScore + stopScore + punctScore) / 4.0, 4)

    joined.select(id, col(textCol),
      nTok.as("n_tokens"), chars.as("tok_chars"), nStop.as("n_stop"),
      langPred.as("lang_pred"), stopRatio.as("stopword_ratio"),
      mwl.as("mean_word_len"), quality.as("quality"))
  }
}
