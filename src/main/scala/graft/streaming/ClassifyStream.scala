package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.Classify

/** Streaming NB quality scoring — the serving lane of [[Classify]]: train
  * once in batch, then score an unbounded document stream statelessly.
  *
  * Design constraint: the batch scorer joins exploded tokens against the
  * vocab table and re-aggregates per doc — in a stream that is a stateful
  * aggregation (watermarks, state store). Serving flips the shape: a
  * TRAINED classifier is model-sized, not corpus-sized (the fastText /
  * CCNet serving stance — the same driver-side-model policy as the Lloyd
  * centroids and PQ codebooks), so the per-token log-odds contributions
  * fold into a LITERAL map column and each document scores as a per-row
  * higher-order fold over its own token array. The streaming plan is
  * pure projection: no join, no aggregation, no state, any output mode.
  *
  * The per-token weight is w(t) = ln P(t|pos) - ln P(t|neg) (unseen
  * tokens get the smoothing-mass weight — negative when T_pos > T_neg,
  * the hash-soup signal); a document's log_odds = prior + sum w(t),
  * rounded to 4 like the batch scorer (summation-order stance), so stream
  * and batch agree on every rounded score and prediction.
  */
object ClassifyStream {

  /** A served NB model: per-token log-odds weights + the constants. */
  case class NbModel(weights: Map[String, Double], unseenWeight: Double,
      logPrior: Double, posLabel: String, negLabel: String)

  /** Train on a batch frame and collect the model driver-side
    * (vocab-sized — the serving assumption; guards as in
    * [[Classify.nbTrainScore]]: stray labels dropped, single-class or
    * empty training fails loudly here at train time). */
  def trainModel(train: DataFrame, textCol: String, labelCol: String,
      posLabel: String, negLabel: String,
      alpha: Double = 1.0): NbModel = {
    val isPos = col(labelCol) === lit(posLabel)
    val labeled = Classify.labeledOnly(train, labelCol, posLabel, negLabel)
    val counts = Classify.vocabCounts(labeled, textCol, isPos)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
    val (tPos, tNeg) = counts.foldLeft((0L, 0L)) {
      case ((p, n), (_, (cp, cn))) => (p + cp, n + cn)
    }
    val vsz = counts.length.toLong
    val Seq(dPos, dNeg) = labeled
      .agg(sum(when(isPos, 1L).otherwise(0L)),
        sum(when(!isPos, 1L).otherwise(0L)))
      .collect().headOption
      .map(r => Seq(if (r.isNullAt(0)) 0L else r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1)))
      .getOrElse(Seq(0L, 0L))
    require(dPos > 0 && dNeg > 0,
      s"ClassifyStream.trainModel: training must contain both classes; " +
        s"'$posLabel' count=$dPos, '$negLabel' count=$dNeg")
    def w(cp: Long, cn: Long): Double =
      math.log((cp + alpha) / (tPos + alpha * vsz)) -
        math.log((cn + alpha) / (tNeg + alpha * vsz))
    NbModel(counts.map { case (t, (cp, cn)) => t -> w(cp, cn) }.toMap,
      w(0L, 0L), math.log(dPos.toDouble / dNeg), posLabel, negLabel)
  }

  /** Per-row log-odds of `text` under the served model: a codegen'd fold
    * over the token array against the literal weight map. */
  def logOdds(text: Column, m: NbModel): Column = {
    val wmap = typedLit(m.weights)
    round(aggregate(Text.tokens(text), lit(m.logPrior),
      (acc, t) => acc +
        coalesce(element_at(wmap, t), lit(m.unseenWeight))), 4)
  }

  /** Score a (streaming or batch) frame: (id, n_tokens, log_odds,
    * prediction) — the same contract as [[Classify.nbTrainScore]]'s
    * output, as a stateless projection. */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      m: NbModel): DataFrame =
    docs.select(col(idCol).as("id"),
        size(Text.tokens(col(textCol))).cast("long").as("n_tokens"),
        logOdds(col(textCol), m).as("log_odds"))
      .withColumn("prediction",
        when(col("log_odds") > 0, lit(m.posLabel))
          .otherwise(lit(m.negLabel)))
}
