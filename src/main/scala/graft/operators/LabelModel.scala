package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weak-supervision label model — the majority-vote + accuracy-weighted
  * re-vote core of data programming (Ratner et al. 2017, Snorkel; the
  * full generative model learns the same per-LF accuracy weights by SGD —
  * the agreement-with-consensus estimator here is its closed-form
  * bootstrap, and the published MV baseline). The training-data use:
  * labeling functions (LFs — cheap heuristics that vote +1/−1 or abstain
  * 0) label corpora no human could, but individual LFs are noisy and
  * some are anti-correlated; estimating each LF's accuracy against the
  * consensus and re-voting with weights ln(acc/(1−acc)) (the optimal
  * log-odds weight for independent voters) recovers signal even from an
  * adversarial LF — its weight goes NEGATIVE and its votes invert.
  *
  * Scale posture: the votes frame (one row per (doc, LF), the long
  * format) shuffles twice on the doc key (consensus vote, weighted
  * re-vote) and once on the LF key (the accuracy aggregate — |LFs| output
  * rows, broadcast back). Nothing is quadratic; the model "parameters"
  * are an |LFs|-row frame, never a driver-side object.
  *
  * Determinism: accuracies are exact count ratios; weights round to 6
  * before the re-vote, weighted scores to 4 before the sign — the
  * repo-wide rounded-boundary stance. */
object LabelModel {

  /** Per-LF accuracy against the majority-vote consensus, estimated on
    * rows where both the LF voted (vote != 0) and the consensus is
    * decisive (mv != 0). acc is clipped to [eps, 1−eps] so a perfect or
    * perfectly-wrong LF gets a finite weight. Output: lf, n_votes,
    * n_agree, acc (rounded 6), weight = ln(acc/(1−acc)) (rounded 6). */
  def lfAccuracies(votes: DataFrame, idCol: String, lfCol: String,
      voteCol: String, eps: Double = 0.01): DataFrame = {
    val mv = votes.groupBy(col(idCol))
      .agg(signum(sum(col(voteCol))).cast("int").as("__mv"))
      .filter(col("__mv") =!= 0)
    val acc = votes.filter(col(voteCol) =!= 0)
      .join(mv, Seq(idCol))
      .groupBy(col(lfCol))
      .agg(count(lit(1)).as("n_votes"),
        sum(when(col(voteCol) === col("__mv"), 1L).otherwise(0L))
          .as("n_agree"))
      .withColumn("acc",
        round(least(greatest(
          col("n_agree").cast("double") / col("n_votes"), lit(eps)),
          lit(1.0 - eps)), 6))
    acc.withColumn("weight",
      round(log(col("acc") / (lit(1.0) - col("acc"))), 6))
  }

  /** Accuracy-weighted re-vote: per doc, w_score = Σ vote·weight(LF)
    * (rounded 4), label = sign(w_score). Output: id, n_votes (non-abstain
    * LFs on this doc), mv (the plain majority sign), w_score, label. */
  def weightedVote(votes: DataFrame, idCol: String, lfCol: String,
      voteCol: String, eps: Double = 0.01): DataFrame = {
    val weights = lfAccuracies(votes, idCol, lfCol, voteCol, eps)
      .select(col(lfCol), col("weight"))
    votes.join(broadcast(weights), Seq(lfCol), "left")
      .groupBy(col(idCol))
      .agg(
        sum(when(col(voteCol) =!= 0, 1L).otherwise(0L)).as("n_votes"),
        signum(sum(col(voteCol))).cast("int").as("mv"),
        round(sum(col(voteCol) * coalesce(col("weight"), lit(0.0))), 4)
          .as("w_score"))
      .withColumn("label", signum(col("w_score")).cast("int"))
  }
}
