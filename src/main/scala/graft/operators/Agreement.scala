package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — Cohen's kappa (Cohen 1960), the standard
  * label-QA statistic before human (or heuristic) annotations become
  * training labels: raw percent agreement is inflated by chance whenever
  * the label distribution is skewed, and kappa corrects for exactly that
  * (po = observed agreement, pe = agreement two independent annotators
  * with the same marginals would reach by chance; kappa =
  * (po − pe)/(1 − pe), read against the conventional Landis-Koch bands).
  * Complements the model-side label QA ([[Classify.labelNoise]] finds
  * rows whose label looks wrong; kappa says whether the labeling PROCESS
  * is reliable enough to trust at all).
  *
  * Scale posture: one corpus scan -> hash aggregate keyed on (group,
  * labelA, labelB) — the contingency table, |groups|·|labels|² rows;
  * every statistic (n, po, the marginal products behind pe) is
  * arithmetic over that metadata-sized frame, re-aggregated per group.
  * The corpus shuffles once, on the contingency key. */
object Agreement {

  /** Per-group Cohen's kappa over two annotation columns. Rows where
    * either annotation is null are excluded (un-annotated, not a
    * disagreement). Output per group: n, po, pe (rounded 6), kappa
    * (rounded 6; null when pe = 1 — a single-category degenerate where
    * chance agreement is total and kappa is undefined). */
  def cohenKappa(df: DataFrame, keyCol: String, aCol: String,
      bCol: String): DataFrame = {
    val ct = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(keyCol), col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val totals = ct.groupBy(col(keyCol)).agg(
      sum(col("__c")).as("__n"),
      sum(when(col("__a") === col("__b"), col("__c")).otherwise(0L))
        .as("__agree"))
    val margA = ct.groupBy(col(keyCol), col("__a").as("__cat"))
      .agg(sum(col("__c")).as("__ca"))
    val margB = ct.groupBy(col(keyCol), col("__b").as("__cat"))
      .agg(sum(col("__c")).as("__cb"))
    val chance = margA.join(margB, Seq(keyCol, "__cat"))
      .groupBy(col(keyCol))
      .agg(sum(col("__ca") * col("__cb")).as("__sprod"))
    totals.join(chance, Seq(keyCol))
      .select(col(keyCol), col("__n").as("n"),
        round(col("__agree").cast("double") / col("__n"), 6).as("po"),
        round(col("__sprod").cast("double") / (col("__n") * col("__n")), 6)
          .as("pe"))
      .withColumn("kappa",
        round((col("po") - col("pe"))
          / nullif(lit(1.0) - col("pe"), lit(0.0)), 6))
  }
}
