package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leave-one-group-out data valuation (the closed-form core of
  * datamodels/Data-Shapley-style attribution, Ghorbani & Zou 2019,
  * restricted to a linear probe where the retrain is FREE): fit a
  * reference model on everything, refit WITHOUT each source from
  * group-subtracted sufficient statistics, and read each source's
  * value as the held-out error it saves. "Which feed is helping and
  * which is poisoning the model" without |sources| retrains — the
  * curation counterpart of label-noise (q147) and drift (q149) audits:
  * those find broken DATA, this prices each source's marginal effect
  * on a MODEL.
  *
  * Everything reduces to sufficient statistics: OLS needs only
  * (n, Σx, Σy, Σxy, Σx²) per training source (one aggregate), and
  * held-out MSE of ANY (a, b) needs only the eval split's
  * (n, Σx, Σy, Σxy, Σx², Σy²) (a second 1-row aggregate):
  * mse = (Σy² − 2aΣy − 2bΣxy + 2abΣx + a²n + b²Σx²)/n. With
  * integer-valued features the sums are EXACT longs, so both engines
  * derive identical fits; (a, b) freeze at 6 decimals before scoring
  * (the q163 stance).
  *
  * Scale posture: two aggregates over the corpus (group-keyed + the
  * 1-row eval), then |sources|-row arithmetic. The leave-out refit is
  * subtraction, not a scan. */
object Valuation {

  /** Output per training group: n_train, slope_wo, icept_wo (the fit
    * without the group, rounded 6), mse_full (constant), mse_wo,
    * delta_mse = mse_wo − mse_full (positive: removing the group HURTS
    * → it was helping), helps = delta_mse >= 0. `xCol`/`yCol` must be
    * integer-valued (cast upstream). */
  def leaveOneGroupOut(train: DataFrame, eval: DataFrame,
      groupCol: String, xCol: String, yCol: String): DataFrame = {
    def sums(df: DataFrame) = Seq(
      count(lit(1)).cast("long").as("n"),
      sum(col(xCol).cast("long")).as("sx"),
      sum(col(yCol).cast("long")).as("sy"),
      sum(col(xCol).cast("long") * col(yCol).cast("long")).as("sxy"),
      sum(col(xCol).cast("long") * col(xCol).cast("long")).as("sxx"))
    val perG = train.groupBy(col(groupCol)).agg(sums(train).head,
      sums(train).tail: _*)
    val tot = perG.agg(sum(col("n")).as("tn"), sum(col("sx")).as("tsx"),
      sum(col("sy")).as("tsy"), sum(col("sxy")).as("tsxy"),
      sum(col("sxx")).as("tsxx"))
    val ev = eval.agg(count(lit(1)).cast("long").as("en"),
      sum(col(xCol).cast("long")).as("esx"),
      sum(col(yCol).cast("long")).as("esy"),
      sum(col(xCol).cast("long") * col(yCol).cast("long")).as("esxy"),
      sum(col(xCol).cast("long") * col(xCol).cast("long")).as("esxx"),
      sum(col(yCol).cast("long") * col(yCol).cast("long")).as("esyy"))

    // OLS from sufficient stats (all longs -> identical doubles)
    def fit(n: org.apache.spark.sql.Column,
        sx: org.apache.spark.sql.Column, sy: org.apache.spark.sql.Column,
        sxy: org.apache.spark.sql.Column,
        sxx: org.apache.spark.sql.Column) = {
      val b = round((n.cast("double") * sxy - sx.cast("double") * sy)
        / (n.cast("double") * sxx - sx.cast("double") * sx), 6)
      val a = round((sy - b * sx) / n, 6)
      (a, b)
    }
    def mse(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) =
      round((col("esyy") - lit(2.0) * a * col("esy")
        - lit(2.0) * b * col("esxy") + lit(2.0) * a * b * col("esx")
        + a * a * col("en") + b * b * col("esxx")) / col("en"), 6)

    val base = perG.crossJoin(broadcast(tot)).crossJoin(broadcast(ev))
    val (aF, bF) = fit(col("tn"), col("tsx"), col("tsy"), col("tsxy"),
      col("tsxx"))
    val (aW, bW) = fit(col("tn") - col("n"), col("tsx") - col("sx"),
      col("tsy") - col("sy"), col("tsxy") - col("sxy"),
      col("tsxx") - col("sxx"))
    base
      .withColumn("slope_wo", bW).withColumn("icept_wo", aW)
      .withColumn("mse_full", mse(aF, bF))
      .withColumn("mse_wo", mse(col("icept_wo"), col("slope_wo")))
      .select(col(groupCol), col("n").as("n_train"), col("slope_wo"),
        col("icept_wo"), col("mse_full"), col("mse_wo"),
        round(col("mse_wo") - col("mse_full"), 6).as("delta_mse"))
      .withColumn("helps", col("delta_mse") >= 0)
  }
}
