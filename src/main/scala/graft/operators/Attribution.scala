package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution — split each conversion's credit
  * across the marketing/content touches that preceded it inside a
  * lookback window, under the five standard models side by side
  * (first-touch, last-touch, linear, position-based U-shape 40/20/40,
  * exponential time-decay). Channel budget decisions hinge on the
  * model choice; computing all five in one pass over the same touch
  * assignment makes the disagreement itself the deliverable.
  *
  * Semantics: a touch is attributed to a conversion of the SAME
  * subject when touch_ts ∈ [conv_ts − lookback, conv_ts). Touches may
  * serve several conversions (standard); conversions with no touch in
  * the window carry no credit. Per conversion each model's credits
  * sum to exactly 1 (position-based: k=1 → 1, k=2 → ½/½, else
  * 0.4/0.2-shared/0.4; time-decay: weights 2^(−Δt/half-life)
  * normalized per conversion).
  *
  * Scale posture: the touch→conversion assignment is a subject-keyed
  * equi-join with a range predicate — it shuffles each side once on
  * the subject key and never compares across subjects; per-conversion
  * ordering rides a (subject, conversion)-partitioned window sized by
  * the lookback, and the final rollup is a |channels|-keyed hash
  * aggregate. Nothing global is sorted. */
object Attribution {

  /** Credit per channel. `touches`: (userCol, tsCol, idCol,
    * channelCol); `conversions`: (userCol, tsCol, idCol). Output per
    * channel: n_touches, n_convs (distinct conversions touched), and
    * the five credit totals (rounded 4), ordered by channel. */
  def multiTouch(touches: DataFrame, conversions: DataFrame,
      userCol: String, tsCol: String, idCol: String, channelCol: String,
      lookbackHours: Int = 72, halfLifeHours: Double = 24.0): DataFrame = {
    val t = touches.select(col(userCol).as("u"),
      unix_micros(col(tsCol)).as("tus"), col(idCol).as("tid"),
      col(channelCol).as("channel"))
    val c = conversions.select(col(userCol).as("u"),
      unix_micros(col(tsCol)).as("cus"), col(idCol).as("cid"))
    val lookbackUs = lookbackHours.toLong * 3600L * 1000000L
    val assigned = t.join(c, Seq("u"))
      .filter(col("tus") < col("cus")
        && col("tus") >= col("cus") - lit(lookbackUs))
    val wc = Window.partitionBy(col("u"), col("cid"))
    val wo = wc.orderBy(col("tus"), col("tid"))
    val scored = assigned
      .withColumn("pos", row_number().over(wo))
      .withColumn("k", count(lit(1)).over(wc))
      .withColumn("dw", pow(lit(0.5),
        (col("cus") - col("tus")).cast("double")
          / lit(halfLifeHours * 3600.0 * 1000000.0)))
      .withColumn("dw_tot", sum(col("dw")).over(wc))
      .select(col("channel"), col("cid"),
        when(col("pos") === 1, 1.0).otherwise(0.0).as("c_first"),
        when(col("pos") === col("k"), 1.0).otherwise(0.0).as("c_last"),
        (lit(1.0) / col("k")).as("c_linear"),
        when(col("k") === 1, 1.0)
          .when(col("k") === 2, 0.5)
          .when(col("pos") === 1 || col("pos") === col("k"), 0.4)
          .otherwise(lit(0.2) / (col("k") - 2)).as("c_position"),
        (col("dw") / col("dw_tot")).as("c_decay"))
    scored.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("cid")).as("n_convs"),
        round(sum(col("c_first")), 4).as("credit_first"),
        round(sum(col("c_last")), 4).as("credit_last"),
        round(sum(col("c_linear")), 4).as("credit_linear"),
        round(sum(col("c_position")), 4).as("credit_position"),
        round(sum(col("c_decay")), 4).as("credit_decay"))
  }
}
