package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benford first-significant-digit audit (Newcomb 1881 / Benford 1938;
  * Nigrini's forensic-accounting methodology made it the standard
  * fabricated-data screen): naturally-grown magnitudes (transaction
  * amounts, populations, file sizes) follow P(d) = log10(1 + 1/d),
  * while invented, truncated, or unit-capped numbers don't. As a
  * corpus-ops audit it screens numeric feeds per source — a synthetic
  * or clipped slice shows up as a large Pearson χ² against the Benford
  * expectation, BEFORE anyone models on it. The verdict threshold
  * (χ² with 8 df: 15.5 at 5%) is the caller's policy; this emits the
  * per-digit decomposition and the statistic.
  *
  * Digit extraction is arithmetic, not string: d = floor(v / 10^floor(
  * log10 v)) for v > 0 — identical IEEE evaluation in any engine (the
  * only boundary risk is v within an ulp of a power of 10, where log10
  * is correctly rounded to the exact integer anyway). Non-positive
  * values are excluded (Benford is defined on magnitudes; the caller
  * pre-filters or takes abs as policy).
  *
  * Scale posture: one scan -> hash aggregate keyed (group, digit) — at
  * most 9 rows per group, map-side combined; expectation and χ² are
  * arithmetic over that frame with a |9|-row window for the group
  * totals. Nothing else shuffles. */
object Benford {

  /** Per (group, digit): n_d, observed and expected shares (rounded 6),
    * the χ² contribution (O−E)²/E (rounded 4), and the group's total χ²
    * (repeated per row — a windowed constant). Digits with zero count
    * still appear (their expected mass contributes to χ²). */
  def firstDigitAudit(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol)
    val digit = floor(v / pow(lit(10.0), floor(log10(v)))).cast("long")
    val counts = df.filter(v > 0)
      .select(col(keyCol), digit.as("digit"))
      .groupBy(col(keyCol), col("digit"))
      .agg(count(lit(1)).as("n_d"))
    // dense (group, 1..9) axis so zero-count digits still contribute
    val digits = df.sparkSession.range(1, 10)
      .select(col("id").as("digit"))
    val grid = counts.select(col(keyCol)).distinct()
      .crossJoin(broadcast(digits))
    val full = grid.join(counts, Seq(keyCol, "digit"), "left")
      .na.fill(0L, Seq("n_d"))
    val w = Window.partitionBy(col(keyCol))
    val n = sum(col("n_d")).over(w)
    val expP = log(10.0, lit(1.0) + lit(1.0) / col("digit"))
    val expN = n * expP
    full
      .withColumn("obs_p", round(col("n_d") / n, 6))
      .withColumn("exp_p", round(expP, 6))
      .withColumn("contrib",
        round((col("n_d") - expN) * (col("n_d") - expN) / expN, 4))
      .withColumn("chi2", round(sum(col("contrib")).over(w), 4))
  }
}
