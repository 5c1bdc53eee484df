package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MinHash-LSH banding design audit — the S-curve procedure of Leskovec,
  * Rajaraman & Ullman (Mining of Massive Datasets §3.4.3, public): with k
  * minhashes split into b bands of r rows (b*r = k), a pair of Jaccard
  * similarity s becomes a candidate with probability
  *
  *   P(candidate | s) = 1 - (1 - s^r)^b
  *
  * The curve's step position moves with (b, r): more bands -> more
  * candidates (higher recall, more false positives), longer rows -> fewer.
  * This planner enumerates every factorization of k and integrates the
  * false-positive mass (candidates below the target threshold) and
  * false-negative mass (misses above it) over a similarity grid, ranking
  * configurations by total error — the knob-picking audit behind
  * [[Dedup.minhashLshPairs]] (q20) and the embedding LSH family (q29).
  *
  * Purely closed-form arithmetic over a |divisors(k)| x gridN frame —
  * metadata-sized at any corpus scale (the planner reads the DATA MODEL,
  * not the data); the one ranking window runs over |divisors(k)| rows.
  * Determinism: s and each probability round to 6 before any sum; masses
  * round after (sums of <= gridN 6-decimal terms — 1e-15 noise cannot
  * move a 6-decimal boundary).
  */
object LshPlan {

  /** One row per (bands, rows) factorization of `k`: integrated
    * false-positive / false-negative mass against `threshold` over a
    * `gridN`-point similarity grid, total error, and `chosen` on the
    * minimum-error configuration (ties -> smallest b). */
  def sCurve(spark: SparkSession, k: Int, threshold: Double,
      gridN: Int = 19): DataFrame = {
    require(k >= 1 && gridN >= 1, "k and gridN must be positive")
    val step = gridN + 1
    val configs = spark.range(1, k + 1L).toDF("b")
      .filter(lit(k) % col("b") === 0)
      .withColumn("r", expr(s"$k div b"))
    val probs = configs
      .withColumn("i", explode(sequence(lit(1), lit(gridN))))
      .withColumn("s", round(col("i").cast("double") / step, 6))
      .withColumn("p", round(lit(1.0)
        - pow(lit(1.0) - pow(col("s"), col("r")), col("b")), 6))
    val masses = probs.groupBy(col("b"), col("r")).agg(
      round(sum(when(col("s") < threshold, col("p")).otherwise(0.0))
        / step, 6).as("fp_mass"),
      round(sum(when(col("s") >= threshold, lit(1.0) - col("p"))
        .otherwise(0.0)) / step, 6).as("fn_mass"))
    val ranked = Window.orderBy(col("total_err"), col("b"))
    masses
      .withColumn("total_err", round(col("fp_mass") + col("fn_mass"), 6))
      .withColumn("chosen", row_number().over(ranked) === 1)
      .orderBy(col("b"))
  }
}
