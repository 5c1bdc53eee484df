package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.RowIds

/** Classifier-selection gain/lift table — the decile view that prices
  * a quality scorer before it gates a pipeline: sort by score, cut
  * into equal buckets, and report per bucket the positive rate, the
  * cumulative share of positives captured (gain), and the rate
  * relative to base (lift). A scorer whose top decile captures 40% of
  * the positives at 4× lift earns its inference cost; one near
  * gain ≈ decile/10 is noise. Complements the threshold-free view
  * (q123's calibration/ECE) with the budget-bound one: "if I can
  * afford to keep only 20%, what do I get?"
  *
  * Determinism: the bucket cut is SQL-standard ntile over a TOTAL
  * order (score desc, id asc) — both engines assign identical buckets
  * (earlier buckets take the remainder); rates are integer ratios
  * rounded 6.
  *
  * Scale posture: ntile is computed WITHOUT the naive
  * `ntile(n).over(Window.orderBy(...))` single-task window. The rank
  * comes from [[RowIds.denseByOrder]] (range-repartition + in-partition
  * sort + metadata prefix offsets — a normal parallel sort), and the
  * bucket is the SQL-standard ntile closed form in pure integer
  * arithmetic on (rank, N): with s = N div n and r = N mod n the first
  * r buckets take s+1 rows and the rest s, i.e.
  * bucket = (rn−1) div (s+1) + 1 when rn ≤ r·(s+1), else
  * r + (rn − r·(s+1) − 1) div s + 1 — bit-identical to the standard
  * window function at any scale, with no single-partition exchange. */
object Lift {

  /** SQL-standard `ntile(n)` over `order` (must be a total order for
    * determinism) as `bucketCol` (int, 1..n), built on the two-phase
    * parallel rank instead of an unpartitioned window. */
  private[graft] def ntileByOrder(df: DataFrame, order: Seq[Column],
      n: Int, bucketCol: String): DataFrame = {
    require(n > 0, s"ntile bucket count must be positive (got $n)")
    val rn = RowIds.denseByOrder(df, "__rn", order)
    val nTot = rn.agg(count(lit(1)).as("__N"))
    // closed form of the SQL-standard remainder distribution; greatest
    // guards the (dead: rn > N is impossible when s = 0) divisor under
    // ANSI division semantics
    rn.crossJoin(broadcast(nTot))
      .withColumn(bucketCol, expr(
        s"""cast(case
           |  when __rn <= (__N % $n) * (__N div $n + 1)
           |    then (__rn - 1) div (__N div $n + 1) + 1
           |  else __N % $n
           |    + (__rn - (__N % $n) * (__N div $n + 1) - 1)
           |      div greatest(__N div $n, 1) + 1
           |end as int)""".stripMargin))
      .drop("__rn", "__N")
  }

  /** Output per bucket 1..n: n_rows, n_pos, pos_rate, cum_pos, gain
    * (cum_pos/total_pos), lift (pos_rate/base_rate), rounded 6. */
  def gainTable(scored: DataFrame, idCol: String, scoreCol: String,
      labelCol: String, buckets: Int = 10): DataFrame = {
    val base = scored.select(col(idCol), col(scoreCol),
      col(labelCol).cast("long").as("__pos"))
    val bucketed = ntileByOrder(base,
      Seq(col(scoreCol).desc, col(idCol).asc), buckets, "bucket")
    val per = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__pos")).as("n_pos"))
    val tot = per.agg(sum(col("n_rows")).as("tn"),
      sum(col("n_pos")).as("tp"))
    // n-row post-aggregate frame: the unpartitioned cumulative window is
    // metadata-sized by construction
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per.crossJoin(broadcast(tot))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .select(col("bucket"), col("n_rows"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n_rows"), 6)
          .as("pos_rate"),
        col("cum_pos"),
        round(col("cum_pos").cast("double") / col("tp"), 6).as("gain"),
        round((col("n_pos").cast("double") / col("n_rows"))
          / (col("tp").cast("double") / col("tn")), 6).as("lift"))
  }

  /** Weight-of-evidence / information-value audit (the credit-scoring
    * standard, Siddiqi 2006) — equal-frequency bins of a raw FEATURE
    * against a binary label: WoE_b = ln(pos-share_b / neg-share_b)
    * (Laplace-smoothed, the Drift.psi convention) and
    * IV = Σ_b (pos-share − neg-share)·WoE. The read: IV < 0.02 means
    * the feature carries nothing, 0.1–0.5 is a real predictor, and a
    * non-monotone WoE ladder flags a feature that needs splitting —
    * all BEFORE any model is trained, which is why feature triage at
    * scale runs on WoE tables rather than model retrains.
    *
    * Same determinism/scale stance as [[gainTable]]: the parallel
    * closed-form ntile over a total (feature, id) order; all shares
    * integer-derived; the IV total is a sum of 6-dp-rounded
    * contributions (exact at 6dp). */
  def woeIv(df: DataFrame, idCol: String, featureCol: String,
      labelCol: String, bins: Int = 5): DataFrame = {
    val base = df.select(col(idCol), col(featureCol),
      col(labelCol).cast("long").as("__pos"))
    val bucketed = ntileByOrder(base,
      Seq(col(featureCol).asc, col(idCol).asc), bins, "bin")
    val per = bucketed.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__pos")).as("n_pos"))
      .withColumn("n_neg", col("n_rows") - col("n_pos"))
    val tot = per.agg(sum(col("n_pos")).as("tp"),
      sum(col("n_neg")).as("tneg"))
    // bins-row post-aggregate frame; the single-partition routing of
    // partitionBy(lit) is safe only because of that
    val wAll = Window.partitionBy(lit(1))
    val shared = per.crossJoin(broadcast(tot))
      .withColumn("pos_share", round((col("n_pos") + lit(0.5))
        / (col("tp") + lit(bins * 0.5)), 6))
      .withColumn("neg_share", round((col("n_neg") + lit(0.5))
        / (col("tneg") + lit(bins * 0.5)), 6))
      .withColumn("woe",
        round(log(col("pos_share") / col("neg_share")), 6))
      .withColumn("iv_contrib",
        round((col("pos_share") - col("neg_share")) * col("woe"), 6))
    shared
      .withColumn("iv", round(sum(col("iv_contrib")).over(wAll), 6))
      .select(col("bin"), col("n_rows"), col("n_pos"), col("pos_share"),
        col("neg_share"), col("woe"), col("iv_contrib"), col("iv"))
  }
}
