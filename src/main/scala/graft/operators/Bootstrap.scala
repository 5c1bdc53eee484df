package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Percentile-bootstrap confidence intervals via the Poisson bootstrap
  * (Chamandy et al. 2012, "Estimating Uncertainty for Massive Data
  * Streams" — Google's production resampling): instead of drawing n
  * rows with replacement (which needs global coordination), give every
  * row an independent Poisson(1) weight per replicate — the counts a
  * true resample would produce, asymptotically — and read the CI off
  * the replicate-statistic quantiles. The eval-infra use: "source A's
  * mean quality is 0.03 above B's" is meaningless without an interval;
  * this attaches one to any per-group mean without distributional
  * assumptions.
  *
  * Determinism (the engine-parity discipline): the Poisson draw is the
  * inverse-CDF of an md5-derived uniform (the q45/q76/q126 md5-keyed
  * stance — seedless, partitioning-independent, replayable in any
  * engine with md5); replicate means are kept as INTEGER (num, den)
  * pairs and rounded by integer arithmetic (⌊(2·num·10⁶ + den) /
  * (2·den)⌋ — exact HALF_UP, no float at a decimal boundary), and
  * quantile indices are integer ceil((q·B)) via (q·B + 999) div 1000.
  *
  * Scale posture: the replicate explode is B× the metric column only
  * (a long), map-side combined into |groups|·B partial sums; the
  * quantile pick is a window over the |groups|·B replicate frame.
  * Nothing corpus-sized is sorted or rebroadcast. */
object Bootstrap {

  /** 95% percentile-bootstrap CI of the per-group mean of `metric`
    * (a NON-NEGATIVE integer-valued column; scale/quantize first
    * otherwise — negative values raise, because the exact integer
    * HALF_UP rounding below is floor-division-based and only
    * half-up-correct for non-negative num/den).
    * Output per group: n_rows, mean, ci_lo, ci_hi, ci_width (all
    * means rounded 6 by exact integer HALF_UP). */
  def poissonMeanCi(df: DataFrame, groupCol: String, idCol: String,
      metric: Column, b: Int = 200): DataFrame = {
    // exact HALF_UP 6-dp rounding of num/den in pure long arithmetic
    // (both non-negative — guarded at scan below — so truncating and
    // floor division agree)
    def r6(numC: String, denC: String): Column =
      expr(s"($numC * 2000000L + $denC) div ($denC * 2)")
        .cast("double") / 1e6

    val xv = metric.cast("long")
    val base = df.select(col(groupCol).as("g"), col(idCol).as("id"),
      when(xv < 0, raise_error(concat(
          lit("Bootstrap.poissonMeanCi: metric must be non-negative "
            + "(integer HALF_UP rounding is floor-based); got "),
          xv.cast("string"))))
        .otherwise(xv).as("x"))
    val reps = base
      .withColumn("__rep", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("u", pmod(Text.md5Long(
        concat(col("id").cast("string"), lit("_"),
          col("__rep").cast("string"))), lit(1000000L)))
      // Poisson(1) inverse CDF at 1e-6 resolution, carried to w=6
      // (remaining tail mass P(w>=7) ≈ 8.3e-5 collapses into 6 — at
      // 1e-6 u-resolution only the <1e-4 tail is quantized away)
      .withColumn("w",
        when(col("u") < 367879L, 0L).when(col("u") < 735759L, 1L)
          .when(col("u") < 919699L, 2L).when(col("u") < 981012L, 3L)
          .when(col("u") < 996340L, 4L).when(col("u") < 999406L, 5L)
          .otherwise(6L))
    // replicate axis "__rep" is LITERAL-bounded (0..b-1), so the
    // (g, __rep) aggregate is a |groups| x b metadata frame and the
    // per-g windows below are width-bounded by the replicate count —
    // the name is what PlanGuardSpec's few-key sweep recognizes
    val perRep = reps.groupBy(col("g"), col("__rep"))
      .agg(sum(col("w") * col("x")).as("num"), sum(col("w")).as("den"))
      .filter(col("den") > 0)
    val wOrd = Window.partitionBy(col("g"))
      .orderBy((col("num").cast("double") / col("den")).asc,
        col("__rep").asc)
    val wAll = Window.partitionBy(col("g"))
    val picked = perRep
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("nb", count(lit(1)).over(wAll))
      .withColumn("lo_i", expr("(25 * nb + 999) div 1000"))
      .withColumn("hi_i", expr("(975 * nb + 999) div 1000"))
      .groupBy(col("g"))
      .agg(max(when(col("rn") === col("lo_i"),
          r6("num", "den"))).as("ci_lo"),
        max(when(col("rn") === col("hi_i"),
          r6("num", "den"))).as("ci_hi"))
    val overall = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n_rows"), sum(col("x")).as("sx"))
      .select(col("g"), col("n_rows"),
        r6("sx", "n_rows").as("mean"))
    overall.join(picked, Seq("g"))
      .select(col("g").as(groupCol), col("n_rows"), col("mean"),
        col("ci_lo"), col("ci_hi"),
        round(col("ci_hi") - col("ci_lo"), 6).as("ci_width"))
  }
}
