package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Doremi, LmScore}

/** CCNet perplexity bucketing and DoReMi domain reweighting: hand-computed
  * cutoffs/weights, null-loss handling, empty degradation. */
class ReweightSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tercileCuts + perplexityBuckets: hand-computed exact terciles") {
    val scored = Seq((1L, Some(-1.0)), (2L, Some(-2.0)), (3L, Some(-3.0)),
      (4L, Some(-4.0)), (5L, Some(-5.0)), (6L, None))
      .toDF("id", "lm_score")
    val cuts = LmScore.tercileCuts(scored, "lm_score", exact = true)
      .collect().head
    // sorted [-5,-4,-3,-2,-1]: c1 at pos 4/3 -> -4 + 1/3; c2 at 8/3
    assert(cuts.getDouble(0) == -3.666667 && cuts.getDouble(1) == -2.333333)
    val buckets = LmScore.perplexityBuckets(scored,
        LmScore.tercileCuts(scored, "lm_score", exact = true))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(buckets == Map(1L -> "head", 2L -> "head", 3L -> "middle",
      4L -> "tail", 5L -> "tail", 6L -> "unscored"))
  }

  test("domainReweight: hand-computed EG step") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0)).toDF("dom", "l")
    val out = Doremi.domainReweight(df, "dom", col("l"),
        eta = 1.0, smoothing = 0.0)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // corpus mean 5/3 -> 1.666667; excess_a = 0.333333, excess_b = 0
    val ew = math.exp(0.333333)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("a") == ((2L, 2.0, 0.333333, r6(ew / (ew + 1)))))
    assert(out("b") == ((1L, 1.0, 0.0, r6(1 / (ew + 1)))))
  }

  test("domainReweight: uniform smoothing mixes in, weights sum to ~1") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0)).toDF("dom", "l")
    val w = Doremi.domainReweight(df, "dom", col("l"),
        eta = 1.0, smoothing = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val ew = math.exp(0.333333)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(w("a") == r6(0.5 * ew / (ew + 1) + 0.25))
    assert(w("b") == r6(0.5 / (ew + 1) + 0.25))
    assert(math.abs(w.values.sum - 1.0) < 1e-5)
  }

  test("null losses are excluded from counts and means") {
    val df = Seq(("a", Some(2.0)), ("a", None), ("b", Some(2.0)))
      .toDF("dom", "l")
    val out = Doremi.domainReweight(df, "dom", col("l"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out("a") == ((1L, 2.0)) && out("b") == ((1L, 2.0)))
  }

  test("empty inputs degrade to empty outputs") {
    val df = Seq.empty[(String, Double)].toDF("dom", "l")
    assert(Doremi.domainReweight(df, "dom", col("l")).collect().isEmpty)
    val s = Seq.empty[(Long, Double)].toDF("id", "lm_score")
    assert(LmScore.perplexityBuckets(s,
      LmScore.tercileCuts(s, "lm_score", exact = true)).collect().isEmpty)
  }
}
