package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LshPlan

/** S-curve banding planner: closed-form spot values, factorization
  * enumeration, band-count monotonicity, and the chosen-config contract. */
class LshPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("enumerates exactly the factorizations of k") {
    val rows = LshPlan.sCurve(spark, 24, 0.7).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 24L), (2L, 12L), (3L, 8L), (4L, 6L), (6L, 4L),
        (8L, 3L), (12L, 2L), (24L, 1L)))
    assert(rows.count(_.getAs[Boolean]("chosen")) == 1)
  }

  test("masses integrate the closed-form curve") {
    // b=6, r=4, grid i/20: fp = sum_{s<0.7} p(s)/20, fn = sum_{s>=0.7}(1-p)/20
    val ps = (1 to 19).map { i =>
      val s = r6(i / 20.0)
      r6(1.0 - math.pow(1.0 - math.pow(s, 4), 6))
    }
    val fp = r6(ps.zipWithIndex
      .filter { case (_, i) => (i + 1) / 20.0 < 0.7 }.map(_._1).sum / 20)
    val fn = r6(ps.zipWithIndex
      .filter { case (_, i) => (i + 1) / 20.0 >= 0.7 }
      .map(1.0 - _._1).sum / 20)
    val row = LshPlan.sCurve(spark, 24, 0.7).collect()
      .find(r => r.getLong(0) == 6L).get
    assert(row.getAs[Double]("fp_mass") == fp)
    assert(row.getAs[Double]("fn_mass") == fn)
    assert(row.getAs[Double]("total_err") == r6(fp + fn))
  }

  test("more bands -> more false positives, fewer false negatives") {
    val rows = LshPlan.sCurve(spark, 24, 0.7).collect()
      .sortBy(_.getLong(0))
    val fps = rows.map(_.getAs[Double]("fp_mass")).toSeq
    val fns = rows.map(_.getAs[Double]("fn_mass")).toSeq
    assert(fps == fps.sorted)
    assert(fns == fns.sorted.reverse)
  }
}
