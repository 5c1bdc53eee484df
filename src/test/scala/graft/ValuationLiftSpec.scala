package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Lift, Mix, Valuation}

/** LOSO data valuation (q174), class-balanced weights (q175),
  * selection gain table (q176). */
class ValuationLiftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("loso valuation: dropping the corrupt source improves the fit") {
    // clean sources live on y = 2x + 1; the corrupt one is orthogonal
    val clean = for (s0 <- Seq("c1", "c2"); i <- 1 to 10)
      yield (s0, i.toLong, 2L * i + 1)
    val corrupt = (1 to 10).map(i => ("bad", i.toLong, 60L - 5 * i))
    val evalRows = (11 to 20).map(i => ("e", i.toLong, 2L * i + 1))
    val out = Valuation.leaveOneGroupOut(
        (clean ++ corrupt).toDF("src", "x", "y"),
        evalRows.toDF("src", "x", "y"), "src", "x", "y")
      .select("src", "mse_full", "mse_wo", "delta_mse", "helps")
      .as[(String, Double, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("bad")._3 < out("bad")._2 && !out("bad")._5)
    assert(out("bad")._3 < 1e-6) // without it the fit is exact
    assert(out("c1")._5 && out("c2")._5)
  }

  test("class-balanced weights: exact effective numbers at beta=0.5") {
    val df = (Seq.fill(1)("a") ++ Seq.fill(2)("b")).toDF("cls")
    val out = Mix.classBalancedWeights(df, "cls", beta = 0.5)
      .select("cls", "n", "eff_n", "weight")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a")._3 == 1.0 && out("b")._3 == 1.5)
    assert(out("a")._4 == 1.2 && out("b")._4 == 0.8) // sum == k
  }

  test("gain table: perfect-ordering fixture concentrates lift on top") {
    val rows = (1 to 20).map(i => (i.toLong, i.toDouble,
      if (i > 15) 1 else 0))
    val out = Lift.gainTable(rows.toDF("id", "score", "label"),
        "id", "score", "label", buckets = 10)
      .orderBy("bucket")
      .select("bucket", "n_rows", "n_pos", "gain", "lift")
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(out.map(_._2).forall(_ == 2L))
    assert(out.map(_._3).toSeq ==
      Seq(2L, 2L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(out(0)._5 == 4.0 && out(0)._4 == 0.4)
    assert(out(2)._4 == 1.0 && out(9)._4 == 1.0)
  }
}
