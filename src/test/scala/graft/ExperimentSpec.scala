package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Experiment, Preference}

/** CUPED A/B readout (q172) and preference-transitivity audit (q173). */
class ExperimentSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cuped: theta=2 fixture — means preserved, variance collapses") {
    // y = 2x (+10 under treatment) -> pooled theta exactly 2, and the
    // adjusted metric is constant within each arm
    val users = (1 to 4).map(i => ("ctrl", i.toDouble, 2.0 * i)) ++
      (1 to 4).map(i => ("treat", i.toDouble, 2.0 * i + 10))
    val out = Experiment.cuped(users.toDF("arm", "x", "y"),
        "arm", "x", "y")
      .select("arm", "n_users", "mean_pre", "mean_post", "mean_adj",
        "var_post", "var_adj", "theta", "var_reduction")
      .as[(String, Long, Double, Double, Double, Double, Double,
        Double, Double)].collect().map(r => r._1 -> r).toMap
    val c = out("ctrl"); val tr = out("treat")
    assert(c._8 == 2.0 && c._3 == 2.5)
    assert(c._4 == 5.0 && c._5 == 5.0)    // CUPED preserves the mean
    assert(tr._4 == 15.0 && tr._5 == 15.0)
    assert(c._6 == 5.0 && c._7 == 0.0)    // within-arm variance -> 0
    assert(c._9 == 0.166667)              // pooled 1 - 25/30
    assert(tr._5 - c._5 == 10.0)          // uplift intact
  }

  test("cycle audit: planted cycle flagged, transitive triad is not") {
    val comps =
      Seq.fill(2)(("A", "B")) ++ Seq(("B", "A")) ++ // majority A->B
      Seq.fill(2)(("B", "C")) ++ Seq.fill(2)(("C", "A")) ++
      Seq(("D", "E"), ("E", "F"), ("D", "F")) ++
      Seq(("G", "H"), ("H", "G")) // tied -> no edge, no triad
    val out = Preference.cycleAudit(comps.toDF("w", "l"), "w", "l")
      .select("x", "y", "z", "cyclic")
      .as[(String, String, String, Boolean)].collect().toSet
    assert(out == Set(("A", "B", "C", true), ("D", "E", "F", false)))
  }
}
