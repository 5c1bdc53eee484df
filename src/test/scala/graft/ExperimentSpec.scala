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

  test("markov stationary: absorbing state drains the periodic one") {
    import graft.operators.Graphs
    // a always -> b, b always -> b: mass flows into b and stays
    val tr = (Seq.fill(4)(("a", "b")) ++ Seq.fill(6)(("b", "b")))
      .toDF("f", "t0")
    val out = Graphs.markovStationary(tr, "f", "t0", iters = 3)
      .select("from_s", "to_s", "n", "p", "pi_from")
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out(("a", "b"))._4 == 1.0 && out(("b", "b"))._4 == 1.0)
    assert(out(("a", "b"))._5 == 0.0)  // nothing flows back into a
    assert(out(("b", "b"))._5 == 1.0)  // all mass settles on b
    // symmetric 2-cycle keeps the uniform distribution
    val sym = (Seq.fill(3)(("x", "y")) ++ Seq.fill(3)(("y", "x")))
      .toDF("f", "t0")
    val pi = Graphs.markovStationary(sym, "f", "t0", 3)
      .select("pi_from").as[Double].collect().toSeq
    assert(pi == Seq(0.5, 0.5))
  }

  test("woe/iv: separable label earns monotone woe and large iv") {
    import graft.operators.Lift
    // label = feature > 50 exactly: bottom bins pure negative, top
    // bins pure positive -> monotone WoE, IV >> 0.5
    val rows = (1 to 100).map(i => (i.toLong, i.toDouble,
      if (i > 50) 1 else 0))
    val out = Lift.woeIv(rows.toDF("id", "x", "y"), "id", "x", "y",
        bins = 5)
      .orderBy("bin").select("bin", "n_pos", "woe", "iv")
      .as[(Int, Long, Double, Double)].collect()
    assert(out.map(_._2).toSeq == Seq(0L, 0L, 10L, 20L, 20L))
    val woes = out.map(_._3)
    assert(woes.zip(woes.tail).forall { case (a, b) => a <= b })
    assert(out.head._4 > 1.0) // separable => strong IV
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
