package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Attribution, Preference, Survival}
import graft.operators.Drift

/** Preference/survival/drift/attribution operators (q155-q158):
  * Bradley-Terry MM ranking, Kaplan-Meier curves, two-sample KS,
  * multi-touch attribution — hand fixtures with known verdicts. */
class RankSurvivalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------------------------------------------------------- BT

  test("bradley-terry corrects for opponent strength") {
    // S farms wins off two weak players; X's 2-0 came against a weak
    // opponent while Y's 2-0 came against S — equal win counts, but BT
    // must rank Y above X (a raw win-rate ties them).
    val comps = Seq.fill(3)(("S", "W1")) ++ Seq.fill(3)(("S", "W2")) ++
      Seq.fill(2)(("X", "W1")) ++ Seq.fill(2)(("Y", "S"))
    val out = Preference.bradleyTerry(
        comps.toDF("winner", "loser"), "winner", "loser")
      .select("player", "games", "wins", "strength")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("X")._3 == 2L && out("Y")._3 == 2L)
    assert(out("X")._2 == 2L && out("Y")._2 == 2L)
    assert(out("Y")._4 > out("X")._4)
    assert(math.abs(out.values.map(_._4).sum - 1.0) < 1e-4)
  }

  test("bradley-terry: symmetric record gives equal strength") {
    val comps = Seq(("A", "B"), ("B", "A"), ("A", "B"), ("B", "A"))
    val out = Preference.bradleyTerry(
        comps.toDF("winner", "loser"), "winner", "loser")
      .select("player", "strength", "rnk")
      .as[(String, Double, Int)].collect().map(r => r._1 -> r).toMap
    assert(out("A")._2 == out("B")._2)
    assert(out("A")._3 == 1 && out("B")._3 == 1) // dense ties
    assert(Preference.bradleyTerry(
      Seq.empty[(String, String)].toDF("winner", "loser"),
      "winner", "loser").count() == 0L)
  }

  // ---------------------------------------------------------------- KM

  test("kaplan-meier matches the textbook worked example") {
    // durations (event?): 1e 2e 2c 3e 4c 5e ->
    // S(1)=5/6, S(2)=5/6*4/5=2/3, S(3)=2/3*2/3=4/9, S(5)=0
    val subj = Seq(("g", 1L, true), ("g", 2L, true), ("g", 2L, false),
      ("g", 3L, true), ("g", 4L, false), ("g", 5L, true))
    val out = Survival.kaplanMeier(
        subj.toDF("g", "dur", "ev"), "g", "dur", "ev")
      .orderBy("t")
      .select("t", "n_risk", "n_event", "n_censored", "survival")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 5L))
    assert(out.map(_._2).toSeq == Seq(6L, 5L, 3L, 1L))
    assert(out.map(_._5).toSeq ==
      Seq(0.833333, 0.666667, 0.444444, 0.0))
    assert(out(1)._4 == 1L) // the censor tied at t=2 is reported there
  }

  test("kaplan-meier: censor-only group emits no rows; groups isolate") {
    val subj = Seq(("a", 1L, true), ("a", 2L, false),
      ("c", 3L, false), ("c", 4L, false))
    val out = Survival.kaplanMeier(
        subj.toDF("g", "dur", "ev"), "g", "dur", "ev")
      .select("g", "t", "n_risk", "survival")
      .as[(String, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(("a", 1L, 2L, 0.5)))
  }

  // ---------------------------------------------------------------- KS

  test("ks: exact D on tied data; disjoint rejects, identical accepts") {
    val base = Seq.fill(50)(("k", 1.0)) ++ Seq.fill(50)(("k", 2.0)) ++
      (1 to 100).map(i => ("same", i.toDouble)) ++
      (1 to 100).map(i => ("far", i.toDouble))
    val cur = Seq.fill(25)(("k", 1.0)) ++ Seq.fill(75)(("k", 2.0)) ++
      (1 to 100).map(i => ("same", i.toDouble)) ++
      (1 to 100).map(i => ("far", i + 1000.0))
    val out = Drift.ksTest(base.toDF("g", "v"), cur.toDF("g", "v"),
        "g", "v")
      .select("g", "d_stat", "reject_05")
      .as[(String, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out("k")._2 == 0.25)       // |0.5 - 0.25| at v=1, 0 at v=2
    assert(out("same")._2 == 0.0 && !out("same")._3)
    assert(out("far")._2 == 1.0 && out("far")._3)
  }

  test("inter-arrival fit: exponential sample passes, clockwork fails") {
    import graft.operators.Sessionize
    def mkEvents(grp: String, gapsSec: Seq[Double]) = {
      var t = 0.0
      gapsSec.zipWithIndex.map { case (g, i) =>
        t += g
        (grp, 1L, new java.sql.Timestamp(1700000000000L
          + (t * 1000).toLong), i.toLong)
      }
    }
    // inverse-CDF exponential grid at rate 0.1 -> near-perfect fit
    val n = 200
    val expGaps = (0 until n).map(i =>
      -math.log(1.0 - (i + 0.5) / n) / 0.1)
    // constant 10s gaps -> maximally non-exponential
    val clock = Seq.fill(n)(10.0)
    val df = (mkEvents("exp", expGaps) ++ mkEvents("clock", clock))
      .toDF("g", "uid", "ts", "eid")
    val out = Sessionize.interArrivalExpFit(df, "g", col("uid"),
        col("ts"), col("eid"))
      .select("g", "n_gaps", "ks_stat", "exp_ok")
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("exp")._2 == (n - 1).toLong && out("exp")._4,
      s"exponential sample rejected: ${out("exp")}")
    assert(!out("clock")._4 && out("clock")._3 > 4.0)
  }

  // --------------------------------------------------------- attribution

  test("multi-touch: all five models split one conversion correctly") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val touches = Seq((1L, ts(1), 10L, "chA"), (1L, ts(2), 11L, "chB"),
      (1L, ts(3), 12L, "chC"),
      // 73h before the conversion -> outside the 72h lookback
      (1L, java.sql.Timestamp.valueOf("2023-12-29 03:00:00"), 13L,
        "chOld"))
    val late = Seq((1L, ts(5), 14L, "chLate")) // after the conversion
    val convs = Seq((1L, ts(4), 99L))
    val out = Attribution.multiTouch(
        (touches ++ late).toDF("u", "ts", "id", "ch"),
        convs.toDF("u", "ts", "id"), "u", "ts", "id", "ch",
        lookbackHours = 72, halfLifeHours = 24.0)
      .select("channel", "credit_first", "credit_last", "credit_linear",
        "credit_position", "credit_decay")
      .as[(String, Double, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(!out.contains("chOld") && !out.contains("chLate"))
    assert(out("chA")._2 == 1.0 && out("chC")._2 == 0.0)
    assert(out("chC")._3 == 1.0 && out("chA")._3 == 0.0)
    assert(out("chA")._4 == 0.3333 && out("chB")._4 == 0.3333)
    assert(out("chA")._5 == 0.4 && out("chB")._5 == 0.2
      && out("chC")._5 == 0.4)
    // decay: nearer touches earn strictly more; credits sum to 1
    assert(out("chC")._6 > out("chB")._6 && out("chB")._6 > out("chA")._6)
    assert(math.abs(out.values.map(_._6).sum - 1.0) < 1e-3)
  }

  test("multi-touch: k=1 and k=2 conventions; no-touch conversion") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val touches = Seq((1L, ts(1), 10L, "a"),
      (2L, ts(1), 20L, "a"), (2L, ts(2), 21L, "b"))
    val convs = Seq((1L, ts(2), 98L), (2L, ts(3), 99L),
      (3L, ts(3), 97L)) // user 3 converted untouched
    val out = Attribution.multiTouch(touches.toDF("u", "ts", "id", "ch"),
        convs.toDF("u", "ts", "id"), "u", "ts", "id", "ch")
      .select("channel", "n_convs", "credit_position", "credit_decay")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a")._2 == 2L && out("b")._2 == 1L)
    assert(out("a")._3 == 1.5 && out("b")._3 == 0.5) // 1 (solo) + 0.5
    assert(math.abs(out.values.map(_._4).sum - 2.0) < 1e-3)
  }
}
