package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Agreement, Benford, Changepoint, LabelModel}

/** Data-QA audit operators (q151-q154): CUSUM changepoint, Cohen's
  * kappa, weak-supervision label model, Benford first-digit audit —
  * hand fixtures with known verdicts plus degenerate-input behavior. */
class QaAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cusum alarms on a planted step and localizes it") {
    // reference window = the clean first 40 samples (mu 1.5, sigma
    // ~1.118); the monitored series steps +3 at t=40, so z jumps to
    // ~+1.3..+3.6 and S_pos crosses h=5 within a few post-step samples.
    val cur = (0 until 80).map(i => ("g", i.toLong,
      if (i < 40) (i % 4).toDouble else (i % 4) + 3.0)) ++
      (0 until 80).map(i => ("c", i.toLong, (i % 4).toDouble))
    val base = cur.filter(_._2 < 40)
    val out = Changepoint.cusum(base.toDF("g", "t", "v"),
        cur.toDF("g", "t", "v"), "g", "t", "v")
      .select("g", "alarm_pos", "alarm_neg", "cp_pos")
      .as[(String, Boolean, Boolean, Option[Long])].collect()
      .toMap2
    val g = out("g")
    assert(g._1 && !g._2 && g._3.exists(t => t >= 40 && t < 48))
    assert(out("c") == ((false, false, None)))
  }

  test("cusum carries the statistic through null-valued rows (window null-skip)") {
    // nulls planted INSIDE the monitored series — including a leading run
    // deep in the frame (the cross-segment case: a null addend must not
    // poison the carried prefix) — must behave exactly like the window
    // formulation's null-skipping sum: they contribute nothing to the
    // statistic, never alarm on their own, and still count in n
    val vals: Long => Option[Double] = i =>
      if (i % 7 == 3 || (i >= 45 && i < 50)) None
      else Some((i % 4).toDouble + (if (i >= 40) 3.0 else 0.0))
    val cur = (0L until 80L).map(i => ("g", i, vals(i)))
    val base = cur.filter(_._2 < 40)
    def run(rows: Seq[(String, Long, Option[Double])]) =
      Changepoint.cusum(base.toDF("g", "t", "v"),
          rows.toDF("g", "t", "v"), "g", "t", "v")
        .select("g", "n", "mu", "sigma", "max_s_pos", "max_s_neg",
          "cp_pos", "cp_neg", "alarm_pos", "alarm_neg")
        .collect().head
    val withNulls = run(cur)
    val withoutNulls = run(cur.filter(_._3.isDefined))
    assert(withNulls.getLong(1) == 80L, "n counts null-valued rows")
    assert(withoutNulls.getLong(1) == cur.count(_._3.isDefined).toLong)
    // every other column identical: null rows are pure carries
    for (i <- Seq(2, 3, 4, 5, 6, 7, 8, 9))
      assert(withNulls.get(i) == withoutNulls.get(i),
        s"column $i diverged: ${withNulls.get(i)} vs ${withoutNulls.get(i)}")
    assert(withNulls.getBoolean(8), "the planted step must still alarm")
  }

  test("cusum mirrors for downward shifts; sigma=0 groups dropped") {
    val down = (0 until 80).map(i => ("d", i.toLong,
      if (i < 40) (i % 4).toDouble else (i % 4) - 3.0))
    val const = (0 until 10).map(i => ("k", i.toLong, 7.0))
    val cur = down ++ const
    val base = cur.filter(_._2 < 40)
    val out = Changepoint.cusum(base.toDF("g", "t", "v"),
        cur.toDF("g", "t", "v"), "g", "t", "v")
      .select("g", "alarm_pos", "alarm_neg")
      .as[(String, Boolean, Boolean)].collect().toSeq
    assert(out == Seq(("d", false, true)))
  }

  test("cohenKappa corrects chance agreement; perfect and null cases") {
    // 2x2 with marginals 50/50 and 70% raw agreement:
    // po=0.7, pe=0.5, kappa=0.4
    val rows = Seq.fill(35)(("g", "y", "y")) ++ Seq.fill(35)(("g", "n", "n")) ++
      Seq.fill(15)(("g", "y", "n")) ++ Seq.fill(15)(("g", "n", "y")) ++
      Seq.fill(10)(("p", "y", "y")) ++ // perfect agreement, one category
      Seq(("x", "y", null), ("x", null, "n"), ("x", "y", "y"))
    val out = Agreement.cohenKappa(rows.toDF("g", "a", "b"), "g", "a", "b")
      .select("g", "n", "po", "pe", "kappa")
      .as[(String, Long, Double, Double, Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("g") == ((100L, 0.7, 0.5, Some(0.4))))
    // single category: pe=1, kappa undefined -> null
    assert(out("p") == ((10L, 1.0, 1.0, None)))
    // null annotations excluded, not counted as disagreement
    assert(out("x")._1 == 1L)
  }

  test("label model: adversarial LF gets negative weight and inverts") {
    // truth = sign(id % 2 == 0): lf_good votes truth on all 20 docs,
    // lf_adv votes the opposite; consensus is 2-LF so ties... add a
    // second good LF so mv is decisive and adv's accuracy is 0.
    val docs = (0L until 20L)
    val truth = (id: Long) => if (id % 2 == 0) 1 else -1
    val votes = docs.flatMap { id =>
      Seq((id, "good1", truth(id)), (id, "good2", truth(id)),
        (id, "adv", -truth(id)))
    }.toDF("id", "lf", "vote")
    val w = LabelModel.lfAccuracies(votes, "id", "lf", "vote")
      .select("lf", "acc", "weight").as[(String, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(w("good1")._1 == 0.99 && w("good1")._2 > 4.0) // eps-clipped
    assert(w("adv")._1 == 0.01 && w("adv")._2 < -4.0)
    val out = LabelModel.weightedVote(votes, "id", "lf", "vote")
      .select("id", "label").as[(Long, Int)].collect().toMap
    assert(docs.forall(id => out(id) == truth(id)))
  }

  test("label model: abstains carry no weight; near-random LF near 0") {
    val votes = ((0L until 40L).flatMap { id =>
      val t = if (id % 2 == 0) 1 else -1
      Seq((id, "g1", t), (id, "g2", t),
        // 50% accurate coin keyed on id%4; abstains on odd ids
        (id, "coin", if (id % 2 == 1) 0 else if (id % 4 == 0) 1 else -1))
    }).toDF("id", "lf", "vote")
    val w = LabelModel.lfAccuracies(votes, "id", "lf", "vote")
      .select("lf", "acc").as[(String, Double)].collect().toMap
    assert(w("coin") == 0.5) // half right on the rows it voted
    val out = LabelModel.weightedVote(votes, "id", "lf", "vote")
      .filter(col("id") % 2 === 1).select("n_votes")
      .as[Long].collect().toSeq
    assert(out.forall(_ == 2L)) // coin's abstains not counted
  }

  test("benford: compliant digits score low chi2, uniform scores high") {
    // draw counts exactly proportional to Benford for n=1000 vs
    // uniform 111 per digit
    val benford = (1 to 9).flatMap(d =>
      Seq.fill((1000 * math.log10(1.0 + 1.0 / d)).round.toInt)(
        ("ok", d * 10.0 + 1)))
    val uniform = (1 to 9).flatMap(d => Seq.fill(111)(("bad", d * 100.0)))
    val out = Benford.firstDigitAudit(
        (benford ++ uniform).toDF("g", "v"), "g", "v")
      .select("g", "chi2").as[(String, Double)].collect().toMap
    assert(out("ok") < 1.0)
    assert(out("bad") > 100.0)
  }

  test("benford: zero-count digits still contribute expected mass") {
    val only1s = Seq.fill(100)(("s", 1.5)).toDF("g", "v")
    val rows = Benford.firstDigitAudit(only1s, "g", "v")
      .select("digit", "n_d").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) == (1L to 9L) && rows.head._2 == 100L &&
      rows.tail.forall(_._2 == 0L))
    // non-positive values excluded entirely
    assert(Benford.firstDigitAudit(
      Seq(("z", -5.0), ("z", 0.0)).toDF("g", "v"), "g", "v").count() == 0L)
  }

  private implicit class MapOps[A, B, C, D](
      rows: Array[(String, A, B, C)]) {
    def toMap2: Map[String, (A, B, C)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
