package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Classify, Drift, Outliers, Privacy}

/** Pipeline-monitoring operators (q147-q150): label-noise audit, MAD
  * outliers, PSI drift, k-anonymity — hand fixtures with known verdicts
  * plus degenerate-input behavior. */
class MonitoringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("madOutliers flags the planted extreme and only it") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("a", 4L, 4.0), ("a", 5L, 100.0),
      ("b", 6L, 10.0), ("b", 7L, 11.0), ("b", 8L, 12.0))
      .toDF("g", "id", "v")
    val out = Outliers.madOutliers(df, "g", "id", "v", k = 3.0)
      .select("g", "id").as[(String, Long)].collect().toSeq
    // a: median 3, MAD 1 -> id 5 scores 97/1.4826 ~ 65; others <= 1.35
    // b: median 11, MAD 1 -> max score 1/1.4826 < 3
    assert(out == Seq(("a", 5L)))
  }

  test("madOutliers skips MAD=0 groups instead of dividing by zero") {
    val df = Seq(("c", 1L, 5.0), ("c", 2L, 5.0), ("c", 3L, 5.0),
      ("c", 4L, 5.0), ("c", 5L, 50.0)).toDF("g", "id", "v")
    assert(Outliers.madOutliers(df, "g", "id", "v").count() == 0L)
  }

  test("psi is zero on identical slices, alarms on a shift") {
    val base = (0 until 10).flatMap(i => Seq.fill(10)(("g", i.toDouble)))
      .toDF("g", "v")
    val same = Drift.psi(base, base, "g", "v", bins = 10)
    val rows = same.select("contrib", "psi").as[(Double, Double)]
      .collect().toSeq
    assert(rows.size == 10 && rows.forall(r => r._1 == 0.0 && r._2 == 0.0))
    val shifted = base.select(col("g"), (col("v") + 5.0).as("v"))
    val psi = Drift.psi(base, shifted, "g", "v", bins = 10)
      .select("psi").as[Double].head()
    assert(psi > 0.25) // alarm threshold
  }

  test("psi degenerate constant baseline lands all mass in bin 0") {
    val base = Seq(("g", 7.0), ("g", 7.0)).toDF("g", "v")
    val cur = Seq(("g", 7.0), ("g", 9.0)).toDF("g", "v")
    val out = Drift.psi(base, cur, "g", "v", bins = 10)
      .select("bin", "n_base", "n_cur").as[(Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(out.head == ((0L, 2L, 2L)))
    assert(out.tail.forall(r => r._2 == 0L && r._3 == 0L))
  }

  test("kAnonymityAudit verdicts on hand groups") {
    val df = Seq(
      ("n1", "s1", "ok"), ("n1", "s1", "debt"), ("n1", "s1", "ok"),
      ("n1", "s1", "ok"), ("n1", "s1", "ok"), // size 5, both values
      ("n2", "s2", "ok"), ("n2", "s2", "ok")) // size 2, one value
      .toDF("nation", "seg", "fin")
    val out = Privacy.kAnonymityAudit(df, Seq("nation", "seg"), "fin",
        k = 5, l = 2)
      .orderBy("nation")
      .select("nation", "group_size", "l_distinct", "k_anonymous",
        "l_diverse")
      .as[(String, Long, Long, Boolean, Boolean)].collect().toSeq
    assert(out == Seq(("n1", 5L, 2L, true, true),
      ("n2", 2L, 1L, false, false)))
  }

  test("labelNoise surfaces exactly the flipped row") {
    val good = (1L to 6L).map(i => (i, "alpha beta gamma", "good"))
    val junk = (11L to 16L).map(i => (i, "zork quux blarg", "junk"))
    val flipped = Seq((99L, "alpha beta gamma", "junk"))
    val train = (good ++ junk ++ flipped).toDF("id", "text", "label")
    val out = Classify.labelNoise(train, "id", "text", "label",
        "good", "junk")
      .select("id", "given_label", "prediction")
      .as[(Long, String, String)].collect().toSeq
    assert(out == Seq((99L, "junk", "good")))
  }
}
