package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Conformal, Rerank, Vocab}

/** Vocabulary saturation (q161), MMR re-ranking (q162), split-conformal
  * calibration (q163) — hand fixtures with known outcomes. */
class VocabRerankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("good-turing fof, unseen mass, and smoothed counts on a fixture") {
    // counts: a=3 b=2 c=1 -> N=6 V=3 N1=1; N_r = 1 for r=1,2,3
    val docs = Seq("a a a", "b b c").toDF("text")
    val out = Vocab.saturation(docs, "text", maxR = 4, zipfTopN = 10)
      .select("r", "n_r", "r_star", "p0_unseen", "vocab", "n_tokens",
        "zipf_slope")
      .as[(Long, Long, Option[Double], Double, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1L && out(2L)._2 == 1L && out(3L)._2 == 1L
      && out(4L)._2 == 0L)
    assert(out(1L)._3.contains(2.0))   // (1+1)*N2/N1 = 2*1/1
    assert(out(2L)._3.contains(3.0))   // (2+1)*N3/N2 = 3*1/1
    assert(out(3L)._3.isEmpty)         // N4 absent
    assert(out(1L)._4 == 0.166667 && out(1L)._5 == 3L && out(1L)._6 == 6L)
    assert(out(1L)._7 < 0.0)           // Zipf slope negative
  }

  test("mmr: diversity penalty demotes the near-duplicate of pick 1") {
    val cand = Seq((1L, 10L, 0.90), (1L, 11L, 0.85), (1L, 12L, 0.50))
      .toDF("qid", "cid", "rel")
    val sims = Seq((1L, 10L, 11L, 0.95), (1L, 10L, 12L, 0.10),
      (1L, 11L, 12L, 0.10)).toDF("qid", "a", "b", "sim")
    val picks = Rerank.mmr(cand, "qid", "cid", "rel", sims, "sim",
        lambda = 0.7, k = 2)
      .orderBy("sel_rank").select("cand_id", "mmr_score")
      .as[(Long, Double)].collect()
    // step2: 11 scores .7*.85-.3*.95 = 0.31 < 12's .7*.5-.3*.1 = 0.32
    assert(picks.map(_._1).toSeq == Seq(10L, 12L))
    assert(picks(0)._2 == 0.63 && picks(1)._2 == 0.32)
    // pure relevance (lambda=1) keeps the paraphrase
    val rel = Rerank.mmr(cand, "qid", "cid", "rel", sims, "sim",
        lambda = 1.0, k = 2)
      .orderBy("sel_rank").select("cand_id").as[Long].collect()
    assert(rel.toSeq == Seq(10L, 11L))
  }

  test("conformal: exact order-statistic qhat and coverage verdicts") {
    val cal = (1 to 9).map(i => ("g", i.toDouble)).toDF("grp", "s")
    val tst = Seq(("g", 2.0), ("g", 5.0), ("g", 9.0), ("g", 10.0))
      .toDF("grp", "s")
    val strict = Conformal.splitConformal(cal, tst, "grp", "s",
        alpha = 0.1, slack = 0.05)
      .select("n_cal", "n_test", "qhat", "coverage", "covered")
      .as[(Long, Long, Double, Double, Boolean)].head()
    // k = ceil(10*0.9) = 9 -> qhat = 9; coverage 3/4
    assert(strict == ((9L, 4L, 9.0, 0.75, false)))
    val loose = Conformal.splitConformal(cal, tst, "grp", "s",
        alpha = 0.5, slack = 0.05)
      .select("qhat", "coverage", "covered")
      .as[(Double, Double, Boolean)].head()
    // k = ceil(10*0.5) = 5 -> qhat = 5; coverage 2/4 >= 0.45
    assert(loose == ((5.0, 0.5, true)))
  }
}
