package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bootstrap, DataCard, Outliers}

/** Poisson-bootstrap CI (q169), data cards (q170), embedding outlier
  * audit composition (q171). */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bootstrap ci: constant group collapses, shift moves the interval") {
    val a = (1 to 40).map(i => ("a", i.toLong, (i % 7).toLong + 10))
    val b = a.map { case (_, id, x) => ("b", id + 1000, x + 100) }
    val c = (1 to 40).map(i => ("c", i.toLong + 2000, 7L))
    val out = Bootstrap.poissonMeanCi(
        (a ++ b ++ c).toDF("src", "id", "x"), "src", "id", col("x"))
      .select("src", "n_rows", "mean", "ci_lo", "ci_hi", "ci_width")
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (ga, gb, gc) = (out("a"), out("b"), out("c"))
    assert(gc._3 == 7.0 && gc._4 == 7.0 && gc._5 == 7.0 && gc._6 == 0.0)
    assert(ga._4 <= ga._3 && ga._3 <= ga._5 && ga._6 > 0.0)
    assert(gb._4 > ga._5)  // +100 shift: intervals must not overlap
    // deterministic: a second run reproduces bit-identical values
    val again = Bootstrap.poissonMeanCi(
        (a ++ b ++ c).toDF("src", "id", "x"), "src", "id", col("x"))
      .select("src", "ci_lo", "ci_hi").as[(String, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again("a") == ((ga._4, ga._5)))
  }

  test("data cards: dup rate, tie-broken top language, quantiles") {
    val docs = Seq(
      (1L, "one two three four", "en", "s", 18L),
      (2L, "one two three four", "en", "s", 18L), // exact dup
      (3L, "a b", "de", "s", 3L),
      (4L, "c d e f g h", "de", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = DataCard.sourceCards(docs, "source", "doc_id", "text",
        "lang", shortChars = 10)
      .select("n_docs", "n_distinct_texts", "dup_rate", "pct_short",
        "top_lang", "top_lang_share", "p50_tok")
      .as[(Long, Long, Double, Double, String, Double, Double)].head()
    assert(out._1 == 4L && out._2 == 3L && out._3 == 0.25)
    assert(out._4 == 0.25)             // only "a b" is under 10 chars
    assert(out._5 == "de" && out._6 == 0.5) // 2-2 tie -> lang asc
    assert(out._7 == 4.0)              // tokens 4,4,2,6 -> median 4
  }

  test("source jsd: symmetric twins tie, the alien source ranks first") {
    import graft.operators.Divergence
    val docs = (Seq.fill(10)(("a", "x y z")) ++
      Seq.fill(10)(("b", "x y z")) ++ Seq.fill(10)(("c", "q r s")))
      .toDF("source", "text")
    val out = Divergence.sourceJsd(docs, "source", "text")
      .select("source", "n_tokens", "jsd", "jsd_rank")
      .as[(String, Long, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a")._3 == out("b")._3) // identical dists, same rest
    assert(out("c")._3 > out("a")._3 && out("c")._4 == 1)
    assert(out.values.forall(_._2 == 30L))
  }

  test("source jsd maxVocab: top-V cap reports drops and scores the kept support exactly") {
    import graft.operators.Divergence
    // planted long tail: three head words dominate (count 30 each);
    // source c additionally carries six singleton tail words
    def head(tail: Boolean) = (Seq.fill(10)(("a", "x y z")) ++
      Seq.fill(10)(("b", "x y y")) ++ Seq.fill(10)(("c", "x z z")) ++
      (if (tail) Seq(("c", "t1 t2 t3 t4 t5 t6")) else Nil))
      .toDF("source", "text")
    val capped = Divergence.sourceJsd(head(tail = true), "source", "text",
        maxVocab = Some(3))
      .select("source", "n_tokens", "n_types", "jsd",
        "dropped_tokens", "dropped_types")
      .as[(String, Long, Long, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // telemetry: only c dropped anything, and it says exactly what
    assert(capped("a")._5 == 0L && capped("a")._6 == 0L)
    assert(capped("b")._5 == 0L && capped("b")._6 == 0L)
    assert(capped("c")._5 == 6L && capped("c")._6 == 6L)
    assert(capped("c")._2 == 30L && capped("c")._3 == 2L) // kept totals
    // the capped score IS the exact uncapped JSD of the kept support:
    // same postings, same totals, same smoothing V — not a truncated sum
    val kept = Divergence.sourceJsd(head(tail = false), "source", "text")
      .select("source", "jsd").as[(String, Double)].collect().toMap
    for (s <- Seq("a", "b", "c"))
      assert(capped(s)._4 == kept(s), s"capped jsd for $s: " +
        s"${capped(s)._4} != uncapped-of-kept ${kept(s)}")
    // a cap wider than the vocabulary is a no-op with zero telemetry
    val wide = Divergence.sourceJsd(head(tail = false), "source", "text",
        maxVocab = Some(100))
      .select("source", "jsd", "dropped_tokens", "dropped_types")
      .as[(String, Double, Long, Long)].collect().map(r => r._1 -> r).toMap
    for (s <- Seq("a", "b", "c"))
      assert(wide(s)._2 == kept(s) && wide(s)._3 == 0L && wide(s)._4 == 0L)
  }

  test("burstiness: clockwork scores 0, a flash crowd scores 99") {
    import graft.operators.Sessionize
    def ts(h: Int) = new java.sql.Timestamp(1700000000000L
      + h * 3600000L)
    val uniform = (0 until 100).map(h => ("u", ts(h)))
    val crowd = Seq.fill(100)(("b", ts(0)))
    val out = Sessionize.burstiness(
        (uniform ++ crowd).toDF("g", "ts"), "g", "ts")
      .select("g", "n_buckets", "fano", "bursty")
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("u") == (("u", 100L, 0.0, false)))
    assert(out("b") == (("b", 100L, 99.0, true)))
  }

  test("embedding outlier composition: far constant vector is flagged") {
    val near = (1 to 20).map(i =>
      (i.toLong, 0, Array(1.0, 0.0, 0.1 * (i % 3))))
    val far = Seq((99L, 0, Array(50.0, 50.0, 50.0)))
    val e = (near ++ far).toDF("vec_id", "label", "v")
    val cent = e.groupBy(col("label"))
      .agg(graft.functions.Vec.sumAgg(col("v")).as("sv"),
        count(lit(1)).as("n"))
      .select(col("label"), expr("transform(sv, x -> x / n)").as("c"))
    val dist = e.join(broadcast(cent), Seq("label"))
      .select(col("label"), col("vec_id"),
        round(sqrt(graft.functions.Vec.l2sq(col("v"), col("c"))), 6)
          .as("dist"))
    val flagged = Outliers.madOutliers(dist, "label", "vec_id", "dist")
      .select("vec_id").as[Long].collect().toSet
    assert(flagged == Set(99L))
  }
}
