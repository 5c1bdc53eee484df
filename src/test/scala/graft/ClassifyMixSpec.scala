package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Classify, Mix}

/** Classify (NB quality filter) and Mix (temperature sampling rates):
  * hand-computed fixtures, degradation behavior, and the loud-failure
  * guards (stray labels dropped, single-class/empty train raises,
  * negative weights raise, budget apportionment sums exactly). */
class ClassifyMixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Fixture model (alpha=1): pos docs "good good fine" + "good fine" ->
  // c(good)=3, c(fine)=2, T_pos=5; neg docs "bad bad awful" + "bad" ->
  // c(bad)=3, c(awful)=1, T_neg=4; V=4; priors 2/2 -> ln(1)=0.
  private def train = Seq(
    ("p1", "good good fine", "good"), ("p2", "good fine", "good"),
    ("n1", "bad bad awful", "junk"), ("n2", "bad", "junk"))
    .toDF("id", "text", "label")

  private def nb(tr: org.apache.spark.sql.DataFrame,
      sc: org.apache.spark.sql.DataFrame) =
    Classify.nbTrainScore(tr, sc, "id", "text", "label", "good", "junk")

  test("nbTrainScore matches hand-computed log-odds and predictions") {
    val score = Seq(("s1", "good bad"), ("s2", "good good fine"),
      ("s3", "   ")).toDF("id", "text")
    val out = nb(train, score).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getString(3)))).toMap
    // s1: ln(4/9 * 1/9) - ln(1/8 * 4/8) = ln(64/81) = -0.2356
    assert(out("s1") == ((2L, -0.2356, "junk")))
    // s2: ln(4/9 * 4/9 * 3/9) - 3*ln(1/8) = ln(8192/243) = 3.5179
    assert(out("s2") == ((3L, 3.5179, "good")))
    // s3: zero tokens -> priors only: ln(2/2) = 0, not > 0 -> junk
    assert(out("s3") == ((0L, 0.0, "junk")))
  }

  test("stray-label train rows are dropped, not counted as negatives") {
    val score = Seq(("s1", "good bad")).toDF("id", "text")
    val strayed = train.unionByName(Seq(
      ("x1", "zombie horde approaching", "dubious"),
      ("x2", "good fine", null.asInstanceOf[String]))
      .toDF("id", "text", "label"))
    val base = nb(train, score).collect().map(_.toSeq).toSeq
    val got = nb(strayed, score).collect().map(_.toSeq).toSeq
    assert(got == base)
  }

  test("single-class and empty training fail loudly") {
    val score = Seq(("s1", "good")).toDF("id", "text")
    for (tr <- Seq(train.filter(col("label") === "good"),
        train.limit(0))) {
      val e = intercept[Exception] { nb(tr, score).collect() }
      def chain(t: Throwable): Seq[Throwable] =
        t +: Option(t.getCause).map(chain).getOrElse(Nil)
      assert(chain(e).exists(t =>
        Option(t.getMessage).exists(_.contains("both classes"))))
    }
  }

  test("temperatureWeights alpha=1 reproduces natural shares") {
    val df = (Seq.fill(1)("a") ++ Seq.fill(3)("b") ++ Seq.fill(6)("c"))
      .toDF("dom")
    val out = Mix.temperatureWeights(df, "dom", lit(1L),
        alpha = 1.0, budget = 10L)
      .orderBy("dom").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(out.toSeq == Seq(("a", 1L, 0.1, 0.1, 1L),
      ("b", 3L, 0.3, 0.3, 3L), ("c", 6L, 0.6, 0.6, 6L)))
  }

  test("budget apportionment sums exactly to the budget") {
    val df = (1 to 7).flatMap(i => Seq.fill(i)(s"d$i")).toDF("dom")
    val out = Mix.temperatureWeights(df, "dom", lit(1L),
      alpha = 0.3, budget = 100L).collect()
    assert(out.map(_.getLong(4)).sum == 100L)
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-5)
    // natural rounding would drift here: 7 domains, shares irrational
  }

  test("negative weights raise instead of poisoning the normalizer") {
    val df = Seq(("a", 5L), ("b", -1L)).toDF("dom", "w")
    val e = intercept[Exception] {
      Mix.temperatureWeights(df, "dom", col("w")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).map(chain).getOrElse(Nil)
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("negative or null"))))
  }

  test("empty input degrades to empty output") {
    val df = Seq.empty[(String, Long)].toDF("dom", "w")
    assert(Mix.temperatureWeights(df, "dom", col("w")).collect().isEmpty)
  }

  test("temperatureSample draws exactly budget_rows per domain") {
    val df = (1L to 200L).map(i => (i, s"d${i % 4}")).toDF("id", "dom")
    val budgets = Mix.temperatureWeights(df, "dom", lit(1L),
        alpha = 0.3, budget = 37L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val sample = Mix.temperatureSample(df, "dom", lit(1L), "id",
      alpha = 0.3, budget = 37L)
    val got = sample.groupBy("dom").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == budgets.filter(_._2 > 0))
    assert(got.values.sum == 37L)
    // deterministic membership under repartitioning
    val again = Mix.temperatureSample(df.repartition(13), "dom", lit(1L),
      "id", alpha = 0.3, budget = 37L)
    assert(sample.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("calibration bins, gaps, and ECE match hand computation") {
    // sigmoid(0)=0.5 -> bin 5; sigmoid(+inf-ish)=1 -> bin 9;
    // sigmoid(-2.1972...)=0.1 -> bin 1 (log_odds = ln(1/9))
    val ln19 = math.log(1.0 / 9.0) // p = 0.1
    val rows = Seq(
      (0.0, true), (0.0, false),          // bin 5: conf .5, frac_pos .5
      (1000.0, true), (1000.0, true),     // bin 9: conf 1, frac_pos 1
      (ln19, false), (ln19, false), (ln19, true)) // bin 1: conf .1, fp 1/3
      .toDF("log_odds", "y")
    val out = Classify.calibration(rows, "log_odds", "y")
      .orderBy("bin").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 5L, 9L))
    val byBin = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(byBin(1L) == ((3L, 0.1, 0.333333, 0.233333)))
    assert(byBin(5L) == ((2L, 0.5, 0.5, 0.0)))
    assert(byBin(9L) == ((2L, 1.0, 1.0, 0.0)))
    // ECE = (3*0.233333 + 2*0 + 2*0) / 7
    val ece = out.head.getDouble(5)
    assert(ece == math.rint(3 * 0.233333 / 7 * 1e6) / 1e6)
    assert(out.forall(_.getDouble(5) == ece), "ece constant across rows")
  }

  test("calibration temperature spreads saturated scores; empty input ok") {
    val rows = Seq((100.0, true), (-100.0, false)).toDF("log_odds", "y")
    val raw = Classify.calibration(rows, "log_odds", "y")
      .select("bin").collect().map(_.getLong(0)).sorted.toSeq
    assert(raw == Seq(0L, 9L), "T=1 saturates to the outer bins")
    val t = Classify.calibration(rows, "log_odds", "y", temperature = 200.0)
      .orderBy("bin").collect()
    assert(t.map(_.getLong(0)).toSeq == Seq(3L, 6L))
    assert(Classify.calibration(rows.limit(0), "log_odds", "y")
      .collect().isEmpty)
  }

  /** Sequential UniMax waterfill (the paper's loop) — the oracle for the
    * closed-form implementation: ascending corpus size, each language gets
    * min(cap, remaining / languagesLeft). */
  private def waterfill(ts: Seq[(String, Long)], c: Long, b: Long)
      : Map[String, Double] = {
    var rem = b.toDouble
    var left = ts.size
    ts.sortBy { case (d, t) => (c * t, d) }.map { case (d, t) =>
      val a = math.min((c * t).toDouble, rem / left)
      rem -= a; left -= 1
      d -> a
    }.toMap
  }

  private def unimaxOut(ts: Seq[(String, Long)], c: Long, b: Long) =
    Mix.unimax(ts.toDF("dom", "w"), "dom", col("w"), c, lit(b))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq

  test("unimax closed form matches the sequential waterfill") {
    // head/tail mix: caps bind on the tail, the head splits the leftover
    val ts = Seq(("en", 900L), ("fr", 350L), ("es", 80L), ("sw", 30L),
      ("yo", 7L))
    for ((c, b) <- Seq((1L, 800L), (2L, 800L), (4L, 2000L), (1L, 100L))) {
      val want = waterfill(ts, c, b)
      val got = unimaxOut(ts, c, b)
      got.foreach { case (d, t, capped, alloc, epochs) =>
        assert(math.abs(alloc - want(d)) < 1e-3, s"$d at c=$c b=$b")
        assert(capped == (if (want(d) == (c * t).toDouble) 1L else 0L),
          s"capped flag for $d at c=$c b=$b")
        assert(math.abs(epochs - alloc / t) < 1e-5)
      }
      // allocations exhaust the budget unless every language hit its cap
      val full = ts.map(_._2 * c).sum
      val expect = math.min(full, b).toDouble
      assert(math.abs(got.map(_._4).sum - expect) < 1e-2)
    }
  }

  test("unimax: all-capped when budget exceeds the capped corpus; " +
      "uncapped shares equal") {
    val ts = Seq(("a", 10L), ("b", 20L), ("c", 30L))
    val all = unimaxOut(ts, 2L, 1000L)
    assert(all.forall(_._3 == 1L))
    assert(all.map(_._4).sum == 120.0)
    assert(all.forall(r => r._5 == 2.0), "capped languages run c epochs")
    // tight budget: nothing capped, every language gets b/n
    val none = unimaxOut(ts, 2L, 15L)
    assert(none.forall(_._3 == 0L))
    assert(none.forall(_._4 == 5.0))
  }

  /** Independent IRLS reference: same rounding contract (sums to 6, beta
    * to 9) but a DIFFERENT solver (Gaussian elimination with partial
    * pivoting vs the operator's in-plan Cramer), so agreement is not
    * circular. */
  private def irlsRef(data: Seq[(Long, Double, Double, Int)], iters: Int)
      : (Double, Double, Double) = {
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    var b = (0.001, 0.0, 0.0) // the operator's off-grid intercept init
    for (_ <- 1 to iters) {
      var g = Array(0.0, 0.0, 0.0)
      val h = Array.ofDim[Double](3, 3)
      data.foreach { case (_, x1, x2, y) =>
        val mu = 1.0 / (1.0 + math.exp(-(b._1 + b._2 * x1 + b._3 * x2)))
        val w = mu * (1 - mu)
        val xs = Array(1.0, x1, x2)
        for (j <- 0 to 2) {
          g(j) += xs(j) * (y - mu)
          for (k <- 0 to 2) h(j)(k) += w * xs(j) * xs(k)
        }
      }
      g = g.map(r6)
      for (j <- 0 to 2; k <- 0 to 2) h(j)(k) = r6(h(j)(k))
      // Gaussian elimination with partial pivoting
      val a = Array.tabulate(3)(j => h(j) :+ g(j))
      for (p <- 0 to 2) {
        val piv = (p to 2).maxBy(r => math.abs(a(r)(p)))
        val t = a(p); a(p) = a(piv); a(piv) = t
        for (r <- p + 1 to 2) {
          val f = a(r)(p) / a(p)(p)
          for (c <- p to 3) a(r)(c) -= f * a(p)(c)
        }
      }
      val d = Array(0.0, 0.0, 0.0)
      for (r <- 2 to 0 by -1)
        d(r) = (a(r)(3) - (r + 1 to 2).map(c => a(r)(c) * d(c)).sum) / a(r)(r)
      b = (r9(b._1 + d(0)), r9(b._2 + d(1)), r9(b._3 + d(2)))
    }
    b
  }

  test("logisticTrainScore matches an independent IRLS reference") {
    val data = (1 to 60).map { i =>
      val x1 = (i % 7).toDouble / 7.0
      val x2 = (i % 5).toDouble / 5.0
      // noisy linear rule so the fit is non-degenerate
      val y = if (2.0 * x1 - 1.5 * x2 + (if (i % 3 == 0) 0.8 else -0.3) > 0)
        1 else 0
      (i.toLong, x1, x2, y)
    }
    val df = data.toDF("id", "x1", "x2", "y")
    for (iters <- Seq(1, 2)) {
      val want = irlsRef(data, iters)
      val got = Classify.logisticTrainScore(df, "id", col("x1"), col("x2"),
        col("y"), iters).limit(1).collect()(0)
      val (b0, b1, b2) =
        (got.getDouble(3), got.getDouble(4), got.getDouble(5))
      assert(math.abs(b0 - want._1) < 1e-6, s"b0 at iters=$iters")
      assert(math.abs(b1 - want._2) < 1e-6, s"b1 at iters=$iters")
      assert(math.abs(b2 - want._3) < 1e-6, s"b2 at iters=$iters")
    }
    // the fitted scorer separates the (mostly) linear rule well
    val scored = Classify.logisticTrainScore(df, "id", col("x1"), col("x2"),
      col("y"), 2).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // the fixture flips 1-in-3 rows against the linear rule, so the best
    // achievable linear fit sits well under 1.0; 0.75 = rule recovered
    val acc = data.count { case (i, _, _, y) => scored(i) == y.toLong }
      .toDouble / data.size
    assert(acc >= 0.75, f"training accuracy $acc%.2f")
  }

  test("rocAuc: hand-computed tie-aware AUC and ROC operating points") {
    // scores: 0.9(+), 0.8(-), 0.8(+), 0.3(-). Ascending ranks: 0.3 -> 1,
    // 0.8 -> avg(2,3) = 2.5 each, 0.9 -> 4. Positive rank sum = 2.5 + 4 =
    // 6.5; AUC = (6.5 - 2*3/2) / (2*2) = 0.875 (equals the trapezoid
    // under the tie-diagonal ROC).
    val df = Seq((0.9, 1), (0.8, 0), (0.8, 1), (0.3, 0)).toDF("sc", "y")
    val out = Classify.rocAuc(df, "sc", "y").orderBy(col("threshold").desc)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (0.9, 1L, 0.5, 0.0, 0.875),
      (0.8, 2L, 1.0, 0.5, 0.875),
      (0.3, 1L, 1.0, 1.0, 0.875)))
    // perfect separation -> AUC 1; reversed -> 0
    val perf = Seq((0.9, 1), (0.1, 0)).toDF("sc", "y")
    assert(Classify.rocAuc(perf, "sc", "y").collect()(0).getDouble(4) == 1.0)
    val rev = Seq((0.9, 0), (0.1, 1)).toDF("sc", "y")
    assert(Classify.rocAuc(rev, "sc", "y").collect()(0).getDouble(4) == 0.0)
  }

  test("tokenMutualInformation: hand-computed 4-cell MI, presence not " +
      "frequency") {
    // d1 "apple banana"(+), d2 "apple apple"(+), d3 "banana"(-),
    // d4 "cherry"(-): N=4, c1=2. apple: perfectly informative, MI = ln 2.
    // banana: one doc each side, MI = 0. cherry: only-negative singleton,
    // MI = .25 ln 2 + .5 ln(4/3) + .25 ln(2/3) = 0.215762. d2's repeated
    // "apple" counts ONCE (document presence, not term frequency).
    val df = Seq((1L, "apple banana", 1), (2L, "apple apple", 1),
      (3L, "banana", 0), (4L, "cherry", 0)).toDF("id", "text", "y")
    val out = Classify.tokenMutualInformation(df, "id", "text", col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("apple") == ((2L, 2L, 0.693147)))
    assert(out("banana") == ((2L, 1L, 0.0)))
    assert(out("cherry") == ((1L, 0L, 0.215762)))
    // ranking: apple > cherry > banana; k truncates
    val top2 = Classify.tokenMutualInformation(df, "id", "text", col("y"),
      k = 2).collect().map(_.getString(0)).toSeq
    assert(top2 == Seq("apple", "cherry"))
  }

  test("rocAuc raises on single-class input") {
    val df = Seq((0.9, 1), (0.1, 1)).toDF("sc", "y")
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).map(chain).getOrElse(Nil)
    val e = intercept[Exception] { Classify.rocAuc(df, "sc", "y").collect() }
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("single-class"))))
  }

  test("rocAuc raises on EMPTY input too (not a silent empty frame)") {
    // the scaladoc's loud-failure promise: an empty upstream filter used
    // to slip past the guard because the global agg's null sums made the
    // raise condition null (ADVICE r12)
    val df = Seq((0.9, 1), (0.1, 0)).toDF("sc", "y").filter(col("sc") > 2.0)
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).map(chain).getOrElse(Nil)
    val e = intercept[Exception] { Classify.rocAuc(df, "sc", "y").collect() }
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("empty input"))),
      s"expected the loud empty-input raise, got: $e")
  }

  test("logisticTrainScore raises on a singular Hessian") {
    val df = (1 to 10).map(i => (i.toLong, 0.0, 0.0, i % 2))
      .toDF("id", "x1", "x2", "y")
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).map(chain).getOrElse(Nil)
    val e = intercept[Exception] {
      Classify.logisticTrainScore(df, "id", col("x1"), col("x2"),
        col("y")).collect()
    }
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("singular Hessian"))))
  }

  test("unimax guards: non-positive budget and negative weights raise") {
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).map(chain).getOrElse(Nil)
    val df = Seq(("a", 5L), ("b", 3L)).toDF("dom", "w")
    val e1 = intercept[Exception] {
      Mix.unimax(df, "dom", col("w"), 1L, lit(0L)).collect()
    }
    assert(chain(e1).exists(t =>
      Option(t.getMessage).exists(_.contains("budget must be positive"))))
    val e2 = intercept[Exception] {
      Mix.unimax(Seq(("a", -1L)).toDF("dom", "w"), "dom", col("w"),
        1L, lit(10L)).collect()
    }
    assert(chain(e2).exists(t =>
      Option(t.getMessage).exists(_.contains("negative or null"))))
    intercept[IllegalArgumentException] {
      Mix.unimax(df, "dom", col("w"), 0L, lit(10L))
    }
  }
}
