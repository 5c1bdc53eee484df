package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Budget
import graft.pipeline.RowIds

/** The two round-2 scale-killers (VERDICT r2 #2/#3) stay dead: row-id
  * assignment and global cumulative sums must be value-identical to the
  * naive unpartitioned-window plans WITHOUT funneling data rows through a
  * single task. Value equality is checked against the naive window; the
  * plan property is checked structurally — any unpartitioned logical
  * Window in the optimized plan must sit above the per-partition METADATA
  * aggregate (one row per partition), never above raw data rows. */
class ScaleSafeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Every Window with an empty partitionSpec must have an Aggregate below
    * it (the partition-counts/subtotals metadata), i.e. it windows over
    * #partitions rows, not #data rows. */
  private def assertGlobalWindowsAreMetadataOnly(df: DataFrame): Unit = {
    val globals = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(globals.nonEmpty, "expected the metadata offset window to exist")
    globals.foreach { w =>
      val aggBelow = (w.child: LogicalPlan).collectFirst {
        case a: Aggregate => a
      }
      assert(aggBelow.nonEmpty,
        s"unpartitioned window over non-aggregated (data-sized) input:\n$w")
    }
  }

  private lazy val docs = {
    val rnd = new scala.util.Random(3)
    (1 to 500).map { i =>
      (i.toLong, rnd.nextDouble(), rnd.nextInt(400) + 20)
    }.toDF("doc_id", "quality", "n_tokens").repartition(7)
  }

  test("RowIds.denseInPartitionOrder: dense 1..N, mono-order, no data-sized global window") {
    val out = RowIds.denseInPartitionOrder(docs, "rid")
    assertGlobalWindowsAreMetadataOnly(out)
    val rows = out.select("rid").as[Long].collect().sorted
    assert(rows.toSeq == (1L to 500L))
    // id order == monotonically_increasing_id order (the P7 contract)
    val pairs = RowIds.denseInPartitionOrder(
        docs.withColumn("__m", monotonically_increasing_id()), "rid")
      .select("__m", "rid").as[(Long, Long)].collect().sortBy(_._1)
    assert(pairs.map(_._2).toSeq == pairs.map(_._2).sorted.toSeq)
  }

  test("RowIds re-application replaces an existing id column, never duplicates") {
    val once = RowIds.denseInPartitionOrder(docs, "rid")
    val twice = RowIds.denseInPartitionOrder(once, "rid")
    assert(twice.columns.count(_ == "rid") == 1)
    assert(twice.select("rid").as[Long].collect().sorted.toSeq == (1L to 500L))
  }

  test("RowIds.denseByOrder == row_number over the naive global window") {
    val naive = docs.withColumn("rid",
      row_number().over(Window.orderBy(col("quality").desc, col("doc_id")))
        .cast("long"))
    val scaled = RowIds.denseByOrder(docs, "rid",
      Seq(col("quality").desc, col("doc_id")))
    assertGlobalWindowsAreMetadataOnly(scaled)
    assert(scaled.exceptAll(naive).isEmpty && naive.exceptAll(scaled).isEmpty)
  }

  test("RowIds.denseRankByOrder == dense_rank over the naive global window") {
    // duplicated keys + ties are the point: ranks must be dense over the
    // DISTINCT key order with every duplicate row getting the same rank
    val keyed = docs.withColumn("k",
      (col("doc_id") % 17).cast("long")) // 17 distinct keys, heavy ties
    val naive = keyed.withColumn("rk",
      dense_rank().over(Window.orderBy(col("k").desc)).cast("long"))
    val scaled = RowIds.denseRankByOrder(keyed, "rk", Seq(col("k").desc))
    assertGlobalWindowsAreMetadataOnly(scaled)
    assert(scaled.exceptAll(naive).isEmpty && naive.exceptAll(scaled).isEmpty)
    // composite keys too (the suffix-array doubling shape)
    val keyed2 = docs.withColumn("k1", (col("doc_id") % 7).cast("long"))
      .withColumn("k2", (col("doc_id") % 11).cast("long"))
    val naive2 = keyed2.withColumn("rk", dense_rank()
      .over(Window.orderBy(col("k1"), col("k2"))).cast("long"))
    val scaled2 = RowIds.denseRankByOrder(keyed2, "rk",
      Seq(col("k1"), col("k2")))
    assert(scaled2.exceptAll(naive2).isEmpty &&
      naive2.exceptAll(scaled2).isEmpty)
  }

  test("Budget.cumulativeSum == naive unpartitioned running sum") {
    val naive = docs.withColumn("cum",
      sum(col("n_tokens")).over(
        Window.orderBy(col("quality").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    val scaled = Budget.cumulativeSum(docs,
      Seq(col("quality").desc, col("doc_id")), col("n_tokens"), "cum")
    assertGlobalWindowsAreMetadataOnly(scaled)
    assert(scaled.exceptAll(naive).isEmpty && naive.exceptAll(scaled).isEmpty)
  }

  test("Budget.packSequences: hand-computed bins and boundary crossers") {
    import spark.implicits._
    // tokens 3,3,3 at ctx 4: doc1 [0,2] bin0 no-cross; doc2 [3,5] bin0
    // crossing into window 1; doc3 [6,8] bin1 crossing into window 2;
    // a zero-token doc sits at its stream position and never crosses
    val rows = Seq((1L, 3L), (2L, 3L), (3L, 0L), (4L, 3L))
      .toDF("id", "n_tokens")
    val out = Budget.packSequences(rows, Seq(col("id")), col("n_tokens"),
        ctxLen = 4)
      .select("id", "bin", "crosses_boundary").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out == Map(1L -> ((0L, false)), 2L -> ((0L, true)),
      3L -> ((1L, false)), 4L -> ((1L, true))))
  }

  test("RowIds holds at 1M rows across 64 partitions (dense, unique, ordered)") {
    val big = spark.range(0, 1000000, 1, 64).toDF("x")
    val out = RowIds.denseInPartitionOrder(big, "rid")
    val stats = out.agg(
      count(lit(1)).as("n"),
      countDistinct(col("rid")).as("d"),
      min(col("rid")).as("lo"),
      max(col("rid")).as("hi")).head()
    assert(stats.getLong(0) == 1000000L && stats.getLong(1) == 1000000L)
    assert(stats.getLong(2) == 1L && stats.getLong(3) == 1000000L)
    // range() partitions ascend with partition index, so mono order == x
    // order: the dense ids must follow x exactly
    assert(out.filter(col("rid") =!= col("x") + 1).isEmpty)
  }

  test("Budget.cumulativeSum matches the naive window on null values too") {
    // nulls are skipped by sum(...) OVER and the result stays null until
    // the first non-null value globally — including a partition whose
    // local prefix is entirely null
    val rows = (1 to 200).map { i =>
      val v: Option[Int] = if (i <= 5 || i % 3 == 0) None else Some(i)
      (i.toLong, v)
    }.toDF("id", "v").repartition(7)
    val naive = rows.withColumn("cum",
      sum(col("v")).over(Window.orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val scaled = Budget.cumulativeSum(rows, Seq(col("id")), col("v"), "cum")
    assert(scaled.exceptAll(naive).isEmpty && naive.exceptAll(scaled).isEmpty)
  }

  test("Budget.tokenBudgetSelect keeps the best-first prefix under budget") {
    val out = Budget.tokenBudgetSelect(docs,
      Seq(col("quality").desc, col("doc_id")), col("n_tokens"), budget = 20000L)
    val kept = out.select("doc_id").as[Long].collect().toSet
    // greedy best-first reference on the driver
    var acc = 0L
    val expected = docs.select("doc_id", "quality", "n_tokens")
      .as[(Long, Double, Int)].collect()
      .sortBy { case (id, q, _) => (-q, id) }
      .takeWhile { case (_, _, n) => { acc += n; acc <= 20000L } }
      .map(_._1).toSet
    assert(kept == expected)
  }

  test("AQE splits a skewed shuffle join at runtime (the salting fallback)") {
    // saltedAggregate handles aggregation skew BEFORE the shuffle; for
    // JOIN skew the engine leans on AQE's runtime split — this pins that
    // the joins it plans are actually eligible (equi sort-merge, no
    // manual partitioning that would disable OptimizeSkewedJoin).
    val conf = spark.conf
    val keys = Seq("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // one monster key (~90% of rows) with a fat payload vs 99 tiny keys
      val left = spark.range(0, 60000)
        .select(when(col("id") % 10 === 0, col("id") % 99 + 1)
          .otherwise(lit(0L)).as("k"),
          lpad(col("id").cast("string"), 96, "x").as("payload"))
      val right = spark.range(0, 100).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("name"))
      val joined = left.join(right, "k")
      // materialize through THIS queryExecution (count() would build its
      // own) so the AdaptiveSparkPlan below is the final, executed one
      assert(joined.collect().length == 60000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed join:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("Lift.ntileByOrder == SQL-standard ntile window, for every remainder shape") {
    // the two-phase closed form must be bit-identical to
    // ntile(n).over(Window.orderBy(...)) — including how the remainder
    // rows distribute over the first buckets — at every (N, n) shape:
    // N < n, N divisible by n, and every remainder class in between
    for (n <- Seq(1, 3, 4, 7, 10); nRows <- Seq(2, 9, 10, 40, 41)) {
      val df = (1 to nRows).map(i => (i.toLong, (i * 37 % 100).toLong))
        .toDF("id", "score").repartition(5)
      val got = graft.operators.Lift
        .ntileByOrder(df, Seq(col("score").desc, col("id").asc), n, "b")
        .select("id", "b").as[(Long, Int)].collect().toMap
      val want = df.withColumn("b", ntile(n).over(
          Window.orderBy(col("score").desc, col("id").asc)))
        .select("id", "b").as[(Long, Int)].collect().toMap
      assert(got == want, s"ntile mismatch at N=$nRows n=$n")
    }
  }

  test("Budget.groupedCumulativeSum == per-group window, no per-group data window") {
    // few huge groups — the shape where Window.partitionBy(g) funnels a
    // whole group through one task; the grouped two-phase prefix must be
    // value-identical and keep every unpartitioned window metadata-sized
    val df = (1 to 4000).map { i =>
      (s"g${i % 3}", (i * 13 % 40).toLong, (i % 7).toLong)
    }.toDF("g", "k", "v").repartition(8)
    val perKey = df.groupBy(col("g"), col("k"))
      .agg(sum(col("v")).as("c"))
    val got = Budget.groupedCumulativeSum(perKey, "g", Seq(col("k")),
        col("c"), "cum")
      .select("g", "k", "cum").as[(String, Long, Long)].collect().toSet
    val w = Window.partitionBy(col("g")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = perKey.withColumn("cum", sum(col("c")).over(w))
      .select("g", "k", "cum").as[(String, Long, Long)].collect().toSet
    assert(got == want)
    assertGlobalWindowsAreMetadataOnly(
      Budget.groupedCumulativeSum(perKey, "g", Seq(col("k")), col("c"), "cum"))
  }

  test("Budget.groupedRunning == per-group windows for sum/min/max/sum-with-min") {
    // every spec type against its naive per-group window, on a frame with
    // few huge groups, signed doubles (the CUSUM shape needs negatives so
    // the running min actually dips), and a long count column
    val df = (1 to 5000).map { i =>
      (s"g${i % 4}", i.toLong,
        ((i * 31 % 19) - 9).toDouble / 4.0, (i % 5).toLong)
    }.toDF("g", "k", "x", "c").repartition(8)
    val got = Budget.groupedRunning(df, "g", Seq(col("k")), Seq(
        Budget.RunSum(col("c"), "rs"),
        Budget.RunMin(col("x"), "rmin"),
        Budget.RunMax(col("x"), "rmax"),
        Budget.RunSumWithMin(col("x"), "cs", "csmin")))
      .select("g", "k", "rs", "rmin", "rmax", "cs", "csmin")
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSet
    val w = Window.partitionBy(col("g")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cs = sum(col("x")).over(w)
    val naive1 = df.select(col("g"), col("k"),
      sum(col("c")).over(w).as("rs"),
      min(col("x")).over(w).as("rmin"),
      max(col("x")).over(w).as("rmax"),
      cs.as("cs"))
    val want = naive1
      .withColumn("csmin", min(col("cs")).over(w))
      .select("g", "k", "rs", "rmin", "rmax", "cs", "csmin")
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSet
    // doubles: the two-phase association can differ in the last ulp from
    // the sequential fold — compare at 9 decimals (callers round to <= 6)
    def r9(t: (String, Long, Long, Double, Double, Double, Double)) =
      (t._1, t._2, t._3, BigDecimal(t._4).setScale(9,
        BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(t._5).setScale(9, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(t._6).setScale(9, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(t._7).setScale(9, BigDecimal.RoundingMode.HALF_UP))
    assert(got.map(r9) == want.map(r9),
      "groupedRunning diverged from the per-group windows")
    graft.pipeline.Pins.flush()
  }

  test("Lift.ntileByOrder: 200k skewed rows, deterministic across re-runs, == ntile") {
    // heavy ties (a Zipfian score with ~50 distinct values) exercise the
    // range partitioner's equal-keys-co-located contract and the persist
    // pin that keeps the count branch and the data branch on ONE sampled
    // partitioning; two runs must agree with each other and with the
    // naive window
    val big = spark.range(0, 200000)
      .select(col("id"), (col("id") % (col("id") % 223 + 1) % 50)
        .as("score")).repartition(16)
    def run() = graft.operators.Lift
      .ntileByOrder(big, Seq(col("score").desc, col("id").asc), 10, "b")
      .select("id", "b").as[(Long, Int)].collect().toMap
    val first = run()
    assert(run() == first, "re-run produced a different bucket assignment")
    val want = big.withColumn("b", ntile(10).over(
        Window.orderBy(col("score").desc, col("id").asc)))
      .select("id", "b").as[(Long, Int)].collect().toMap
    assert(first == want, "two-phase ntile diverged from the window at 200k")
  }

  test("Rerank.mmr: greedy runs executor-local per query (co-group, no driver collect)") {
    // two queries with a planted paraphrase pair: c11/c12 are near-dups
    // (sim .9), so after picking c11 (top rel) MMR must skip c12 for c13
    // even though rel(c12) > rel(c13)
    val cands = Seq(
      (1L, 11L, 0.9), (1L, 12L, 0.8), (1L, 13L, 0.5),
      (2L, 21L, 0.7), (2L, 22L, 0.6)).toDF("qid", "cid", "rel")
    val sims = Seq(
      (1L, 11L, 12L, 0.9), (1L, 11L, 13L, 0.0), (1L, 12L, 13L, 0.1),
      (2L, 21L, 22L, 0.2)).toDF("qid", "a", "b", "sim")
    val out = graft.operators.Rerank.mmr(cands, "qid", "cid", "rel",
      sims, "sim", lambda = 0.7, k = 2)
    // per-qid locality: the plan co-groups on qid — no collect, no
    // query-spanning state
    assert(out.queryExecution.optimizedPlan.toString.contains("CoGroup"),
      "mmr should plan as a per-qid CoGroup")
    val picks = out.select("query_id", "sel_rank", "cand_id")
      .as[(Long, Int, Long)].collect().toSet
    // q1: pick c11 (.63); then c12 scores .7*.8-.3*.9=.29 < c13's
    // .7*.5-.3*0=.35 -> c13. q2: c21 then c22 (.7*.6-.3*.2=.36)
    assert(picks == Set((1L, 1, 11L), (1L, 2, 13L),
      (2L, 1, 21L), (2L, 2, 22L)))
    // scores survive the 7-dp contract
    val s13 = out.filter(col("query_id") === 1 && col("sel_rank") === 2)
      .select("mmr_score").as[Double].head()
    assert(s13 == 0.35)
  }

  test("Preference.bradleyTerry refuses a data-sized player universe") {
    val comps = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
      .toDF("winner", "loser")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Preference.bradleyTerry(comps, "winner", "loser",
        iters = 3, maxPlayers = 2)
    }
    assert(e.getMessage.contains("driver-safe bound"))
    // at the default bound the same frame fits fine
    assert(graft.operators.Preference.bradleyTerry(
      comps, "winner", "loser").count() == 3)
  }
}
