package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted-join rewrite (q177): identical result set to the plain
  * equi-join for any salt assignment. */
class SaltedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join == plain join, including dups and unmatched rows") {
    val fact = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"),
      (9L, "orphan")).toDF("k", "payload")
    val dim = Seq((1L, "dim1"), (2L, "dim2"), (7L, "unused"))
      .toDF("k", "attr")
    val salted = Skew.saltedJoin(fact, dim, "k",
        xxhash64(col("payload")), numSalts = 4)
      .select("k", "payload", "attr")
      .as[(Long, String, String)].collect().sorted.toSeq
    val plain = fact.join(dim, Seq("k"))
      .select("k", "payload", "attr")
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(salted == plain && salted.size == 4)
    // salt columns must not leak into the output
    assert(!Skew.saltedJoin(fact, dim, "k", xxhash64(col("payload")), 4)
      .columns.contains("__salt"))
  }

  test("planted hot key: salted join == AQE-split plain join, and AQE has nothing to split after salting") {
    // the q139/q177 shape: ~90% of fact rows collapse onto ONE dim key.
    // Run the same join both ways under aggressive AQE skew settings and
    // compare: (a) results identical, (b) AQE must split the plain join
    // at runtime, (c) the salted rewrite leaves NO skewed partition for
    // AQE to split — salting moved the fix from runtime to plan time.
    val conf = spark.conf
    val keys = Seq("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // AQE's caveat, pinned here: when the join output feeds an
      // aggregation, OptimizeSkewedJoin DECLINES to split (the split
      // breaks the join's output partitioning and would add a shuffle)
      // unless forced — which is exactly why the salted rewrite is the
      // plan-time fix for agg-fed skewed joins, not a redundancy
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val fact = spark.range(0, 60000)
        .select(when(col("id") % 10 === 0, col("id") % 99 + 1)
          .otherwise(lit(0L)).as("k"),
          lpad(col("id").cast("string"), 96, "x").as("payload"),
          col("id"))
      val dim = spark.range(0, 100).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("name"))

      // materialize the JOINS through their own queryExecutions so the
      // AdaptiveSparkPlan inspected below is the final, executed one
      val plainJoined = fact.join(dim, Seq("k"))
      assert(plainJoined.collect().length == 60000)
      assert(plainJoined.queryExecution.executedPlan.toString
          .contains("skew=true"),
        "AQE did not split the plain join on the planted hot key")

      val saltedJoined = Skew.saltedJoin(fact, dim, "k",
        xxhash64(col("id")), numSalts = 8)
      assert(saltedJoined.collect().length == 60000)
      // the salted join's shuffle key is (k, salt): the hot key is spread
      // over 8 partitions, so no partition crosses the skew threshold and
      // AQE leaves the join untouched
      assert(!saltedJoined.queryExecution.executedPlan.toString
          .contains("skew=true"),
        "salting should leave AQE with no skewed partition to split")

      // and the two paths agree on the aggregated result
      val plainRows = plainJoined.groupBy(col("name"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq
      val saltedRows = saltedJoined.groupBy(col("name"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq
      assert(saltedRows == plainRows,
        "salted join result diverged from the AQE-split plain join")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
