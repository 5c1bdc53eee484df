package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100-TB co-located-join posture (SURVEY.md "Partitioning & shuffle"):
  * pre-bucketing both join sides on the key eliminates the shuffle exchanges
  * from the join — the physical plan must contain NO Exchange. This is the
  * mechanism a production deployment uses for the repeated master<->source
  * linkage joins. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join without any shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

    val orders = (1L to 1000L).map(i => (i, i % 100, i * 1.5))
      .toDF("o_orderkey", "o_custkey", "o_total")
    val customer = (0L until 100L).map(i => (i, s"cust$i"))
      .toDF("c_custkey", "c_name")

    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    // join on the bucket key AND aggregate on it: bucketing satisfies the
    // distribution requirement of both operators -> zero exchanges
    val joined = spark.table("b_orders")
      .join(spark.table("b_customer").hint("shuffle_merge"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey")).agg(sum(col("o_total")).as("t"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join + same-key agg should not shuffle at all:\n$plan")
    assert(plan.contains("Bucketed: true"))

    assert(joined.count() == 100)
  }

  test("hive-partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft-part").toString
    val docs = Seq(
      (1L, "en", "hello world"), (2L, "en", "more text"),
      (3L, "de", "hallo welt"), (4L, "fr", "bonjour")).toDF(
      "doc_id", "lang", "text")
    // lang is low-cardinality and the dominant filter axis -> directory
    // partitioning; at 100 TB a lang='en' scan must never touch the other
    // languages' files
    docs.write.partitionBy("lang").mode("overwrite").parquet(dir)

    val back = spark.read.parquet(dir).filter(col("lang") === "en")
    val exec = back.queryExecution.executedPlan.toString
    // the filter must land in PartitionFilters (directory pruning), not as
    // a post-scan Filter over all partitions
    assert(exec.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter should prune at the partition level:\n$exec")
    assert(back.count() == 2)

    // dynamic partition overwrite replaces ONLY the touched partition:
    // rewriting 'de' must leave 'en'/'fr' data intact (the incremental
    // re-ingest contract; static overwrite mode would drop them)
    Seq((30L, "de", "neu")).toDF("doc_id", "lang", "text")
      .write.partitionBy("lang").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(dir)
    val after = spark.read.parquet(dir)
    assert(after.count() == 4)
    assert(after.filter(col("lang") === "de").head().getLong(0) == 30L)
  }

  test("persisted IVF-PQ index: probe reads prune to the probed lists") {
    import graft.operators.Similarity
    // the 100-TB serving path: the encoded index is WRITTEN ONCE
    // partitioned by cent_id (one directory per inverted list), and a
    // query probing nprobe lists must physically read only those
    // directories — partition pruning is what makes nprobe/nlist the
    // index's actual I/O fraction, not just a candidate-count bound
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(4)(Array.fill(8)(rnd.nextGaussian() * 3))
    val corpus = (0L until 80L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.2).toFloat))
    }.toDF("id", "vec")
    val model = Similarity.pqTrainResidual(corpus, "id", "vec",
      m = 4, k = 8, nlist = 4)
    val dir = Files.createTempDirectory("graft-ivfpq").toString
    Similarity.pqEncode(corpus, "id", "vec", model)
      .write.partitionBy("cent_id").mode("overwrite").parquet(dir)

    val index = spark.read.parquet(dir)
    assert(index.count() == 80, "index round-trip lost rows")
    val probed = index.filter(col("cent_id").isin(0, 2))
    val exec = probed.queryExecution.executedPlan.toString
    assert(exec.contains("PartitionFilters: [cent_id"),
      s"probe filter should prune whole list directories:\n$exec")
    // the codes survive the round-trip as 1-byte arrays (the storage
    // claim: m bytes + rnorm per vector, never the raw floats)
    assert(index.schema("codes").dataType.simpleString == "array<tinyint>")
    assert(!index.columns.contains("vec"))
  }
}
