package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sharding

/** Deterministic sharding/order: pure function of (content, epoch) —
  * partitioning-invariant, epoch permutations differ, positions are a
  * 1..n permutation per shard, and one shard degrades to a global order. */
class ShardingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ids = (1L to 300L).toDF("id2").select(col("id2").as("doc"))

  test("shard and both epoch orders are partitioning-invariant") {
    val a = Sharding.deterministicShards(ids.repartition(1), "doc", 4,
      Seq(0, 1)).orderBy("id").collect().toSeq
    val b = Sharding.deterministicShards(ids.repartition(11, col("doc")),
      "doc", 4, Seq(0, 1)).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("per-shard positions are a 1..n permutation; epochs permute differently") {
    val out = Sharding.deterministicShards(ids, "doc", 4, Seq(0, 1))
    val byShard = out.collect()
      .groupBy(_.getLong(1))
    assert(byShard.keySet.subsetOf((0L until 4L).toSet))
    byShard.values.foreach { rows =>
      val n = rows.length
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to n),
        "pos_e0 must be a 1..n permutation")
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to n),
        "pos_e1 must be a 1..n permutation")
    }
    // the two epoch orders must actually differ somewhere
    assert(out.filter(col("pos_e0") =!= col("pos_e1")).count() > 0)
    // hash sharding spreads: no shard holds more than half the corpus
    assert(byShard.values.map(_.length).max < 150)
  }

  test("numShards = 1 is a single global deterministic order") {
    val out = Sharding.deterministicShards(ids, "doc", 1)
      .collect()
    assert(out.forall(_.getLong(1) == 0L))
    assert(out.map(_.getLong(2)).sorted.toSeq == (1L to 300L))
    assert(Sharding.deterministicShards(ids.limit(0), "doc", 3)
      .collect().isEmpty)
  }
}
