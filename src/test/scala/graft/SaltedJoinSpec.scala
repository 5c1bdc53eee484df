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
}
