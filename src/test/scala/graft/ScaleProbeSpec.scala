package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ScaleProbe's replicate-and-perturb corpus builder: row counts multiply,
  * shifted ids stay disjoint, and replica TEXT is shingle-decorrelated
  * (cross-replica Jaccard 0) while within-replica near-dup structure is
  * preserved — the property that keeps the measured time-vs-scale
  * exponent about the ENGINE, not about a quadratically exploding
  * near-dup pair set. */
class ScaleProbeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val base = "/root/testdata/sf0.001"

  test("replicate: counts multiply, ids disjoint, text decorrelated, dims as-is") {
    val out = java.nio.file.Files.createTempDirectory("scaleprobe").toString
    ScaleProbe.replicate(spark, base, out, 3)

    val bd = spark.read.parquet(s"$base/documents.parquet")
    val rd = spark.read.parquet(s"$out/documents.parquet")
    assert(rd.count() == 3 * bd.count())
    assert(rd.select("doc_id").distinct().count() == rd.count(),
      "shifted ids must stay globally unique")

    // dims are not replicated
    assert(spark.read.parquet(s"$out/region.parquet").count() ==
      spark.read.parquet(s"$base/region.parquet").count())

    // per-word tagging: replica 1's copy of doc 0 shares ZERO 3-gram
    // shingles with the original (cross-replica Jaccard 0), and within
    // replica 1 the relative structure is the base corpus's own
    val r0 = graft.operators.Dedup.shinglePostings(
      rd.filter(col("doc_id") < 1000000), "doc_id", "text", 3)
    val r1 = graft.operators.Dedup.shinglePostings(
      rd.filter(col("doc_id") >= 10000000L && col("doc_id") < 11000000L),
      "doc_id", "text", 3)
    val shared = r0.select("shingle").distinct()
      .join(r1.select("shingle").distinct(), "shingle").count()
    assert(shared == 0, s"cross-replica shingle overlap: $shared")

    // deterministic: a second replicate into the same dir is a no-op,
    // and into a fresh dir is bit-identical content
    val out2 = java.nio.file.Files.createTempDirectory("scaleprobe2").toString
    ScaleProbe.replicate(spark, base, out2, 3)
    val a = spark.read.parquet(s"$out/documents.parquet")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val b = spark.read.parquet(s"$out2/documents.parquet")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a == b)

    // embeddings: rotated, same dim, decorrelated from the base copy
    val be = spark.read.parquet(s"$out/embeddings.parquet")
    val dims = be.select(size(col("embedding")).as("d")).distinct().collect()
    assert(dims.length == 1, "all replica embeddings keep one dimension")
    val pair = be.filter(col("vec_id") === 0L ||
        col("vec_id") === 10000000L)
      .orderBy("vec_id").collect().map(_.getSeq[Float](1))
    assert(pair(0) != pair(1), "replica vector must not be an exact clone")
    assert(pair(0).sorted == pair(1).sorted, "rotation permutes, not rewrites")
  }
}
