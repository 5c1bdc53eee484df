package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vec
import graft.operators.Similarity

/** The production IVF-PQ operating point (nlist = 64, nprobe << nlist) must
  * run with ZERO codegen fallbacks: round 12 measured the folded-residual
  * encode projection exceeding janino's 64 KB method limit at nlist = 64 and
  * Spark silently dropping it to interpreted evaluation (PLANS.md round-12
  * note). This spec pins the fix by running the full encode + search plan
  * under `spark.sql.codegen.fallback=false` + `factoryMode=CODEGEN_ONLY`,
  * where any janino failure THROWS instead of falling back. */
class PqCodegenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 200 deterministic 64-dim vectors, PARQUET-BACKED: the round-12
    * fallback only manifested when the encode projection fused with a
    * parquet scan's columnar-read code into one whole-stage processNext()
    * (a range-backed plan stayed just under the limit), so the repro must
    * scan parquet exactly like the production corpus does. */
  private lazy val corpus: DataFrame = {
    val dir = java.nio.file.Files
      .createTempDirectory("pq-codegen").resolve("emb.parquet").toString
    spark.range(0, 200).toDF("vec_id")
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(63)),
          i => sin(col("vec_id") * 0.37 + i * 1.13)
            + cos(col("vec_id") % 7 * 2.1 - i * 0.5))
          .cast("array<float>").as("embedding"))
      .write.mode("overwrite").parquet(dir)
    // the production column is array<float>: the float->double cast loop
    // inlines per reference and is part of what the fused stage must fit
    spark.read.parquet(dir)
      .select(col("vec_id"), Vec.asDouble(col("embedding")).as("vec"))
  }

  private def withCodegenOnly[T](body: => T): T = {
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try body
    finally {
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("residual pqEncode at nlist=64 compiles (no interpreted fallback)") {
    val e = corpus
    val model = Similarity.pqTrainResidual(e, "vec_id", "vec",
      m = 8, k = 16, nlist = 64)
    val enc = Similarity.pqEncode(e, "vec_id", "vec", model)
    // collect(), not count(): count lets column pruning strip the heavy
    // encode expressions out of the stage under test
    val rows = withCodegenOnly(enc.collect())
    assert(rows.length == 200)
    assert(rows.forall(_.getAs[Seq[Byte]]("codes").length == 8))
  }

  test("full IVF-PQ search at nlist=64 nprobe=4 compiles and answers") {
    val e = corpus
    val q = e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    val model = Similarity.pqTrainResidual(e, "vec_id", "vec",
      m = 8, k = 16, nlist = 64)
    val res = Similarity.pqTopK(e, "vec_id", "vec", q, "qid", "qvec",
      k = 3, model, nlist = 64, nprobe = 4)
    val rows = withCodegenOnly(res.collect())
    assert(rows.length == 8 * 3) // 8 queries x top-3
    // self-match must win rank 1 when the query's own list is probed first
    val r1 = rows.filter(_.getAs[Int]("rank") == 1)
    assert(r1.length == 8)
  }

  test("ArgmaxCosine is bit-compatible with the array_max struct form") {
    import graft.expressions.ArgmaxCosine
    // centroids: index 1 duplicates index 0 (tie -> smallest index), index
    // 3 is all-zero (null cosine -> never wins)
    val cents = Seq(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(1.0, 0.0, 0.0, 0.0),
      Seq(0.0, 1.0, 0.5, 0.0), Seq(0.0, 0.0, 0.0, 0.0),
      Seq(-1.0, -1.0, 0.3, 0.9))
    val centMat = array(cents.map(cv => array(cv.map(lit): _*)): _*)
    val vecs = Seq(
      Seq(1.0, 0.0, 0.0, 0.0),   // exact tie between 0 and 1 -> 0
      Seq(0.1, 0.9, 0.4, 0.0),   // -> 2
      Seq(-0.5, -0.5, 0.2, 0.4), // -> 4
      Seq(0.0, 0.0, 0.0, 0.0))   // zero vector: all sims null -> 0
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val structForm = array_max(array(cents.zipWithIndex.map { case (cv, ci) =>
      struct(Vec.cosine(col("v"), array(cv.map(lit): _*)).as("sim"),
        lit(-ci).as("neg"), lit(ci).as("cent_id"))
    }: _*)).getField("cent_id")
    val got = df.select(col("id"),
        ArgmaxCosine.column(col("v"), centMat).as("native"),
        structForm.as("unrolled"))
      .orderBy(col("id")).collect()
    assert(got.map(_.getInt(1)).toSeq == Seq(0, 2, 4, 0))
    assert(got.forall(r => r.getInt(1) == r.getInt(2)))
  }
}
