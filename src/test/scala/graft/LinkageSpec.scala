package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Linkage
import graft.operators.Linkage.FsField

/** Fellegi-Sunter linkage: hand-computed u-probabilities and pair weights,
  * the null-neutral stance, the constant-field clamp, and decisions. */
class LinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // N=4 names: ann x2, bob, cal -> u_name = (4+1+1)/16 = 0.375
  // N=4 segs: A x3, B          -> u_seg  = (9+1)/16  = 0.625
  // N=3 buckets (one null): 10 x2, 20 -> u_bb = (4+1)/9 = 0.555555556
  private def recs = Seq(
    (1L, "ann", "A", Option(10L)), (2L, "ann", "A", Option(10L)),
    (3L, "bob", "A", Option(20L)), (4L, "cal", "B", Option.empty[Long]))
    .toDF("id", "name", "seg", "bb")

  private val fields =
    Seq(FsField("name", 0.9), FsField("seg", 0.8), FsField("bb", 0.7))

  private def lg2(x: Double) = math.log(x) / math.log(2.0)
  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("u-probabilities match the collision-mass formula") {
    val u = Linkage.uProbabilities(recs, fields).collect()(0)
    assert(u.getAs[Double]("u_name") == 0.375)
    assert(u.getAs[Double]("u_seg") == 0.625)
    assert(u.getAs[Double]("u_bb") == 0.555555556)
  }

  test("pair weights, null-neutral comparisons, decisions") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val out = Linkage.fellegiSunter(recs, "id", pairs, fields,
        upperT = 1.5, lowerT = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.get(2), r.get(3), r.get(4), r.getDouble(5), r.getString(6))))
      .toMap

    // (1,2): all agree
    val w12 = r6(lg2(0.9 / 0.375) + lg2(0.8 / 0.625) + lg2(0.7 / 0.555555556))
    assert(out((1L, 2L)) == ((1, 1, 1, w12, "match")))
    // (1,3): name/bb disagree, seg agrees
    val w13 = r6(lg2(0.1 / 0.625) + lg2(0.8 / 0.625)
      + lg2(0.3 / (1 - 0.555555556)))
    assert(out((1L, 3L)) == ((0, 1, 0, w13, "non_match")))
    // (1,4): bb is null on one side -> neutral 0, agree flag null
    val w14 = r6(lg2(0.1 / 0.625) + lg2(0.2 / 0.375) + 0.0)
    assert(out((1L, 4L)) == ((0, 0, null, w14, "non_match")))
  }

  test("possible band sits strictly between the thresholds") {
    val pairs = Seq((1L, 3L)).toDF("a", "b")
    val w13 = r6(lg2(0.1 / 0.625) + lg2(0.8 / 0.625)
      + lg2(0.3 / (1 - 0.555555556)))
    val d = Linkage.fellegiSunter(recs, "id", pairs, fields,
        upperT = 10.0, lowerT = w13 - 1.0)
      .select("decision").as[String].collect()
    assert(d.toSeq == Seq("possible"))
  }

  test("constant field clamps u instead of producing an infinite weight") {
    val const = recs.withColumn("seg", lit("A"))
    val pairs = Seq((1L, 3L)).toDF("a", "b")
    val row = Linkage.fellegiSunter(const, "id", pairs,
        Seq(FsField("seg", 0.8)), 1.0, -1.0).collect()(0)
    val w = row.getDouble(3)
    assert(!w.isInfinite && !w.isNaN)
    // u clamped to 1-1e-9 -> agreement weight ~= log2(0.8) (tiny u shift)
    assert(math.abs(w - r6(lg2(0.8 / (1 - 1e-9)))) < 1e-6)
  }

  test("empty pairs degrade to an empty result with the full schema") {
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val out = Linkage.fellegiSunter(recs, "id", pairs, fields, 1.0, -1.0)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("id_a", "id_b", "agree_name",
      "agree_seg", "agree_bb", "weight", "decision"))
  }
}
