package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Z-order layout: Morton arithmetic against hand values, and the reason
  * the layout exists — for a 2-D box predicate, rows cluster into a far
  * smaller contiguous span of the z-sorted order than of a single-column
  * sort, which is exactly what file-level min-max pruning converts into
  * skipped IO. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("interleave2 matches hand-computed Morton codes") {
    val out = Seq((5L, 3L), (0L, 0L), (255L, 0L), (0L, 255L))
      .toDF("a", "b")
      .select(ZOrder.interleave2(col("a"), col("b"), 8))
      .collect().map(_.getLong(0)).toSeq
    // a=101b -> bits at 0,2,4 = 1+4*0+16 = 21? a bits: 1(à0),0(à2),1(à4)
    // 5 = 101b: bit0=1->pos0, bit1=0->pos2, bit2=1->pos4 => 1+16 = 17
    // 3 = 011b: bit0=1->pos1, bit1=1->pos3 => 2+8 = 10; total 27
    assert(out(0) == 27L)
    assert(out(1) == 0L)
    assert(out(2) == 0x5555L) // all even bits
    assert(out(3) == 0xAAAAL) // all odd bits
  }

  test("equi-width bucket handles bounds and degenerate ranges") {
    val df = Seq((0.0, 0.0, 10.0), (10.0, 0.0, 10.0), (5.0, 0.0, 10.0),
      (7.0, 7.0, 7.0)).toDF("x", "lo", "hi")
    val out = df.select(
      ZOrder.bucket(col("x"), col("lo"), col("hi"), 8))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(0L, 255L, 127L, 0L))
  }

  test("2-D box predicates touch a far smaller span of the z-sorted order") {
    // full 64x64 grid, already bucketized (bits = 6)
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("za", "zb")
      .withColumn("zcode", ZOrder.interleave2(col("za"), col("zb"), 6))
    import org.apache.spark.sql.expressions.Window
    val zSorted = grid.withColumn("rank",
      row_number().over(Window.orderBy(col("zcode"))).cast("long"))
    val xSorted = grid.withColumn("rank",
      row_number().over(Window.orderBy(col("za"), col("zb"))).cast("long"))

    def span(df: org.apache.spark.sql.DataFrame): Long = {
      val r = df.filter(col("za") < 16 && col("zb") < 16)
        .agg(min(col("rank")), max(col("rank"))).head()
      r.getLong(1) - r.getLong(0) + 1
    }
    val zSpan = span(zSorted)
    val xSpan = span(xSorted)
    // the [0,16)^2 box is one aligned z-quadrant: exactly its 256 rows
    assert(zSpan == 256L, s"aligned quadrant must be contiguous, got $zSpan")
    // under x-major order the same box spans 16 column-stripes
    assert(xSpan > 900L, s"x-sort span unexpectedly small: $xSpan")
  }

  test("zCode output is partitioning-invariant and empty-safe") {
    val df = (1L to 200L).map(i => (i, i % 37, i * 0.5)).toDF("id", "u", "v")
    val a = ZOrder.zCode(df.repartition(1), "u", "v").orderBy("id")
      .select("id", "za", "zb", "zcode").collect().toSeq
    val b = ZOrder.zCode(df.repartition(7, col("v")), "u", "v").orderBy("id")
      .select("id", "za", "zb", "zcode").collect().toSeq
    assert(a == b)
    assert(ZOrder.zCode(df.limit(0), "u", "v").collect().isEmpty)
  }
}
