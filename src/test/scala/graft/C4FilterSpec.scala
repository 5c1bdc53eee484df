package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.C4Filter

/** C4 line-filter rules (Raffel et al. 2020 §2.2) on a hand-built fixture:
  * every rule proven individually, plus empty-input/empty-text degradation
  * and partitioning invariance (the op is row-local, so any partitioning
  * must give identical rows). */
class C4FilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    C4Filter.c4Lines(rows.toDF("id", "text"), "id", "text",
      minWords = 5, minKeptLines = 2)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("line and page rules each fire on their own trigger") {
    val good = "this line has five words."
    val out = run(Seq(
      (1L, s"$good\nanother good line is here!\nno terminal punct here at all"),
      (2L, s"$good\nshort line."), // 2nd line < 5 words -> only 1 kept
      (3L, s"$good\nplease enable JavaScript to continue viewing.\n$good"),
      (4L, s"$good\n$good\nvar x = { a: 1 };"),
      (5L, s"$good\n$good\nLorem ipsum dolor sit amet.")))

    // doc 1: two kept lines, third dropped (no terminal punctuation)
    assert(out(1L).getLong(1) == 3 && out(1L).getLong(2) == 2)
    assert(out(1L).getBoolean(6), "doc 1 must be kept")
    // doc 2: only one kept line -> page dropped by minKeptLines
    assert(out(2L).getLong(2) == 1 && !out(2L).getBoolean(6))
    // doc 3: javascript line dropped despite punctuation + length,
    // but the two surrounding lines keep the page
    assert(out(3L).getLong(2) == 2 && out(3L).getBoolean(6))
    assert(!out(3L).getString(7).toLowerCase.contains("javascript"))
    // doc 4: curly brace -> page dropped even with 2 kept lines
    assert(out(4L).getBoolean(5) && !out(4L).getBoolean(6))
    // doc 5: lorem ipsum -> page dropped; the lorem line itself is
    // well-formed so it IS a kept line (page rule, not line rule)
    assert(out(5L).getBoolean(4) && !out(5L).getBoolean(6))
    assert(out(5L).getLong(2) == 3)
  }

  test("empty input and empty text degrade without throwing") {
    assert(run(Seq.empty).isEmpty)
    val out = run(Seq((1L, ""), (2L, "\n\n")))
    Seq(1L, 2L).foreach { id =>
      assert(out(id).getLong(1) == 0 && out(id).getLong(2) == 0)
      assert(out(id).getDouble(3) == 0.0 && !out(id).getBoolean(6))
      assert(out(id).getString(7) == "")
    }
  }

  test("row-local op is partitioning-invariant") {
    val df = (1L to 40L)
      .map(i => (i, s"doc $i has exactly five words.\nfiller without punct"))
      .toDF("id", "text")
    val a = C4Filter.c4Lines(df.repartition(1), "id", "text")
      .orderBy("id").collect().toSeq
    val b = C4Filter.c4Lines(df.repartition(7, col("text")), "id", "text")
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
