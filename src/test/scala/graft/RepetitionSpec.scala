package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Repetition

/** Gopher repetition metrics: hand-computed line/n-gram fixtures, the
  * short-doc whole-shingle convention, and empty-input degradation. */
class RepetitionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: (Long, String)*) =
    Repetition.gopherRepetition(rows.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getBoolean(6)))).toMap

  test("line metrics: duplicate lines and chars, hand-computed") {
    // lines foo/bar/foo/baz: 4 lines, 3 distinct -> dup_line_frac 0.25;
    // chars 12 vs distinct 9 -> dup_line_char_frac 0.25
    val out = run((1L, "foo\nbar\nfoo\nbaz"))
    val (n, dlf, dlcf, top2, dup5, flagged) = out(1L)
    assert(n == 4L && dlf == 0.25 && dlcf == 0.25)
    // \s+ tokenization spans the newlines: 2-grams "foo bar"/"bar foo"/
    // "foo baz" all cnt 1, tie-break -> "foo baz" (7 of 21 chars);
    // 4 tokens < 5 -> dup5 whole-doc shingle, 0. Flag fires on top2.
    assert(top2 == round6(7.0 / 21) && dup5 == 0.0 && flagged)
  }

  test("top-2-gram char fraction, hand-computed with tie-break") {
    // "a b a b a b": 2-grams "a b"x3, "b a"x2 -> top (3,"a b"), chars
    // 3*3=9 of 15 -> 0.6; 5-grams both unique -> dup5 0; flagged via top2
    val (_, _, _, top2, dup5, flagged) = run((1L, "a b a b a b"))(1L)
    assert(top2 == 0.6 && dup5 == 0.0 && flagged)
  }

  test("dup-5-gram char fraction on a pure repetition loop") {
    // "x x x x x x": 5-gram "x x x x x" x2 -> dup5 = 1.0; top2 "x x" x5
    val (_, _, _, top2, dup5, flagged) = run((1L, "x x x x x x"))(1L)
    assert(top2 == 1.0 && dup5 == 1.0 && flagged)
  }

  test("short docs count one whole-doc shingle; ties break to max gram") {
    val (_, _, _, top2, dup5, flagged) = run((1L, "just four small words"))(1L)
    // 4 tokens < 5 -> single whole-doc 5-gram (cnt 1) -> dup5 0;
    // 2-grams all cnt 1 -> tie-break picks "small words" (11 of 30 chars).
    // Short docs inherently concentrate n-gram mass — Gopher applies these
    // thresholds after a min-length gate, hence the flag here.
    assert(dup5 == 0.0 && top2 == round6(11.0 / 30) && flagged)
  }

  test("empty and whitespace-only docs degrade to zeros") {
    val out = run((1L, ""), (2L, "   "))
    for (idx <- Seq(1L, 2L)) {
      val (n, dlf, dlcf, top2, dup5, flagged) = out(idx)
      assert(n == 0L && dlf == 0.0 && dlcf == 0.0 && top2 == 0.0 &&
        dup5 == 0.0 && !flagged)
    }
  }

  test("empty input frame yields empty output") {
    val df = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Repetition.gopherRepetition(df, "doc_id", "text")
      .collect().isEmpty)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
