package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.NfcNormalize

/** NfcNormalize: canonical composition against hand-built decomposed
  * inputs, NFKC-fold refusal, pass-through fast path, and null safety. */
class NfcNormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val eAcuteD = "e\u0301"       // decomposed
  private val eAcuteC = "\u00e9"        // composed
  private val ligFi = "\ufb01"          // U+FB01, must NOT fold under NFC

  test("composes decomposed sequences, leaves compatibility chars alone") {
    val out = Seq("Caf" + eAcuteD, "A\u030a", ligFi + "ne", "ascii only")
      .toDF("s").select(NfcNormalize.column(col("s")).as("n"))
      .as[String].collect().toSeq
    assert(out == Seq("Caf" + eAcuteC, "\u00c5", ligFi + "ne", "ascii only"))
  }

  test("idempotent and length-shrinking on combining runs") {
    val df = Seq("x" + eAcuteD + eAcuteD).toDF("s")
    val once = df.select(NfcNormalize.column(col("s")).as("n"))
    val twice = once.select(NfcNormalize.column(col("n")).as("n"))
    assert(once.as[String].head() == twice.as[String].head())
    // e + acute + acute -> eacute + acute: 4 chars -> 3
    assert(once.select(length(col("n"))).as[Int].head() == 3)
  }

  test("null-safe and kernel pass-through on normalized input") {
    val out = Seq[Option[String]](None, Some("plain"))
      .toDF("s").select(NfcNormalize.column(col("s")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out.toSeq == Seq(null, "plain"))
    val s = "already composed \u00e9"
    assert(NfcNormalize.nfc(s) eq s) // isNormalized fast path returns same ref
  }
}
