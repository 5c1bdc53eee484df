package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpanCorrupt

/** T5 span corruption: the (input, target) pair must LOSSLESSLY encode the
  * original document — substituting each input sentinel with its target
  * span reproduces the token stream exactly. Plus counting identities,
  * sentinel numbering, degradation, and partitioning invariance. */
class SpanCorruptSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = (1L to 60L)
    .map(i => (i, (1 to 40).map(j => s"w${(i * 7 + j * 3) % 13}")
      .mkString(" ")))
    .toDF("doc_id", "text")

  private def parse(tgt: String): Map[Int, Seq[String]] = {
    if (tgt.isEmpty) Map.empty
    else {
      val parts = tgt.split("(?=<extra_id_\\d+>)").filter(_.nonEmpty)
      parts.map { p =>
        val toks = p.trim.split("\\s+").toSeq
        val k = toks.head.stripPrefix("<extra_id_").stripSuffix(">").toInt
        k -> toks.tail
      }.toMap
    }
  }

  test("sentinel substitution reconstructs every original document") {
    val out = SpanCorrupt.t5SpanCorruption(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(5), r.getString(6))).toMap
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    var masked = 0L
    out.foreach { case (id, (nTok, nSpans, nMasked, input, target)) =>
      val spans = parse(target)
      assert(spans.keySet == (0 until nSpans.toInt).toSet,
        s"doc $id: sentinels must number 0..${nSpans - 1}")
      assert(spans.values.map(_.length).sum == nMasked)
      val rebuilt = input.split("\\s+").filter(_.nonEmpty).flatMap { t =>
        if (t.startsWith("<extra_id_"))
          spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
        else Seq(t)
      }
      assert(rebuilt.toSeq == orig(id).split("\\s+").toSeq,
        s"doc $id: sentinel substitution must reconstruct the original")
      assert(nTok == 40L)
      masked += nMasked
    }
    // noise density 0.15 over 2400 tokens: the mask volume must be in a
    // plausible band (hash draws are deterministic, so this cannot flake)
    assert(masked > 150 && masked < 600, s"masked=$masked out of band")
  }

  test("empty docs degrade; output is partitioning-invariant") {
    val withEmpty = docs.unionByName(
      Seq((998L, ""), (999L, "   ")).toDF("doc_id", "text"))
    val out = SpanCorrupt.t5SpanCorruption(withEmpty, "doc_id", "text")
    val empty = out.filter(col("id") >= 998L).collect()
    assert(empty.length == 2 && empty.forall(r =>
      r.getLong(1) == 0 && r.getLong(3) == 0 && r.getString(5) == ""))
    val a = SpanCorrupt.t5SpanCorruption(withEmpty.repartition(1),
      "doc_id", "text").orderBy("id").collect().toSeq
    val b = SpanCorrupt.t5SpanCorruption(
      withEmpty.repartition(9, col("text")), "doc_id", "text")
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
