package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.functions.Cleaning

/** The golden-record "most complete value" merge as a typed custom
  * `Aggregator` (SURVEY.md §2.9 / §7.2 M2) — the exact-semantics UDAF
  * promised by the survey: longest valid value wins; equal lengths prefer
  * the latest `last_updated`; still equal prefer the earliest row.
  *
  * The production path is [[graft.pipeline.GoldenRecord.mostComplete]]
  * (built-in `max_by` over a strict ordering struct): it gets partial
  * aggregation and codegen from Catalyst and implements the same ordering.
  * This Aggregator exists as the reference-parity artifact and the
  * equivalence oracle for that fast path (MostCompleteAggSpec proves the
  * two agree on every group), and as the extension point for merge rules
  * that stop being expressible as an ordering (e.g. value voting).
  *
  * Buffer = (bestValue, bestLen, bestTsMicros, bestNegRow); merge is
  * associative + commutative, so map-side partial aggregation applies.
  */
object MostCompleteAgg {

  case class In(value: String, tsMicros: Long, rowId: Long)
  case class Buf(value: String, len: Int, tsMicros: Long, negRow: Long,
      set: Boolean)

  private def valid(v: String): Boolean =
    v != null && v.trim.nonEmpty &&
      !Cleaning.MissingSentinels.contains(v.trim)

  val agg: Aggregator[In, Buf, String] = new Aggregator[In, Buf, String] {
    def zero: Buf = Buf(null, -1, Long.MinValue, Long.MinValue, set = false)

    private def better(a: Buf, b: Buf): Buf =
      if (!b.set) a
      else if (!a.set) b
      else {
        val cmp =
          if (a.len != b.len) a.len.compareTo(b.len)
          else if (a.tsMicros != b.tsMicros) a.tsMicros.compareTo(b.tsMicros)
          else a.negRow.compareTo(b.negRow)
        if (cmp >= 0) a else b
      }

    def reduce(b: Buf, in: In): Buf =
      if (!valid(in.value)) b
      // code-point count, not UTF-16 length: Spark's length() counts code
      // points, and the equivalence with GoldenRecord.mostComplete must
      // hold for supplementary characters too
      else better(b, Buf(in.value,
        in.value.codePointCount(0, in.value.length), in.tsMicros, -in.rowId,
        set = true))

    def merge(a: Buf, b: Buf): Buf = better(a, b)
    def finish(b: Buf): String = if (b.set) b.value else null
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Column form: mostCompleteAgg(value, tsMicros, rowId). */
  lazy val fn = udaf(agg)

  def apply(value: Column, tsMicros: Column, rowId: Column): Column =
    fn(value, tsMicros, rowId)
}
