package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` / `array<double>`
  * embedding columns (the `embeddings.embedding` test column is
  * `array<float>`, 64-dim).
  *
  * All math is done in double precision with a left-to-right fold
  * (`aggregate`), which makes the result bit-deterministic per row — the same
  * value on every executor and in any other engine that folds sequentially.
  * That determinism is what lets similarity scores be oracle-checked.
  */
object Vec {

  /** Cast an array<float> to array<double> (exact, no rounding; a no-op
    * for arrays already double). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product: native codegen'd left-to-right loop
    * ([[graft.expressions.VecDot]]) — bit-identical to a sequential
    * fold-in-doubles, ~50x faster than the higher-order-function
    * formulation on the millions-of-pairs paths. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VecDot.column(asDouble(a), asDouble(b))

  /** Dot product against int8 codes ([[graft.expressions.VecDotI8]]): the
    * quantized-ANN scoring kernel — reads the 1-byte codes in place, no
    * dequantized array is materialized. Multiply by the per-vector scale
    * to recover the dequantized dot. */
  def dotI8(a: Column, codes: Column): Column =
    graft.expressions.VecDotI8.column(asDouble(a), codes)

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity; null when either vector has zero norm (explicit guard
    * — ANSI mode would otherwise raise divide-by-zero). */
  def cosine(a: Column, b: Column): Column =
    cosineFromParts(dot(a, b), norm(a), norm(b))

  /** Cosine from a precomputed dot product and per-side norms — lets join
    * operators compute each row's norm ONCE before the pair join instead of
    * per candidate pair (3x fewer array traversals on the hot path).
    * Identical arithmetic to [[cosine]]: dot / (normA * normB). */
  def cosineFromParts(dotAB: Column, normA: Column, normB: Column): Column = {
    val denom = normA * normB
    when(denom > 0.0, dotAB / denom).otherwise(lit(null).cast("double"))
  }

  /** Element-wise vector sum AGGREGATE (native
    * [[graft.expressions.VecSum]]): one double[dim] buffer per group with
    * associative merges — the centroid/embedding averaging kernel. Divide by
    * `count` for a mean. */
  def sumAgg(v: Column): Column =
    graft.expressions.VecSum.column(asDouble(v))

  /** Squared euclidean distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Sign-bit LSH bucket: pack the signs of `planes.length` hyperplane dot
    * products into an int. `planes` are literal array columns (generated
    * deterministically on the driver — see
    * [[graft.operators.Similarity.hyperplanes]]), so the whole thing is one
    * codegen'd expression over the scan: no shuffle to bucket a 100-TB corpus. */
  def lshBucket(v: Column, planes: Seq[Column]): Column = {
    require(planes.nonEmpty && planes.length <= 63,
      s"lshBucket packs sign bits into a long: 1..63 planes, got ${planes.length}")
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, p) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }
}
