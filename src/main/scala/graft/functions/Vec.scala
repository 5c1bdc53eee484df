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

  /** Cast an array<float> to array<double> (exact, no rounding). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product: fold(zip_with(a, b, *), +) in doubles. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity; null when either vector has zero norm (explicit guard
    * — ANSI mode would otherwise raise divide-by-zero). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom > 0.0, dot(a, b) / denom).otherwise(lit(null).cast("double"))
  }

  /** Squared euclidean distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Sign-bit LSH bucket: pack the signs of `planes.length` hyperplane dot
    * products into an int. `planes` are literal array columns (generated
    * deterministically on the driver — see
    * [[graft.operators.Similarity.hyperplanes]]), so the whole thing is one
    * codegen'd expression over the scan: no shuffle to bucket a 100-TB corpus. */
  def lshBucket(v: Column, planes: Seq[Column]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, p) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
}
