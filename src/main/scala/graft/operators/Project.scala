package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection (Achlioptas 2003's ±1
  * database-friendly variant) with a distortion audit — compress
  * d-dim embeddings to k ≪ d dims by a fixed sign matrix and measure
  * what it does to pairwise similarity. At corpus scale the embedding
  * column dominates storage and every ANN shuffle; JL is the
  * cheapest defensible compression (no training, no codebooks —
  * contrast the learned PQ tier, q92–q95), and the audit answers the
  * operational question: is cosine after projection still within
  * tolerance for THIS corpus?
  *
  * The sign matrix is derived from md5 of the (row, col) index pair —
  * deterministic, seedless, identical in any engine with md5, so the
  * projection is reproducible across writers (the same stance as the
  * md5-keyed splits, q110/q126). No scaling is applied: cosine is
  * scale-invariant and the audit compares cosines.
  *
  * Scale posture: projection is a pure per-row expression over a
  * LITERAL k×d sign matrix (k·d multiply-adds per row, no shuffle,
  * no join against a matrix table); the audit's pair frame is formed
  * by an id-shifted self-join (adjacent ids — linear, not quadratic)
  * and one 1-row summary aggregate broadcast back. */
object Project {

  /** The deterministic ±1 sign matrix: sign(k, j) = +1 iff the first
    * hex char of md5("k_j") is in [0-7]. */
  private[graft] def signMatrix(dOut: Int, dIn: Int): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dOut, dIn) { (k, j) =>
      val h = md.digest(s"${k}_${j}".getBytes("UTF-8"))
      md.reset()
      // first hex char is the high nibble of byte 0
      if (((h(0) >> 4) & 0xf) < 8) 1 else -1
    }
  }

  /** Column expression: project `vec` (array<double>, length dIn) to
    * an array<double> of length dOut via the literal sign matrix. */
  def jlProject(vec: Column, dOut: Int, dIn: Int): Column = {
    val m = signMatrix(dOut, dIn)
    // one 2-D Literal instead of dOut·dIn CreateArray/Literal nodes
    // (identical values — constant folding produced this Literal anyway)
    val rows = typedLit(m.map(_.toSeq).toSeq)
    transform(rows, row =>
      aggregate(zip_with(vec, row, (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x))
  }

  /** Distortion audit over adjacent-id pairs: per pair the original
    * and projected cosine (rounded 6) and their absolute gap, plus
    * corpus-level mean/max gap repeated per row (1-row broadcast).
    * `df`: (idCol, vecCol array<double>). */
  def jlDistortion(df: DataFrame, idCol: String, vecCol: String,
      dOut: Int, dIn: Int): DataFrame = {
    import graft.functions.Vec
    val e = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      jlProject(col(vecCol), dOut, dIn).as("pv"))
    val a = e.select(col("id"), col("v").as("va"), col("pv").as("pa"))
    val b = e.select((col("id") - 1).as("id"), col("v").as("vb"),
      col("pv").as("pb"))
    val pairs = a.join(b, Seq("id"))
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"),
        round(Vec.cosine(col("va"), col("vb")), 6).as("cos_orig"),
        round(Vec.cosine(col("pa"), col("pb")), 6).as("cos_proj"))
      .withColumn("abs_gap",
        round(abs(col("cos_orig") - col("cos_proj")), 6))
    val summary = pairs.agg(
      round(avg(col("abs_gap")), 6).as("mean_gap"),
      round(max(col("abs_gap")), 6).as("max_gap"))
    pairs.crossJoin(broadcast(summary))
  }
}
