package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the data-layout
  * operator behind multi-column file skipping (Morton 1966; the technique
  * in Delta/Iceberg `OPTIMIZE ZORDER BY`): interleaving the bits of two
  * bucketized dimensions produces a 1-D sort key under which points close
  * in BOTH dimensions are close in the file, so per-file/row-group
  * min-max statistics prune scans for predicates on EITHER OR BOTH
  * columns — a single-column sort only ever prunes its own column.
  *
  * Bucketization here is equi-width from the global min/max (a 1-row
  * broadcast aggregate — at 100 TB those bounds come from table
  * metadata; percentile-based bucketing is the skew-robust variant and
  * slots into the same interleave). The interleave itself is pure
  * integer bit arithmetic — codegen'd, engine-portable, zero shuffle;
  * the only exchange a layout job needs is the final range-partitioned
  * sort by the code, which IS the product.
  */
object ZOrder {

  /** Morton-interleave two already-bucketized non-negative ints of
    * `bits` bits each: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. Folded into a 2*bits-term sum of shifts — constant-folded
    * per row, no UDF. */
  def interleave2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Equi-width bucket of `c` into [0, 2^bits) given broadcast global
    * bounds `cmin`/`cmax` (degenerate ranges map to bucket 0). */
  def bucket(c: Column, cmin: Column, cmax: Column, bits: Int): Column = {
    val n = (1L << bits) - 1
    when(cmax > cmin,
      floor((c - cmin).cast("double") / (cmax - cmin) * n).cast("long"))
      .otherwise(0L)
  }

  /** Attach `zcode` (plus the two bucket columns `za`/`zb`) for
    * dimensions `dimA`/`dimB` of `df`, `bits` bits each. One scan for
    * the bounds (1-row broadcast), one codegen'd projection for the
    * code. Sort by `zcode` to lay data out; this function deliberately
    * does NOT sort so callers can compose (e.g. range-partitioned
    * write). */
  def zCode(df: DataFrame, dimA: String, dimB: String,
      bits: Int = 8): DataFrame = {
    val bounds = df.agg(
      min(col(dimA)).as("__amin"), max(col(dimA)).as("__amax"),
      min(col(dimB)).as("__bmin"), max(col(dimB)).as("__bmax"))
    val za = bucket(col(dimA), col("__amin"), col("__amax"), bits)
    val zb = bucket(col(dimB), col("__bmin"), col("__bmax"), bits)
    df.crossJoin(broadcast(bounds))
      .withColumn("za", za).withColumn("zb", zb)
      .withColumn("zcode", interleave2(col("za"), col("zb"), bits))
      .drop("__amin", "__amax", "__bmin", "__bmax")
  }
}
