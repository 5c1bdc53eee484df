package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-Minimum-Values distinct-value sketch as a native
  * `TypedImperativeAggregate` (Bar-Yossef et al. 2002; Beyer et al.,
  * SIGMOD'07 "On Synopses for Distinct Value Estimation"): keep the `k`
  * smallest DISTINCT hash values seen; the k-th smallest, as a fraction
  * u_k of the hash space, estimates the distinct count as (k-1)/u_k.
  *
  * Why KMV next to the built-in HLL: a KMV sketch is a uniform SAMPLE of
  * the element hash space, so two sketches compose under set operations —
  * the k smallest of a union is computable from the two sketches alone,
  * and the fraction of the combined sketch present in both sides is an
  * unbiased Jaccard estimator (Beyer et al. §5). HLL gives union only;
  * intersection/Jaccard via inclusion-exclusion explodes the relative
  * error when the intersection is small. Split-overlap auditing
  * (train/val leakage, cross-source duplication) needs exactly these
  * intersection estimates.
  *
  * Contract: input is an already-hashed NON-NEGATIVE long (the portable
  * [[graft.functions.Text.md5Long]] 60-bit convention — comparisons are
  * signed, so negative inputs would sort before all hashes and bias the
  * estimate; nulls are ignored, which makes `kmv_agg(when(cond, h))`
  * a filtered sketch at zero extra passes). State is O(k) (a bounded
  * sorted set), partial aggregation ships one k-entry buffer per map
  * task, and merge = union-then-truncate in any order — the mergeable-
  * summaries shape that makes the sketch a streaming/100-TB citizen.
  * Output: the sketch as a sorted ascending `array<long>` — deterministic
  * for any input order/partitioning, so sketches (and every estimate
  * derived with [[Kmv.estimate]]/[[Kmv.jaccard]]) are oracle-exact, not
  * tolerance-graded.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"KmvAgg needs k >= 2, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_agg requires a bigint (pre-hashed) input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object Kmv {

  /** The md5Long hash space: 16^15 = 2^60 (hashes are uniform in
    * [0, 2^60) — exactly representable as a double). */
  val Md5LongSpace: Double = 1152921504606846976.0

  def column(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(KmvAgg(bridge.expression(c), k).toAggregateExpression())
  }

  /** Distinct-count estimate from a KMV sketch: exact size when the
    * sketch never filled (it then IS the distinct value set), else
    * (k-1) * space / h_k. Pure built-in arithmetic — restatable in any
    * SQL engine, so estimates grade hash-exact. */
  def estimate(sketch: Column, k: Int,
      space: Double = Md5LongSpace): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(space)
        / element_at(sketch, k).cast("double"))

  /** The combined (union) sketch: k smallest of the two sketches' union —
    * computable from the sketches alone (the KMV composition property). */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Jaccard estimate (Beyer et al. §5): the fraction of the combined
    * k-sketch whose values appear in BOTH input sketches. */
  def jaccard(a: Column, b: Column, k: Int): Column = {
    val x = unionSketch(a, b, k)
    when(size(x) === 0, lit(0.0))
      .otherwise(size(array_intersect(x, array_intersect(a, b)))
        .cast("double") / size(x))
  }
}
