package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom-filter runtime join pruning as a native kernel pair — the explicit
  * form of the "runtime row-level filter" big-join pattern: aggregate the
  * SELECTIVE side's join keys into an O(bits) sketch, ship it to the fact
  * scan as a literal, and drop non-joining fact rows BEFORE the data-sized
  * shuffle. At 100 TB the win is the shuffle you never pay: a 0.1%-selective
  * dim predicate prunes ~99% of fact exchange bytes for the cost of one
  * bits/8-byte broadcast (the filter is conservative — false positives pass
  * and die in the exact join; false negatives are impossible, so the final
  * result is exactly the plain join's).
  *
  * Bit positions use Kirsch–Mitzenmacher double hashing (two splitmix64
  * finalizer mixes, h_i = h1 + i*h2), the standard k-independent-hash
  * replacement (Kirsch & Mitzenmacher 2006, public).
  *
  * [[BloomAgg]] is a `TypedImperativeAggregate` (mergeable word-OR partial
  * state, like Spark's own sketch aggregates); [[BloomMightContain]] is a
  * codegen'd scalar over the `array<long>` words.
  */
object Bloom {

  /** splitmix64 finalizer over (v + seed) — a public-domain 64-bit mix. */
  def mix(v: Long, seed: Long): Long = {
    var z = v + seed
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def posAt(h1: Long, h2: Long, i: Int, numBits: Int): Int =
    (((h1 + i.toLong * h2) & Long.MaxValue) % numBits).toInt

  def set(words: Array[Long], v: Long, numBits: Int, numHashes: Int): Unit = {
    val h1 = mix(v, 0x9E3779B97F4A7C15L)
    val h2 = mix(v, 0xC2B2AE3D27D4EB4FL) | 1L
    var i = 0
    while (i < numHashes) {
      val p = posAt(h1, h2, i, numBits)
      words(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  /** Membership test; shared by interpreted and generated code. */
  def mightContain(words: ArrayData, v: Long, numBits: Int,
      numHashes: Int): Boolean = {
    val h1 = mix(v, 0x9E3779B97F4A7C15L)
    val h2 = mix(v, 0xC2B2AE3D27D4EB4FL) | 1L
    var i = 0
    while (i < numHashes) {
      val p = posAt(h1, h2, i, numBits)
      if ((words.getLong(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def agg(c: Column, numBits: Int, numHashes: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(
      BloomAgg(bridge.expression(c), numBits, numHashes).toAggregateExpression())
  }

  def mightContainCol(words: Column, value: Column, numBits: Int,
      numHashes: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(BloomMightContain(bridge.expression(words),
      bridge.expression(value), numBits, numHashes))
  }

  /** Build the filter over `df`'s `keyCol` (cast to long) and return its
    * words. The collect is sketch-sized (numBits/64 longs), never
    * data-sized — the caller inlines it as the literal for
    * [[mightContainCol]] on the fact side. */
  def buildFrom(df: org.apache.spark.sql.DataFrame, keyCol: Column,
      numBits: Int, numHashes: Int): Seq[Long] = {
    import org.apache.spark.sql.functions.col
    val r = df.select(agg(keyCol.cast("long"), numBits, numHashes).as("b"))
      .select(col("b")).head()
    if (r.isNullAt(0)) Seq.fill((numBits + 63) / 64)(0L) else r.getSeq[Long](0)
  }
}

/** Bloom-filter aggregate: OR-mergeable `array<long>` word state. Null
  * inputs are skipped. `numBits` must be a positive multiple of 64. */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(numBits >= 64 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1, 16], got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BloomAgg requires a bigint input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.set(buf, v.asInstanceOf[Long], numBits, numHashes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(bytes.length / 8)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `might_contain(words, key)` — codegen'd membership test against the
  * (typically literal) filter words. Conservative: true may be a false
  * positive, false is definite absence. */
case class BloomMightContain(left: Expression, right: Expression,
    numBits: Int, numHashes: Int) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "BloomMightContain requires (array<bigint>, bigint), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(words: Any, v: Any): Any =
    Bloom.mightContain(words.asInstanceOf[ArrayData],
      v.asInstanceOf[Long], numBits, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Bloom.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev,
      (w, v) => s"$cls.mightContain($w, $v, $numBits, $numHashes)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
