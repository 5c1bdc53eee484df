package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter sketch as a native `TypedImperativeAggregate`
  * (the same Catalyst extension point Spark's own `percentile_approx` /
  * `hll_sketch_agg` use). Returns the sketch's candidate keys — a guaranteed
  * superset of every value occurring more than n/(k+1) times in the input —
  * as a sorted `array<string>`.
  *
  * Why a sketch and not `groupBy(word).count()`: the exact count shuffles
  * the full key stream (vocabulary-sized — fine for words, fatal for, e.g.,
  * URL or shingle streams at 100 TB). The sketch is O(k) state per partial
  * aggregate, so the "shuffle" is one k-entry summary per map task, merged
  * associatively; the follow-up exact-count pass then touches only the ≤ k
  * candidate keys (broadcast semi-join filter before the shuffle). That
  * two-pass plan is q72's shape.
  *
  * Merge is the mergeable-summaries rule (Agarwal et al., PODS'12): sum
  * counts, then subtract the (size−k)-th smallest count and drop non-positive
  * entries. Each subtraction of c from a survivor accounts for ≥ k+1 stream
  * items, so total undercount per key ≤ n/(k+1) — under partial aggregation
  * in any merge order. Keys with true frequency > n/(k+1) therefore cannot
  * reach zero and always survive into the final summary.
  *
  * No reference-pipeline analogue (the contacts corpus is small enough for
  * exact counts); this is a training-data-pipeline extension operator.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"MisraGries needs at least one counter, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"MisraGries requires a string input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v == null) buf
    else {
      buf.get(v) match {
        case Some(c) => buf.update(v, c + 1L)
        case None =>
          // copy(): the incoming UTF8String may point into a reused row
          // buffer; the map key must own its bytes
          buf.update(v.copy(), 1L)
          if (buf.size > k) MisraGries.shrink(buf, k)
      }
      buf
    }
  }

  override def merge(a: mutable.HashMap[UTF8String, Long],
      b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (key, c) =>
      a.update(key, a.getOrElse(key, 0L) + c)
    }
    if (a.size > k) MisraGries.shrink(a, k)
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val keys = buf.keys.toArray
    java.util.Arrays.sort(keys, (x: UTF8String, y: UTF8String) => x.compareTo(y))
    new GenericArrayData(keys.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val bytes = key.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {

  /** Reduce `buf` to at most `k` entries: subtract the (size−k)-th smallest
    * count from every entry and drop non-positive ones. At least size−k
    * entries (those with count ≤ that pivot) are removed, so every unit of
    * pivot subtracted is charged against ≥ k+1 entries' worth of stream
    * mass — summed over all shrinks that is ≤ n total, giving the n/(k+1)
    * per-key undercount bound (and survival of every key with true
    * frequency above it). */
  private[expressions] def shrink(buf: mutable.HashMap[UTF8String, Long],
      k: Int): Unit = {
    val counts = buf.values.toArray
    java.util.Arrays.sort(counts)
    val pivot = counts(counts.length - k - 1)
    buf.filterInPlace((_, c) => c > pivot)
    buf.mapValuesInPlace((_, c) => c - pivot)
  }

  def column(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(MisraGries(bridge.expression(c), k).toAggregateExpression())
  }
}
