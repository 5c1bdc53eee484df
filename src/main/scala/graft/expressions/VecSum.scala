package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise sum of `array<double>` vectors as a native
  * `TypedImperativeAggregate` — the aggregation kernel of the k-means update
  * step (and any centroid/embedding averaging). One double[] buffer per
  * group, merged associatively, so a 100-TB corpus mean ships ONE dim-length
  * vector per map task per group instead of a `posexplode` row per vector
  * component (corpus x dim rows through the exchange).
  *
  * All input vectors in a group must share one dimensionality; mismatches,
  * zero-length vectors (indistinguishable from the uninitialized buffer),
  * and null COMPONENTS (which would otherwise unbox to 0.0) all throw
  * rather than silently corrupt the sum. Null vectors are skipped; a group
  * with no non-null vector sums to an empty array.
  */
case class VecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"VecSum requires array<double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) buf
    else {
      val n = arr.numElements()
      if (n == 0) throw new IllegalArgumentException(
        "VecSum: zero-length vector (empty arrays are not summable)")
      val b = if (buf.isEmpty) new Array[Double](n) else buf
      if (b.length != n) throw new IllegalArgumentException(
        s"VecSum: mixed vector dimensions (${b.length} vs $n)")
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"VecSum: null component at index $i (would unbox to 0.0)")
        b(i) += arr.getDouble(i)
        i += 1
      }
      b
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      if (a.length != b.length) throw new IllegalArgumentException(
        s"VecSum: mixed vector dimensions (${a.length} vs ${b.length})")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.map(v => v: Any))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSum =
    copy(child = newChild)
}

object VecSum {
  def column(c: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(VecSum(bridge.expression(c)).toAggregateExpression())
  }
}
