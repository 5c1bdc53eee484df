package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keep the `k` best (score, id) pairs per group
  * with O(k) state — the mergeable-summaries alternative to the
  * `row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k` window.
  *
  * Why it matters at 100 TB: the window form shuffles and SORTS every row
  * of every group to keep k of them; this aggregate's partial buffers
  * ship at most k entries per map task per group, so the exchange carries
  * `k * partitions` rows per group and nothing ever sorts more than k
  * elements. Same asymptotic win as Spark's own `percentile_approx`
  * over a full sort — here applied to per-group top-k retention
  * (best-document-per-cluster, top-candidates-per-query ANN, q47-style
  * keep-best dedup).
  *
  * Ordering contract: best = highest score, ties broken by SMALLEST id
  * (deterministic under any partitioning/merge order). Output:
  * `array<struct<score double, id bigint>>` sorted best-first. Null
  * scores/ids are ignored.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k >= 1, s"TopKAgg needs k >= 1, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_agg requires (double, bigint), got (${s.simpleString}, ${i.simpleString})")
    }

  /** Weakest-first order: lowest score first; among equal scores the
    * LARGEST id first (it loses the tie), so `first()` is always the
    * entry to evict. */
  private def comparator: java.util.Comparator[(Double, Long)] =
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](comparator)

  private def add(buf: java.util.TreeSet[(Double, Long)],
      e: (Double, Long)): Unit = {
    if (buf.size < k) { buf.add(e); () }
    else if (comparator.compare(e, buf.first()) > 0) {
      if (buf.add(e)) { buf.pollFirst(); () }
    }
  }

  override def update(buf: java.util.TreeSet[(Double, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      add(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(a: java.util.TreeSet[(Double, Long)],
      b: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    // best-first: descending iterator of the weakest-first set
    val arr = new Array[Any](buf.size)
    val it = buf.descendingIterator()
    var i = 0
    while (it.hasNext) {
      val (s, id) = it.next()
      arr(i) = InternalRow(s, id)
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (s, id) = it.next()
      out.writeDouble(s); out.writeLong(id)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKAgg = copy(score = newLeft, id = newRight)
}

object TopK {
  def column(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(TopKAgg(bridge.expression(score),
      bridge.expression(id), k).toAggregateExpression())
  }
}
