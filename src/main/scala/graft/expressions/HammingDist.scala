package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Hamming distance over two `array<long>` bit-sketch columns, with
  * whole-stage codegen — the per-pair kernel of binary-quantized ANN
  * ([[graft.operators.Similarity.binaryTopK]]): popcount of the XOR, summed
  * across words. A `zip_with`/`aggregate` formulation would interpret two
  * lambdas and allocate a zipped array per PAIR on exactly the path the
  * 1-bit sketch exists to make cheap; this is a tight loop over
  * `Long.bitCount` (one hardware POPCNT per word when JIT'd).
  *
  * Mismatched lengths: the shorter side is zero-extended (missing words
  * count their partner's set bits — the sketch-correct reading: absent
  * dimensions are sign-0). Null words are treated as 0L.
  */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"HammingDist requires array<bigint> inputs, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    HammingDist.dist(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HammingDist.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$cls.dist($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HammingDist = copy(left = newLeft, right = newRight)
}

object HammingDist {
  /** popcount(xor) summed across words; shared by interpreted + codegen. */
  def dist(x: ArrayData, y: ArrayData): Long = {
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.max(nx, ny)
    var acc = 0L
    var i = 0
    while (i < n) {
      val xv = if (i < nx && !x.isNullAt(i)) x.getLong(i) else 0L
      val yv = if (i < ny && !y.isNullAt(i)) y.getLong(i) else 0L
      acc += java.lang.Long.bitCount(xv ^ yv)
      i += 1
    }
    acc
  }

  def column(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(HammingDist(bridge.expression(a), bridge.expression(b)))
  }
}
