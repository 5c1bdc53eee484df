package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns, with whole-stage
  * codegen — the hot kernel of every similarity / ANN / near-dup operator.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, *), +)`)
  * allocates a zipped array and interprets two lambdas per row; at millions
  * of candidate pairs that dominates the runtime. This expression is a tight
  * primitive loop in generated code (or in [[nullSafeEval]] when
  * interpreted). Summation is left-to-right in doubles — bit-identical to
  * the sequential fold, so oracle hash-compares are unaffected.
  *
  * Mismatched lengths: extra elements of the longer array are ignored
  * (min-length loop); null if either side or any used element is null-free
  * by construction here (embeddings are dense), so element nulls are treated
  * as 0.0 for robustness.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"VecDot requires array<double> inputs, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    VecDot.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VecDot.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$cls.dot($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDot = copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Tight left-to-right loop; shared by interpreted and generated code. */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getDouble(i) * y.getDouble(i)
      }
      i += 1
    }
    acc
  }

  def column(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(VecDot(bridge.expression(a), bridge.expression(b)))
  }
}
