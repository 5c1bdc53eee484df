package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native per-query ADC lookup-table build:
  * `(qsub: array<double>, codebook: array<array<double>>) ->
  *   array<double>` with `out[code] = dot(qsub, codebook[code])` —
  * the k-wide LUT one subspace of [[graft.operators.Similarity.pqTopK]]
  * precomputes per query row.
  *
  * Why native: the expression formulation — `array(k x VecDot(qsub,
  * literal))` — unrolls k dot TREES per subspace into the generated
  * method; at the 8-bit industry codebook size (k = 256, m = 8 → 2048
  * dots) the fused stage blows past janino's limits and the whole
  * projection dies (or silently interprets). Here the k x ds loop runs
  * at RUNTIME over the literal codebook matrix, so the generated code
  * is one static call regardless of k — the [[PqArgmin]] stance applied
  * to the probe side.
  *
  * Arithmetic is bit-compatible with the unrolled form it replaces:
  * each entry is [[VecDot.dot]]'s left-to-right accumulation over
  * min-length, nulls contributing 0 — byte-identical doubles, so every
  * ADC oracle hash is unchanged. */
case class PqLut(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "PqLut requires (array<double>, array<array<double>>), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(q: Any, cb: Any): Any =
    PqLut.build(q.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqLut.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (q, cb) => s"$cls.build($q, $cb)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqLut = copy(left = newLeft, right = newRight)
}

object PqLut {
  /** Shared by interpreted and generated code. Entry arithmetic is
    * exactly [[VecDot.dot]] per code. */
  def build(qsub: ArrayData, cb: ArrayData): GenericArrayData = {
    val k = cb.numElements()
    val out = new Array[Double](k)
    var code = 0
    while (code < k) {
      out(code) = VecDot.dot(qsub, cb.getArray(code))
      code += 1
    }
    new GenericArrayData(out)
  }

  def column(qsub: Column, cbMat: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(PqLut(bridge.expression(qsub), bridge.expression(cbMat)))
  }
}
