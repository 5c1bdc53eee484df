package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Native product-quantization code assignment:
  * `(sub: array<double>, codebook: array<array<double>>,
  *   consts: array<double>) -> tinyint` — the code minimizing the
  * squared-L2 argmin key `round(consts[code] - 2 * dot(sub, cb[code]), 6)`
  * with ties to the smallest code. `consts[code]` carries the
  * sub-independent part of the key (`||cb||^2` for raw PQ;
  * `||cb||^2 + 2 c_sub.cb` for residual PQ, looked up per list by the
  * caller), so one kernel serves both paths.
  *
  * Why native: the expression formulation — an `array_min` over k
  * candidate structs, each embedding a literal sub-centroid dot — codegens
  * to one unsplittable function that at m=8 x k=16 (residual path, with
  * per-list constant lookups) exceeds the JVM's 64 KB method limit and
  * silently drops the whole encode projection to interpreted mode. Here
  * the k x ds loop runs at RUNTIME over a literal codebook matrix, so the
  * generated code is one static call regardless of m, k, or nlist — the
  * [[VecDotI8]] stance applied to the encode side.
  *
  * Arithmetic is bit-compatible with the expression form it replaced:
  * left-to-right dot accumulation (VecDot order), key rounded to 6 via
  * BigDecimal.valueOf(...).setScale(HALF_UP) — exactly Spark's
  * `round(col, 6)` on doubles — then strict `<` comparison so the first
  * (smallest) code wins ties, matching `array_min` on (key, code) structs.
  */
case class PqArgmin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ByteType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _),
          ArrayType(ArrayType(DoubleType, _), _),
          ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "PqArgmin requires (array<double>, array<array<double>>, " +
          s"array<double>), got ${first.dataType.simpleString}, " +
          s"${second.dataType.simpleString}, ${third.dataType.simpleString}")
    }

  override protected def nullSafeEval(s: Any, cb: Any, c: Any): Any =
    PqArgmin.pick(s.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqArgmin.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (s, cb, c) => s"$cls.pick($s, $cb, $c)")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqArgmin =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqArgmin {
  /** Shared by interpreted and generated code. Null elements contribute 0
    * to the dot (VecDot convention); inputs are non-null arrays. */
  def pick(sub: ArrayData, cb: ArrayData, consts: ArrayData): Byte = {
    val k = cb.numElements()
    var bestKey = Double.PositiveInfinity
    var best = 0
    var code = 0
    while (code < k) {
      val cv = cb.getArray(code)
      val n = math.min(sub.numElements(), cv.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (!sub.isNullAt(i) && !cv.isNullAt(i)) {
          dot += sub.getDouble(i) * cv.getDouble(i)
        }
        i += 1
      }
      val key = java.math.BigDecimal
        .valueOf(consts.getDouble(code) - 2.0 * dot)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (key < bestKey) { bestKey = key; best = code }
      code += 1
    }
    best.toByte
  }

  def column(sub: Column, cb: Column, consts: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(PqArgmin(bridge.expression(sub), bridge.expression(cb),
      bridge.expression(consts)))
  }
}
