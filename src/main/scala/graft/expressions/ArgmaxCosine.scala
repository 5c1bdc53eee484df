package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native nearest-centroid assignment:
  * `(vec: array<double>, cents: array<array<double>>) -> int` — the index
  * (position in `cents`, 0-based) maximizing cosine(vec, cents[i]), ties to
  * the SMALLEST index, a null cosine (zero-norm side) losing to any non-null.
  *
  * Why native: the expression formulation — `array_max` over nlist
  * (cosine, -cent_id, cent_id) structs, each embedding a literal centroid
  * dot — emits O(nlist) codegen'd struct builds inside one whole-stage
  * processNext(). At the production IVF-PQ operating point (nlist = 64,
  * dim 64, fused with the parquet scan's float->double cast loops) that
  * stage exceeded janino's 64 KB method limit and Spark silently dropped
  * the whole encode projection to interpreted evaluation (round-12
  * PLANS.md note). Here the nlist x dim loop runs at RUNTIME over a
  * literal centroid matrix, so generated code is one static call
  * regardless of nlist — the [[PqArgmin]] stance applied to the coarse
  * assignment.
  *
  * Arithmetic is bit-compatible with the struct form it replaced:
  * per-centroid cosine = dot / (||v|| * ||c||) with every dot the
  * left-to-right [[VecDot.dot]] loop (null elements contribute 0,
  * min-length), the zero-denominator guard yielding null exactly like
  * `Vec.cosineFromParts`, and the argmax comparing doubles with
  * `java.lang.Double.compare` (Spark's double ordering) strictly, so the
  * first (smallest) index wins ties — `array_max`'s lexicographic
  * (sim, -cent_id) order. Divergence from the struct form on a NULL input
  * vector only: this expression is null-intolerant (returns null) where
  * the struct form returned index 0 through an all-null sim column;
  * embedding columns are dense, and callers require non-null vectors. */
case class ArgmaxCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "ArgmaxCosine requires (array<double>, array<array<double>>), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(v: Any, cents: Any): Any =
    ArgmaxCosine.pick(v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ArgmaxCosine.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (v, c) => s"$cls.pick($v, $c)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArgmaxCosine =
    copy(left = newLeft, right = newRight)
}

object ArgmaxCosine {
  /** Shared by interpreted and generated code. `cents` must be non-empty
    * (callers assign against a required-non-empty centroid set); a
    * defensively-handled empty set returns 0. */
  def pick(v: ArrayData, cents: ArrayData): Int = {
    val nv = math.sqrt(VecDot.dot(v, v))
    val k = cents.numElements()
    var best = 0
    var bestSim = 0.0
    var bestNull = true
    var c = 0
    while (c < k) {
      val cv = cents.getArray(c)
      val nc = math.sqrt(VecDot.dot(cv, cv))
      val denom = nv * nc
      if (denom > 0.0) {
        val sim = VecDot.dot(v, cv) / denom
        if (bestNull || java.lang.Double.compare(sim, bestSim) > 0) {
          best = c; bestSim = sim; bestNull = false
        }
      } // null cosine: loses to any non-null, and on an all-null column the
        // (sim, -cent_id) struct max falls through to the smallest index —
        // both exactly `best`'s initialization + never-replace behavior
      c += 1
    }
    best
  }

  def column(vec: Column, cents: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(ArgmaxCosine(bridge.expression(vec), bridge.expression(cents)))
  }
}
