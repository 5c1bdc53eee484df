package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Approximate BPE token count as a native expression: matches of the
  * GPT-2-style pre-tokenizer regex (letter runs, single digits, single
  * punctuation marks), with letter runs counted as ceil(len/4) subword
  * pieces — one scan per row instead of regexp_extract_all materializing a
  * piece array and an interpreted fold summing it. Byte-identical to the
  * HOF form ([[graft.functions.Text.bpeTokenCountHof]]), including null in
  * -> null out and 0 for empty text.
  */
case class BpeCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BpeCount requires a string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BpeCount.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

object BpeCount {

  private val Bpeish =
    java.util.regex.Pattern.compile(graft.functions.Text.BpeishRegex)

  /** Shared kernel for interpreted and generated code. */
  def count(s: UTF8String): Long = {
    val m = Bpeish.matcher(s.toString)
    var acc = 0L
    while (m.find()) {
      val len = m.end() - m.start()
      // letter runs are the only multi-char matches; ceil(len / 4)
      acc += (if (len <= 1) 1L else (len + 3L) / 4L)
    }
    acc
  }

  def column(c: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(BpeCount(bridge.expression(c)))
  }
}
