package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as a native Catalyst expression — the tokenize +
  * slide + join kernel under every shingle-based dedup operator (Jaccard
  * pairs, MinHash signatures, decontamination, repetition rules).
  *
  * The higher-order-function formulation
  * (`transform(sequence(...), i => concat_ws(" ", slice(tokens, i, n)))`)
  * interprets one lambda call and allocates one sliced array PER SHINGLE;
  * profiled at sf0.1 the posting build dominated every pair query (~4 s of
  * an 8 s q19). This expression is one tight loop per row, shared by the
  * interpreted and generated paths.
  *
  * Semantics are byte-identical to the composed form (and to the DuckDB
  * oracle twins):
  *   tokens   = lowercase, split on `\s+`, empties dropped;
  *   shingles = the len-n+1 space-joined n-token windows, or — for
  *              documents shorter than n tokens — ONE shingle holding the
  *              space-joined whole document;
  *   null/empty text therefore yields `[""]` (never null), exactly like
  *   `concat_ws` over an empty token array.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _: StringType =>
      TypeCheckResult.TypeCheckFailure(s"shingle size must be >= 1, got $n")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"WordShingles requires a string input, got ${other.simpleString}")
  }

  // null input maps to [""], so eval/codegen bypass the null-safe helpers
  override def eval(input: InternalRow): Any =
    WordShingles.shingles(child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = WordShingles.getClass.getName.stripSuffix("$")
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $cls.shingles(${childGen.isNull} ? null : ${childGen.value}, $n);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Shared kernel for interpreted and generated code. UTF8String
    * lowercasing (not java.lang.String's) keeps locale-independent parity
    * with Spark's `lower`. */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val toks: Array[String] =
      if (s == null) Array.empty
      else Ws.split(s.toLowerCase.toString).filter(_.nonEmpty)
    val out: Array[Any] =
      if (toks.length >= n) {
        val m = toks.length - n + 1
        val arr = new Array[Any](m)
        var i = 0
        while (i < m) {
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          arr(i) = UTF8String.fromString(sb.toString)
          i += 1
        }
        arr
      } else Array[Any](UTF8String.fromString(toks.mkString(" ")))
    new GenericArrayData(out)
  }

  def column(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(WordShingles(bridge.expression(c), n))
  }
}
