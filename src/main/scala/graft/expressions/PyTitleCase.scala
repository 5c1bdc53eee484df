package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Python `str.title()` parity as a native Catalyst expression with codegen.
  *
  * The reference title-cases FIRSTNAME/LASTNAME/FULLNAME/TITLE with Python's
  * `str.title()` (reference cleaning/clean_contacts.py:117-119), which starts a
  * new "word" after ANY non-letter: `o'brien` -> `O'Brien`, `abc2d` -> `Abc2D`.
  * Spark's `initcap` splits on whitespace only (`O'brien`), so exact parity
  * needs this expression (SURVEY.md §2.8 C5).
  *
  * Implemented over ASCII letter boundaries (the reference corpus is ASCII);
  * non-ASCII bytes pass through and act as word boundaries, matching
  * `str.title()` for the Latin-1 subset the data exercises.
  */
case class PyTitleCase(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      PyTitleCase.titleCase(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PyTitleCase.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString($cls.titleCase($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): PyTitleCase =
    copy(child = newChild)
}

object PyTitleCase {
  /** Java port of CPython's `str.title()` loop (Objects/unicodeobject.c
    * do_title): track whether the previous char was cased; uppercase the first
    * cased char of each run, lowercase the rest. */
  def titleCase(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (Character.isLetter(ch)) {
        sb.append(if (prevCased) Character.toLowerCase(ch)
                  else Character.toTitleCase(ch))
        prevCased = true
      } else {
        sb.append(ch)
        prevCased = false
      }
      i += 1
    }
    sb.toString
  }

  def column(c: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(PyTitleCase(bridge.expression(c)))
  }
}
