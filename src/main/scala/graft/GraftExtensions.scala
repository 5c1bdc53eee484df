package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{PyTitleCase, VecDot}

/** SparkSessionExtensions hook: registers the engine's native expressions
  * as SQL functions, so `spark.sql("SELECT py_title(name), vec_dot(a, b)")`
  * works on any session created with
  * `spark.sql.extensions=graft.GraftExtensions` (cluster-wide via config,
  * no code changes at call sites).
  *
  * Custom optimizer rules / strategies are deliberately absent: the survey
  * found none needed (SURVEY.md §4) — expressions are the only custom
  * Catalyst artifacts in this engine.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("py_title"),
      info("py_title", "str - Python str.title() semantics"),
      (args: Seq[Expression]) => PyTitleCase(args.head)))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "(array<double>, array<double>) - dot product"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")
}
