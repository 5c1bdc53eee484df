package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a native
  * codegen expression — Spark ships no normalizer, yet web-scale text is
  * a mix of composed and decomposed encodings of the SAME visible string
  * (`e` + U+0301 vs `é`). Every byte-keyed operator upstream — exact
  * dedup (q6/q18), shingle hashing (q19/q20), token counting, BPE — is
  * wrong on un-normalized text: two spellings of one word hash apart, so
  * duplicates survive and vocabularies split. Normalization is therefore
  * the first row-local pass of a curation pipeline (the C4/CCNet
  * preprocessing stance), BEFORE any fingerprint is computed.
  *
  * NFC (not NFKC) deliberately: canonical composition is lossless and
  * round-trips display-identical strings; compatibility folding (NFKC's
  * ligature/width folds) is a content-altering cleaning choice left to
  * the caller. Implementation is the JDK's `java.text.Normalizer` (ICU
  * parity on the canonical forms — both implement UAX #15), wrapped as a
  * UnaryExpression with `defineCodeGen`, so it rides inside
  * whole-stage codegen like any built-in string function: a fast
  * `Normalizer.isNormalized` check skips the rewrite for the (dominant)
  * already-composed case, and the expression stays a pure row-local map
  * — zero shuffle at any scale.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NfcNormalize.nfc(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NfcNormalize.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString($cls.nfc($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  def nfc(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)

  def column(c: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(NfcNormalize(bridge.expression(c)))
  }
}
