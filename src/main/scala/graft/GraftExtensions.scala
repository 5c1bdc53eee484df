package graft

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.bridge

import graft.expressions.{PyTitleCase, VecDot, WordShingles}
import graft.functions.Text

/** SparkSessionExtensions hook: registers the engine's native expressions
  * AND its composed text-analysis columns as SQL functions, so
  * `spark.sql("SELECT py_title(name), redact_pii(text), quality_score(text)")`
  * works on any session created with
  * `spark.sql.extensions=graft.GraftExtensions` (cluster-wide via config,
  * no code changes at call sites). The composed functions expand to the
  * same codegen-friendly Catalyst trees as their Column forms — SQL users
  * pay nothing over DataFrame users.
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
    ext.injectFunction((FunctionIdentifier("vec_dot_i8"),
      info("vec_dot_i8",
        "(array<double>, array<tinyint>) - dot against int8 codes"),
      (args: Seq[Expression]) => graft.expressions.VecDotI8(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("hamming_dist"),
      info("hamming_dist",
        "(array<bigint>, array<bigint>) - popcount-of-xor over bit-sketch " +
          "words (binary-ANN kernel)"),
      (args: Seq[Expression]) =>
        graft.expressions.HammingDist(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("pq_argmin"),
      info("pq_argmin",
        "(array<double>, array<array<double>>, array<double>) - PQ code " +
          "assignment: argmin of round(consts[c] - 2*dot(sub, cb[c]), 6)"),
      (args: Seq[Expression]) =>
        graft.expressions.PqArgmin(args(0), args(1), args(2))))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "str - Unicode NFC canonical composition"),
      (args: Seq[Expression]) => graft.expressions.NfcNormalize(args.head)))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "(str, n) - word n-gram shingle array"),
      (args: Seq[Expression]) =>
        WordShingles(args(0), intLiteral("word_shingles size", args(1)))))
    // text-analysis family (Column compositions lowered via the bridge)
    register(ext, "redact_pii", "str - emails/phones to typed placeholders",
      a => Text.redactPii(a.head))
    register(ext, "email_count", "str - number of email matches",
      a => Text.emailCount(a.head))
    register(ext, "phone_count", "str - number of phone matches",
      a => Text.phoneCount(a.head))
    register(ext, "quality_score", "str - heuristic doc quality in [0,1]",
      a => Text.qualityScore(a.head))
    register(ext, "lang_id", "str - n-gram language-ID heuristic",
      a => Text.langId(a.head))
    register(ext, "doc_fingerprint", "str - order-sensitive rolling hash",
      a => Text.fingerprint(a.head))
    register(ext, "bpe_count", "str - BPE-ish subword token count",
      a => Text.bpeTokenCount(a.head))
    register(ext, "simhash64", "str - 64-bit SimHash fingerprint",
      a => Text.simhash(a.head))
    register(ext, "hamming64", "(long, long) - Hamming distance",
      a => Text.hamming(a(0), a(1)))
    // aggregates: the registry builder returns the bare AggregateFunction
    // and the analyzer wraps it in an AggregateExpression, same as built-ins
    ext.injectFunction((FunctionIdentifier("vec_sum"),
      info("vec_sum", "(array<double>) - elementwise vector sum aggregate"),
      (args: Seq[Expression]) => graft.expressions.VecSum(args.head)))
    ext.injectFunction((FunctionIdentifier("misra_gries"),
      info("misra_gries",
        "(str, k) - Misra-Gries heavy-hitter candidates (array<string>)"),
      (args: Seq[Expression]) =>
        graft.expressions.MisraGries(args(0),
          intLiteral("misra_gries k", args(1)))))
    ext.injectFunction((FunctionIdentifier("topk_agg"),
      info("topk_agg",
        "(score double, id bigint, k) - bounded per-group top-k " +
          "(array<struct<score,id>> best-first, O(k) state)"),
      (args: Seq[Expression]) =>
        graft.expressions.TopKAgg(args(0), args(1),
          intLiteral("topk_agg k", args(2)))))
    ext.injectFunction((FunctionIdentifier("kmv_agg"),
      info("kmv_agg",
        "(bigint, k) - k-minimum-values distinct sketch (sorted " +
          "array<bigint> of the k smallest distinct hashes)"),
      (args: Seq[Expression]) =>
        graft.expressions.KmvAgg(args(0),
          intLiteral("kmv_agg k", args(1)))))
    ext.injectFunction((FunctionIdentifier("bloom_agg"),
      info("bloom_agg",
        "(bigint, numBits, numHashes) - Bloom filter word aggregate " +
          "(array<bigint>)"),
      (args: Seq[Expression]) => graft.expressions.BloomAgg(args(0),
        intLiteral("bloom_agg numBits", args(1)),
        intLiteral("bloom_agg numHashes", args(2)))))
    ext.injectFunction((FunctionIdentifier("bloom_contains"),
      info("bloom_contains",
        "(array<bigint>, bigint, numBits, numHashes) - conservative " +
          "membership test against Bloom words"),
      (args: Seq[Expression]) => graft.expressions.BloomMightContain(
        args(0), args(1),
        intLiteral("bloom_contains numBits", args(2)),
        intLiteral("bloom_contains numHashes", args(3)))))
    ext.injectFunction((FunctionIdentifier("cms_agg"),
      info("cms_agg",
        "(str, w, d) - Count-Min sketch counter-matrix aggregate " +
          "(array<bigint>)"),
      (args: Seq[Expression]) => graft.expressions.CmsAgg(args(0),
        intLiteral("cms_agg w", args(1)),
        intLiteral("cms_agg d", args(2)))))
    ext.injectFunction((FunctionIdentifier("cms_estimate"),
      info("cms_estimate",
        "(array<bigint>, str, w, d) - Count-Min point-frequency estimate"),
      (args: Seq[Expression]) => graft.expressions.CmsEstimate(
        args(0), args(1),
        intLiteral("cms_estimate w", args(2)),
        intLiteral("cms_estimate d", args(3)))))
  }

  /** Fold a SQL argument that must be a compile-time integer. Checked for
    * foldability BEFORE eval(): a non-foldable arg (e.g. a column reference)
    * would otherwise surface as an opaque analyzer/eval exception instead
    * of this message (round-6 ADVICE). */
  private def intLiteral(what: String, e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be an integer literal, got non-foldable expression $e")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private def register(ext: SparkSessionExtensions, name: String,
      usage: String, f: Seq[Column] => Column): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name, usage),
      (args: Seq[Expression]) => bridge.expression(f(args.map(bridge.column)))))
}
