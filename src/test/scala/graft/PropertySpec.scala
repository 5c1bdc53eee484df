package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.PyTitleCase

/** Property-based tests (SURVEY.md §5): idempotence and structural
  * invariants of the pure (driver-side) kernels, driven by ScalaCheck
  * generators over fixed seeds (deterministic run-to-run). Spark-level
  * invariants (dedup output <= input etc.) are covered in the operator
  * specs. */
class PropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 300): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaChar, 2 -> Gen.numChar,
      2 -> Gen.const(' '), 1 -> Gen.oneOf('\'', '-', '.', '@')))
      .map(_.mkString)

  test("titleCase is idempotent") {
    for (s <- samples(asciiText)) {
      val once = PyTitleCase.titleCase(s)
      assert(PyTitleCase.titleCase(once) == once, s"input: '$s'")
    }
  }

  test("titleCase preserves length and non-letters") {
    for (s <- samples(asciiText)) {
      val t = PyTitleCase.titleCase(s)
      assert(t.length == s.length)
      for (i <- s.indices if !s(i).isLetter) assert(t(i) == s(i))
    }
  }

  test("JDK codecs: PNG/WAV encode->header-decode round-trips any size") {
    import graft.operators.Multimodal._
    val pngGen = for {
      w <- Gen.choose(1, 64)
      h <- Gen.choose(1, 64)
      ch <- Gen.oneOf(1, 3, 4)
    } yield (w, h, ch)
    for ((w, h, ch) <- samples(pngGen, n = 60)) {
      assert(decodeImageMeta(encodePng(w, h, ch))
        .contains(MediaMeta("image", w, h, ch, 0L)), s"png ${w}x$h/$ch")
      // corrupting the header magic must yield an honest None, not junk
      val bytes = encodePng(w, h, ch)
      bytes(1) = 'X'.toByte
      assert(decodeImageMeta(bytes).isEmpty)
    }
    val wavGen = for {
      k <- Gen.choose(1, 500) // frames = 8k at 8 kHz -> duration = k ms
      ch <- Gen.oneOf(1, 2)
    } yield (k, ch)
    for ((k, ch) <- samples(wavGen, n = 60)) {
      assert(decodeAudioMeta(encodeWav(k * 8, ch))
        .contains(MediaMeta("audio", 0, 0, ch, k.toLong)), s"wav $k/$ch")
    }
  }

  test("fakeFeatures: deterministic, normalized, fixed-dim") {
    val gen = for {
      bytes <- Gen.listOf(Gen.choose(-128, 127).map(_.toByte))
      dim <- Gen.choose(1, 32)
    } yield (bytes, dim)
    for ((bytes, dim) <- samples(gen)) {
      val a = graft.operators.Multimodal.fakeFeatures(bytes.toArray, dim)
      val b = graft.operators.Multimodal.fakeFeatures(bytes.toArray, dim)
      assert(a.toSeq == b.toSeq)
      assert(a.length == dim)
      if (bytes.nonEmpty) assert(math.abs(a.sum - 1.0f) < 1e-4f)
    }
  }
}
