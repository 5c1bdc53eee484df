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

  test("imageFeatures: deterministic, per-channel normalized, honest on junk") {
    import graft.operators.Multimodal
    val gen = for {
      w <- Gen.choose(1, 24)
      h <- Gen.choose(1, 12)
      dim <- Gen.oneOf(4, 8, 16, 32)
    } yield (w, h, dim)
    for ((w, h, dim) <- samples(gen)) {
      val png = Multimodal.encodePng(w, h, 4)
      val a = Multimodal.imageFeatures(png, dim)
      val b = Multimodal.imageFeatures(png, dim)
      assert(a.toSeq == b.toSeq)
      assert(a.length == dim)
      // each of the 4 channels' buckets sums to 1 over w*h pixels
      assert(math.abs(a.sum - 4.0f) < 1e-4f)
      // counts primitive agrees with the normalization
      val hist = Multimodal.imageHistogram(png, dim / 4).get
      assert(hist.sum == 4L * w * h)
      assert(a.toSeq == hist.map(c => (c.toDouble / (w * h)).toFloat).toSeq)
    }
    // undecodable bytes: empty, never invented
    for (junk <- samples(Gen.listOf(Gen.choose(-128, 127).map(_.toByte)))) {
      assert(Multimodal.imageFeatures(junk.toArray, 8).isEmpty
        || Multimodal.decodePixels(junk.toArray).isDefined)
    }
  }
}
