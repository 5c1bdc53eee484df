package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, LmScore, Multimodal, QualityRules, Sessionize, Similarity}

/** Operator-level tests: dedup family (exact / Jaccard / MinHash-LSH /
  * SimHash / embedding), ANN search, sessionization, multimodal plumbing. */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact dedup keeps the min-id survivor per key") {
    val df = Seq((3L, "A", "x"), (1L, "A", "x"), (2L, "B", "y"))
      .toDF("id", "k1", "k2")
    val out = Dedup.exact(df, Seq(col("k1"), col("k2")), col("id"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L))
  }

  test("exactText dedups on normalized content") {
    val df = docs((1L, "Hello  World"), (2L, " hello world "), (3L, "other"))
    val out = Dedup.exactText(df, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 3L))
  }

  test("ngramJaccardPairs computes exact jaccard on shingle sets") {
    // doc1: shingles {a b c, b c d}; doc2: {a b c}; jaccard = 1/2
    val df = docs((1L, "a b c d"), (2L, "a b c"), (3L, "x y z"))
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text",
      shingleSize = 3, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs == Seq((1L, 2L, 0.5)))
  }

  test("minhashLshPairs finds planted near-dups with exact rescoring") {
    val base = (1 to 50).map(i => s"tok$i").mkString(" ")
    val near = (2 to 50).map(i => s"tok$i").mkString(" ")
    val far = (1 to 50).map(i => s"zzz$i").mkString(" ")
    val df = docs((1L, base), (2L, near), (3L, far))
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text", shingleSize = 3,
      numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("QualityRules.signals: repetition, top-2gram, symbols, edge docs") {
    val df = docs(
      (1L, "spam spam spam spam spam spam"), // one token repeated
      (2L, "the quick brown fox jumps over lazy dogs while birds sing loudly"),
      (3L, "x ## #### ..."),                  // symbol noise
      (4L, ""),                               // empty
      (5L, "   "))                            // whitespace only
    val out = QualityRules.signals(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 5, "every input id is preserved")
    // doc 1: 6 tokens, 1 distinct -> dup frac 5/6; top 2-gram "spam spam" x5
    assert(out(1L).getAs[Double]("dup_tok_frac") == math.rint(5.0 / 6 * 1e6) / 1e6)
    assert(out(1L).getAs[String]("top_2gram") == "spam spam")
    assert(out(1L).getAs[Long]("top_2gram_cnt") == 5L)
    assert(!out(1L).getAs[Boolean]("keep"))
    // doc 2: no repeats, every 2-gram unique -> keeps
    assert(out(2L).getAs[Double]("dup_tok_frac") == 0.0)
    assert(out(2L).getAs[Long]("top_2gram_cnt") == 1L)
    assert(out(2L).getAs[Boolean]("keep"))
    // doc 3: 6 '#' chars + one '...' = 7 symbols over 4 tokens -> fails
    assert(out(3L).getAs[Double]("symbol_word_ratio") == 1.75)
    assert(!out(3L).getAs[Boolean]("keep"))
    // empty / whitespace docs: zero tokens, all ratios 0, keep = true
    for (id <- Seq(4L, 5L)) {
      assert(out(id).getAs[Long]("n_tokens") == 0L)
      assert(out(id).getAs[Double]("dup_tok_frac") == 0.0)
      assert(out(id).getAs[Double]("top2gram_char_frac") == 0.0)
      assert(out(id).getAs[Boolean]("keep"))
    }
  }

  test("QualityRules: a 1-token doc has no 2-gram and is not dropped") {
    val out = QualityRules.signals(docs((1L, "hello")), "doc_id", "text")
      .head()
    // the whole-document fallback shingle must NOT masquerade as a
    // dominant 2-gram (it would score char_frac 1.0 and drop the doc)
    assert(out.getAs[Long]("n_tokens") == 1L)
    assert(out.getAs[String]("top_2gram") == "")
    assert(out.getAs[Long]("top_2gram_cnt") == 0L)
    assert(out.getAs[Double]("top2gram_char_frac") == 0.0)
    assert(out.getAs[Boolean]("keep"))
  }

  test("simhashPairs: pigeonhole candidates + hamming filter") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (2 to 60).map(i => s"tok$i").mkString(" ")
    val far = (1 to 60).map(i => s"aaa$i").mkString(" ")
    val df = docs((1L, base), (2L, near), (3L, far))
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("embeddingNearDup and its LSH variant agree on planted pairs") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 20L).map(i => (i, Array.fill(16)(rnd.nextGaussian())))
    val planted = vecs.filter(_._1 % 5 == 0)
      .map { case (i, v) => (i + 100, v.map(_ + 0.01)) }
    val df = (vecs ++ planted).toDF("id", "vec")
    val exact = Dedup.embeddingNearDup(df, "id", "vec", 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((0L, 100L), (5L, 105L), (10L, 110L), (15L, 115L)))
    val lsh = Dedup.embeddingNearDupLsh(df, "id", "vec", 0.99,
      planes = 8, tables = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // precision is exact (rescored)
    assert(lsh.size >= 3, s"LSH recall too low: $lsh") // recall is probabilistic
  }

  test("new operators degrade cleanly on empty inputs") {
    val noVecs = Seq.empty[(Long, Array[Double])].toDF("id", "vec")
    assert(Dedup.semDedup(noVecs, "id", "vec", 2, 1, 0.9).isEmpty)
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(LmScore.lmScore(noDocs, "doc_id", "text").isEmpty)
    val bpe = graft.operators.BpeTrain.train(noDocs, "text", 2)
    assert(bpe.merges.isEmpty && bpe.vocab.isEmpty)
    assert(graft.operators.BpeTrain
      .tokenCounts(noDocs, "doc_id", "text", Nil).isEmpty)
    assert(Dedup.incrementalLshPairs(
      docs((1L, "some corpus doc with words")), noDocs,
      "doc_id", "text").isEmpty)
    assert(graft.operators.Budget.packSequences(
      Seq.empty[(Long, Long)].toDF("id", "n"),
      Seq(col("id")), col("n"), 16).isEmpty)
  }

  test("powerIteration finds the dominant axis; degenerate starts are safe") {
    // strong x-axis variance, slight y noise: the principal direction must
    // land on +x (sign convention) regardless of the mixed input signs
    val vecs = Seq(Array(3.0, 0.1), Array(-2.9, 0.05), Array(3.1, -0.1),
      Array(-3.0, 0.0), Array(2.8, 0.15)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    val v = Similarity.powerIteration(vecs, "vec", iters = 2)
    assert(v.head > 0.99 && math.abs(v(1)) < 0.2, s"direction was $v")
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-3) // unit norm
    // data exactly orthogonal to the all-ones start: w = 0, the iterate
    // keeps the previous vector instead of dividing by zero
    val ortho = Seq((1L, Array(1.0, -1.0)), (2L, Array(-2.0, 2.0)))
      .toDF("id", "vec")
    val kept = Similarity.powerIteration(ortho, "vec", iters = 1)
    assert(kept == Seq(0.707107, 0.707107))
    // empty corpus: the deterministic start comes back, no crash
    assert(Similarity.powerIteration(vecs.limit(0), "vec", 1).nonEmpty)
  }

  test("pageRank: uniform on cycles, mass concentrates on hubs, sums to 1") {
    import graft.operators.Graphs
    // 3-cycle: symmetric, rank stays exactly uniform
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val cpr = Graphs.pageRank(cycle, iters = 2).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(cpr.values.toSet == Set(0.333333333))
    // undirected star: the hub collects both spokes' full mass
    val star = Seq(("h", "s1"), ("s1", "h"), ("h", "s2"), ("s2", "h"))
      .toDF("src", "dst")
    val spr = Graphs.pageRank(star, iters = 2).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(spr("s1") == spr("s2") && spr("h") > spr("s1"))
    assert(math.abs(spr.values.sum - 1.0) < 1e-6) // undirected: no leak
    // empty graph: empty result, no division by zero
    assert(Graphs.pageRank(cycle.limit(0), iters = 1).isEmpty)
  }

  test("triangleCounts: cliques, pendants, normalization, naive parity") {
    import graft.operators.Graphs
    def counts(edges: org.apache.spark.sql.DataFrame) =
      Graphs.triangleCounts(edges).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // K4: every node sits in C(3,2) = 3 triangles
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c",
      "b" -> "d", "c" -> "d").toDF("src", "dst")
    assert(counts(k4) == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    // triangle + pendant: pendant is in no triangle and absent from output
    val pend = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "d")
      .toDF("src", "dst")
    assert(counts(pend) == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
    // reversed duplicates and self-loops normalize away
    val messy = pend.unionByName(Seq("b" -> "a", "c" -> "b", "a" -> "a")
      .toDF("src", "dst"))
    assert(counts(messy) == counts(pend))
    // 4-cycle: no triangles at all
    val square = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
      .toDF("src", "dst")
    assert(Graphs.triangleCounts(square).isEmpty)
    // random graph: parity with the naive a<b<c triple join
    val rnd = (1 to 120).map(i =>
      (s"n${(i * 7) % 23}", s"n${(i * 13 + 5) % 23}")).toDF("src", "dst")
    val canon = rnd.select(least($"src", $"dst").as("u"),
        greatest($"src", $"dst").as("v"))
      .filter($"u" < $"v").distinct()
    val naive = canon.as("e1")
      .join(canon.as("e2"), col("e1.v") === col("e2.u"))
      .join(canon.as("e3"), col("e1.u") === col("e3.u") &&
        col("e2.v") === col("e3.v"))
      .select(explode(array(col("e1.u"), col("e1.v"), col("e2.v")))
        .as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(rnd) == naive)
  }

  test("pageRank deep iteration: checkpointed lineage == uncheckpointed") {
    import graft.operators.Graphs
    val star = Seq(("h", "s1"), ("s1", "h"), ("h", "s2"), ("s2", "h"),
      ("s1", "s2"), ("s2", "s1")).toDF("src", "dst")
    def ranks(ckpt: Int) = Graphs.pageRank(star, iters = 12,
        checkpointEvery = ckpt)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // checkpoint truncates the PLAN only — the 1e-9-rounded values are
    // bit-identical with and without it
    assert(ranks(5) == ranks(0))
  }

  test("incrementalLshPairs: batch pairs found, corpus-corpus never re-paired") {
    val corpus = docs(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact corpus dup
      (3L, "totally different content lives here now"))
    val batch = docs(
      (101L, "beta gamma delta epsilon zeta"), // near-dup of 1 AND 2
      (102L, "one two three four five"),
      (103L, "one two three four five"),       // batch-internal dup
      (104L, "unrelated batch document text entirely"))
    val out = Dedup.incrementalLshPairs(corpus, batch, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2) is a TRUE near-dup pair but purely corpus-side: the ingest
    // operator must not regenerate it
    assert(out == Set((1L, 101L), (2L, 101L), (102L, 103L)))
  }

  test("semDedup keeps the lower-centroid-sim member of each similar pair") {
    // one cluster (nlist=1) so every assertion is unconditional: two
    // identical-DIRECTION groups (equal c_sim -> the id tie-break decides),
    // one 0.96-cosine pair with distinct c_sims (the paper's policy proper),
    // and a dissimilar singleton
    val df = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(2.0, 0.0)), (3L, Array(3.0, 0.0)),
      (4L, Array(0.0, 1.0)), (5L, Array(0.0, 2.0)),
      (6L, Array(0.8, 0.6)), (7L, Array(0.6, 0.8)),
      (8L, Array(-1.0, 1.0))).toDF("id", "vec")
    val rows = Dedup.semDedup(df, "id", "vec", nlist = 1, iters = 2,
        tau = 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
    val byId = rows.map(t => t._1 -> t).toMap
    assert(rows.map(_._1).toSet == (1L to 8L).toSet) // one row per input
    assert(rows.map(_._2).toSet.size == 1)           // a single cluster
    rows.foreach(t => assert(t._6 == t._5.nonEmpty)) // is_dup <=> dup_of
    // equal-c_sim groups: min id survives, every dup points at it
    assert(byId(1L)._5.isEmpty && byId(1L)._4 == 2L)
    assert(byId(2L)._5 == Some(1L) && byId(3L)._5 == Some(1L))
    assert(byId(4L)._5.isEmpty && byId(5L)._5 == Some(4L))
    // the 0.96 pair: exactly one dropped, and the SURVIVOR has the lower
    // (c_sim, id) — semantic outliers are preserved
    val (s6, s7) = (byId(6L), byId(7L))
    assert(s6._6 ^ s7._6)
    val (kept, drop) = if (s6._6) (s7, s6) else (s6, s7)
    assert(kept._3 < drop._3 || (kept._3 == drop._3 && kept._1 < drop._1))
    assert(drop._5 == Some(kept._1))
    assert(s6._4 == 1L && s7._4 == 1L) // similar only to each other
    // dissimilar singleton: untouched
    assert(byId(8L)._4 == 0L && !byId(8L)._6 && byId(8L)._5.isEmpty)
  }

  test("lmScore: repeated transitions outscore gibberish; smoothing floor") {
    val docs = Seq(
      (1L, "the cat sat on the mat"), (2L, "the cat sat on the mat"),
      (3L, "the dog sat on the mat"),
      (4L, "zq9 xv7 kk3 jj1"), // every transition a singleton
      (5L, "one"), (6L, "")).toDF("doc_id", "text")
    def scores(threshold: Double) =
      LmScore.lmScore(docs, "doc_id", "text", alpha = 0.5,
        threshold = threshold).collect()
        .map(r => r.getLong(0) -> (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getBoolean(3))).toMap
    val s = scores(-100.0)
    // identical docs score identically; shared frequent transitions beat
    // the one-off doc 3, which beats all-singleton doc 4
    assert(s(1L)._2 == s(2L)._2)
    assert(s(1L)._2.get > s(3L)._2.get && s(3L)._2.get > s(4L)._2.get)
    // sub-bigram docs: zero bigrams, null score, never flagged
    assert(s(5L) == ((0L, None, false)) && s(6L) == ((0L, None, false)))
    assert(s.values.forall(!_._3)) // threshold below everything: no flags
    // a threshold inside the doc3/doc4 gap flags exactly the gibberish
    val mid = (s(3L)._2.get + s(4L)._2.get) / 2
    val flagged = scores(mid).filter(_._2._3).keySet
    assert(flagged == Set(4L))
    // separate train corpus: a fully-unseen doc hits the smoothing floor
    // ln(alpha / (alpha * V)) = -ln(V) exactly (V = train vocab size)
    val train = Seq((9L, "xx yy")).toDF("doc_id", "text")
    val floor = LmScore.lmScore(Seq((1L, "aa bb cc")).toDF("doc_id", "text"),
      "doc_id", "text", train = Some(train)).collect().head
    assert(floor.getDouble(2) ==
      BigDecimal(-math.log(2)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("knScore == driver-side Kneser-Ney reference; continuation backoff") {
    val trainDocs = Seq(
      (1L, "the cat sat on the mat"), (2L, "the cat ran home"),
      (3L, "a dog sat quietly"), (4L, "the dog ran"))
    val scoreDocs = trainDocs ++ Seq(
      (5L, "the cat sat"),            // all-seen transitions
      (6L, "zq9 xv7 kk3"),            // fully OOV: pure regularized Pcont
      (7L, "home the cat"),           // unseen bigram, seen context
      (8L, "one"), (9L, ""))          // sub-bigram: null, never flagged
    def toks(s: String) =
      s.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    // driver-side reference of the documented model
    val D = 0.75
    val pairs = trainDocs.flatMap(d => toks(d._2).sliding(2).toSeq
      .filter(_.size == 2).map(p => (p(0), p(1))))
    val cUV = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cU = cUV.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1f = cUV.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1b = cUV.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val nBg = cUV.size.toLong
    val vsz = trainDocs.flatMap(d => toks(d._2)).distinct.size.toLong
    def pcont(v: String) = (n1b.getOrElse(v, 0L) + 1.0) / (nBg + vsz + 1.0)
    def p(u: String, v: String) = cU.get(u) match {
      case Some(cu) =>
        math.max(cUV.getOrElse((u, v), 0L) - D, 0.0) / cu +
          D * n1f(u) / cu * pcont(v)
      case None => pcont(v)
    }
    def ref(text: String): Option[Double] = {
      val ps = toks(text).sliding(2).toSeq.filter(_.size == 2)
        .map(pr => math.log(p(pr(0), pr(1))))
      if (ps.isEmpty) None
      else Some(BigDecimal(ps.sum / ps.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = LmScore.knScore(scoreDocs.toDF("doc_id", "text"),
        "doc_id", "text", discount = D, threshold = -100.0,
        train = Some(trainDocs.toDF("doc_id", "text")))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getBoolean(3))).toMap
    graft.pipeline.Pins.flush()
    for ((id, text) <- scoreDocs)
      assert(got(id)._2 == ref(text), s"doc $id ('$text')")
    // sub-bigram docs: null score, never flagged
    assert(got(8L) == ((0L, None, false)) && got(9L) == ((0L, None, false)))
    // probabilities are proper: every score is a log of p in (0, 1]
    assert(got.values.flatMap(_._2).forall(_ <= 0.0))
    // fluent all-seen text beats the fully-OOV soup
    assert(got(5L)._2.get > got(6L)._2.get)
    // the KN discriminator: 'sat' follows two distinct contexts, so its
    // continuation mass exceeds the OOV floor — the unseen bigram
    // (home, the) in doc 7 still scores above doc 6's pure-OOV floor
    assert(got(7L)._2.get > got(6L)._2.get)
  }

  test("bpeTrain learns the hand-computed merges (greedy, tie-broken)") {
    // Sennrich-style corpus: low x5, lower x2, newest x6, widest x3.
    // Round 1: e-s and s-t tie at 9 -> (e,s) by pair order. Round 2:
    // (es,t) at 9. Round 3: l-o and o-w tie at 7 -> (l,o).
    val docs = Seq((1L,
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower")
        ++ Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    val r = graft.operators.BpeTrain.train(docs, "text", numMerges = 3)
    assert(r.merges.map(m => (m.iter, m.left, m.right, m.weight)) ==
      Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
    val vocab = r.vocab.collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    // merged symbols carry the merged counts; unmerged chars keep theirs
    assert(vocab("est") == 9L && vocab("lo") == 7L && vocab("w") == 16L)
    assert(!vocab.contains("es") && !vocab.contains("s")) // fully absorbed
    // "aaa" + merge (a,a): greedy left-to-right -> ["aa","a"], never a+aa
    val tri = graft.operators.BpeTrain.train(
      Seq((1L, "aaa")).toDF("doc_id", "text"), "text", numMerges = 1)
    assert(tri.merges.head.left == "a" && tri.merges.head.right == "a")
    val triVocab = tri.vocab.collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(triVocab == Map("aa" -> 1L, "a" -> 1L))
    // early stop: single-char words leave nothing to merge
    val none = graft.operators.BpeTrain.train(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "text", numMerges = 2)
    assert(none.merges.isEmpty)
    // encode under the learned merges: low -> [lo, w] = 2, lower ->
    // [lo, w, e, r] = 4, newest -> [n, e, w, est] = 4, and the UNSEEN word
    // "lowest" segments through the same table: [lo, w, est] = 3
    val enc = graft.operators.BpeTrain.tokenCounts(
      Seq((1L, "low lower newest"), (2L, "lowest")).toDF("doc_id", "text"),
      "doc_id", "text", r.merges).collect()
      .map(row => row.getLong(0) -> (row.getLong(1), row.getLong(2))).toMap
    assert(enc == Map(1L -> ((3L, 10L)), 2L -> ((1L, 3L))))
    // zero merges: token count degrades to character count
    val raw = graft.operators.BpeTrain.tokenCounts(
      Seq((1L, "ab cde")).toDF("doc_id", "text"), "doc_id", "text", Nil)
      .collect().head
    assert(raw.getLong(1) == 2L && raw.getLong(2) == 5L)
  }

  test("bpeTrain merge batching == sequential on non-interacting and shared-symbol heads") {
    // non-interacting heads: the top pairs touch disjoint symbols, so one
    // batched round must learn exactly what three sequential rounds learn
    // (same pairs, same iter order, same recorded weights)
    val disjoint = Seq((1L,
      (Seq.fill(3)("ab") ++ Seq.fill(2)("cd") ++ Seq.fill(1)("ef"))
        .mkString(" "))).toDF("doc_id", "text")
    val seqR = graft.operators.BpeTrain.train(disjoint, "text", 3)
    val batR = graft.operators.BpeTrain.train(disjoint, "text", 3,
      mergeBatch = 3)
    assert(seqR.merges == batR.merges)
    assert(batR.merges.map(m => (m.iter, m.left, m.right, m.weight)) ==
      Seq((1, "a", "b", 3L), (2, "c", "d", 2L), (3, "e", "f", 1L)))

    // interacting heads: (a,b) and (b,c) share b — the batch must DEFER
    // (b,c) to the next round's fresh counts (here unchanged, since no
    // word contains "abc"), landing on the same merges as sequential
    val shared = Seq((1L, "ab bc ab bc")).toDF("doc_id", "text")
    val seqS = graft.operators.BpeTrain.train(shared, "text", 2)
    val batS = graft.operators.BpeTrain.train(shared, "text", 2,
      mergeBatch = 2)
    assert(seqS.merges == batS.merges)
    assert(batS.merges.map(m => (m.left, m.right)) ==
      Seq(("a", "b"), ("b", "c")))

    // the Sennrich fixture (ties + cascading "es"->"est") under batching
    // still matches sequential: (es,t) only exists AFTER (e,s), so the
    // round-1 batch cannot select it early
    val docs = Seq((1L,
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower")
        ++ Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    val a = graft.operators.BpeTrain.train(docs, "text", 3)
    val b = graft.operators.BpeTrain.train(docs, "text", 3, mergeBatch = 2)
    assert(a.merges == b.merges)
  }

  test("bpe mergeBatch=4 vs sequential on the real corpus: same set+weights+vocab (q190's surface)") {
    // the property q190 oracle-grades: batch-4 training may REORDER
    // merges relative to sequential (here the shared-'r' deferral moves
    // (o,r) from round 2 to round 4), but the merge SET, each merge's
    // recorded weight, AND the vocabulary after applying all merges must
    // be identical — the order-independent surface the q190 twin
    // (sequential rounds unrolled in SQL) compares on, re-verified here
    // on real data rather than hand fixtures
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).isDirectory)
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
    val seq4 = graft.operators.BpeTrain.train(real, "text", 4)
    val bat4 = graft.operators.BpeTrain.train(real, "text", 4,
      mergeBatch = 4)
    def key(m: graft.operators.BpeTrain.BpeMerge) =
      (m.left, m.right, m.weight)
    assert(seq4.merges.map(key).sorted == bat4.merges.map(key).sorted,
      s"merge set/weights diverged: ${seq4.merges} vs ${bat4.merges}")
    assert(seq4.merges != bat4.merges ||
      seq4.merges.map(_.iter) == bat4.merges.map(_.iter)) // sanity
    def voc(r: graft.operators.BpeTrain.BpeResult) = r.vocab.collect()
      .map(row => (row.getString(0), row.getLong(1))).sortBy(_._1).toSeq
    assert(voc(seq4) == voc(bat4), "applied vocabulary diverged")
  }

  test("simhashPairs maxHamming=0: exact-duplicate buckets, no mask wrap") {
    val df = docs((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "totally different text here"))
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // identical docs -> identical simhash -> the one expected pair; with the
    // wrapped mask every doc landed in bucket 0 and 3 pairs came back
    assert(pairs.toSeq == Seq((1L, 2L)))
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 64)
    }
  }

  test("connectedComponents refuses to return unconverged labels") {
    // a 6-node chain needs ~5 propagation rounds; maxIter=2 must throw,
    // not silently split the component
    val nodes = (1L to 6L).toDF("id")
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(nodes, chain, maxIter = 2).collect()
    }
    assert(e.getMessage.contains("maxIter"))
    // with enough rounds the same chain resolves to one cluster
    val ok = Dedup.connectedComponents(nodes, chain, maxIter = 10)
      .select("cluster").distinct().collect()
    assert(ok.length == 1 && ok.head.getLong(0) == 1L)
  }

  test("embeddingNearDup size guard refuses oversized input") {
    val df = (0L until 10L).map(i => (i, Array(1.0, 0.0))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDup(df, "id", "vec", 0.9, maxRows = 5L)
    }
    assert(e.getMessage.contains("embeddingNearDupLsh"))
    // at or under the cap, the verifier still runs
    assert(Dedup.embeddingNearDup(df.limit(3), "id", "vec", -1.0,
      maxRows = 5L).count() == 3L)
  }

  test("bruteForceTopK returns the true nearest neighbors") {
    // 1-d directions: cosine is 1 for same direction, -1 opposite
    val corpus = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f))).toDF("id", "vec")
    val queries = Seq((100L, Array(1.0f, 0.0f))).toDF("qid", "qvec")
    val out = Similarity.bruteForceTopK(corpus, "id", "vec",
      queries, "qid", "qvec", k = 2)
      .select("neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(out == Seq((1L, 1), (2L, 2)))
  }

  test("lshTopK / ivfTopK recall vs brute-force ground truth") {
    val rnd = new scala.util.Random(3)
    // clustered corpus so ANN structure exists: 4 centers + noise
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian() * 3))
    val corpus = (0L until 80L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat))
    }.toDF("id", "vec")
    val queries = corpus.filter(col("id") < 8)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(corpus, "id", "vec",
      queries, "qid", "qvec", k = 5))
    val lsh = pairs(Similarity.lshTopK(corpus, "id", "vec",
      queries, "qid", "qvec", k = 5, planes = 6, tables = 8))
    val ivf = pairs(Similarity.ivfTopK(corpus, "id", "vec",
      queries, "qid", "qvec", k = 5, nlist = 8, nprobe = 4))
    assert(truth.size == 40)
    assert((lsh & truth).size >= 30, s"LSH recall ${(lsh & truth).size}/40")
    assert((ivf & truth).size >= 24, s"IVF recall ${(ivf & truth).size}/40")

    // k-means-trained coarse quantizer: centroids converge onto the 4 real
    // clusters, so trained IVF must recall at least as much as the sampled
    // quantizer here (and stay within nlist centroids)
    val trained = pairs(Similarity.ivfTopK(corpus, "id", "vec",
      queries, "qid", "qvec", k = 5, nlist = 8, nprobe = 4, trainIters = 2))
    assert((trained & truth).size >= (ivf & truth).size,
      s"trained IVF recall ${(trained & truth).size} < sampled ${(ivf & truth).size}")

    // int8-quantized lists: same routing, 1-byte codes — the ~0.4%
    // quantization error cannot reorder clustered neighbors, so quantized
    // IVF must match the float IVF candidate set here
    val qivf = pairs(Similarity.ivfTopKQuantized(corpus, "id", "vec",
      queries, "qid", "qvec", k = 5, nlist = 8, nprobe = 4))
    assert(qivf == ivf,
      s"quantized IVF diverged from float IVF: ${qivf.size} vs ${ivf.size}")

    // binary sketch, candidate cap off: the exact-cosine re-rank over ALL
    // pairs must reproduce brute force verbatim (pairs AND cosines)
    def ranked(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "cosine", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    val bin = ranked(Similarity.binaryTopK(corpus, "id", "vec",
      queries, "qid", "qvec", k = 5, candidates = 1000))
    val bf = ranked(Similarity.bruteForceTopK(corpus, "id", "vec",
      queries, "qid", "qvec", k = 5))
    assert(bin == bf, "uncapped binaryTopK must equal bruteForceTopK")
    // capped: a query's own cluster-mates share most sign bits, so the
    // Hamming pre-rank keeps them and recall stays high
    val binCap = pairs(Similarity.binaryTopK(corpus, "id", "vec",
      queries, "qid", "qvec", k = 5, candidates = 16))
    assert((binCap & truth).size >= 30,
      s"binary recall ${(binCap & truth).size}/40")
  }

  test("binaryTopK sign packing: dim < 32 and dim > 64 both work") {
    val small = Seq((1L, Array(1.0f, -1.0f)), (2L, Array(0.5f, -1.0f)),
      (3L, Array(-1.0f, 1.0f))).toDF("id", "vec")
    val q = Seq((10L, Array(1.0f, -1.0f))).toDF("qid", "qvec")
    // bits beyond dim contribute nothing; same-sign vectors collide at
    // hamming 0 and the exact re-rank orders them by cosine
    val out = Similarity.binaryTopK(small, "id", "vec", q, "qid", "qvec",
      k = 2, candidates = 2)
      .select("neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(out == Seq((1L, 1), (2L, 2)))
    // dim 80 -> three words; uncapped still equals brute force exactly
    val rnd = new scala.util.Random(13)
    val wide = (0L until 30L).map(i => (i, Array.fill(80)(rnd.nextGaussian()
      .toFloat))).toDF("id", "vec")
    val wq = wide.filter(col("id") < 3)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bin = pairs(Similarity.binaryTopK(wide, "id", "vec", wq,
      "qid", "qvec", k = 4, candidates = 1000))
    val bf = pairs(Similarity.bruteForceTopK(wide, "id", "vec", wq,
      "qid", "qvec", k = 4))
    assert(bin == bf)
  }

  test("ivfTopKQuantized ships tinyint codes, scores within quantization error") {
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 40L).map { i =>
      (i, Array.fill(8)((rnd.nextGaussian() * 2).toFloat))
    }.toDF("id", "vec")
    val queries = corpus.filter(col("id") < 4)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val out = Similarity.ivfTopKQuantized(corpus, "id", "vec",
      queries, "qid", "qvec", k = 3, nlist = 4, nprobe = 4)
    // quantized cosine within max-abs-int8 error of the exact cosine
    val exact = Similarity.bruteForceTopK(corpus, "id", "vec",
        queries, "qid", "qvec", k = 39)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("c0"))
    val joined = out.join(exact, Seq("query_id", "neighbor_id"))
      .select(abs(col("cosine") - col("c0"))).collect().map(_.getDouble(0))
    assert(joined.nonEmpty && joined.forall(_ < 0.02),
      s"quantized cosine drifted: max ${joined.max}")
    // the representation that crosses the candidate exchange must be the
    // 1-byte codes (the 8x shuffle claim), not pre-dequantized doubles.
    // Checked on the ANALYZED plan: with a local-relation corpus the
    // optimizer's ConvertToLocalRelation evaluates the encode projection
    // eagerly (r7, after the encode moved below the routing window) and
    // erases the cast text from the optimized plan — the codes are then
    // literally materialized AS tinyint, which is the claim itself
    assert(out.queryExecution.analyzed.toString.contains("tinyint"),
      "int8 codes missing from the analyzed plan")
  }

  test("trainCentroids: spherical k-means objective is non-decreasing") {
    val rnd = new scala.util.Random(9)
    val centers = Array.fill(3)(Array.fill(8)(rnd.nextGaussian() * 2))
    val corpus = (0L until 60L).map { i =>
      val c = centers((i % 3).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.2).toFloat))
    }.toDF("id", "vec")
    // objective = mean best-cosine to the centroid set
    def objective(cents: org.apache.spark.sql.DataFrame): Double =
      corpus.select(col("id"), graft.functions.Vec.asDouble(col("vec")).as("v"))
        .join(broadcast(cents))
        .select(col("id"),
          graft.functions.Vec.cosine(col("v"), col("cent_vec")).as("sim"))
        .groupBy("id").agg(max(col("sim")).as("best"))
        .agg(avg(col("best"))).head().getDouble(0)
    val objs = (0 to 2).map { it =>
      val cents =
        if (it == 0)
          corpus.select(col("id").as("sid"),
              graft.functions.Vec.asDouble(col("vec")).as("cent_vec"))
            .orderBy(md5(col("sid").cast("string")).asc).limit(6)
            .select(col("cent_vec"), lit(0L).as("cent_id"))
        else Similarity.trainCentroids(corpus, "id", "vec", nlist = 6,
          iters = it)
      assert(cents.count() <= 6)
      objective(cents)
    }
    // Lloyd improves (or holds) the objective each iteration; the 1e-6
    // epsilon absorbs the 6-decimal centroid rounding (<= 5e-7 per
    // component, diluted across dims in the cosine)
    assert(objs(1) >= objs(0) - 1e-6, s"iter1 ${objs(1)} < seed ${objs(0)}")
    assert(objs(2) >= objs(1) - 1e-6, s"iter2 ${objs(2)} < iter1 ${objs(1)}")
  }

  test("trainLloyd epsilon rule stops early; epsilon=None runs maxIters") {
    val rnd = new scala.util.Random(9)
    val centers = Array.fill(3)(Array.fill(8)(rnd.nextGaussian() * 2))
    val corpus = (0L until 60L).map { i =>
      val c = centers((i % 3).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.2).toFloat))
    }.toDF("id", "vec")
    // tightly clustered data flattens after 1-2 iterations: a generous
    // epsilon must stop before maxIters, with monotone objectives
    val conv = Similarity.trainLloyd(corpus, "id", "vec", nlist = 3,
      maxIters = 6, epsilon = Some(0.01))
    assert(conv.converged && conv.itersRun < 6,
      s"expected early stop, ran ${conv.itersRun}")
    assert(conv.objectives.size == conv.itersRun)
    // near-monotone, not strictly: the mean update tracks but does not
    // exactly optimize the COSINE objective (the maximizer would be the
    // direction of the normalized-vector sum), so sub-1e-2 terminal dips
    // are legitimate — and correctly trip the stop rule
    assert(conv.objectives.sliding(2).forall(p =>
      p.size < 2 || p(1) >= p(0) - 5e-3), s"objectives ${conv.objectives}")
    assert(conv.objectives.last > conv.objectives.head,
      s"training never improved on the seeds: ${conv.objectives}")
    // the last improvement is what tripped the rule
    assert(conv.objectives.last - conv.objectives(conv.itersRun - 2) < 0.01)
    // history stays positionally addressable on early stop (padded)
    assert(conv.centroids.size == 7)
    // epsilon=None never stops early
    val full = Similarity.trainLloyd(corpus, "id", "vec", nlist = 3,
      maxIters = 4, epsilon = None)
    assert(!full.converged && full.itersRun == 4)
  }

  test("pqEncode assigns hand-checkable codes and reconstruction norms") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (2L, Array(0.0f, 1.0f, 1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f, 0.2f, 0.8f)),
      (4L, Array(0.1f, 0.9f, 0.9f, 0.1f))).toDF("id", "vec")
    // sampled codebooks from ids 1,2: cb0 = [(0,[1,0]),(1,[0,1])],
    // cb1 = [(0,[0,1]),(1,[1,0])]; argmin ||c||^2 - 2 s.c per subspace:
    //   doc3 sub0 (0.9,0.1) -> code 0; sub1 (0.2,0.8) -> code 0
    //   doc4 sub0 (0.1,0.9) -> code 1; sub1 (0.9,0.1) -> code 1
    val model = Similarity.pqTrain(corpus, "id", "vec", m = 2, k = 2)
    assert(model.m == 2 && model.ds == 2)
    val out = Similarity.pqEncode(corpus, "id", "vec", model)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Byte](1).toSeq, r.getDouble(2))).toMap
    assert(out(1L)._1 == Seq(0.toByte, 0.toByte))
    assert(out(2L)._1 == Seq(1.toByte, 1.toByte))
    assert(out(3L)._1 == Seq(0.toByte, 0.toByte))
    assert(out(4L)._1 == Seq(1.toByte, 1.toByte))
    // every reconstruction here is a unit-per-subspace codeword: norm =
    // sqrt(1 + 1), from the literal sub-norm lookup, not the raw vector
    out.values.foreach { case (_, rn) =>
      assert(math.abs(rn - math.sqrt(2.0)) < 1e-12) }
  }

  test("pqTopK: IVF-routed ADC matches the exhaustive PQ ranking") {
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(2)(Array.fill(8)(rnd.nextGaussian() * 3))
    val corpus = (0L until 40L).map { i =>
      val c = centers((i % 2).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.2).toFloat))
    }.toDF("id", "vec")
    val queries = corpus.filter(col("id") < 4)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val model = Similarity.pqTrain(corpus, "id", "vec", m = 4, k = 8)
    def top(nprobe: Int) = Similarity.pqTopK(corpus, "id", "vec",
        queries, "qid", "qvec", k = 3, model, nlist = 2, nprobe = nprobe)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // nlist = 2 sampled coarse centroids = ids 0 and 1, one per planted
    // cluster (i % 2 alternates), so each query's neighbors all live in
    // its own list and probing 1 of 2 must already match probing all —
    // with MORE lists than clusters the near-identical centroids would
    // split a cluster arbitrarily and nprobe=1 would (correctly) miss
    val exhaustive = top(2)
    assert(exhaustive.size == 12)
    assert(top(1) == exhaustive,
      "nprobe=1 lost neighbors that routing should have kept local")
    // trained-codebook path exercises the per-subspace Lloyd refinement
    val trained = Similarity.pqTrain(corpus, "id", "vec", m = 4, k = 4,
      trainIters = 1)
    assert(trained.codebooks.size == 4 &&
      trained.codebooks.forall(cb => cb.nonEmpty && cb.size <= 4 &&
        cb.forall(_._2.size == 2)))
  }

  test("residual PQ reconstructs clustered data better than raw PQ") {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(2)(Array.fill(8)(rnd.nextGaussian() * 3))
    val rows = (0L until 60L).map { i =>
      val c = centers((i % 2).toInt)
      (i, c.map(x => x + rnd.nextGaussian() * 0.2))
    }
    val corpus = rows.map { case (i, v) => (i, v.map(_.toFloat)) }
      .toDF("id", "vec")
    val vecs = rows.toMap
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Seq[Double], b: Seq[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    // driver-side reconstruction from the encode output + model literals
    def fidelity(model: Similarity.PqModel): Double = {
      val enc = Similarity.pqEncode(corpus, "id", "vec", model).collect()
      val fids = enc.map { r =>
        val id = r.getLong(0)
        val off = if (model.residualCentroids.isDefined) 1 else 0
        val codes = r.getSeq[Byte](1 + off)
        val base = model.residualCentroids match {
          case Some(cents) => cents(r.getInt(1))._2
          case None => Seq.fill(8)(0.0)
        }
        val rhat = (0 until model.m).flatMap(mi =>
          model.codebooks(mi)(codes(mi).toInt)._2)
        val xhat = base.zip(rhat).map { case (b, h) => b + h }
        cos(vecs(id).toSeq, xhat)
      }
      fids.sum / fids.length
    }
    val raw = Similarity.pqTrain(corpus, "id", "vec", m = 4, k = 8)
    val res = Similarity.pqTrainResidual(corpus, "id", "vec", m = 4, k = 8,
      nlist = 2)
    val (fRaw, fRes) = (fidelity(raw), fidelity(res))
    // residuals are tight noise around the cluster centers, so the same
    // m x k code budget reconstructs strictly better — the reason FAISS
    // IVFPQ quantizes residuals at all
    assert(fRes > fRaw,
      s"residual fidelity $fRes not better than raw $fRaw")
    assert(fRes > 0.99, s"residual reconstruction too lossy: $fRes")
    // and the routed search agrees with the exhaustive one on 2 clean
    // clusters (each query's neighbors live in its own list)
    val queries = corpus.filter(col("id") < 4)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    def top(nprobe: Int) = Similarity.pqTopK(corpus, "id", "vec",
        queries, "qid", "qvec", k = 3, res, nlist = 2, nprobe = nprobe)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(top(1) == top(2), "residual routing lost local neighbors")
  }

  test("fuzzy blocked pairs find planted typos, never cross-join") {
    val base = (1L to 40L).map(i => (i, s"name$i")).toDF("id", "name")
    val dirty = (1L to 40L).filter(_ % 5 == 0)
      .map(i => (i + 100, s"nxme$i")).toDF("id", "name") // 1 substitution
    val all = base.unionByName(dirty)
    val pairs = graft.operators.Fuzzy.blockedPairs(all, "id", "name",
        expr("right(name, 2)"), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    for (i <- Seq(5L, 10L, 15L, 20L, 25L, 30L, 35L, 40L))
      assert(pairs.exists(p => p._1 == i && p._2 == i + 100 && p._3 == 1),
        s"missing planted pair for $i in $pairs")
  }

  test("approx_count_distinct stays within its error bound (q48 semantics)") {
    val df = (1 to 20000).map(i => (i % 7, i % 3000)).toDF("g", "v")
    val r = df.groupBy("g")
      .agg(approx_count_distinct(col("v"), 0.02).as("a"),
        countDistinct(col("v")).as("e")).collect()
    for (row <- r) {
      val a = row.getLong(1); val e = row.getLong(2)
      assert(math.abs(a - e).toDouble / e < 0.05, s"approx $a vs exact $e")
    }
  }

  test("Boilerplate.strip removes frequent lines, keeps content in order") {
    val docs = (1L to 10L).map { i =>
      (i, Seq("HEADER", s"unique content $i", s"more $i", "FOOTER")
        .mkString("\n"))
    } :+ (11L, "HEADER\nFOOTER") // doc that is ALL boilerplate
    val out = graft.operators.Boilerplate
      .strip(docs.toDF("id", "text"), "id", "text", minDocs = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (i <- 1L to 10L)
      assert(out(i) == s"unique content $i\nmore $i", s"doc $i: ${out(i)}")
    assert(out(11L) == "") // id preserved, text emptied
    assert(out.size == 11)
  }

  test("percentile_approx tracks exact quantiles within GK accuracy (q55 semantics)") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 20000).map(i => (i % 4, rnd.nextDouble() * 1000)).toDF("g", "v")
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    val r = df.groupBy("g").agg(
        percentile_approx(col("v"),
          array(qs.map(lit): _*), lit(10000)).as("a"),
        percentile(col("v"), array(qs.map(lit): _*)).as("e"))
      .collect()
    for (row <- r; i <- qs.indices) {
      val a = row.getSeq[Double](1)(i); val e = row.getSeq[Double](2)(i)
      // accuracy=10000 -> rank error <= n/10000; on ~5000-row groups the
      // sketch is near-exact, so 1% value tolerance is generous
      assert(math.abs(a - e) / math.max(e, 1e-9) < 0.01,
        s"q=${qs(i)} approx $a vs exact $e")
    }
  }

  test("connectedComponents: chains, singletons, and merges resolve to min label") {
    val nodes = (1L to 10L).toDF("id")
    // chain 1-2-3-4, pair 6-7, triangle-merge 8-9 + 9-10 + 8-10; 5 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L),
      (8L, 9L), (9L, 10L), (8L, 10L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(cc(5L) == 5L)
    assert(cc(6L) == 6L && cc(7L) == 6L)
    assert(Seq(8L, 9L, 10L).forall(cc(_) == 8L))
  }

  test("softDedupWeights: 1/|cluster| per member, singletons keep 1.0, " +
      "total mass = cluster count") {
    val nodes = (1L to 10L).toDF("id")
    // same topology as the CC fixture: sizes 4 (ids 1-4), 1 (5), 2 (6-7),
    // 3 (8-10)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L),
      (8L, 9L), (9L, 10L), (8L, 10L)).toDF("id_a", "id_b")
    val out = Dedup.softDedupWeights(nodes, pairs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((1L, 4L, 0.25)) && out(4L) == ((1L, 4L, 0.25)))
    assert(out(5L) == ((5L, 1L, 1.0)))
    assert(out(6L) == ((6L, 2L, 0.5)) && out(7L) == ((6L, 2L, 0.5)))
    assert(out(9L) == ((8L, 3L, 0.333333)))
    // every cluster contributes one document's worth of mass (up to the
    // 6-decimal rounding on the 1/3 cluster)
    assert(math.abs(out.values.map(_._3).sum - 4.0) < 1e-5)
  }

  test("connectedComponents: pointer jumping converges deep chains in O(log d) jobs") {
    // a 256-node path has diameter 255: plain neighbor-min propagation would
    // need ~255 rounds (and would THROW at the default maxIter=20); with the
    // path-halving jump the label offset grows as 2^t - 1, so ~9 rounds (one
    // Spark job each: the convergence count) resolve the whole chain
    val n = 256L
    val nodes = (1L to n).toDF("id")
    val chain = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val cc = Dedup.connectedComponents(nodes, chain, maxIter = 20)
      assert(cc.filter(col("cluster") =!= 1L).count() == 0,
        "every chain node must resolve to the component min")
      // listener delivery is async: wait until the job count stops moving
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (stable < 3 && System.nanoTime() < deadline) {
        val cur = jobs.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
        Thread.sleep(50)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // one ACTION per round (the convergence count), but AQE materializes
    // each shuffle stage of the round's plan as its own Spark job (~7/round
    // observed), so ~9 rounds land near 75 jobs; plain O(diameter)
    // propagation would take ~256 rounds = ~1,800 jobs. The bound below
    // separates the two regimes with generous slack.
    assert(jobs.get() <= 150,
      s"expected O(log diameter) rounds, saw ${jobs.get()} jobs")
  }

  test("multi-pass fuzzy blocking raises recall over any single pass") {
    // typo in the SUFFIX defeats suffix-blocking but not prefix-blocking
    val base = (1L to 30L).map(i => (i, f"name$i%03d")).toDF("id", "name")
    val dirty = Seq((901L, "name00x"), (902L, "nxme002")) // suffix / prefix typo
      .toDF("id", "name")
    val all = base.unionByName(dirty)
    val byPrefix = expr("left(name, 4)")
    val bySuffix = expr("right(name, 3)")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = ids(graft.operators.Fuzzy.multiBlockedPairs(all, "id", "name",
      Seq(byPrefix, bySuffix), maxDist = 1))
    assert(multi.contains((1L, 901L)), s"prefix pass should find suffix typo: $multi")
    assert(multi.contains((2L, 902L)), s"suffix pass should find prefix typo: $multi")
    val single = ids(graft.operators.Fuzzy.blockedPairs(all, "id", "name",
      bySuffix, maxDist = 1))
    assert(!single.contains((1L, 901L)))
  }

  test("sessionization: 30-min gap splits sessions, rollup is correct") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, ts(0), 1L, 1.0), (2L, ts(10), 1L, 2.0), // session 1
      (3L, ts(45), 1L, 3.0),                        // session 2 (35-min gap)
      (4L, ts(5), 2L, 4.0))                         // user 2, session 1
      .toDF("event_id", "ts", "user_id", "value")
    val out = Sessionize.sessionStats(ev, col("user_id"), col("ts"),
      col("event_id"), col("value"), gapSeconds = 1800)
      .orderBy("key", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getDouble(5)))
      .toSeq
    assert(out == Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0), (2L, 1L, 1L, 4.0)))
  }

  test("salted aggregation == direct groupBy on a skewed key") {
    val df = ((1 to 500).map(_ => ("HOT", 1.0)) ++
      (1 to 50).map(i => (s"k${i % 7}", i.toDouble))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("count"), sum(col("v")).as("sum"))
      .withColumnRenamed("k", "key")
    val salted = graft.operators.Skew.saltedAggregate(df, col("k"), 8,
      graft.operators.Skew.countAndSum(col("v")))
    val d1 = direct.exceptAll(salted); val d2 = salted.exceptAll(direct)
    assert(d1.isEmpty && d2.isEmpty)
  }

  test("joinSkewPlan: products, shares, salt sizing, one-sided keys") {
    import graft.operators.Skew
    val left = (Seq.fill(10)("hot") ++ Seq("a", "a", "b", "only_left"))
      .map((_, 1)).toDF("k", "x")
    val right = (Seq.fill(20)("hot") ++ Seq("a", "b", "b", "only_right"))
      .map((_, 1)).toDF("k", "x")
    val out = Skew.joinSkewPlan(left, right, "k",
        targetRowsPerTask = 100, topK = 10).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5), r.getLong(6)))).toMap
    // hot: 10*20=200 of 204 total; a: 2*1=2; b: 1*2=2; one-sided keys absent
    assert(out.keySet == Set("hot", "a", "b"))
    assert(out("hot") == ((10L, 20L, 200L, 0.980392, true, 2L)))
    assert(out("a") == ((2L, 1L, 2L, 0.009804, false, 1L)))
    assert(out("b") == ((1L, 2L, 2L, 0.009804, false, 1L)))
    // ordering: out_rows desc then key asc
    val ordered = Skew.joinSkewPlan(left, right, "k", 100, 10)
      .collect().map(_.getString(0)).toSeq
    assert(ordered == Seq("hot", "a", "b"))
    // topK truncates
    assert(Skew.joinSkewPlan(left, right, "k", 100, 1).count() == 1)
  }

  test("multimodal: featurize is deterministic, batch-shaped, right dims") {
    // real PNGs: the default featurizer is a genuine raster decode
    val ds = Seq(1L, 2L).toDS().map(id =>
      Multimodal.MediaRow(id, Multimodal.encodePng(
        (id * 5).toInt, (id * 3).toInt, 4)))
    val a = Multimodal.featurize(ds, dim = 8).collect().sortBy(_.id)
    val b = Multimodal.featurize(ds.repartition(3), dim = 8).collect().sortBy(_.id)
    assert(a.length == 2 && a.forall(_.features.length == 8))
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq,
      "features must not depend on partitioning")
    // per-channel normalized histogram: 4 channels, each summing to 1
    assert(math.abs(a(0).features.sum - 4.0f) < 1e-5f)
    // A channel of an ARGB PNG is the constant 255 -> all mass in the
    // last of the 2 A-buckets
    assert(a(0).features(0) == 0.0f && a(0).features(1) == 1.0f)
    // undecodable bytes answer EMPTY features, never invented ones
    val junk = Seq(Multimodal.MediaRow(9L, "not an image".getBytes)).toDS()
    assert(Multimodal.featurize(junk, dim = 8).collect()
      .head.features.isEmpty)
    // the pluggable slot: a custom featurizer rides the same plumbing
    val custom = Multimodal.featurize(ds, dim = 3,
      (bytes, d) => Array.fill(d)(bytes.length.toFloat)).collect()
    assert(custom.forall(r => r.features.length == 3))
  }

  test("multimodal: binaryFile source reads media dirs with glob filter") {
    val dir = java.nio.file.Files.createTempDirectory("media").toFile
    java.nio.file.Files.write(new java.io.File(dir, "a.img").toPath,
      Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(new java.io.File(dir, "b.img").toPath,
      Array[Byte](5, 6))
    java.nio.file.Files.write(new java.io.File(dir, "skip.txt").toPath,
      Array[Byte](9))
    val df = Multimodal.readBinaryDir(spark, dir.getAbsolutePath, "*.img")
    val rows = df.select("path", "length", "content").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(1)).sorted.toSeq == Seq(2L, 4L))
    // the raw bytes are not decodable media -> the real default
    // featurizer answers empty features for every row, but the plumbing
    // (batching, ids, row count) holds
    val features = Multimodal.featurize(
      df.select(col("length").as("id"), col("content"))
        .as[Multimodal.MediaRow], dim = 4).collect()
    assert(features.length == 2 && features.forall(_.features.isEmpty))
  }

  test("partitioned parquet scan prunes partitions (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("parts").toString
    val df = (1 to 100).map(i => (i.toLong, s"2024-0${i % 3 + 1}", i * 1.0))
      .toDF("id", "month", "v")
    df.write.partitionBy("month").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("month") === "2024-02")
      .agg(sum(col("v")))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("isnotnull(month") || plan.contains("month#"),
      s"expected partition pruning in:\n$plan")
    // only one of three partitions is read
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("2024-01") || scanned.contains("PartitionCount: 1"),
      s"partition not pruned:\n$scanned")
    q.collect()
  }

  test("multimodal: decodePixels recovers the exact ARGB raster; pixelStats sums it") {
    import Multimodal._
    // ARGB PNG round-trip is lossless: byte i of the decoded raster is
    // component i%4 of pixel i/4 under encodePng's p(x,y)=(x*31+y*17)|FF<<24
    val (w, h) = (5, 3)
    val px = decodePixels(encodePng(w, h, 4)).get
    assert(px.length == w * h * 4)
    for (y <- 0 until h; x <- 0 until w) {
      val v = x * 31 + y * 17
      val i = (y * w + x) * 4
      assert((px(i) & 0xff) == 255 && (px(i + 1) & 0xff) == ((v >> 16) & 0xff)
        && (px(i + 2) & 0xff) == ((v >> 8) & 0xff)
        && (px(i + 3) & 0xff) == (v & 0xff), s"pixel ($x,$y)")
    }
    // undecodable bytes: honest None, and pixelStats marks n_pixels = -1
    // with zero sums — never invented statistics
    assert(decodePixels("not an image".getBytes).isEmpty)
    val stats = pixelStats(Seq(
        MediaRow(1L, encodePng(w, h, 4)),
        MediaRow(2L, "junk".getBytes),
        MediaRow(3L, null)).toDS())
      .collect().sortBy(_.id)
    val vs = for (y <- 0 until h; x <- 0 until w) yield x * 31 + y * 17
    assert(stats(0) == PixelStatsRow(1L, (w * h).toLong, 255L * w * h,
      vs.map(v => (v >> 16) & 0xff).sum.toLong,
      vs.map(v => (v >> 8) & 0xff).sum.toLong,
      vs.map(_ & 0xff).sum.toLong))
    assert(stats(1) == PixelStatsRow(2L, -1L, 0L, 0L, 0L, 0L))
    assert(stats(2) == PixelStatsRow(3L, -1L, 0L, 0L, 0L, 0L))
    // partitioning-independence of the mapPartitions batch shape
    val re = pixelStats(Seq(MediaRow(1L, encodePng(w, h, 4))).toDS()
      .repartition(3)).collect()
    assert(re.toSeq == Seq(stats(0)))
  }

  test("multimodal: REAL JDK codecs — PNG/WAV round-trip, resize, honest unknown") {
    import Multimodal._
    // PNG: header decode recovers the encoded dimensions and channel
    // count for all three buffer types
    for ((w, h, ch) <- Seq((7, 5, 1), (12, 9, 3), (3, 4, 4))) {
      val m = decodeImageMeta(encodePng(w, h, ch))
      assert(m.contains(MediaMeta("image", w, h, ch, 0L)),
        s"png ${w}x$h/$ch decoded as $m")
    }
    // WAV: channels + exact millisecond duration from the header
    // (160 frames @ 8 kHz = 20 ms)
    val wav = decodeAudioMeta(encodeWav(nFrames = 160, channels = 2))
    assert(wav.contains(MediaMeta("audio", 0, 0, 2, 20L)), s"wav: $wav")
    // resize: full decode -> scale -> re-encode, dims verified by a
    // second REAL header decode
    val resized = resizeImage(encodePng(12, 9, 3), 4, 3)
    assert(resized.isDefined)
    assert(decodeImageMeta(resized.get).exists(m =>
      m.width == 4 && m.height == 3))
    // bytes no JDK reader accepts: honest None / unknown — never the fake
    assert(decodeImageMeta("not an image".getBytes).isEmpty)
    assert(decodeAudioMeta("not audio".getBytes).isEmpty)
    assert(resizeImage("junk".getBytes, 2, 2).isEmpty)
    val mixed = Seq(
      MediaRow(1L, encodePng(6, 2, 3)),
      MediaRow(2L, encodeWav(80, 1)),
      MediaRow(3L, "???".getBytes),
      MediaRow(4L, null))
      .toDS()
    val got = decodeMetaBatch(mixed).collect().sortBy(_.id)
      .map(r => (r.id, r.meta.kind, r.meta.width, r.meta.channels,
        r.meta.durationMs)).toSeq
    assert(got == Seq((1L, "image", 6, 3, 0L), (2L, "audio", 0, 1, 10L),
      (3L, "unknown", 0, 0, 0L), (4L, "unknown", 0, 0, 0L)))
  }

  test("asOf joinBackward: latest at-or-before, ties, misses, key isolation") {
    import graft.operators.AsOf
    val probe = Seq(
      (101L, "u1", 50L),  // before any build row for u1 -> null
      (102L, "u1", 100L), // exactly at build ts=100 -> same-instant visible
      (103L, "u1", 250L), // between 200 and 300 -> picks ts=200
      (104L, "u2", 999L), // u2 has its own history -> picks u2's ts=500
      (105L, "u3", 10L))  // key with no build rows at all -> null
      .toDF("pid", "user", "pts")
    val build = Seq(
      (1L, "u1", 100L, "a"),
      (2L, "u1", 200L, "b"),
      (3L, "u1", 200L, "b2"), // equal-ts tie: greatest tie (id=3) wins
      (4L, "u1", 300L, "c"),
      (5L, "u2", 500L, "z"))
      .toDF("bid", "user", "bts", "tag")
    val out = AsOf.joinBackward(probe, build, Seq("user"),
        "pts", "bts", "bid", Seq("bid", "tag"))
      .orderBy("pid")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.toString).orNull,
        r.getString(4))).toSeq
    assert(out == Seq(
      (101L, null, null),
      (102L, "1", "a"),
      (103L, "3", "b2"),
      (104L, "5", "z"),
      (105L, null, null)))
  }

  test("asOf joinBackward: monster key (one key = ~50x all others) stays exact") {
    // the documented hot-key bound: one key's whole history sorts in ONE
    // task. This pins CORRECTNESS under that skew — 10k build rows + 2k
    // probes on key "hot" alongside 40 small keys; closed-form expected
    // matches make any ordering/frame drift under a skewed sort visible
    import graft.operators.AsOf
    val hotBuild = (1L to 10000L).map(i => (i, "hot", i * 10L, s"v$i"))
    val smallBuild = (1L to 40L).map(k => (100000L + k, s"k$k", 100L, "s"))
    val build = (hotBuild ++ smallBuild).toDF("bid", "user", "bts", "tag")
    // probe ts = 15, 65, 115 ... -> expected match bts = floor(ts/10)*10
    val hotProbe = (0L until 2000L).map(i => (200000L + i, "hot", i * 50L + 15L))
    val smallProbe = (1L to 40L).map(k => (300000L + k, s"k$k", 99L)) // miss
    val probe = (hotProbe ++ smallProbe).toDF("pid", "user", "pts")
    val out = AsOf.joinBackward(probe, build, Seq("user"),
      "pts", "bts", "bid", Seq("bid"))
    val hot = out.filter(col("user") === "hot")
      .select(col("pid"), col("asof_bid")).collect()
    assert(hot.length == 2000)
    hot.foreach { r =>
      val i = r.getLong(0) - 200000L
      val expected = (i * 50L + 15L) / 10L // floor((i*50+15)/10) = bid of bts<=ts
      assert(r.getLong(1) == expected,
        s"probe $i matched bid ${r.getLong(1)}, expected $expected")
    }
    // the 40 small keys all probe at ts=99 < their only build ts=100 -> null
    assert(out.filter(col("user") =!= "hot" && col("asof_bid").isNotNull)
      .count() == 0)
  }

  test("asOf joinBackward: null build ts never matches; string tie rejected") {
    import graft.operators.AsOf
    val probe = Seq((1L, "k", 50L)).toDF("pid", "k", "pts")
    val build = Seq((java.lang.Long.valueOf(9L), "k", null.asInstanceOf[java.lang.Long]),
        (java.lang.Long.valueOf(8L), "k", java.lang.Long.valueOf(100L)))
      .toDF("bid", "k", "bts")
    // the null-ts build row must NOT leak its payload to the probe
    // (b.ts <= p.ts is never satisfied by null), and ts=100 > 50 is later
    val r = AsOf.joinBackward(probe, build, Seq("k"), "pts", "bts",
      "bid", Seq("bid")).head()
    assert(r.isNullAt(3), s"null-ts build row leaked: $r")

    val badTie = build.withColumn("bid", col("bid").cast("string"))
    val e = intercept[IllegalArgumentException] {
      AsOf.joinBackward(probe, badTie, Seq("k"), "pts", "bts",
        "bid", Seq("bid"))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("asOf joinForward: earliest at-or-after, smallest-tie, null-ts probe") {
    import graft.operators.AsOf
    val probe = Seq(
      (101L, "u1", 150L), // next build is ts=200 -> tie: smallest bid wins
      (102L, "u1", 301L), // after the last build -> null
      (103L, "u1", 300L), // exactly at 300 -> same-instant visible
      (104L, "u2", 0L))   // u2's own earliest
      .toDF("pid", "user", "pts")
      .unionByName(Seq(("u1", 105L)).toDF("user", "pts")
        .select(lit(null).cast("long").as("pid"), col("user"),
          lit(null).cast("long").as("pts"))) // null probe ts -> no match
    val build = Seq(
      (2L, "u1", 200L, "b"),
      (3L, "u1", 200L, "b2"),
      (4L, "u1", 300L, "c"),
      (5L, "u2", 500L, "z"))
      .toDF("bid", "user", "bts", "tag")
    val out = AsOf.joinForward(probe, build, Seq("user"),
        "pts", "bts", "bid", Seq("bid", "tag"))
      .collect()
      .map(r => (Option(r.get(0)).map(_.toString).orNull,
        Option(r.get(3)).map(_.toString).orNull)).toMap
    assert(out == Map("101" -> "2", "102" -> null, "103" -> "4",
      "104" -> "5", (null: String) -> null))
  }

  test("asOf tolerance bounds the match distance (backward + forward)") {
    import graft.operators.AsOf
    import java.sql.Timestamp
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val probe = Seq((1L, "k", ts(30))).toDF("pid", "k", "pts")
    val build = Seq((7L, "k", ts(5), "far"), (8L, "k", ts(50), "fwd-far"))
      .toDF("bid", "k", "bts", "tag")
    // backward: nearest earlier build is 25 min away -> inside 30m, outside 10m
    def back(tol: String) = AsOf.joinBackward(probe, build, Seq("k"),
      "pts", "bts", "bid", Seq("tag"), tolerance = Some(tol)).head()
    assert(back("30 minutes").getString(3) == "far")
    assert(back("10 minutes").isNullAt(3))
    // forward: nearest later build is 20 min away -> inside 25m, outside 5m
    def fwd(tol: String) = AsOf.joinForward(probe, build, Seq("k"),
      "pts", "bts", "bid", Seq("tag"), tolerance = Some(tol)).head()
    assert(fwd("25 minutes").getString(3) == "fwd-far")
    assert(fwd("5 minutes").isNullAt(3))
  }

  test("asOf joins match a driver-side reference on randomized inputs") {
    import graft.operators.AsOf
    val rnd = new scala.util.Random(7) // fixed seed: deterministic run-to-run
    val keys = Seq("a", "b", "c")
    for (_ <- 1 to 3) {
      // small ts domain on purpose: plenty of equal-ts ties, same-instant
      // probe/build collisions, and keys with empty build histories
      val probe = (1 to 40).map(i =>
        (i.toLong, keys(rnd.nextInt(3)), rnd.nextInt(20).toLong))
      val build = (1 to 30).map(i =>
        (100L + i, keys(rnd.nextInt(3)), rnd.nextInt(20).toLong))
      def refBack(k: String, ts: Long): Option[Long] = build
        .filter(b => b._2 == k && b._3 <= ts)
        .sortBy(b => (b._3, b._1)).lastOption.map(_._1)
      def refFwd(k: String, ts: Long): Option[Long] = build
        .filter(b => b._2 == k && b._3 >= ts)
        .sortBy(b => (b._3, b._1)).headOption.map(_._1)
      val pDf = probe.toDF("pid", "k", "pts").repartition(7)
      val bDf = build.toDF("bid", "k", "bts").repartition(5)
      def run(f: => org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
        f.collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      val outB = run(AsOf.joinBackward(pDf, bDf, Seq("k"), "pts", "bts",
        "bid", Seq("bid")))
      val outF = run(AsOf.joinForward(pDf, bDf, Seq("k"), "pts", "bts",
        "bid", Seq("bid")))
      for ((pid, k, ts) <- probe) {
        assert(outB(pid) == refBack(k, ts), s"backward pid=$pid k=$k ts=$ts")
        assert(outF(pid) == refFwd(k, ts), s"forward pid=$pid k=$k ts=$ts")
      }
    }
  }

  test("asOf joinBackward preserves every probe row and its columns") {
    import graft.operators.AsOf
    val probe = Seq((1L, "k", 10L, "keepme")).toDF("pid", "k", "pts", "extra")
    val build = Seq((9L, "k", 5L)).toDF("bid", "k", "bts")
    val out = AsOf.joinBackward(probe, build, Seq("k"), "pts", "bts",
      "bid", Seq("bid"))
    assert(out.columns.toSeq == Seq("pid", "k", "pts", "extra", "asof_bid"))
    val r = out.head()
    assert(r.getString(3) == "keepme" && r.getLong(4) == 9L)
  }

  private def containedPairs(df: org.apache.spark.sql.DataFrame,
      maxGramDf: Option[Long] = None) =
    Dedup.substringContainment(df, "doc_id", "text", gram = 8,
        maxGramDf = maxGramDf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("substringContainment finds token-suffix containment, no false hits") {
    val df = docs(
      (1L, "a b c d e f g h i j"),
      (2L, "b c d e f g h i j"),   // true suffix of doc 1 (9 tokens)
      (3L, "k l m n o p q r s t")) // unrelated
    assert(containedPairs(df) == Set((2L, 1L)))
    // token-boundary safety: "ab" is not contained in "a ab-x" style text
    val tricky = docs((4L, "aa bb cc dd ee ff gg hh ii"),
      (5L, "a bb cc dd ee ff gg hh ii"))
    assert(containedPairs(tricky).isEmpty)
  }

  test("substringContainment short-doc fallback probes whole text") {
    val df = docs(
      (1L, "a b c d e f g h i j"),
      (2L, "b c d e f g h i j"),
      (4L, "c d e")) // 3 tokens < gram floor: gram probe can't see it
    assert(containedPairs(df) == Set((2L, 1L), (4L, 1L), (4L, 2L)))
  }

  test("substringContainment survives a hot gram via the df cap + rarest-gram probe") {
    val hot = "h1 h2 h3 h4 h5 h6 h7 h8" // shared leading 8-gram, df = 8
    val noise = (10L to 15L).map(i =>
      (i, s"$hot u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h"))
    val container = (20L, s"$hot r1 r2 r3 r4 r5 r6 r7 r8 r9")
    val contained = (21L, s"$hot r1 r2 r3 r4 r5 r6 r7 r8") // prefix of 20
    val df = docs((noise :+ container :+ contained): _*)
    // cap 3 drops the hot gram from the postings; doc 21's FIRST gram is
    // exactly that hot gram, so first-gram probing would miss the pair —
    // the rarest-gram probe must find it through an r-token window (df 2)
    assert(containedPairs(df, maxGramDf = Some(3L)) == Set((21L, 20L)))
    // and the uncapped path agrees on the same corpus
    assert(containedPairs(df) == Set((21L, 20L)))
  }

  // ------------------------------------------------------------------ DSIR

  /** Driver-side executable spec of Dsir.importanceWeights: same token
    * model, same md5-60-bit bucket hash, same add-alpha log-ratio, written
    * against plain Scala collections (no Spark plan shared). */
  private def dsirReference(rows: Seq[(Long, String, Boolean)],
      buckets: Int, alpha: Double): Map[Long, (Double, Long)] = {
    def md5Long60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def feats(text: String): Seq[Long] = {
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val fs = if (toks.size >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
               else Seq(toks.mkString(" "))
      fs.map(f => md5Long60(f) % buckets)
    }
    val perDoc = rows.map { case (id, text, isT) => (id, isT, feats(text)) }
    val cr = perDoc.flatMap(_._3).groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val ct = perDoc.filter(_._2).flatMap(_._3).groupBy(identity)
      .map { case (b, xs) => b -> xs.size.toLong }
    val tr = cr.values.sum.toDouble
    val tt = ct.values.sum.toDouble
    def lam(b: Long): Double =
      math.log((ct.getOrElse(b, 0L) + alpha) / (tt + alpha * buckets)) -
        math.log((cr(b) + alpha) / (tr + alpha * buckets))
    perDoc.map { case (id, _, fs) =>
      id -> (fs.map(lam).sum, fs.size.toLong)
    }.toMap
  }

  test("DSIR weights match a driver-side reference exactly (incl. short docs)") {
    val rows = Seq(
      (1L, "the cat sat on the mat", true),
      (2L, "the dog ran to the cat", true),
      (3L, "xs qq zz xs qq ww", false),
      (4L, "the cat ran", false),      // target-looking non-target doc
      (5L, "solo", false),             // 1 token -> whole-text fallback feat
      (6L, "  ", false))               // empty -> one "" feature
    val df = rows.toDF("doc_id", "text", "is_t")
    val out = graft.operators.Dsir.importanceWeights(
        df, "doc_id", "text", col("is_t"), buckets = 16, alpha = 0.5)
      .collect().map(r => r.getLong(r.fieldIndex("id")) ->
        (r.getDouble(r.fieldIndex("logw_raw")),
          r.getLong(r.fieldIndex("n_feats")))).toMap
    val ref = dsirReference(rows, buckets = 16, alpha = 0.5)
    assert(out.keySet == ref.keySet)
    for ((id, (logw, n)) <- ref) {
      assert(out(id)._2 == n, s"n_feats for doc $id")
      assert(math.abs(out(id)._1 - logw) < 1e-9, s"logw for doc $id")
    }
    // directionality: the target-vocabulary non-target doc must outscore
    // the alien-vocabulary doc (the point of importance weighting)
    assert(out(4L)._1 > out(3L)._1)
  }

  test("DSIR resample: exact k, deterministic, partitioning-independent") {
    val corpus = (1L to 60L).map(i =>
      (i, (0 until 12).map(j => s"w${(i * 7 + j * 3) % 40}").mkString(" "),
        i % 3 == 0))
    val df = corpus.toDF("doc_id", "text", "is_t")
    def sel(d: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] = {
      val w = graft.operators.Dsir.importanceWeights(
        d, "doc_id", "text", col("is_t"), buckets = 32, alpha = 0.5)
      graft.operators.Dsir.resample(w, k = 10)
        .select(col("id"), col("score")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    }
    val a = sel(df)
    val b = sel(df.repartition(7, col("text")))
    assert(a.size == 10)
    assert(a == b)
  }

  // -------------------------------------------------- k-center greedy

  test("kCenterGreedy picks the hand-computed farthest-point sequence") {
    val pts = Seq(
      (1L, Seq(0.0, 0.0)),   // norm2 0
      (2L, Seq(10.0, 0.0)),  // norm2 100 -> first center
      (3L, Seq(0.0, 9.0)),   // d2 to (10,0) = 181 -> second
      (4L, Seq(5.0, 5.0)),   // min d2 41 -> fourth
      (5L, Seq(9.9, 0.0)))   // d2 to (10,0) = 0.01, never chosen
    val df = pts.toDF("vec_id", "vec")
    val centers = graft.operators.Similarity.kCenterGreedy(
      df, "vec_id", "vec", k = 4)
    assert(centers.map(c => (c._1, c._2)) ==
      Seq((1, 2L), (2, 3L), (3, 1L), (4, 4L)))
    val assign = graft.operators.Similarity.kCenterAssign(
        df, "vec_id", "vec", centers)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(assign(5L) == ((1, 2L, 0.01)))   // nearest center is (10,0)
    assert(assign(1L) == ((3, 1L, 0.0)))    // a chosen point maps to itself
    assert(assign(4L) == ((4, 4L, 0.0)))
  }

  test("kCenterGreedy: smallest id wins norm/distance ties; k > n degrades") {
    val df = Seq((7L, Seq(3.0, 4.0)), (2L, Seq(4.0, 3.0)),
      (9L, Seq(0.0, 0.0))).toDF("vec_id", "vec")
    // ids 2 and 7 tie on norm2 = 25 -> id 2 first; both remaining points
    // (id 7 at d2 2, id 9 at d2 25) -> id 9 second, id 7 third; k=5 asks
    // for more centers than points and must stop at 3 without error
    val centers = graft.operators.Similarity.kCenterGreedy(
      df, "vec_id", "vec", k = 5)
    assert(centers.map(_._2) == Seq(2L, 9L, 7L))
  }

  test("kCenterGreedy is partitioning-independent") {
    val vecs = (1L to 40L).map(i =>
      (i, Seq(math.sin(i.toDouble) * 3, math.cos(i.toDouble * 2) * 5,
        (i % 7).toDouble)))
    val df = vecs.toDF("vec_id", "vec")
    val a = graft.operators.Similarity.kCenterGreedy(df, "vec_id", "vec", 4)
    val b = graft.operators.Similarity.kCenterGreedy(
      df.repartition(11, col("vec_id")), "vec_id", "vec", 4)
    assert(a == b)
  }

  test("marginMining: hand-computed ratio margins, hub discounted") {
    // a1=(1,0), a2=(0,1); b: exact twins b1/b2 plus the hub b3=(1,1),
    // which has cosine 1/sqrt(2) to BOTH a's. With k=2:
    //   avgk(a1) = (1 + c)/2, avgk(b1) = (1 + 0)/2, avgk(b3) = c
    // margin(a1,b1) = 1 / ((avgk(a1) + 0.5)/2) ~ 1.4776 — the twin wins
    // even though the hub's raw cosine is a strong 0.707.
    val a = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("id", "vec")
    val b = Seq((11L, Seq(1.0, 0.0)), (12L, Seq(0.0, 1.0)),
      (13L, Seq(1.0, 1.0))).toDF("id", "vec")
    val out = graft.operators.Similarity.marginMining(
        a, "id", "vec", b, "id", "vec", k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    val c = 1.0 / math.sqrt(2.0)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = r6(1.0 / (((1.0 + c) / 2 + 0.5) / 2))
    assert(out(1L) == ((11L, 1.0, expected)))
    assert(out(2L) == ((12L, 1.0, expected)))
  }

  test("marginMining recovers planted twins against distractors") {
    // mutually orthogonal sources (basis vectors) so neighborhoods don't
    // overlap; twins at +0.02 per component, distractors are complement
    // vectors (cosine 0 to their own source, ~0.38 to the others)
    val base = (0L until 8L).map(i => (i,
      Seq.tabulate(8)(d => if (d == i) 1.0 else 0.0)))
    val a = base.toDF("id", "vec")
    val twins = base.map { case (i, v) => (i + 100, v.map(_ + 0.02)) }
    val distract = base.map { case (i, v) => (i + 200, v.map(1.0 - _)) }
    val b = (twins ++ distract).toDF("id", "vec")
    val out = graft.operators.Similarity.marginMining(
        a, "id", "vec", b, "id", "vec", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 8 && out.forall { case (ai, bi) => bi == ai + 100 })
  }

  test("hardNegatives: mined positive is best same-label, negatives nearest wrong-label") {
    // anchor 1 (label 0) at 0 deg; same-label 2 at 10 deg, 3 at 60 deg;
    // wrong-label 4 at 5 deg (hardest), 5 at 30 deg, 6 at 170 deg (easy)
    def v(deg: Double) = {
      val r = math.toRadians(deg); Seq(math.cos(r), math.sin(r))
    }
    val corpus = Seq(
      (1L, v(0), 0), (2L, v(10), 0), (3L, v(60), 0),
      (4L, v(5), 1), (5L, v(30), 1), (6L, v(170), 1))
      .toDF("id", "vec", "label")
    val anchors = corpus.filter(col("id") === 1)
    val out = Similarity.hardNegatives(corpus, "id", "vec", "label",
        anchors, "id", "vec", "label", kNeg = 2, kCand = 10)
      .orderBy("role", "rnk").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("neg", 1L, 4L), ("neg", 2L, 5L),
      ("pos", 1L, 2L)))

    // kCand cap: with only the single nearest candidate (4, wrong label),
    // no positive row is emitted and 4 is the one negative
    val capped = Similarity.hardNegatives(corpus, "id", "vec", "label",
        anchors, "id", "vec", "label", kNeg = 2, kCand = 1)
      .collect().map(r => (r.getString(1), r.getLong(3)))
    assert(capped.toSeq == Seq(("neg", 4L)))

    // empty anchors degrade to empty output
    assert(Similarity.hardNegatives(corpus, "id", "vec", "label",
      anchors.limit(0), "id", "vec", "label").collect().isEmpty)
  }
}
