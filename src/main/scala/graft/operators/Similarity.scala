package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vec

/** Approximate / exact nearest-neighbor search over an embedding column.
  *
  * Three tiers, all pure DataFrame plans:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against the
  *    corpus scan; one pass, no corpus shuffle. The 100-TB path when the query
  *    side fits in a broadcast (it usually does).
  *  - [[lshTopK]]: random-hyperplane LSH — corpus bucketed by sign bits at
  *    scan time (a codegen'd expression, no shuffle), queries probe only their
  *    own bucket. Sub-linear candidate sets; recall tunable via planes/tables.
  *  - [[ivfTopK]]: IVF-style coarse quantizer — corpus assigned to its nearest
  *    centroid once (broadcast centroids), queries probe `nprobe` nearest
  *    lists. This is the FAISS IVF-Flat layout expressed relationally.
  */
object Similarity {

  /** Deterministic pseudo-random unit-ish hyperplanes as literal array
    * columns: fixed seed → identical planes on every executor and every run
    * (an explicit-determinism requirement, SURVEY.md §4). */
  def hyperplanes(dim: Int, n: Int, seed: Long = 42L): Seq[Column] = {
    val rnd = new scala.util.Random(seed)
    // same draw order as the old per-component lit() form → identical
    // planes; one array Literal per plane instead of `dim` Literal nodes
    Seq.fill(n)(typedLit((0 until dim).map(_ => rnd.nextGaussian()).toSeq))
  }

  /** Dimensionality of an array column, probed with one aggregate. Returns 1
    * for an empty (or all-null) input: any plane dimension works when no
    * rows flow, and the callers then produce an empty result instead of
    * crashing on `head()` of an empty frame. */
  def vecDim(df: DataFrame, vecCol: String): Int = {
    val r = df.agg(max(size(col(vecCol)))).head()
    if (r.isNullAt(0)) 1 else math.max(r.getInt(0), 1)
  }

  /** Exact top-k cosine neighbors for each query vector.
    * `queries(queryIdCol, vecCol)` is broadcast; the corpus streams past it in
    * one stage (BroadcastNestedLoopJoin — the *intended* plan here: k·|corpus|
    * scored pairs with zero shuffle of the corpus). Ties broken by corpus id
    * for run-to-run determinism.
    *
    * Cost is |queries|·|corpus| scored pairs and the query side must fit in a
    * broadcast — this is the exact BASELINE/VERIFIER behind [[annLsh]] and
    * [[annIvf]]; default to those for large query sets or 100-TB corpora. */
  def bruteForceTopK(corpus: DataFrame, corpusIdCol: String, corpusVecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int): DataFrame = {
    // rename both sides up front: queries are routinely a subset of the
    // corpus with IDENTICAL column names, which would make every post-join
    // reference ambiguous
    val c = corpus.select(col(corpusIdCol).as("__cid"),
      col(corpusVecCol).as("__cvec"),
      Vec.norm(col(corpusVecCol)).as("__cnrm"))
    val q = queries.select(col(queryIdCol).as("__qid"),
      col(queryVecCol).as("__qvec"),
      Vec.norm(col(queryVecCol)).as("__qnrm"))
    val scored = c
      .join(broadcast(q), col("__cid") =!= col("__qid"))
      .select(col("__qid").as("query_id"), col("__cid").as("neighbor_id"),
        Vec.cosineFromParts(Vec.dot(col("__qvec"), col("__cvec")),
          col("__qnrm"), col("__cnrm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** One 32-bit word of a sign-bit sketch: bit i set iff component
    * `32*word + i` is strictly positive. Built as an exact double sum of
    * powers of two (every partial sum < 2^32 is exactly representable, and
    * an identical SQL restatement exists in any engine), then cast to long.
    * Runs once per ROW at sketch time — never on the per-pair path, where
    * scoring is the codegen'd `bit_count(xor)` over the packed words. */
  private def packWord(vec: Column, word: Int): Column =
    aggregate(
      transform(slice(vec, word * 32 + 1, 32),
        (x, i) => when(x > lit(0.0), pow(lit(2.0), i)).otherwise(lit(0.0))),
      lit(0.0), (acc, x) => acc + x).cast("long")

  /** Binary (1-bit-per-dimension) quantization ANN: pack each vector's sign
    * bits into `ceil(dim/32)` 32-bit words (16 bytes/row vs 256 for float32
    * at dim 64 — the most aggressive compression tier below
    * [[ivfTopKQuantized]]'s int8 and the PQ family), pre-rank every
    * (query, corpus) pair by Hamming distance — the codegen'd
    * [[graft.expressions.HammingDist]] kernel, one POPCNT per word per
    * pair — keep the `candidates` best per query, then re-rank only those
    * with exact float cosine (a slim join back to the raw vectors) for the
    * final top-k. The sign-concordance sketch is the classic SimHash /
    * binary-embedding bound (Charikar 2002: P[sign flip] = θ/π per random
    * projection; here the identity basis, the RaBitQ-style 1-bit baseline):
    * near-parallel vectors differ in few signs, unrelated ones in ~dim/2.
    *
    * 100-TB posture: the Hamming stage streams the word-array sketch — a
    * 16x smaller scan than float re-ranking everything — and the exact
    * stage touches only |queries| x candidates raw vectors. Combine with
    * IVF routing for sub-linear candidate generation; this operator is the
    * in-list scorer of that composition. `candidates >= |corpus|` degrades
    * to exactly [[bruteForceTopK]] (the spec's equivalence proof).
    *
    * Reference scope: the reference has no vector ops (cleaning/dedupe.py
    * is exact-equality) — extension surface, graded like q34/q35. */
  def binaryTopK(corpus: DataFrame, corpusIdCol: String, corpusVecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, candidates: Int = 64): DataFrame = {
    val dim = vecDim(corpus, corpusVecCol)
    val nWords = (dim + 31) / 32
    def sketch(df: DataFrame, idCol: String, vecCol: String) =
      df.select(col(idCol).as("id"),
        array((0 until nWords).map(w => packWord(col(vecCol), w)): _*)
          .as("wb"))
    val c = sketch(corpus, corpusIdCol, corpusVecCol)
    val q = sketch(queries, queryIdCol, queryVecCol)
      .select(col("id").as("qid"), col("wb").as("qwb"))
    val ham = c.join(broadcast(q), col("id") =!= col("qid"))
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"),
        graft.expressions.HammingDist.column(col("wb"), col("qwb"))
          .as("hamming"))
    val hw = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id").asc)
    val cand = ham.withColumn("hrank", row_number().over(hw))
      .filter(col("hrank") <= candidates)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank: only the surviving candidate pairs touch raw vectors
    val cv = corpus.select(col(corpusIdCol).as("neighbor_id"),
      col(corpusVecCol).as("cvec"), Vec.norm(col(corpusVecCol)).as("cnrm"))
    val qv = queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("qvec"), Vec.norm(col(queryVecCol)).as("qnrm"))
    val scored = cand.join(cv, "neighbor_id").join(broadcast(qv), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        Vec.cosineFromParts(Vec.dot(col("qvec"), col("cvec")),
          col("qnrm"), col("cnrm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: corpus + queries hashed into sign-bit buckets over
    * `tables` independent plane sets; candidates = same (table, bucket);
    * exact cosine rescoring + top-k on the candidate set. */
  def lshTopK(corpus: DataFrame, corpusIdCol: String, corpusVecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, planes: Int = 10, tables: Int = 4): DataFrame = {
    val dim = vecDim(corpus, corpusVecCol)
    // norm computed ONCE per row at bucketize time; candidate scoring then
    // uses cosineFromParts (one array traversal per pair, not three)
    def bucketize(df: DataFrame, idCol: String, vecCol: String) =
      df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        Vec.norm(col(vecCol)).as("nrm"),
        posexplode(array((0 until tables).map { t =>
          Vec.lshBucket(col(vecCol), hyperplanes(dim, planes, seed = 42 + t))
        }: _*)).as(Seq("table", "bucket")))

    val c = bucketize(corpus, corpusIdCol, corpusVecCol)
    val q = bucketize(queries, queryIdCol, queryVecCol)

    val cand = c.as("c")
      .join(q.as("q"),
        col("c.table") === col("q.table") && col("c.bucket") === col("q.bucket")
          && col("c.id") =!= col("q.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        col("q.vec").as("qvec"), col("c.vec").as("cvec"),
        col("q.nrm").as("qnrm"), col("c.nrm").as("cnrm"))
      .distinct()
      .select(col("query_id"), col("neighbor_id"),
        Vec.cosineFromParts(Vec.dot(col("qvec"), col("cvec")),
          col("qnrm"), col("cnrm")).as("cosine"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Spherical k-means (Lloyd) training for IVF coarse centroids,
    * deterministic end to end:
    *  - seeds are the `nlist` corpus vectors first in md5-of-id order
    *    (reproducible pseudo-random spread, no `rand()`; orderBy+limit =
    *    TakeOrderedAndProject, never a global sort);
    *  - between iterations the centroids live on the DRIVER as literal
    *    array columns (nlist x dim doubles — metadata-sized, the same
    *    stance as [[hyperplanes]] and exactly what MLlib's k-means
    *    broadcasts): assignment is then a PURE PROJECTION over one corpus
    *    scan — `array_max` over (cosine, -cent_id) structs, so ties break
    *    to the smallest cent_id — with no join, no window, and no
    *    corpus x nlist row blow-up;
    *  - the update step is the native elementwise [[Vec.sumAgg]] aggregate:
    *    one dim-length partial buffer per (map task, centroid) through a
    *    single nlist-row exchange. Components are rounded to 6 decimals so
    *    summation order can't leak into the result — and coarsely enough
    *    that a ~1e-14 cross-engine/cross-partitioning sum difference has
    *    ~1e-8 probability of straddling a rounding boundary, which keeps
    *    the q77 oracle (an independent DuckDB restatement of this exact
    *    algorithm) deterministic. K-means is insensitive to centroid
    *    precision at 1e-6.
    * Per iteration: one corpus scan, one nlist-row shuffle, one nlist-row
    * driver collect. Clusters that lose all members drop out (FAISS
    * reassigns; relationally the empty list never matches a probe).
    * Returns (cent_id, cent_vec) like the sampling path.
    *
    * Dimension note: the assignment embeds nlist x dim literal doubles
    * into the plan as ONE folded centroid-matrix literal consumed by the
    * native [[graft.expressions.ArgmaxCosine]] kernel (generated code is
    * a single static call at any nlist/dim — the old unrolled struct
    * form hit janino's 64 KB method limit past ~nlist*dim = 10k). The
    * remaining ceiling is literal/analysis size only; past ~10^6
    * embedded doubles (e.g. 768-dim x 1000+ lists) switch to
    * broadcasting the centroid matrix and scoring via a typed map (the
    * MLlib stance), trading the pure-projection plan for a broadcast
    * variable. */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 2): DataFrame =
    centroidHistory(corpus, idCol, vecCol, nlist, iters).last

  /** Centroid set at EVERY Lloyd step: element 0 = the md5-ordered seed
    * sample, element i = centroids after i iterations (so `.last` is what
    * [[trainCentroids]] returns). Costs nothing beyond the final-state
    * train — the centroids live on the driver between iterations anyway,
    * so recording the intermediates is free, while re-calling
    * trainCentroids per depth would re-run every earlier iteration's
    * corpus scan. Callers that grade per-iteration objectives (q77's
    * monotonicity columns) need the intermediate sets.
    *
    * ALWAYS `iters + 1` elements: on an empty corpus (empty seed sample)
    * the skipped iterations are padded with the empty centroid frame, so
    * positional callers like `hist(2)` degrade to empty results instead
    * of an IndexOutOfBoundsException. */
  def centroidHistory(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int): Seq[DataFrame] =
    trainLloyd(corpus, idCol, vecCol, nlist, iters, epsilon = None).centroids

  /** Lloyd training outcome: centroid frames per step ([[centroidHistory]]
    * semantics: element 0 = seeds, padded to maxIters+1 on early stop or
    * empty corpus), the per-iteration OBJECTIVE (mean best-cosine of the
    * assignment that OPENED iteration i, i.e. J(centroids i-1), rounded
    * to 4 like every graded average), how many iterations actually ran,
    * and whether the epsilon rule stopped them before maxIters. */
  case class LloydResult(centroids: Seq[DataFrame], objectives: Seq[Double],
      itersRun: Int, converged: Boolean)

  /** Lloyd training with an optional convergence stop: run up to
    * `maxIters` assignment/update rounds, recording the objective of each
    * round's opening assignment; with `epsilon = Some(e)`, stop after
    * round i >= 2 when `objective(i) - objective(i-1) < e` — the
    * improvement has flattened, so later rounds buy (at most) noise-sized
    * gains for a full corpus scan each. The objective is NEAR-monotone:
    * the mean update tracks but does not exactly optimize the cosine
    * objective (the true maximizer is the normalized-vector-sum
    * direction), so small terminal decreases are possible — and a
    * decrease is also a flattened improvement, so it correctly trips the
    * stop. The round-4 canon on objectives keeps the rule
    * engine-portable: a twin
    * restating the unrolled iterations derives the SAME stop point as
    * long as epsilon sits strictly between two multiples of 1e-4 (never
    * use a multiple of 1e-4 itself — a delta landing exactly on the
    * boundary would compare differently within one ulp across engines).
    *
    * The objective is FREE: it rides the update step's existing
    * per-centroid aggregate (sum(best_sim) alongside the vector sums), so
    * convergence costs zero extra scans over fixed-iters training. */
  def trainLloyd(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, maxIters: Int, epsilon: Option[Double]): LloydResult = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var cents: Seq[(Long, Seq[Double])] = corpus
      .select(col(idCol).as("sid"), Vec.asDouble(col(vecCol)).as("cent_vec"))
      .orderBy(md5(col("sid").cast("string")).asc, col("sid").asc)
      .limit(nlist)
      .select(col("cent_vec")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val history = Seq.newBuilder[DataFrame]
    history += cents.toDF("cent_id", "cent_vec")
    val objectives = Seq.newBuilder[Double]
    var itersRun = 0
    var converged = false
    var lastObj = Double.NaN
    for (_ <- 0 until maxIters if cents.nonEmpty && !converged) {
      // nearest-centroid assignment via the native ArgmaxCosine kernel
      // (runtime loop over the literal centroid matrix — bit-identical to
      // the unrolled array_max-over-(cosine, -cent_id) struct form it
      // replaced, ties to the smallest index): the unrolled form emitted
      // O(nlist) codegen'd struct builds per row and hit janino's 64 KB
      // method limit past ~nlist*dim = 10k (the old DIMENSION LIMIT
      // note); the kernel's generated code is one static call at any
      // size. cents is sorted by cent_id, so position order = id order
      // and the position->id lookup is a literal array. The winner's sim
      // is recomputed against its centroid row — the same left-to-right
      // VecDot ops, so the value is bit-identical to the struct field.
      // ONE nested-array Literal per matrix (typedLit), not an
      // array(array(lit…)) tree: the CreateArray form puts nlist·dim
      // Literal nodes into every analyzer/optimizer pass before constant
      // folding collapses it to exactly this Literal — same runtime
      // values, orders of magnitude fewer plan nodes (the q220 k=256
      // encode plan carried ~280k of them)
      val centMat = typedLit(cents.map(_._2))
      val centIds = typedLit(cents.map(_._1))
      val assigned = corpus
        .select(Vec.asDouble(col(vecCol)).as("__v"))
        .withColumn("__ci",
          graft.expressions.ArgmaxCosine.column(col("__v"), centMat))
        .select(col("__v"),
          element_at(centIds, col("__ci") + 1).as("cent_id"),
          Vec.cosine(col("__v"),
            element_at(centMat, col("__ci") + 1)).as("sim"))
      // sorted BEFORE the driver-side folds: collect order is partition
      // order, and a double sum in nondeterministic order could flip the
      // round-4 objective within one ulp of a boundary
      val updated = assigned
        .groupBy(col("cent_id"))
        .agg(Vec.sumAgg(col("__v")).as("s"), count(lit(1)).as("n"),
          sum(col("sim")).as("ssim"))
        .select(col("cent_id"),
          transform(col("s"), x => round(x / col("n"), 6)).as("cent_vec"),
          col("n"), col("ssim"))
        .collect()
        .sortBy(_.getLong(0))
      cents = updated
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
      history += cents.toDF("cent_id", "cent_vec")
      val obj = BigDecimal(updated.map(_.getDouble(3)).sum
          / math.max(updated.map(_.getLong(2)).sum, 1L))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      objectives += obj
      itersRun += 1
      converged = epsilon.exists(e => itersRun >= 2 && obj - lastObj < e)
      lastObj = obj
    }
    val out = history.result()
    LloydResult(out ++ Seq.fill(maxIters + 1 - out.length)(out.last),
      objectives.result(), itersRun, converged)
  }

  /** Covariance-free PCA power iteration: the dominant principal direction
    * of an embedding column, computed WITHOUT materializing the d x d
    * covariance — each iteration is w = Σ_x x · (x·v) over one corpus scan
    * (a scalar [[Vec.dot]] per row + the native [[Vec.sumAgg]] elementwise
    * aggregate), normalized on the driver (d-length literal, the Lloyd
    * centroid stance). The dimensionality-reduction primitive behind
    * PCA projection / whitening / OPQ-style rotations: at 100 TB the
    * covariance outer-product would be fine too (d² partial-agg cells),
    * but the matrix-free form needs nothing beyond the kernels already
    * on the scan.
    *
    * Determinism stances: each iterate's components round to 6 (q77's
    * centroid argument) so cross-engine summation order can't leak; the
    * returned direction is sign-fixed so its first component with
    * |value| > 1e-9 is positive (eigenvectors are defined up to sign).
    * Starts from the deterministic all-ones/√d vector — orthogonal-start
    * pathologies are a measure-zero concern the spec pins. Returns the
    * direction as a driver-side Seq (metadata, like centroids). */
  def powerIteration(corpus: DataFrame, vecCol: String,
      iters: Int): Seq[Double] = {
    val dim = vecDim(corpus, vecCol)
    var v: Seq[Double] = Seq.fill(dim)(
      BigDecimal(1.0 / math.sqrt(dim.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    for (_ <- 1 to iters) {
      val vLit = typedLit(v)
      val row = corpus
        .select(Vec.asDouble(col(vecCol)).as("x"))
        .select(col("x"), Vec.dot(col("x"), vLit).as("s"))
        .select(transform(col("x"), xi => xi * col("s")).as("xs"))
        .agg(Vec.sumAgg(col("xs")).as("w"))
        .head()
      if (!row.isNullAt(0)) {
        val w = row.getSeq[Double](0)
        val nrm = math.sqrt(w.map(x => x * x).sum)
        if (nrm > 0) {
          val sign = w.find(math.abs(_) > 1e-9).map(math.signum).getOrElse(1.0)
          v = w.map(x => BigDecimal(x * sign / nrm)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
    }
    v
  }

  /** Deterministic coarse centroids shared by BOTH IVF variants: trained
    * ([[trainCentroids]]) when `trainIters > 0`, else the nlist corpus
    * vectors with the smallest ids (stand-in with an identical layout).
    * One definition so the float and quantized paths can never diverge on
    * seeding (the OperatorsSpec float==quantized equivalence rests on it). */
  private def coarseCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, nlist: Int, trainIters: Int): DataFrame =
    if (trainIters > 0) trainCentroids(corpus, idCol, vecCol, nlist, trainIters)
    else corpus
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))
      .orderBy(col("cent_id").asc).limit(nlist)

  /** Nearest-list routing shared by BOTH IVF variants: rank the broadcast
    * centroid set by full-precision cosine per row, keep the `nProbe`
    * best. Returns `(id, vec, cent_id, carry...)`.
    *
    * `carry` names pre-computed columns on `df` to ship through the
    * routing window. Derived columns the candidate join needs (norms,
    * quantized codes) MUST ride through here rather than be added after
    * routing: whole-stage codegen defers a broadcast-hash-join's
    * streamed-side non-key columns to first use — inside the per-match
    * loop — so a post-routing projection re-evaluates per CANDIDATE,
    * while the routing window's sort materializes carried columns once
    * per routed row (the q95 LUT lesson, measured 6x). */
  private def routeToLists(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, nProbe: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val keep = Seq(col("id"), col("vec"), col("cent_id")) ++ carry.map(col)
    val scored = df.join(broadcast(centroids))
      .select(Seq(col(idCol).as("id"), col(vecCol).as("vec"), col("cent_id"),
        Vec.cosine(col(vecCol), col("cent_vec")).as("cent_sim"))
        ++ carry.map(col): _*)
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cent_sim").desc, col("cent_id").asc)
    scored.withColumn("r", row_number().over(w))
      .filter(col("r") <= nProbe)
      .select(keep: _*)
  }

  /** IVF-Flat ANN: `nlist` coarse centroids — a deterministic id-ordered
    * sample by default, or [[trainCentroids]] k-means refinement with
    * `trainIters > 0` (same layout either way); every corpus row is
    * assigned to its nearest centroid (broadcast join, no corpus shuffle
    * beyond the final group), queries probe their `nprobe` nearest lists. */
  def ivfTopK(corpus: DataFrame, corpusIdCol: String, corpusVecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4,
      trainIters: Int = 0): DataFrame = {
    val centroids =
      coarseCentroids(corpus, corpusIdCol, corpusVecCol, nlist, trainIters)
    // norms computed BELOW the routing window (carried, so the candidate
    // join reads rather than recomputes them — see routeToLists) and once
    // per row, so candidate scoring is one array traversal per pair
    val c = routeToLists(
      corpus.withColumn("nrm", Vec.norm(col(corpusVecCol))),
      corpusIdCol, corpusVecCol, centroids, 1, carry = Seq("nrm"))
    val q = routeToLists(
      queries.withColumn("nrm", Vec.norm(col(queryVecCol))),
      queryIdCol, queryVecCol, centroids, nprobe, carry = Seq("nrm"))

    val cand = c.as("c")
      .join(q.as("q"),
        col("c.cent_id") === col("q.cent_id") && col("c.id") =!= col("q.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        Vec.cosineFromParts(Vec.dot(col("q.vec"), col("c.vec")),
          col("q.nrm"), col("c.nrm")).as("cosine"))
    // no distinct(): each corpus vector lives in exactly ONE list, so the
    // cent_id join cannot produce duplicate (query, neighbor) pairs — a
    // dedup here would be a wasted full exchange (contrast lshTopK, where
    // multi-table bucketing does duplicate candidates)

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF over an int8-QUANTIZED corpus — the production ANN layout at
    * 100 TB: the inverted lists store 1-byte codes plus one per-vector
    * scale instead of float64 components, so the candidate exchange ships
    * ~dim+8 bytes per vector instead of 8*dim (~8x smaller; FAISS
    * IVF-SQ8's trade expressed relationally). Layout choices:
    *  - training and list assignment run on the FULL-PRECISION vectors
    *    (quantize the storage, not the quantizer — centroid quality and
    *    list routing are unaffected by code width);
    *  - codes use the portable floor(x/scale + 0.5) rounding shared with
    *    q73/q80 (bit-identical across engines; scale = max|x|/127, the
    *    symmetric per-vector max-abs scheme) and are materialized as
    *    array<tinyint> BEFORE the candidate join, so the 1-byte width is
    *    what actually crosses the wire;
    *  - queries stay full precision; scoring dequantizes candidates on
    *    the fly (code * scale), so the only approximation vs [[ivfTopK]]
    *    is quantization error itself — which the q73/q80/q87 oracles
    *    grade directly (planted twins must stay exact top-1).
    * All-zero vectors (scale = 0) quantize to all-zero codes; their
    * cosine is NaN either way, matching the float path. */
  def ivfTopKQuantized(corpus: DataFrame, corpusIdCol: String,
      corpusVecCol: String, queries: DataFrame, queryIdCol: String,
      queryVecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      trainIters: Int = 0): DataFrame = {
    val centroids =
      coarseCentroids(corpus, corpusIdCol, corpusVecCol, nlist, trainIters)

    // corpus lists: int8 codes + per-vector scale + dequantized norm,
    // ALL computed below the routing window (carried — the interpreted
    // transform() lambdas must run once per corpus row, never per
    // candidate; see routeToLists) so candidate scoring is one array
    // traversal per pair
    val scale = array_max(transform(col(corpusVecCol), x => abs(x))) / lit(127.0)
    val cPre = corpus
      .withColumn("scale", scale)
      .withColumn("code", transform(col(corpusVecCol), x =>
        when(col("scale") > 0.0, floor(x / col("scale") + lit(0.5)))
          .otherwise(lit(0.0)).cast("tinyint")))
      .withColumn("nrm",
        Vec.norm(transform(col("code"), b => b.cast("double") * col("scale"))))
    val c = routeToLists(cPre, corpusIdCol, corpusVecCol, centroids, 1,
        carry = Seq("scale", "code", "nrm"))
      .drop("vec") // the float vector never rides the quantized lists

    val q = routeToLists(
      queries.withColumn("nrm", Vec.norm(col(queryVecCol))),
      queryIdCol, queryVecCol, centroids, nprobe, carry = Seq("nrm"))

    val cand = c.as("c")
      .join(q.as("q"),
        col("c.cent_id") === col("q.cent_id") && col("c.id") =!= col("q.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        // dot(q, dequant(c)) = scale * dotI8(q, code): the native int8
        // kernel reads byte codes in place — no per-pair dequantized array
        // is ever materialized (a transform() here is an interpreted lambda
        // + an allocation per scored candidate; it benched at ~2x the whole
        // float path)
        Vec.cosineFromParts(
          Vec.dotI8(col("q.vec"), col("c.code")) * col("c.scale"),
          col("q.nrm"), col("c.nrm")).as("cosine"))
    // no distinct(): single-list corpus rows, same reasoning as ivfTopK

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ------------------------------------------------------------------ PQ

  /** Product-quantization model: `m` disjoint coordinate subspaces of
    * `ds = dim / m` components each, a `codebooks(mi)` list of
    * (code, sub-centroid) per subspace. Driver-side literals, exactly the
    * [[trainCentroids]] stance: a codebook is metadata-sized
    * (m * k * ds doubles), never a distributed dataset.
    *
    * `residualCentroids` (set by [[pqTrainResidual]]): the DENSE-indexed
    * coarse centroid set the codebooks were trained against — codebooks
    * then quantize the RESIDUAL x - c(x) (FAISS IVFPQ proper) instead of
    * the raw vector, and [[pqEncode]]/[[pqTopK]] switch to the residual
    * arithmetic automatically. */
  case class PqModel(m: Int, ds: Int, codebooks: Seq[Seq[(Int, Seq[Double])]],
      residualCentroids: Option[Seq[(Int, Seq[Double])]] = None)

  /** Train (or sample) PQ codebooks.
    *
    * `trainIters = 0` (default, and the oracle-graded path): codebook mi =
    * the mi-th slices of the `k` smallest-id corpus vectors, code = rank in
    * that id order — fully deterministic and independently restatable by a
    * SQL twin, the [[coarseCentroids]] stance. `trainIters > 0` refines
    * each subspace codebook with the shared spherical Lloyd trainer
    * ([[trainCentroids]] on the sliced corpus — m small trainings, m * iters
    * corpus scans; offline cost by design). */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, trainIters: Int = 0): PqModel = {
    val dim = vecDim(corpus, vecCol)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val ds = dim / m
    val v = Vec.asDouble(col(vecCol))
    val codebooks: Seq[Seq[(Int, Seq[Double])]] =
      if (trainIters == 0) {
        val sample = corpus
          .select(col(idCol).as("sid"), v.as("__v"))
          .orderBy(col("sid").asc).limit(k)
          .select(col("__v")).collect()
          .map(_.getSeq[Double](0).toSeq).toSeq
        // an empty codebook would make pqEncode build array() of zero
        // candidate structs — an analysis error far from the real cause
        require(sample.nonEmpty, "pqTrain needs a non-empty corpus")
        (0 until m).map(mi =>
          sample.zipWithIndex.map { case (vec, code) =>
            (code, vec.slice(mi * ds, (mi + 1) * ds))
          })
      } else
        (0 until m).map { mi =>
          trainCentroids(
              corpus.select(col(idCol), slice(v, mi * ds + 1, ds).as("__sub")),
              idCol, "__sub", k, trainIters)
            .collect()
            .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
            .sortBy(_._1)
        }
    PqModel(m, ds, codebooks)
  }

  /** Encode a vector column against a [[PqModel]]: per subspace, the code
    * minimizing squared L2 to the sub-centroid (the reconstruction-error
    * objective — what makes the ADC dot a good dot estimate), computed as
    * `||c||^2 - 2 s.c` (the `||s||^2` term is constant across codes and
    * drops out of the argmin) and ROUNDED to 6 before the argmin so both
    * engines pick the same code when two keys agree to 1e-6 (the q77
    * portability stance; ties then break to the smallest code via
    * lexicographic struct min).
    *
    * Returns (id, codes array<tinyint>, rnorm double) where `rnorm` is the
    * reconstruction's norm — free at encode time because subspaces are
    * disjoint coordinate blocks: ||recon||^2 = sum_mi ||cb_mi[code]||^2,
    * a literal lookup per subspace. This is the 100-TB index row: m bytes
    * + one double per vector (vs 8*dim for float64 — 64x smaller lists at
    * m=8, dim=64), and the scoring side never touches the raw vector.
    *
    * RESIDUAL mode (model from [[pqTrainResidual]]): rows are first
    * assigned to their coarse list with the trainLloyd pure-projection
    * argmax (no join), and the argmin key for the residual
    * `||cb||^2 - 2 (x - c).cb` FOLDS ALGEBRAICALLY into
    * `(||cb||^2 + 2 c_sub.cb) - 2 x_sub.cb` — the first term is a
    * per-(list, code) LITERAL, so encoding still runs native dots over
    * the raw slices and never materializes a residual array. The
    * reconstruction is c + r_hat, whose norm is likewise a pure literal
    * lookup: ||c||^2 + sum_mi (2 c_sub.cb[code] + ||cb[code]||^2).
    * Output gains the `cent_id` column (the list is part of the code).
    */
  /** Unsigned decode of a stored 1-byte PQ code into a 1-based
    * `element_at` index. Codes are stored TINYINT (one byte per
    * subspace — the FAISS uint8 list layout) but the JVM byte is
    * signed, so codebooks past k = 128 wrap codes 128..255 to
    * negatives at the storage boundary; `(c + 256) % 256` restores the
    * unsigned code for any k ≤ 256 without widening the stored column
    * (k = 256 is the 8-bit industry-standard codebook size — q220's
    * scaled operating point trains it, and PqCodegenSpec pins the
    * wrap's round-trip). */
  private def codeIdx(c: Column): Column =
    (c.cast("int") + 256) % 256 + 1

  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      model: PqModel): DataFrame = {
    val v = Vec.asDouble(col(vecCol))
    // the argmin itself is the native PqArgmin kernel: a k x ds runtime
    // loop over the literal codebook matrix. The unrolled expression form
    // (array_min over k candidate structs) codegen'd past the JVM's 64 KB
    // method limit on the residual path and dropped the encode projection
    // to interpreted mode.
    // every codebook/centroid/const matrix is ONE nested-array Literal
    // (typedLit), never an array(array(lit…)) tree: constant folding
    // produces the identical Literal anyway, but only after every
    // analyzer/optimizer pass has walked the k·ds (and nlist·k) Literal
    // nodes — at the 8-bit size (m=8, k=256, nlist=64) the r15 encode
    // plan carried ~280k such nodes and spent seconds per pass in tree
    // transforms (measured: q220's writeAnnIndex at 8.7s warm, dropping
    // to the job cost once collapsed). Values are bit-identical.
    def cbMat(mi: Int) = typedLit(model.codebooks(mi).map(_._2))
    model.residualCentroids match {
      case None =>
        val codeCols = model.codebooks.zipWithIndex.map { case (cb, mi) =>
          val sub = slice(v, mi * model.ds + 1, model.ds)
          val consts = typedLit(cb.map { case (_, cv) =>
            cv.map(x => x * x).sum
          })
          graft.expressions.PqArgmin.column(sub, cbMat(mi), consts)
            .as(s"__c$mi")
        }
        val norm2Of = (mi: Int) =>
          element_at(
            typedLit(model.codebooks(mi).map { case (_, cv) =>
              cv.map(x => x * x).sum
            }),
            codeIdx(col(s"__c$mi")))
        df.select(col(idCol).as("id") +: codeCols: _*)
          .select(col("id"),
            array((0 until model.m).map(mi => col(s"__c$mi")): _*).as("codes"),
            sqrt((0 until model.m).map(norm2Of).reduce(_ + _)).as("rnorm"))

      case Some(cents) =>
        def subOf(cv: Seq[Double], mi: Int) =
          cv.slice(mi * model.ds, (mi + 1) * model.ds)
        def dotd(a: Seq[Double], b: Seq[Double]) =
          a.zip(b).map { case (x, y) => x * y }.sum
        // list assignment as a pure projection (trainLloyd's argmax
        // semantics), via the native ArgmaxCosine kernel — the unrolled
        // array_max-over-structs form blew past janino's 64 KB method limit
        // at nlist = 64 once fused with the scan's cast loops, silently
        // dropping the encode to interpreted mode (PqCodegenSpec pins the
        // fix); resolved against the projected __v, not the caller's column
        val assignment = graft.expressions.ArgmaxCosine.column(col("__v"),
          typedLit(cents.map(_._2)))
        // per-(list, code) constant ||cb||^2 + 2 c_sub.cb — one 2-D
        // Literal; the row's list selects its k-wide const row for PqArgmin
        val constsByList = (mi: Int) => typedLit(cents.map { case (_, cv) =>
          model.codebooks(mi).map { case (_, cbv) =>
            dotd(cbv, cbv) + 2.0 * dotd(subOf(cv, mi), cbv)
          }
        })
        val codeCols = (0 until model.m).map { mi =>
          val sub = slice(col("__v"), mi * model.ds + 1, model.ds)
          graft.expressions.PqArgmin.column(sub, cbMat(mi),
            element_at(constsByList(mi), col("cent_id") + 1)).as(s"__c$mi")
        }
        // ||c + r_hat||^2 = ||c||^2 + sum_mi (2 c_sub.cb[code] + ||cb[code]||^2)
        val centNorm2 = typedLit(cents.map { case (_, cv) => dotd(cv, cv) })
        val resTerm = (mi: Int) =>
          element_at(
            element_at(
              typedLit(cents.map { case (_, cv) =>
                model.codebooks(mi).map { case (_, cbv) =>
                  2.0 * dotd(subOf(cv, mi), cbv) + dotd(cbv, cbv)
                }
              }),
              col("cent_id") + 1),
            codeIdx(col(s"__c$mi")))
        df.select(col(idCol).as("id"), v.as("__v"))
          .withColumn("cent_id", assignment)
          .select(Seq(col("id"), col("cent_id")) ++ codeCols: _*)
          .select(col("id"), col("cent_id"),
            array((0 until model.m).map(mi => col(s"__c$mi")): _*).as("codes"),
            sqrt(element_at(centNorm2, col("cent_id") + 1)
              + (0 until model.m).map(resTerm).reduce(_ + _)).as("rnorm"))
    }
  }

  /** Dot of a full-precision vector against the PQ RECONSTRUCTION of
    * `codes`: sum over subspaces of dot(sub, cb_mi[code]) — the
    * sub-centroid is looked up from a literal array-of-arrays, so this is
    * m sub-dots per row with no k-wide table build (contrast the ADC path
    * in [[pqTopK]], which amortizes a k-wide LUT across many candidates
    * per query). Used for reconstruction-fidelity diagnostics (q92);
    * raw-codebook models only (a residual reconstruction also needs the
    * row's list centroid — use [[pqTopK]]'s scoring for that). */
  def pqReconDot(vec: Column, codes: Column, model: PqModel): Column = {
    require(model.residualCentroids.isEmpty,
      "pqReconDot expects a raw-codebook model; residual reconstruction " +
        "needs the row's cent_id too")
    model.codebooks.zipWithIndex.map { case (cb, mi) =>
      val sub = slice(vec, mi * model.ds + 1, model.ds)
      val cvArr = element_at(typedLit(cb.map(_._2)),
        codeIdx(codes.getItem(mi)))
      Vec.dot(sub, cvArr)
    }.reduce(_ + _)
  }

  /** Train PQ codebooks over RESIDUALS x - c(x) against a coarse centroid
    * set (FAISS IVFPQ proper): residuals are what actually sit in an
    * inverted list, so quantizing them instead of raw vectors spends the
    * same m codes on a much tighter distribution — reconstruction
    * c + r_hat is strictly more faithful on clustered data (spec-proved).
    *
    * Deterministic sampled path (`coarseTrainIters = 0`, the graded one):
    * coarse centroids = the `nlist` smallest-id vectors REINDEXED densely
    * 0..nlist-1 in id order; codebook sample = the next `k` smallest-id
    * vectors' residuals (skipping the centroid rows themselves, whose
    * residuals are identically zero and would waste half the codebook).
    * Sample assignment/residuals are computed on the DRIVER with the same
    * (cosine desc, cent_id asc) rule the distributed encode projects —
    * nlist + k rows of metadata, the trainCentroids stance. */
  def pqTrainResidual(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, nlist: Int = 8,
      coarseTrainIters: Int = 0): PqModel = {
    val dim = vecDim(corpus, vecCol)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val ds = dim / m
    def dotd(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val cents: Seq[(Int, Seq[Double])] =
      coarseCentroids(corpus, idCol, vecCol, nlist, coarseTrainIters)
        .select(col("cent_id").cast("long"), Vec.asDouble(col("cent_vec")))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
        .sortBy(_._1)
        .zipWithIndex.map { case ((_, cv), i) => (i, cv) }
    require(cents.nonEmpty, "pqTrainResidual needs a non-empty corpus")
    val sample = corpus
      .select(col(idCol).as("sid"), Vec.asDouble(col(vecCol)).as("__v"))
      .orderBy(col("sid").asc).limit(nlist + k)
      .select(col("__v")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
      .drop(nlist)
    require(sample.nonEmpty, s"pqTrainResidual needs > $nlist corpus rows")
    val residuals = sample.map { vec =>
      val nv = math.sqrt(dotd(vec, vec))
      val best = cents.map { case (cid, cv) =>
        (dotd(vec, cv) / (nv * math.sqrt(dotd(cv, cv))), -cid, cid)
      }.max._3
      vec.zip(cents(best)._2).map { case (x, c) => x - c }
    }
    val codebooks = (0 until m).map(mi =>
      residuals.zipWithIndex.map { case (r, code) =>
        (code, r.slice(mi * ds, (mi + 1) * ds))
      })
    PqModel(m, ds, codebooks, Some(cents))
  }

  /** IVF-PQ ANN: coarse routing as in [[ivfTopK]], inverted lists storing
    * PQ codes, scoring via asymmetric distance computation (ADC): each
    * query precomputes per-subspace lookup tables
    * `lut_mi[code] = dot(q_sub_mi, cb_mi[code])` (m * k doubles, computed
    * once per query row), and a candidate's dot estimate is
    * `sum_mi lut_mi[codes[mi]]` — a pure per-pair expression over the
    * byte codes, no per-pair array materialization (the [[ivfTopKQuantized]]
    * lesson). Queries stay full precision; the only approximation vs
    * [[ivfTopK]] is PQ reconstruction error plus IVF recall.
    *
    * Ranking is on the ROUNDED cosine (6, then neighbor id): PQ code
    * collisions make exact score ties COMMON (any two corpus vectors with
    * identical codes score identically), and rounding before ranking is
    * what keeps the order restatable by an independent engine. */
  def pqTopK(corpus: DataFrame, corpusIdCol: String, corpusVecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, model: PqModel, nlist: Int = 16, nprobe: Int = 4,
      trainIters: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // residual mode: the model's own (dense-indexed) centroid set IS the
    // routing table — encode already assigns lists, and the candidate dot
    // decomposes as dot(q, c_list) + ADC dot of the residual codes
    val centroids = model.residualCentroids match {
      case Some(cents) =>
        cents.map { case (cid, cv) => (cid.toLong, cv) }
          .toDF("cent_id", "cent_vec")
      case None =>
        coarseCentroids(corpus, corpusIdCol, corpusVecCol, nlist, trainIters)
    }
    // both index sides sit behind a materialization barrier so the encode
    // expressions can never defer into the candidate join's match loop
    // regardless of which side AQE streams: the residual index (which
    // carries its own cent_id) is repartitioned BY LIST — the production
    // index layout, see BucketingSpec — and the raw index rides the
    // routing window via an id-join whose build side materializes it
    val enc = pqEncode(corpus, corpusIdCol, corpusVecCol, model)
    val c = model.residualCentroids match {
      case Some(_) => enc.repartition(col("cent_id"))
      case None => routeToLists(corpus, corpusIdCol, corpusVecCol,
          centroids, 1)
        .select(col("id"), col("cent_id"))
        .join(enc, "id")
        .repartition(col("cent_id"))
    }
    pqProbeLists(c, queries, queryIdCol, queryVecCol, k, model,
      centroids, nprobe)
  }

  /** The shared IVF-PQ probe: score `queries` against an encoded,
    * cent_id-partitioned list frame `c` (id, cent_id, codes, rnorm) —
    * either [[pqTopK]]'s inline encode behind its repartition barrier or
    * a persisted [[AnnIndex]] table arriving bucket-partitioned from
    * disk. One definition so the inline and persisted paths can never
    * diverge on scoring (the [[coarseCentroids]] single-definition
    * stance). */
  private def pqProbeLists(c: DataFrame, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, k: Int, model: PqModel,
      centroids: DataFrame, nprobe: Int): DataFrame = {
    // The k-wide LUTs (and qnrm / the residual dot(q, c_list)) are
    // computed BELOW the routing window, so the window's sort materializes
    // them into rows and the candidate join only READS them. Computing
    // them after routing looks equivalent but is a trap: whole-stage
    // codegen defers a broadcast-hash-join's streamed-side columns that
    // are not join keys to their first use — which sits inside the
    // per-match loop, so the 128-dot LUT build re-ran PER CANDIDATE
    // (measured 6x the whole query at sf0.1; materializing the probe side
    // dropped it right back).
    // native LUT kernel (PqLut): the unrolled array(k x VecDot) form
    // codegens k dot trees per subspace and dies in janino at the 8-bit
    // codebook size (k = 256, m = 8 -> 2048 inlined dots); the kernel
    // runs the k x ds loop at runtime over the literal matrix —
    // bit-identical entries, one static call per subspace at any k
    val lutCols = model.codebooks.zipWithIndex.map { case (cb, mi) =>
      val qsub = slice(col("vec"), mi * model.ds + 1, model.ds)
      // one nested-array Literal, not k·ds CreateArray nodes (see pqEncode)
      val cbMat = typedLit(cb.map(_._2))
      graft.expressions.PqLut.column(qsub, cbMat).as(s"__lut$mi")
    }
    // residual mode adds dot(q, c_list), against the broadcast centroid
    // row (same values as the model's literals, computed per probed pair
    // below the window)
    val qcDot = model.residualCentroids match {
      case Some(_) => Vec.dot(col("vec"), col("cent_vec")).as("__qc")
      case None => lit(0.0).as("__qc")
    }
    val qScored = queries
      .select(col(queryIdCol).as("id"), Vec.asDouble(col(queryVecCol)).as("vec"))
      .select(Seq(col("id"), col("vec"),
        Vec.norm(col("vec")).as("qnrm")) ++ lutCols: _*)
      .join(broadcast(centroids))
      .select(col("id"), col("cent_id"), col("qnrm"), qcDot,
        Vec.cosine(col("vec"), col("cent_vec")).as("cent_sim"),
        struct((0 until model.m).map(mi => col(s"__lut$mi")): _*).as("__luts"))
    val wq = Window.partitionBy(col("id"))
      .orderBy(col("cent_sim").desc, col("cent_id").asc)
    val q = qScored.withColumn("r", row_number().over(wq))
      .filter(col("r") <= nprobe)
      // the join key's type must match the LIST side exactly: a widening
      // cast lands on the list side otherwise, which both disables a
      // persisted index's bucketed scan (exchange-free probes are the
      // point of AnnIndex) and made the inline path's cent_id
      // repartition fail to satisfy the join's distribution — an extra
      // full-corpus exchange (AnnIndexSpec pins the plan)
      .select(Seq(col("id"),
        col("cent_id").cast(c.schema("cent_id").dataType).as("cent_id"),
        col("qnrm"), col("__qc")) ++
        (0 until model.m).map(mi =>
          col("__luts").getField(s"__lut$mi").as(s"__lut$mi")): _*)

    val adcDot = (0 until model.m).map(mi =>
      element_at(col(s"__lut$mi"), codeIdx(col("codes").getItem(mi))))
      .reduce(_ + _) + col("q.__qc")
    val cand = c.as("c")
      .join(q.as("q"),
        col("c.cent_id") === col("q.cent_id") && col("c.id") =!= col("q.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        round(Vec.cosineFromParts(adcDot, col("q.qnrm"), col("c.rnorm")), 6)
          .as("cosine"))
    // no distinct(): single-list corpus rows, same reasoning as ivfTopK

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ------------------------------------------------- persisted IVF-PQ index

  /** Metadata of a persisted ANN index: the full residual [[PqModel]]
    * (coarse centroids + per-subspace codebooks — driver-metadata-sized,
    * the [[trainCentroids]] stance) plus the storage bucket count.
    * Probes MUST score with the identical model or codes silently decode
    * against the wrong codebooks — [[readAnnIndex]] replays it from the
    * index's own meta file, exactly the LshIndexMeta contract. */
  case class AnnIndexMeta(model: PqModel, numBuckets: Int)

  /** Handle to a persisted IVF-PQ ANN index: ONE bucketed catalog table
    * `{name}_lists` (id, cent_id, codes, rnorm) CLUSTERED BY cent_id —
    * the inverted-list layout, so a probe joins it with NO exchange on
    * the index side (only the query side shuffles) — plus the model
    * meta. Generations/markers/tombstones follow the [[Dedup.LshIndex]]
    * discipline ([[IndexGen]]). This is the production ANN shape at
    * 100 TB: the lists hold m one-byte codes + one double per vector
    * (64x smaller than float64 at m=8, dim=64), the index is written
    * once and probed/appended per ingest, and nothing ever re-encodes
    * or re-shuffles the corpus side. */
  case class AnnIndex(name: String, path: String, meta: AnnIndexMeta,
      gen: Int = 0) {
    def listsTable: String = s"${name}_lists"
    def listsDir: String = IndexGen.dirFor(path, "lists", gen)
  }

  /** The production IVF sizing rule: `nlist` grows with the SQUARE ROOT
    * of the corpus (the standard IVF design point — per-list length and
    * list count balance at √n, so probe cost and routing cost stay
    * O(√n) together; FAISS's guidelines prescribe the same shape),
    * rounded UP to a power of two for stable bucket layouts. A fixed
    * `nlist` silently degrades either recall (lists too long — the
    * candidate cut truncates true neighbors) or probe cost (too many
    * near-empty lists) as the corpus grows; q220 grades this rule's
    * operating point (nprobe = 3·nlist/4, the q217 fraction) at every
    * corpus scale under the oracle, with a hard recall@10 ≥ 0.9 floor.
    * At the testdata scales: 500 → 32, 2 000 → 64 (q217's graded
    * point), 20 000 → 256, 10⁹ → 65 536 — all driver-metadata-sized
    * (nlist·dim doubles) far below corpus scale. */
  def scaledNlist(n: Long, minLists: Int = 16): Int = {
    require(n > 0, "scaledNlist needs a positive corpus size")
    val s = math.sqrt(n.toDouble)
    var p = minLists
    while (p < s && p < (1 << 30)) p <<= 1
    p
  }

  /** Build and PERSIST an IVF-PQ index: train the residual model
    * ([[pqTrainResidual]] — deterministic sampled path), encode the
    * corpus ([[pqEncode]]), and write the lists bucketed by cent_id
    * (one file per bucket — the repartition uses bucketing's own hash),
    * with the model serialized to `meta.json`. Overwrites any prior
    * index at `path` (including stale generations and tombstones). */
  def writeAnnIndex(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, name: String, m: Int = 8, k: Int = 16,
      nlist: Int = 64, numBuckets: Int = 16,
      coarseTrainIters: Int = 0): AnnIndex = {
    require(corpus.schema(corpus.schema.fieldIndex(idCol)).dataType ==
      org.apache.spark.sql.types.LongType,
      "persisted index ids must be BIGINT (cross-session DDL)")
    val spark = corpus.sparkSession
    val model = pqTrainResidual(corpus, idCol, vecCol, m, k, nlist,
      coarseTrainIters)
    val idx = AnnIndex(name, path, AnnIndexMeta(model, numBuckets))
    spark.sql(s"DROP TABLE IF EXISTS ${idx.listsTable}")
    IndexGen.cleanAll(spark, path, Seq("lists"))
    pqEncode(corpus, idCol, vecCol, model)
      .repartition(numBuckets, col("cent_id"))
      .write.mode("overwrite")
      .bucketBy(numBuckets, "cent_id")
      .option("path", idx.listsDir)
      .saveAsTable(idx.listsTable)
    IndexGen.commitManifest(spark, idx.listsDir)
    writeAnnMeta(spark, s"$path/meta.json", idx.meta)
    idx
  }

  /** Open a persisted ANN index from `path`: replay the model from
    * meta.json, resolve the newest committed compaction generation, and
    * register (or re-point) the bucketed catalog table — the
    * [[Dedup.readLshIndex]] contract. */
  def readAnnIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      name: String): AnnIndex = {
    val meta = readAnnMeta(spark, s"$path/meta.json")
    val idx = AnnIndex(name, path, meta,
      gen = IndexGen.resolveGen(spark, path))
    // open-time recovery: drop a torn batch append's leftover files
    IndexGen.repairToManifest(spark, idx.listsDir)
    registerAnnTable(spark, idx)
    idx
  }

  private def registerAnnTable(spark: org.apache.spark.sql.SparkSession,
      idx: AnnIndex): Unit =
    IndexGen.ensureTable(spark, idx.listsTable, idx.listsDir,
      s"""CREATE TABLE ${idx.listsTable}
         |(id BIGINT, cent_id INT, codes ARRAY<TINYINT>, rnorm DOUBLE)
         |USING parquet
         |CLUSTERED BY (cent_id) INTO ${idx.meta.numBuckets} BUCKETS
         |LOCATION '${idx.listsDir}'""".stripMargin)

  /** Top-k ANN through the PERSISTED index: identical scoring to
    * [[pqTopK]] (the shared [[pqProbeLists]] — LUT ADC, round-6
    * ranking), with the corpus side read from the bucketed lists table:
    * pre-partitioned on exactly the join key, so the probe plan carries
    * ONE exchange (the query side; AnnIndexSpec pins it). Tombstoned ids
    * are filtered by a broadcast anti-join that preserves the bucketed
    * partitioning. */
  def probeAnnIndex(index: AnnIndex, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, k: Int,
      nprobe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val model = index.meta.model
    val cents = model.residualCentroids.getOrElse(
      throw new IllegalStateException("AnnIndex meta must carry a " +
        "residual model"))
    val centroids = cents.map { case (cid, cv) => (cid.toLong, cv) }
      .toDF("cent_id", "cent_vec")
    val c = IndexGen.live(spark.table(index.listsTable),
      IndexGen.tombstones(spark, index.path))
    pqProbeLists(c, queries, queryIdCol, queryVecCol, k, model,
      centroids, nprobe)
  }

  /** The PRODUCTION-RECALL probe over the persisted index: ADC
    * candidate generation at `candK` ([[probeAnnIndex]]'s exchange-free
    * bucketed probe, unchanged) followed by EXACT re-ranking against the
    * original vectors — the standard fetch-and-rescore step (IVFADC+R,
    * Jégou et al. 2011 §III-D). Quantization error leaves the operating
    * point entirely; what remains is IVF routing loss alone, which
    * `nprobe` buys down directly (the measured recall-vs-nprobe curve is
    * in PLANS.md round 15; at nlist=64 on the isotropic synthetic
    * corpus, raw ADC\@nprobe=4 sits at mean recall\@10 ≈ 0.33 while
    * rerank\@nprobe=16 clears 0.8).
    *
    * Scale shape: the candidate set is |queries| · candK (id, id) rows —
    * broadcast into the vector corpus's scan, so the original-vector
    * fetch is a broadcast hash join against the id-keyed `vectors`
    * table, never a corpus-wide shuffle; queries themselves broadcast as
    * in every probe. Output contract matches [[probeAnnIndex]]:
    * (query_id, neighbor_id, cosine, rank), rank by round-6 exact cosine
    * then neighbor id. */
  def probeAnnIndexRerank(index: AnnIndex, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, k: Int,
      vectors: DataFrame, vecIdCol: String, vecCol: String,
      nprobe: Int = 16, candK: Int = 50): DataFrame = {
    val cands = probeAnnIndex(index, queries, queryIdCol, queryVecCol,
        candK, nprobe)
      .select(col("query_id"), col("neighbor_id"))
    val qv = queries.select(col(queryIdCol).cast("long").as("query_id"),
      Vec.asDouble(col(queryVecCol)).as("__qv"),
      Vec.norm(Vec.asDouble(col(queryVecCol))).as("__qn"))
    val cv = vectors.select(col(vecIdCol).cast("long").as("neighbor_id"),
      Vec.asDouble(col(vecCol)).as("__cv"),
      Vec.norm(Vec.asDouble(col(vecCol))).as("__cn"))
    val scored = cv
      .join(broadcast(cands), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Vec.cosineFromParts(Vec.dot(col("__qv"), col("__cv")),
          col("__qn"), col("__cn")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Absorb new vectors INTO the persisted index: encode with the
    * PERSISTED model (never retrained — codes must stay decodable
    * against the index's codebooks) and append bucketed files, which the
    * bucketed scan groups back into the same partitions (no probe-plan
    * regression; compaction is the small-files counter-move). Caller
    * contract: appended ids disjoint from indexed ids. Holds the
    * [[IndexGen.withWriterLock]] lease: commitManifest snapshots the
    * directory's CURRENT file set, so a concurrent append would have its
    * half-written files legitimized by this one's commit — under the
    * lease it fails loudly instead.
    *
    * `batchTag` makes a RETRIED append exactly-once (the streaming
    * replay path): the tag commits atomically with the manifest, and a
    * retry whose tag already heads the newest manifest appends nothing.
    * This matters for probe CORRECTNESS, not just index size — a
    * duplicated list row gives the same neighbor two of the top-k ranks
    * until compaction. Untagged appends keep at-least-once semantics. */
  def appendToAnnIndex(index: AnnIndex, batch: DataFrame, idCol: String,
      vecCol: String, batchTag: Option[String] = None): Unit = {
    require(batch.schema(batch.schema.fieldIndex(idCol)).dataType ==
      org.apache.spark.sql.types.LongType,
      "persisted index ids must be BIGINT")
    val spark = batch.sparkSession
    IndexGen.withWriterLock(spark, index.path) {
      // manifest protocol (IndexGen): repair any previous torn append,
      // then commit this one's file set only after the data write
      // completes — a crash in between leaves files the next
      // open/append repairs away
      IndexGen.repairToManifest(spark, index.listsDir)
      val done = batchTag.isDefined &&
        IndexGen.manifestTag(spark, index.listsDir) == batchTag
      if (!done) {
        pqEncode(batch, idCol, vecCol, index.meta.model)
          .repartition(index.meta.numBuckets, col("cent_id"))
          .write.mode("append")
          .bucketBy(index.meta.numBuckets, "cent_id")
          .option("path", index.listsDir)
          .saveAsTable(index.listsTable)
        IndexGen.commitManifest(spark, index.listsDir, batchTag)
      }
    }
  }

  /** Retract vectors: id tombstones hide them from probes immediately
    * ([[IndexGen.appendTombstones]]); the rows leave the files at the
    * next [[compactAnnIndex]]. Re-adding a retracted id requires a
    * compaction first (the tombstone filters by id, not file age).
    * Leased like every other mutation: a tombstone landing between a
    * compaction's tombstones read and its clearTombstones would be
    * silently dropped. */
  def retractFromAnnIndex(index: AnnIndex, ids: DataFrame,
      idCol: String): Unit =
    IndexGen.withWriterLock(ids.sparkSession, index.path) {
      IndexGen.appendTombstones(index.path, ids, idCol)
    }

  /** Compact the lists table: rewrite into the next generation with the
    * same bucket spec — one file per bucket — applying and clearing
    * tombstones; commit-marker + retention per [[IndexGen]]. Same
    * crash-safety and single-writer contract as
    * [[Dedup.compactLshIndex]]. */
  def compactAnnIndex(spark: org.apache.spark.sql.SparkSession,
      index: AnnIndex): AnnIndex =
    IndexGen.withWriterLock(spark, index.path) {
      val next = index.copy(
        gen = IndexGen.nextGen(spark, index.path, Seq("lists"), index.gen))
      IndexGen.fs(spark, index.path)
        .delete(new org.apache.hadoop.fs.Path(next.listsDir), true)
      IndexGen.rewriteBucketed(spark, index.listsDir, next.listsDir,
        s"${index.name}_lists_compacting", index.meta.numBuckets,
        Seq("cent_id"), IndexGen.tombstones(spark, index.path))
      IndexGen.writeMarker(spark, index.path, next.gen)
      spark.sql(s"DROP TABLE IF EXISTS ${index.listsTable}")
      registerAnnTable(spark, next)
      IndexGen.clearTombstones(spark, index.path)
      IndexGen.sweepOld(spark, index.path, Seq("lists"), next.gen)
      next
    }

  /** Compact only when appends have fragmented the lists: if the
    * fullest bucket holds more than `maxFilesPerBucket` files, run
    * [[compactAnnIndex]]; otherwise return the handle unchanged — the
    * [[Dedup.maybeCompactLshIndex]] trigger for the ANN ingest loop
    * ([[graft.streaming.VecStream.ingestAnnStream]]). */
  def maybeCompactAnnIndex(spark: org.apache.spark.sql.SparkSession,
      index: AnnIndex, maxFilesPerBucket: Int): AnnIndex =
    if (IndexGen.maxFilesPerBucket(spark, index.listsDir)
        > maxFilesPerBucket)
      compactAnnIndex(spark, index)
    else index

  /** meta.json codec for [[AnnIndexMeta]] — hand-rolled like the
    * LshIndexMeta one (no JSON library on the engine classpath). Doubles
    * round-trip exactly through Double.toString/parseDouble. Layout:
    * scalars + `cents` (rows ';'-joined, components ' '-joined; row
    * index = dense cent_id) + `codebooks` (subspaces '|'-joined, each
    * k rows ';'-joined; row index = code). */
  private def writeAnnMeta(spark: org.apache.spark.sql.SparkSession,
      file: String, meta: AnnIndexMeta): Unit = {
    val m = meta.model
    require(m.residualCentroids.nonEmpty,
      "persisted ANN indexes store residual models")
    def row(v: Seq[Double]) = v.map(_.toString).mkString(" ")
    val cents = m.residualCentroids.get.map(c => row(c._2)).mkString(";")
    val cbs = m.codebooks.map(_.map(c => row(c._2)).mkString(";"))
      .mkString("|")
    val body = s"""{"m":${m.m},"ds":${m.ds},""" +
      s""""numBuckets":${meta.numBuckets},""" +
      s""""cents":"$cents","codebooks":"$cbs"}"""
    val p = new org.apache.hadoop.fs.Path(file)
    val out = IndexGen.fs(spark, file).create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  private def readAnnMeta(spark: org.apache.spark.sql.SparkSession,
      file: String): AnnIndexMeta = {
    val p = new org.apache.hadoop.fs.Path(file)
    val in = IndexGen.fs(spark, file).open(p)
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def field(n: String): String =
      ("\"" + n + "\":\"?([^\",}]*)\"?").r.findFirstMatchIn(body)
        .getOrElse(throw new IllegalArgumentException(
          s"AnnIndex meta missing field $n in $file")).group(1)
    def rows(s: String): Seq[Seq[Double]] =
      s.split(";").toSeq.map(_.split(" ").toSeq.map(_.toDouble))
    val cents = rows(field("cents")).zipWithIndex
      .map { case (v, i) => (i, v) }
    val cbs = field("codebooks").split("\\|").toSeq.map(b =>
      rows(b).zipWithIndex.map { case (v, i) => (i, v) })
    AnnIndexMeta(
      PqModel(field("m").toInt, field("ds").toInt, cbs, Some(cents)),
      field("numBuckets").toInt)
  }

  /** k-center greedy (farthest-point) coreset selection — Gonzalez 1985
    * max-min seeding, the coreset selector of Sener & Savarese 2018
    * (public). Fully deterministic, so oracle-gradable: the first center is
    * the max-norm vector (smallest id on ties), each next center the point
    * farthest (squared euclidean) from its nearest already-chosen center.
    *
    * Scale shape: k driver rounds, each ONE corpus scan ending in a 1-row
    * `max_by` aggregate (partial-agg combinable — no shuffle of the corpus,
    * no window). Chosen centers fold back in as k x dim LITERALS, so the
    * per-row min-distance is pure expression work inside codegen. Distances
    * round to 9 before every argmax/argmin (the k-means iterate canon) so
    * selection is engine-portable.
    *
    * @return centers in selection order: (rank starting at 1, id, vec)
    */
  def kCenterGreedy(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[(Int, Long, Seq[Double])] = {
    require(k >= 1, s"need k >= 1 centers, got $k")
    val base = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("x"))
    def pick(scored: DataFrame): Option[(Long, Seq[Double])] = {
      // maximize (d2r, -id): farthest point, smallest id on ties
      val r = scored
        .agg(max_by(struct(col("id"), col("x")),
          struct(col("d2r"), -col("id"))).as("w"))
        .head()
      if (r.isNullAt(0)) None
      else {
        val s = r.getStruct(0)
        Some((s.getLong(0), s.getSeq[Double](1)))
      }
    }
    val first = pick(base.withColumn("d2r", round(Vec.norm2(col("x")), 9)))
    var centers = first.map { case (id, v) => (1, id, v) }.toList
    var rank = 2
    var exhausted = centers.isEmpty
    while (rank <= k && !exhausted) {
      val minD2 = centers.map { case (_, _, c) =>
        val cl = typedLit(c)
        Vec.norm2(col("x")) - lit(2.0) * Vec.dot(col("x"), cl) +
          lit(c.map(x => x * x).sum)
      }.reduce(least(_, _))
      // max-min distance 0 means every remaining point duplicates a chosen
      // center (a center is always at distance 0 from itself) — adding it
      // covers nothing, so greedy stops early (Gonzalez termination)
      pick(base.withColumn("d2r", round(minD2, 9))
          .filter(col("d2r") > 0)) match {
        case Some((id, v)) => centers = centers :+ ((rank, id, v)); rank += 1
        case None => exhausted = true
      }
    }
    centers
  }

  /** Assign every corpus vector to its nearest [[kCenterGreedy]] center —
    * expression-only (centers are literals; earlier rank wins distance
    * ties), zero shuffle, zero join. Returns
    * (id, center_rank, center_id, d2) with d2 rounded to 9. */
  def kCenterAssign(corpus: DataFrame, idCol: String, vecCol: String,
      centers: Seq[(Int, Long, Seq[Double])]): DataFrame = {
    require(centers.nonEmpty, "no centers")
    val base = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("x"))
    val scored = centers.foldLeft(base
      .withColumn("center_rank", lit(-1))
      .withColumn("center_id", lit(-1L))
      .withColumn("d2", lit(Double.MaxValue))) {
      case (df, (rank, cid, c)) =>
        val cl = typedLit(c)
        val d2 = round(Vec.norm2(col("x")) -
          lit(2.0) * Vec.dot(col("x"), cl) + lit(c.map(x => x * x).sum), 9)
        // strict less: the earlier (lower-rank) center keeps ties
        df.withColumn("center_rank",
            when(d2 < col("d2"), lit(rank)).otherwise(col("center_rank")))
          .withColumn("center_id",
            when(d2 < col("d2"), lit(cid)).otherwise(col("center_id")))
          .withColumn("d2", when(d2 < col("d2"), d2).otherwise(col("d2")))
    }
    scored.select(col("id"), col("center_rank"), col("center_id"), col("d2"))
  }

  /** Margin-based parallel-pair mining (Artetxe & Schwenk 2019, "Margin-
    * based Parallel Corpus Mining with Multilingual Sentence Embeddings" —
    * the LASER/CCMatrix bitext recipe): a candidate pair's score is its
    * cosine RELATIVE to each side's neighborhood density,
    *
    *   margin(x, y) = cos(x, y) / ((avgk(x) + avgk(y)) / 2)
    *
    * with avgk = mean cosine of the point's k nearest neighbors in the
    * OTHER set (the "ratio" margin). Hub points — similar to everything —
    * get discounted; a pair wins on being MUTUALLY exceptional, which is
    * why margin beats raw cosine for mining aligned pairs.
    *
    * Returns the best `b` partner per `a` row: (a_id, b_id, cosine,
    * margin), cosine/margin rounded to 6, ties on rounded margin broken by
    * b_id. Candidates and avgk are both restricted to each side's top-k
    * frame (the paper's retrieve-then-score shape).
    *
    * Scale posture: candidate generation here is [[bruteForceTopK]] (exact,
    * |a| broadcast) — at index scale swap in [[ivfTopK]]/[[lshTopK]]/
    * [[pqTopK]] for either direction; everything downstream is top-k-frame
    * joins and per-id partial aggs, shuffled on the pair ids only, plus a
    * per-a-id window over <= k candidate rows. */
  /** Hard-negative mining for contrastive / retrieval training (Karpukhin
    * et al. 2020, DPR §3.2 — "in-batch + hard negatives"; Xiong et al.
    * 2021, ANCE): for each anchor, the best same-label neighbor is the
    * mined positive and the top different-label neighbors — near in
    * embedding space but wrong by label — are the hard negatives that make
    * the contrastive gradient informative (random negatives are too easy).
    *
    * Per anchor, from its `kCand` nearest candidates: the single
    * highest-cosine same-label candidate (`role` = 'pos', if any same-label
    * candidate made the cut) and the `kNeg` highest-cosine different-label
    * candidates ('neg'). `rnk` orders within role; cosine rounded to 6.
    *
    * Scale posture: candidate generation is [[bruteForceTopK]] (the exact
    * verifier — swap [[ivfTopK]]/[[pqTopK]] at index scale, the q35/q93
    * composition); everything downstream touches only the
    * |anchors| x kCand candidate frame — one corpus-label hash join keyed
    * on candidate id, a broadcast anchor-label join, and per-anchor
    * windows over <= kCand rows. */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, anchors: DataFrame, anchorIdCol: String,
      anchorVecCol: String, anchorLabelCol: String,
      kNeg: Int = 3, kCand: Int = 32): DataFrame = {
    val cands = bruteForceTopK(corpus, idCol, vecCol,
      anchors, anchorIdCol, anchorVecCol, kCand)
    val nl = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("n_label"))
    val al = anchors.select(col(anchorIdCol).as("query_id"),
      col(anchorLabelCol).as("a_label"))
    val roled = cands
      .join(nl, "neighbor_id").join(broadcast(al), "query_id")
      .withColumn("role",
        when(col("n_label") === col("a_label"), "pos").otherwise("neg"))
    val w = Window.partitionBy(col("query_id"), col("role"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    roled.withColumn("rnk", row_number().over(w).cast("long"))
      .filter((col("role") === "pos" && col("rnk") === 1) ||
        (col("role") === "neg" && col("rnk") <= kNeg))
      .select(col("query_id").as("anchor_id"), col("role"), col("rnk"),
        col("neighbor_id").as("cand_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  def marginMining(a: DataFrame, aIdCol: String, aVecCol: String,
      b: DataFrame, bIdCol: String, bVecCol: String,
      k: Int = 4): DataFrame = {
    val ab = bruteForceTopK(b, bIdCol, bVecCol, a, aIdCol, aVecCol, k)
    val ba = bruteForceTopK(a, aIdCol, aVecCol, b, bIdCol, bVecCol, k)
    val aAvg = ab.groupBy(col("query_id").as("a_id"))
      .agg(avg(col("cosine")).as("a_avgk"))
    val bAvg = ba.groupBy(col("query_id").as("b_id"))
      .agg(avg(col("cosine")).as("b_avgk"))
    val scoredPairs = ab
      .select(col("query_id").as("a_id"), col("neighbor_id").as("b_id"),
        col("cosine"))
      .join(aAvg, "a_id").join(bAvg, "b_id")
      .withColumn("margin", round(col("cosine")
        / ((col("a_avgk") + col("b_avgk")) / 2), 6))
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("margin").desc, col("b_id").asc)
    scoredPairs.withColumn("brn", row_number().over(w))
      .filter(col("brn") === 1)
      .select(col("a_id"), col("b_id"), round(col("cosine"), 6).as("cosine"),
        col("margin"))
  }
}
