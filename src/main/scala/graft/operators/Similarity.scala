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
    Seq.fill(n)(array((0 until dim).map(_ => lit(rnd.nextGaussian())): _*))
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
    * DIMENSION LIMIT: the assignment projection embeds nlist x dim literal
    * doubles into the plan (one `array(lit...)` per centroid). Fine at the
    * tested sizes, but at production embedding dims (e.g. 768 x 64 lists =
    * ~50k literals) this bloats analysis/codegen past comfortable limits —
    * past roughly nlist*dim > 10k switch to broadcasting the centroid
    * matrix and scoring via a typed map (the MLlib stance), trading the
    * pure-projection plan for a broadcast variable. */
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
      nlist: Int, iters: Int): Seq[DataFrame] = {
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
    for (_ <- 0 until iters if cents.nonEmpty) {
      // (cosine, -cent_id, cent_id) structs; array_max's lexicographic
      // struct order = best similarity, smallest cent_id on ties
      val candidates = array(cents.map { case (cid, v) =>
        val centCol = array(v.map(lit): _*)
        struct(Vec.cosine(col("__v"), centCol).as("sim"),
          lit(-cid).as("neg"), lit(cid).as("cent_id"))
      }: _*)
      val assigned = corpus
        .select(Vec.asDouble(col(vecCol)).as("__v"))
        .select(col("__v"),
          array_max(candidates).getField("cent_id").as("cent_id"))
      cents = assigned
        .groupBy(col("cent_id"))
        .agg(Vec.sumAgg(col("__v")).as("s"), count(lit(1)).as("n"))
        .select(col("cent_id"),
          transform(col("s"), x => round(x / col("n"), 6)).as("cent_vec"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
        .sortBy(_._1)
      history += cents.toDF("cent_id", "cent_vec")
    }
    val out = history.result()
    out ++ Seq.fill(iters + 1 - out.length)(out.last)
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
    * best. Returns `(id, vec, cent_id)`. */
  private def routeToLists(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, nProbe: Int): DataFrame = {
    val scored = df.join(broadcast(centroids))
      .select(col(idCol).as("id"), col(vecCol).as("vec"), col("cent_id"),
        Vec.cosine(col(vecCol), col("cent_vec")).as("cent_sim"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cent_sim").desc, col("cent_id").asc)
    scored.withColumn("r", row_number().over(w))
      .filter(col("r") <= nProbe)
      .select(col("id"), col("vec"), col("cent_id"))
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
    // norms computed AFTER routing (once per surviving row), so candidate
    // scoring is one array traversal per pair
    val c = routeToLists(corpus, corpusIdCol, corpusVecCol, centroids, 1)
      .withColumn("nrm", Vec.norm(col("vec")))
    val q = routeToLists(queries, queryIdCol, queryVecCol, centroids, nprobe)
      .withColumn("nrm", Vec.norm(col("vec")))

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

    // corpus lists: int8 codes + per-vector scale + dequantized norm (norm
    // precomputed here so candidate scoring is one array traversal)
    val scale = array_max(transform(col("vec"), x => abs(x))) / lit(127.0)
    val c = routeToLists(corpus, corpusIdCol, corpusVecCol, centroids, 1)
      .withColumn("scale", scale)
      .select(col("id"), col("cent_id"), col("scale"),
        transform(col("vec"), x =>
          when(col("scale") > 0.0, floor(x / col("scale") + lit(0.5)))
            .otherwise(lit(0.0)).cast("tinyint")).as("code"))
      .withColumn("nrm",
        Vec.norm(transform(col("code"), b => b.cast("double") * col("scale"))))

    val q = routeToLists(queries, queryIdCol, queryVecCol, centroids, nprobe)
      .withColumn("nrm", Vec.norm(col("vec")))

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
}
