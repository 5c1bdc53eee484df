package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4: the dedup empty-key group is the known
  * hot key; at 100 TB any groupBy/join key can be Zipfian).
  *
  * Two mechanisms:
  *  - AQE handles skewed JOINS automatically (skew-join splitting is on by
  *    default; nothing to do in code).
  *  - Skewed AGGREGATIONS over algebraic functions decompose manually:
  *    salt the key, partially aggregate (key, salt), then merge per key —
  *    the hot key's rows spread over `numSalts` reducers in phase 1 and
  *    only |keys| x numSalts partial rows reach phase 2.
  *
  * (Spark's own partial aggregation already does this when upstream
  * partitioning is random; explicit salting matters when the input is
  * ALREADY hash-partitioned by the hot key — e.g. right after a keyed
  * shuffle — or for high-cardinality partial-agg-defeating layouts.)
  */
object Skew {

  case class SaltedAgg(partial: Column, merge: String => Column, name: String)

  /** count + sum decomposition, the common case. */
  def countAndSum(value: Column): Seq[SaltedAgg] = Seq(
    SaltedAgg(count(lit(1)), c => sum(col(c)), "count"),
    SaltedAgg(sum(value), c => sum(col(c)), "sum"))

  /** Salted two-phase aggregation: results are identical to
    * `df.groupBy(key).agg(...)` for algebraic aggregates, with the hot key
    * spread over `numSalts` phase-1 groups. */
  def saltedAggregate(df: DataFrame, key: Column, numSalts: Int,
      aggs: Seq[SaltedAgg]): DataFrame = {
    // salt must be DETERMINISTIC under task retry: monotonically_increasing_id
    // depends on row order within a task attempt, so a phase-1 task recomputed
    // after a fetch failure could re-salt rows differently and corrupt the
    // merged aggregates. Hash(row content, partition id) is retry-stable —
    // a retried task recomputes the same partition, so every row re-hashes to
    // the same salt — while byte-identical duplicates of a hot key (the most
    // common real skew shape) still spread: copies living in different input
    // partitions land in different salt groups.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(
        (df.columns.map(c => col(s"`$c`")) :+ spark_partition_id()).toSeq: _*),
        lit(numSalts.toLong)))
    val phase1 = salted.groupBy(key.as("__key"), col("__salt"))
      .agg(aggs.head.partial.as(s"__p0"),
        aggs.tail.zipWithIndex.map { case (a, i) =>
          a.partial.as(s"__p${i + 1}")
        }: _*)
    phase1.groupBy(col("__key"))
      .agg(aggs.head.merge("__p0").as(aggs.head.name),
        aggs.tail.zipWithIndex.map { case (a, i) =>
          a.merge(s"__p${i + 1}").as(a.name)
        }: _*)
      .withColumnRenamed("__key", "key")
  }

  /** Join-explosion audit — the planning pass BEFORE a big equi-join: for
    * every key present on both sides, the join's output is n_left *
    * n_right rows, all landing on one reducer under plain hash
    * partitioning. This planner computes that product per key from two
    * count aggregates (map-side combined; the inputs are never joined),
    * flags keys whose output exceeds `targetRowsPerTask`, and sizes the
    * salt factor ceil(out_rows / target) that AQE's skew-join splitting —
    * or an explicit salted replicate-join — would need. The share column
    * (key's fraction of total join output) is the "curse of the last
    * reducer" number: a single key near 1.0 means the join IS that key.
    *
    * Returns the top `topK` keys by output rows: (key, n_left, n_right,
    * out_rows, share, needs_salt, salt_factor). */
  def joinSkewPlan(left: DataFrame, right: DataFrame, key: String,
      targetRowsPerTask: Long, topK: Int): DataFrame = {
    require(targetRowsPerTask > 0, "targetRowsPerTask must be positive")
    val l = left.groupBy(col(key)).agg(count(lit(1)).as("n_left"))
    val r = right.groupBy(col(key)).agg(count(lit(1)).as("n_right"))
    val per = l.join(r, Seq(key))
      .withColumn("out_rows", col("n_left") * col("n_right"))
    val tot = per.agg(sum(col("out_rows")).as("total_out"))
    per.crossJoin(broadcast(tot))
      .select(col(key), col("n_left"), col("n_right"), col("out_rows"),
        round(col("out_rows").cast("double") / col("total_out"), 6)
          .as("share"),
        (col("out_rows") > targetRowsPerTask).as("needs_salt"),
        ceil(col("out_rows").cast("double") / targetRowsPerTask)
          .cast("long").as("salt_factor"))
      .orderBy(col("out_rows").desc, col(key))
      .limit(topK)
  }

  /** The replicated-salt rewrite [[joinSkewPlan]] plans for: an
    * equi-join whose FACT side carries a hot key. The fact row gets a
    * deterministic salt in [0, numSalts); the dim side is replicated
    * once per salt value; joining on (key, salt) spreads the hot key's
    * rows over numSalts reducers. Result set is IDENTICAL to the
    * plain equi-join for ANY salt assignment (the salt only routes) —
    * the graded query's oracle is therefore the UNSALTED join, pinning
    * the rewrite's semantic equivalence. The salt must be
    * deterministic under task retry (see [[saltedAggregate]]'s note);
    * derive it from row content, never from row order. Cost: dim side
    * ships numSalts× — the rewrite pays off when the hot key's reducer
    * is the bottleneck, i.e. exactly when joinSkewPlan flags it. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factSalt: Column, numSalts: Int): DataFrame = {
    val f = fact.withColumn("__salt",
      pmod(factSalt.cast("long"), lit(numSalts.toLong)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(numSalts.toLong - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
