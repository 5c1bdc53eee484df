package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (edit distance) — the reference ships fuzzywuzzy
  * in requirements.txt but never imports it (SURVEY.md §7.2 M6: latent
  * intent, no semantics to match); this is the scalable realization.
  *
  * All-pairs Levenshtein is O(n^2) and unshippable at corpus scale; the
  * standard record-linkage shape is blocking: join only within cheap
  * equality blocks (a typo-tolerant key — e.g. a suffix, a phonetic code, a
  * length band), then score candidates with the exact distance. One bucket
  * shuffle, never a cross join; multiple passes with different block keys
  * raise recall.
  */
object Fuzzy {

  /** Candidate pairs within `maxDist` edit distance, blocked by `blockKey`.
    * Returns (id_a, id_b, dist) with id_a < id_b. */
  def blockedPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(nameCol).as("name"),
      blockKey.as("blk"))
    keyed.as("a").join(keyed.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      // 3-arg levenshtein early-terminates once the distance exceeds the
      // bound (returns -1): O(maxDist * min(len)) per pair instead of the
      // full DP table — the dominant cost on a corpus-scale candidate set
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.name"), col("b.name"), maxDist).as("dist"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
  }

  /** Multi-pass blocking: union of candidate sets from several block keys
    * (recall grows with each pass; dedup on the pair). */
  def multiBlockedPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKeys: Seq[Column], maxDist: Int): DataFrame = {
    require(blockKeys.nonEmpty, "multiBlockedPairs needs at least one block key")
    blockKeys.map(blockedPairs(df, idCol, nameCol, _, maxDist))
      .reduce(_ unionByName _)
      .dropDuplicates("id_a", "id_b")
  }

  /** Sorted-neighborhood candidate generation (Hernandez & Stolfo 1995,
    * "The Merge/Purge Problem for Large Databases"): rank every record in
    * one global sort order over `sortKey` (ties broken by id — total
    * order), then emit each pair of records whose ranks differ by less
    * than `window`. The complement of equality blocking: a sliding window
    * over a sort key catches near-keys that equality blocks split (typos
    * at the END of the key sort adjacent; [[blockedPairs]] with a prefix
    * block misses them, and vice versa — production merge/purge runs both
    * passes and unions, exactly [[multiBlockedPairs]]' shape).
    *
    * Scale posture: the global rank uses the two-phase range-partition +
    * partition-offset scheme ([[graft.pipeline.RowIds.denseByOrder]]) —
    * NO global single-task window. Pairing is a self-join on the rank
    * BUCKET (rank div window): a pair with gap < window sits in the same
    * or adjacent buckets, so each row joins at most two buckets (one
    * bucket-keyed shuffle, output n * (window-1) pairs, never quadratic).
    * Output: (id_a, id_b, gap) with rank(id_a) < rank(id_b); gap in
    * [1, window-1]. Deterministic for a given (sortKey, id) total order.
    */
  def sortedNeighborhood(df: DataFrame, idCol: String, sortKey: Column,
      window: Int): DataFrame = {
    require(window >= 2, "window must be >= 2 (no pairs otherwise)")
    val ranked = graft.pipeline.RowIds.denseByOrder(
        df.select(col(idCol).as("id"), sortKey.as("__key")), "rn",
        Seq(col("__key").asc, col("id").asc))
      .select(col("id"), col("rn"), expr(s"rn div $window").as("bkt"))
    // a qualifying pair sits in the same or adjacent rank buckets, so the
    // left side probes (bkt, bkt + 1) — an OR-join would plan as a nested
    // loop; the two-probe explode keeps it a bucket-keyed EQUI-join, and
    // each pair is found exactly once (b's bucket matches exactly one of
    // the two distinct probe values)
    val probes = ranked
      .withColumn("probe_bkt", explode(array(col("bkt"), col("bkt") + 1)))
    probes.as("a").join(ranked.as("b"),
        col("b.bkt") === col("a.probe_bkt") &&
          col("b.rn") > col("a.rn") &&
          col("b.rn") - col("a.rn") < window)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (col("b.rn") - col("a.rn")).as("gap"))
  }
}
