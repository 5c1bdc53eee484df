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
}
