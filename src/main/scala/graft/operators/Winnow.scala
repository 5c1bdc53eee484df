package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every k-char gram, slide a
  * window of w consecutive hashes, and keep each window's minimum
  * (rightmost on ties). The guarantee that makes this the standard
  * plagiarism/near-dup signature: any shared substring of length
  * ≥ w + k − 1 produces at least one IDENTICAL selected fingerprint
  * in both documents, while the selected density stays ~2/(w+1) —
  * position-robust, unlike fixed-stride sampling, and
  * substring-sensitive, unlike whole-doc MinHash (reference
  * cleaning/dedupe.py:1 dedups whole rows only; this is the
  * sub-document counterpart, same family as Dedup.substringContainment
  * but with guaranteed-coverage sampling instead of full posting
  * lists).
  *
  * Plan shape: ONE Generate (positions explode), ONE window function —
  * the per-window rightmost-min is min(struct(hash, −pos)) over a
  * w-row sliding frame keyed by doc, so selection adds no join and no
  * w-fold blowup — then distinct. Pair generation is the usual
  * bucketed equi-join on fingerprint hash. Everything is doc-keyed or
  * fingerprint-keyed; nothing global. */
object Winnow {

  /** Selected fingerprints per doc: (idCol, fp_hash, pos) — pos is the
    * 1-based k-gram start of the selected gram. Text shorter than k
    * yields no rows. `hashSql` is the per-gram hash (any SQL function
    * name usable in an expr); the md5 default is engine-portable so
    * the oracle can replay it — swap to `xxhash64` in production for a
    * cheaper codegen'd hash (selection logic is hash-agnostic). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, hashSql: String = "md5"): DataFrame = {
    val grams = docs
      .select(col(idCol), col(textCol).as("__t"))
      .filter(length(col("__t")) >= k)
      // hash-partition on the doc id BEFORE the explode: the per-gram
      // hashing is the CPU-heavy step and a compact local input (one
      // parquet row group) would otherwise run it in a single task;
      // the selection window partitions by the same key, so this
      // exchange REPLACES the window's rather than adding one — and it
      // moves raw docs, not the ~len× larger gram rows. numPartitions
      // is explicit because AQE would coalesce a small-byte shuffle
      // back to one partition, re-serializing the CPU-bound stage.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col(idCol))
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(1, length(__t) - ${k - 1}), " +
          s"p -> $hashSql(substring(__t, p, $k)))"))
        .as(Seq("__p0", "h")))
      .select(col(idCol), (col("__p0") + 1).as("pos"), col("h"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    grams
      .withColumn("__sel", min(struct(col("h"), (-col("pos")).as("np")))
        .over(win))
      // the first w-1 rows carry partial windows; the paper's windows
      // are exactly the full ones, so drop frames shorter than w
      .withColumn("__n", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .filter(col("__n") >= w)
      .select(col(idCol), col("__sel.h").as("fp_hash"),
        (-col("__sel.np")).as("pos"))
      .distinct()
  }

  /** Near-dup candidate pairs: docs sharing ≥ `minShared` distinct
    * selected fingerprints, with the shared count. Join is bucketed by
    * fingerprint value; a same-doc fingerprint selected at several
    * positions counts once (the join runs on distinct (doc, hash)).
    * Fingerprints selected in more than `dfCap` docs are dropped
    * before the join — a corpus-common gram is boilerplate, not
    * copying, and an uncapped hot bucket is the q89-class quadratic
    * (the cap bounds any bucket's pair fan-out at dfCap²/2). */
  def sharedFingerprintPairs(fps: DataFrame, idCol: String,
      minShared: Int = 2, dfCap: Int = 64): DataFrame = {
    val df = fps.select(col(idCol).as("id"), col("fp_hash")).distinct()
    val keep = df.groupBy(col("fp_hash"))
      .agg(count(lit(1)).as("__df")).filter(col("__df") <= dfCap)
      .select(col("fp_hash"))
    val capped = df.join(keep, Seq("fp_hash"))
    val a = capped.select(col("id").as("id_a"), col("fp_hash"))
    val b = capped.select(col("id").as("id_b"), col("fp_hash"))
    a.join(b, Seq("fp_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
