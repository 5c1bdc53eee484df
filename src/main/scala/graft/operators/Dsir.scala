package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * NeurIPS; public). Selects raw-corpus documents that resemble a target
  * distribution by importance weights over HASHED N-GRAM features: fit two
  * bag-of-hashed-bigrams multinomials (target vs raw), then score each doc
  * by sum_f c_doc[f] * (ln p_target[f] - ln p_raw[f]).
  *
  * Scale shape (the reason DSIR works at 100 TB where classifier-based
  * selection needs GPU inference): everything is one token-stream pass.
  *   explode(bigrams) -> hash-mod to `buckets`
  *     -> partial-agg groupBy(id, bucket)        [the only data-sized shuffle]
  *     -> bucket stats re-agg (<= buckets rows)  [tiny]
  *     -> broadcast log-ratio table joined back  [no second corpus scan]
  *     -> per-doc sum                            [id-keyed agg]
  * The feature hash is the portable md5-60-bit ([[Text.md5Long]]) so the
  * bucket assignment — and therefore every weight — is reproducible in any
  * engine with md5 (the oracle-twin requirement); production could swap
  * xxhash64 in one line for speed.
  */
object Dsir {

  /** Per-document DSIR importance weights.
    *
    * @param isTarget predicate over `docs` columns marking the target-domain
    *                 rows (the "looks like what I want to train on" set);
    *                 the raw distribution is fit on ALL rows
    * @return one row per doc with >= 1 bigram:
    *         (id, n_feats, logw_raw) — logw_raw UNROUNDED (callers round)
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256, alpha: Double = 0.5): DataFrame = {
    require(buckets >= 2, s"need >=2 hash buckets, got $buckets")
    val shingled = docs
      .select(col(idCol).as("id"), isTarget.as("is_target"),
        Text.wordShingles(col(textCol), 2).as("sh"))
      .select(col("id"), col("is_target"), explode(col("sh")).as("f"))
      .select(col("id"), col("is_target"),
        pmod(Text.md5Long(col("f")), lit(buckets)).as("b"))
    // the only data-sized shuffle: map-side combine collapses the token
    // stream to |docs| x |buckets| before the exchange
    val docBucket = shingled
      .groupBy(col("id"), col("is_target"), col("b"))
      .agg(count(lit(1)).as("c"))
    // raw + target bucket histograms in ONE re-agg of the (already tiny)
    // doc-bucket frame: never a second pass over the corpus
    val bucketStats = docBucket.groupBy(col("b"))
      .agg(sum(col("c")).as("cr"),
        sum(when(col("is_target"), col("c")).otherwise(0L)).as("ct"))
    val totals = bucketStats
      .agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    // add-alpha smoothed log-ratio per bucket; <= `buckets` rows, broadcast
    val lam = bucketStats.crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("ct") + alpha) / (col("tt") + alpha * buckets)) -
          log((col("cr") + alpha) / (col("tr") + alpha * buckets)))
          .as("lam"))
    docBucket.join(broadcast(lam), Seq("b"))
      .groupBy(col("id"))
      .agg(sum(col("c") * col("lam")).as("logw_raw"),
        sum(col("c")).as("n_feats"))
  }

  /** Gumbel-top-k importance RESAMPLING (the paper's §3.2 sampling-without-
    * replacement): score = logw + Gumbel(0,1), take the top k. The Gumbel
    * draw derives from the portable md5 uniform ([[Text.md5Mod]]) so the
    * sample is partitioning-independent and engine-reproducible. logw is
    * rounded to 4 BEFORE the noise add (summation-order canon), the draw to
    * 6; their 2-term sum is then IEEE-exact in any engine.
    *
    * @param weights output of [[importanceWeights]]
    * @return k rows: (id, n_feats, logw, score), unordered
    */
  def resample(weights: DataFrame, k: Int): DataFrame = {
    val u = (Text.md5Mod(col("id")) + 1) / lit(Text.P31.toDouble + 1)
    weights
      .withColumn("logw", round(col("logw_raw"), 4))
      .withColumn("g", round(-log(-log(u)), 6))
      .withColumn("score", round(col("logw") + col("g"), 6))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
      .select(col("id"), col("n_feats"), col("logw"), col("score"))
  }
}
