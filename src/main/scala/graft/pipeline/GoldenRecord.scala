package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Cleaning

/** Golden-record deduplication — the reference's centerpiece operator
  * (clean_contacts.py:158-236; SURVEY.md §2.5 A1): group contacts by a dedup
  * key and, per column, keep the "most complete" value: the longest valid
  * value, ties broken by recency, then by stable row order.
  *
  * Spark-first design: the whole merge is ONE hash aggregation using the
  * built-in `max_by` with a *strict* ordering struct — (length, last_updated,
  * -row_id) is totally ordered because row_id is unique, so there are no
  * nondeterministic ties (the explicit-determinism requirement of SURVEY.md
  * §4: the reference's pre-sort-then-groupby order cannot survive a shuffle,
  * so the ordering is folded INTO the aggregate). `max_by` gets partial
  * aggregation (map-side combine) for free, which is what makes this one
  * shuffle of group-local winners — not rows — at 100 TB.
  */
object GoldenRecord {

  /** Ordering struct for mostComplete: null for invalid values so max_by
    * skips them entirely. Lexicographic struct comparison = longest value,
    * then latest timestamp, then earliest row. */
  private def completeness(value: Column, lastUpdated: Column, rowId: Column): Column =
    when(Cleaning.isPresent(value.cast("string")),
      struct(
        length(value.cast("string")).as("len"),
        // try_cast: an unparseable string ts (raw, un-Cleaned frames)
        // degrades to the epoch fallback instead of throwing under ANSI
        coalesce(lastUpdated.try_cast("timestamp"),
          lit("1970-01-01 00:00:00").cast("timestamp")).as("ts"),
        (-rowId).as("neg_row")))
      .otherwise(lit(null))

  /** Most-complete value of `value` within the group: longest valid (non-null,
    * non-"", non-sentinel) value; equal lengths -> the most recently updated
    * row; still equal -> the earliest row in stable input order.
    * (clean_contacts.py:204-226 with the O1 recency pre-sort folded in.) */
  def mostComplete(value: Column, lastUpdated: Column, rowId: Column): Column =
    max_by(value, completeness(value, lastUpdated, rowId))

  /** Attach the dedup key (clean_contacts.py:164-179): lower(email), falling
    * back to lower(fullname) + "-" + mobile. Case-insensitive role resolution
    * (the intended semantics — divergence ledger §1.4).
    *
    * Rows with NO identity at all share the key "-" and merge into one
    * golden record — the reference's groupby does the same; callers that
    * want to preserve identity-less rows must filter them out first. A frame
    * where none of the three roles even RESOLVES would silently collapse the
    * whole table that way, so that case is rejected. */
  def withDedupKey(df: DataFrame, keyCol: String = "dedup_key"): DataFrame = {
    val resolved = Seq("EMAIL", "FULLNAME", "MOBILE").flatMap(Roles.exact(df, _))
    require(resolved.nonEmpty,
      s"none of EMAIL/FULLNAME/MOBILE resolve against columns " +
        s"[${df.columns.mkString(", ")}] — every row would get the same " +
        "dedup key and the whole table would merge into one golden record")
    def c(role: String): Column =
      Roles.exact(df, role).map(n => col(n).cast("string"))
        .getOrElse(lit(null).cast("string"))
    df.withColumn(keyCol, Cleaning.dedupKey(c("EMAIL"), c("FULLNAME"), c("MOBILE")))
  }

  /** Full golden-record dedup: key -> group -> per-column mostComplete.
    * `rowIdCol` must be a pre-existing unique id; `lastUpdatedCol` is optional
    * (recency tiebreak). Output has one row per key, original columns only. */
  def dedupe(df: DataFrame, rowIdCol: String,
      lastUpdatedCol: Option[String] = None,
      keyCol: String = "dedup_key"): DataFrame = {
    val keyed = if (df.columns.contains(keyCol)) df else withDedupKey(df, keyCol)
    val ts = lastUpdatedCol.map(col).getOrElse(lit(null).cast("timestamp"))
    val dataCols = keyed.columns.toSeq.filterNot(c => c == keyCol)
    val aggs = dataCols.map(c =>
      mostComplete(col(s"`$c`"), ts, col(s"`$rowIdCol`")).as(c))
    keyed.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*).drop(keyCol)
  }

  /** Incremental golden-record upsert — the daily-ingest shape: instead of
    * re-merging the whole golden table (the reference's "incremental" story
    * is rerunning the script over everything), only groups whose dedup key
    * appears in the incoming batch are re-merged; untouched golden rows
    * pass through without a shuffle of their data. Incoming batches are
    * small relative to the golden table, so `touchedKeys` broadcasts and
    * the anti/semi joins stay map-side.
    *
    * PRECONDITION: `existing` must itself be a prior dedupe output (one row
    * per key, values already merged/normalized). Untouched rows pass through
    * unmodified, so only under that precondition is the result identical to
    * `dedupe(existing ∪ incoming)` (spec-proved for that case). */
  def upsertIncremental(existing: DataFrame, incoming: DataFrame,
      rowIdCol: String, lastUpdatedCol: Option[String] = None,
      keyCol: String = "dedup_key"): DataFrame = {
    val exKeyed = if (existing.columns.contains(keyCol)) existing
      else withDedupKey(existing, keyCol)
    val inKeyed = if (incoming.columns.contains(keyCol)) incoming
      else withDedupKey(incoming, keyCol)
    val touchedKeys = inKeyed.select(col(keyCol)).distinct()
    val touched = exKeyed.join(broadcast(touchedKeys), Seq(keyCol), "left_semi")
    val untouched = exKeyed.join(broadcast(touchedKeys), Seq(keyCol), "left_anti")
    val merged = dedupe(touched.unionByName(inKeyed), rowIdCol,
      lastUpdatedCol, keyCol)
    untouched.drop(keyCol).unionByName(merged)
  }

  /** SEQNO reassignment (P8, clean_contacts.py:62-63): 1..N in an explicit
    * order — pandas relied on implicit "current order", which does not exist
    * in a distributed plan, so the sort key is a required argument.
    * Range-partitioned two-phase assignment ([[RowIds.denseByOrder]]): no
    * unpartitioned window, scale-safe. */
  def resetSeqNumbers(df: DataFrame, seqCol: String, order: Seq[Column]): DataFrame =
    RowIds.denseByOrder(df, seqCol, order)
}
