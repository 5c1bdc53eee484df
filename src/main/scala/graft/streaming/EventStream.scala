package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming ingest over the events table (SURVEY.md §2.10 — an
  * extension beyond reference parity: the reference is strictly batch, but
  * the engine leaves room for incremental ingest of the same transforms).
  *
  * Design: `readStream` file source -> event-time watermark -> windowed
  * aggregation -> sink. The aggregation is the streaming twin of the batch
  * q16_events_hourly query; `Trigger.AvailableNow` drains a static directory
  * and stops, which is how the spec proves batch/stream equivalence.
  *
  * Scale notes: file-source listing is incremental (maxFilesPerTrigger);
  * state is bounded by the watermark (1h windows x event types), so state
  * store size is independent of stream length.
  */
object EventStream {

  /** events schema modulo the `ts` physical encoding (streaming reads need
    * an explicit schema; `ts` is filled in per-directory by [[readEvents]],
    * which probes the actual files — the corpus has shipped both
    * TIMESTAMP(NANOS)-as-int64 and timestamp[us]). */
  val RawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming scan of an events parquet directory. Schema-adaptive like
    * the batch loader ([[graft.queries.Tables.events]]): one batch probe of
    * the directory resolves the writer's `ts` encoding, then the stream
    * reads with that schema and normalizes to session-tz TimestampType. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val tsType = graft.queries.Tables.rawEvents(spark, dir)
      .schema("ts").dataType
    val schema = StructType(RawSchema.fields.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    graft.queries.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(dir))
  }

  /** Hourly per-type rollup with a 2-hour watermark: the streaming twin of
    * the batch q16 query. Late rows beyond the watermark are dropped —
    * bounded state at unbounded stream length. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming gap-sessionization: `session_window` grows a per-key window
    * while events arrive within `gap`, closes it at watermark + gap — the
    * streaming twin of [[graft.operators.Sessionize]] (state bounded by the
    * watermark; the custom-state escape hatch for richer semantics is
    * `KeyValueGroupedDataset.flatMapGroupsWithState`, same plan position).
    * Works on batch frames too (used by the equivalence spec). */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup: first event per `keys` wins, duplicates arriving
    * within the watermark are dropped (`dropDuplicatesWithinWatermark` —
    * state for a key is freed once the watermark passes it, so state size is
    * bounded by the dedup horizon, not the stream length; the batch twin
    * [[graft.operators.Dedup.exact]] is the unbounded-horizon equivalent).
    * The streaming ingest guard of the dedup family: at-least-once upstream
    * delivery (Kafka/file redelivery) becomes exactly-once rows downstream. */
  def dedupEvents(events: DataFrame, keys: Seq[String],
      horizon: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark(keys)

  /** Watermarked stream-stream interval join: each purchase joined to the
    * same user's clicks from the `lookback` window ending at the purchase
    * (click-attribution shape). Both sides carry watermarks and the join
    * condition bounds event-time distance, so the state store retains only
    * `lookback + watermark` of history per side — the condition IS the
    * state-cleanup contract (an unbounded-time stream-stream join would
    * grow state forever and Spark rejects it in append mode). Works on
    * batch frames too (watermarks no-op), which is how the spec proves
    * stream == batch. */
  def purchaseAttribution(events: DataFrame,
      lookback: String = "10 minutes"): DataFrame =
    attributionJoin(events, lookback, "inner")

  /** LEFT OUTER variant of [[purchaseAttribution]]: every purchase emits
    * exactly once — attributed when a qualifying click exists, else with
    * null click columns once the watermark proves no qualifying click can
    * still arrive. The unmatched purchase is HELD IN STATE until the click
    * watermark passes its lookback horizon, so the null-row emission is the
    * observable state-eviction event (the Streaming2Spec outer-join case
    * pins exactly that ordering); state stays bounded by lookback +
    * watermark per side exactly like the inner form. */
  def purchaseAttributionOuter(events: DataFrame,
      lookback: String = "10 minutes"): DataFrame =
    attributionJoin(events, lookback, "left_outer")

  private def attributionJoin(events: DataFrame, lookback: String,
      joinType: String): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("pts"), col("value").as("purchase_value"))
      .withWatermark("pts", "2 hours")
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("cts"))
      .withWatermark("cts", "2 hours")
    p.join(c,
        col("user_id") === col("c_user") &&
        col("cts") <= col("pts") &&
        col("cts") >= col("pts") - expr(s"INTERVAL $lookback"),
        joinType)
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        // null cts (unmatched outer row) propagates to a null gap
        ((unix_micros(col("pts")) - unix_micros(col("cts"))) / 1000000L)
          .cast("long").as("gap_s"),
        col("purchase_value"))
  }

  /** Drain a directory through [[purchaseAttribution]] into memory. */
  def drainAttributionToMemory(spark: SparkSession, dir: String,
      table: String): StreamingQuery = {
    val q = purchaseAttribution(readEvents(spark, dir))
      .writeStream.format("memory").queryName(table)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Drain a directory through [[dedupEvents]] into an in-memory table. */
  def drainDedupToMemory(spark: SparkSession, dir: String,
      table: String): StreamingQuery = {
    val q = dedupEvents(readEvents(spark, dir), Seq("event_id"))
      .select("event_id", "user_id", "event_type", "value")
      .writeStream.format("memory").queryName(table)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Drain a directory through [[sessionize]] into an in-memory table. */
  def drainSessionsToMemory(spark: SparkSession, dir: String,
      table: String): StreamingQuery = {
    val q = sessionize(readEvents(spark, dir))
      .writeStream.format("memory").queryName(table)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Drain the directory with AvailableNow into an in-memory table and stop.
    * Returns the query (already awaited). Used by specs to prove the
    * streaming plan computes exactly the batch answer. */
  def drainToMemory(spark: SparkSession, dir: String, table: String): StreamingQuery = {
    val q = hourlyRollup(readEvents(spark, dir))
      .writeStream.format("memory").queryName(table)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Stream-static enrichment: join the event stream against a static (or
    * slowly-changing, re-read per batch) dimension frame and aggregate per
    * dimension attribute. The static side is broadcast — stream-static joins
    * need no watermark and hold NO join state (each micro-batch probes the
    * dimension like a batch job would), which is why this is the right plan
    * for dimension enrichment and the stream-stream interval join
    * ([[purchaseAttribution]]) is reserved for two genuinely unbounded
    * sides. Rows with no dimension match keep a null attribute (left join)
    * rather than silently dropping. */
  def enrichedRollup(events: DataFrame, dim: DataFrame,
      dimKey: String = "user_id", attr: String = "segment"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .join(broadcast(dim), Seq(dimKey), "left")
      .groupBy(window(col("ts"), "1 hour").as("w"), col(attr))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:00").as("hour"),
        col(attr), col("n_events"), col("total_value"))

  /** Drain a directory through [[enrichedRollup]] into memory. */
  def drainEnrichedToMemory(spark: SparkSession, dir: String, dim: DataFrame,
      table: String): StreamingQuery = {
    val q = enrichedRollup(readEvents(spark, dir), dim)
      .writeStream.format("memory").queryName(table)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
