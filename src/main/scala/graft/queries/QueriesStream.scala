package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Cleaning, Text, Vec}
import graft.operators.{AllPairs, Boilerplate, Classify, Dedup, Mix, Multimodal, Sessionize, Similarity, SuffixArray}
import graft.pipeline.{Fill, GoldenRecord, Validate}

import graft.queries.Queries.QueryDef
import graft.queries.Shared._

/** Event-time analytics and streaming twins: sessions, windows, funnels, CDC/upsert, time series.
  *
  * One registry shard of [[Queries.all]] — same QueryDef/oracle
  * conventions (see [[Queries]]'s scaladoc); split from the single
  * 11.6k-line Queries.scala in round 16 for maintainability. */
private[queries] object QueriesStream {

  def defs: Seq[QueryDef] = Seq(


    // ---------------------------------------------------------------------
    // q16: hourly event rollup (the batch twin of the streaming ingest path;
    // §2.10) — window bucket emitted as a string.
    QueryDef("q16_events_hourly",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.groupBy(date_format(date_trunc("hour", col("ts")),
            "yyyy-MM-dd HH:00").as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("total_value"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
             |  event_type, count(*) AS n_events,
             |  round(sum(value), 2) AS total_value
             |FROM events GROUP BY hour, event_type
             |ORDER BY hour, event_type""".stripMargin)),


    // ---------------------------------------------------------------------
    // q17: JSON extraction (S8 analogue) from the events props column.
    QueryDef("q17_events_json",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("k_val"))
          .filter(col("event_id") % 20 === 0)
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
             |FROM events WHERE event_id % 20 = 0 ORDER BY event_id""".stripMargin)),


    // ---------------------------------------------------------------------
    // q24: gap-based sessionization (30-min inactivity) + per-session
    // rollup: ONE shuffle on user_id, both windows and the final group
    // reuse the same partitioning.
    QueryDef("q24_sessions",
      (s, dir) => {
        val e = t(s, dir, "events")
        Sessionize.sessionStats(e, col("user_id"), col("ts"), col("event_id"),
            col("value"), gapSeconds = 1800)
          .select(col("key").as("user_id"), col("session_id").cast("long"),
            date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
            col("n_events"), col("total_value"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH flags AS (
             |  SELECT user_id, ts, event_id, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             |         THEN 1 ELSE 0 END AS is_start
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT *, sum(is_start) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM flags)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
             |  count(*) AS n_events, round(sum(value), 2) AS total_value
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),


    // ---------------------------------------------------------------------
    // q32: as-of / prior-event lookup per key (the window-function form of
    // an as-of join against the same stream): previous event's value and
    // the microsecond gap, one shuffle on user_id.
    QueryDef("q32_prior_event",
      (s, dir) => {
        val e = t(s, dir, "events")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        e.select(col("event_id"), col("user_id"), col("value"),
            lag(col("value"), 1).over(w).as("prev_value"),
            (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
              .as("gap_us"))
          .filter(col("event_id") % 10 === 0)
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, value,
             |  lag(value) OVER w AS prev_value,
             |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |QUALIFY event_id % 10 = 0
             |ORDER BY event_id""".stripMargin)),


    // ---------------------------------------------------------------------
    // q39: RANGE-frame window aggregation — 7-day moving average of daily
    // order totals (value-range frame over a day-number ordering, distinct
    // from the ROWS frames used elsewhere).
    QueryDef("q39_moving_avg",
      (s, dir) => {
        val o = t(s, dir, "orders")
        // integer cents: prices have 2 decimals, so sum*100 is integral and
        // integer addition is order-exact in doubles — both engines compute
        // bit-identical averages (a raw double MA rounds apart on
        // half-cents depending on summation order)
        val daily = o
          .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
          .agg(round(sum(col("o_totalprice")) * 100, 0).cast("long")
            .as("cents"))
          .withColumn("day_num",
            datediff(col("day").cast("date"), lit("1970-01-01").cast("date")))
        val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
        daily
          // round to whole cents FIRST: an avg of integers can land exactly
          // on x.5 (even window), where Spark (decimal-string HALF_UP) and
          // DuckDB (binary-value) round differently after the /100
          .withColumn("ma7",
            round(round(avg(col("cents")).over(w), 0) / 100.0, 2))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            round(col("cents") / 100.0, 2).as("total"), col("ma7"))
          .orderBy(col("day"))
      },
      Some("""WITH daily AS (
             |  SELECT date_trunc('day', o_orderdate) AS day,
             |    CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT) AS cents,
             |    date_diff('day', DATE '1970-01-01',
             |      CAST(date_trunc('day', o_orderdate) AS DATE)) AS day_num
             |  FROM orders GROUP BY 1)
             |SELECT strftime(day, '%Y-%m-%d') AS day,
             |  round(cents / 100.0, 2) AS total,
             |  round(round(avg(cents) OVER (ORDER BY day_num
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 0) / 100.0, 2) AS ma7
             |FROM daily ORDER BY day""".stripMargin)),


    // ---------------------------------------------------------------------
    // q64: backward as-of join (AsOf.joinBackward) — for every purchase,
    // the user's most recent click at or before it. Union-merge plan: ONE
    // hash shuffle on user_id + per-partition sort, never the range-join
    // row explosion. Oracle restates the same semantics as a LATERAL
    // top-1 lookup with the identical (ts DESC, id DESC) tie order.
    QueryDef("q64_asof_join",
      (s, dir) => {
        val e = t(s, dir, "events")
        val probe = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val build = e.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts").as("cts"), col("value").as("click_value"))
        graft.operators.AsOf.joinBackward(probe, build, Seq("user_id"),
            "ts", "cts", "click_id", Seq("click_id", "cts", "click_value"))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("pts_us"),
            col("asof_click_id").as("click_id"),
            col("asof_click_value").as("click_value"),
            (unix_micros(col("ts")) - unix_micros(col("asof_cts")))
              .as("gap_us"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id, p.user_id, epoch_us(p.ts) AS pts_us,
             |  m.click_id, m.click_value, epoch_us(p.ts) - m.cts_us AS gap_us
             |FROM events p LEFT JOIN LATERAL (
             |  SELECT b.event_id AS click_id, b.value AS click_value,
             |    epoch_us(b.ts) AS cts_us
             |  FROM events b
             |  WHERE b.event_type = 'click' AND b.user_id = p.user_id
             |    AND b.ts <= p.ts
             |  ORDER BY b.ts DESC, b.event_id DESC LIMIT 1) m ON true
             |WHERE p.event_type = 'purchase'
             |ORDER BY p.event_id""".stripMargin)),


    // ---------------------------------------------------------------------
    // q65: hopping (sliding) window rollup — 1-hour windows every 30
    // minutes, so each event lands in exactly two windows. Spark's window()
    // generator expands rows BEFORE the partial aggregate, so the shuffle
    // carries |windows x types| partial rows, not events. Epoch-aligned in
    // both engines (window() and time_bucket), making the oracle exact.
    QueryDef("q65_hopping_windows",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("total_value"))
          .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm")
              .as("win_start"),
            col("event_type"), col("n_events"), col("total_value"))
          .orderBy(col("win_start"), col("event_type"))
      },
      Some("""WITH ws AS (
             |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
             |                 time_bucket(INTERVAL '30 minutes', ts)
             |                   - INTERVAL '30 minutes']) AS win,
             |    event_type, value
             |  FROM events)
             |SELECT strftime(win, '%Y-%m-%d %H:%M') AS win_start,
             |  event_type, count(*) AS n_events,
             |  round(sum(value), 2) AS total_value
             |FROM ws GROUP BY win, event_type
             |ORDER BY win_start, event_type""".stripMargin)),


    // ---------------------------------------------------------------------
    // q67: cohort retention — users grouped by first-activity day, activity
    // counted per day-offset since that first event. Two shuffles, both on
    // user_id (the min-ts aggregate and the join back), so AQE reuses one
    // exchange; the final rollup is metadata-sized (cohorts x offsets).
    // The classic product-analytics operator, absent from the reference.
    QueryDef("q67_cohort_retention",
      (s, dir) => {
        val e = t(s, dir, "events")
        val first = e.groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
        e.join(first, "user_id")
          .groupBy(
            date_format(date_trunc("DAY", col("first_ts")), "yyyy-MM-dd")
              .as("cohort_day"),
            floor((unix_micros(col("ts")) - unix_micros(col("first_ts")))
              / lit(86400000000.0)).cast("long").as("day_offset"))
          .agg(countDistinct(col("user_id")).as("active_users"),
            count(lit(1)).as("n_events"))
          .orderBy(col("cohort_day"), col("day_offset"))
      },
      Some("""WITH first AS (
             |  SELECT user_id, min(ts) AS first_ts FROM events
             |  GROUP BY user_id)
             |SELECT strftime(date_trunc('day', f.first_ts), '%Y-%m-%d')
             |    AS cohort_day,
             |  CAST(floor(epoch(e.ts - f.first_ts) / 86400) AS BIGINT)
             |    AS day_offset,
             |  count(DISTINCT e.user_id) AS active_users,
             |  count(*) AS n_events
             |FROM events e JOIN first f USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),


    // ---------------------------------------------------------------------
    // q68: ordered funnel conversion — users who viewed, then clicked
    // AFTER their first view, then purchased AFTER that first click. Each
    // stage is a min-ts aggregate + equi-join on user_id (partial agg +
    // hash join, no windows over event history, no per-user sequence
    // materialization) — the plan a 100-TB event log needs.
    QueryDef("q68_funnel",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_type"))
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("view_ts"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("ts") > col("view_ts"))
          .groupBy("user_id").agg(min(col("ts")).as("click_ts"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("ts") > col("click_ts"))
          .select("user_id").distinct()
        v.agg(count(lit(1)).as("users"))
          .select(lit("1_view").as("stage"), col("users"))
          .unionByName(c.agg(count(lit(1)).as("users"))
            .select(lit("2_click").as("stage"), col("users")))
          .unionByName(p.agg(count(lit(1)).as("users"))
            .select(lit("3_purchase").as("stage"), col("users")))
          .orderBy(col("stage"))
      },
      Some("""WITH v AS (
             |  SELECT user_id, min(ts) AS view_ts FROM events
             |  WHERE event_type = 'view' GROUP BY user_id),
             |c AS (
             |  SELECT e.user_id, min(e.ts) AS click_ts
             |  FROM events e JOIN v USING (user_id)
             |  WHERE e.event_type = 'click' AND e.ts > v.view_ts
             |  GROUP BY e.user_id),
             |p AS (
             |  SELECT DISTINCT e.user_id
             |  FROM events e JOIN c USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts)
             |SELECT '1_view' AS stage, count(*) AS users FROM v
             |UNION ALL SELECT '2_click', count(*) FROM c
             |UNION ALL SELECT '3_purchase', count(*) FROM p
             |ORDER BY stage""".stripMargin)),


    // ---------------------------------------------------------------------
    // q79: SCD type-2 interval construction — collapse each user's event
    // stream into effective-dated state rows (valid_from / valid_to, null =
    // currently open): lag() drops consecutive duplicates, lead() closes
    // each surviving interval. The point-in-time dimension shape training
    // snapshots join against (with the q64 as-of family). One shuffle on
    // the user key serves both window passes; (ts, event_id) gives a total
    // order so simultaneous events can't flip rows.
    QueryDef("q79_scd2_intervals",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val changes = t(s, dir, "events")
          .filter(col("user_id") % 25 === 0)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("state"))
          .withColumn("prev", lag(col("state"), 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("state"))
        changes
          .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
          .select(col("user_id"), col("state"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
            date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss")
              .as("valid_to"),
            col("event_id"))
          .orderBy(col("user_id"), col("valid_from"), col("event_id"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, ts, event_id, event_type AS state
             |  FROM events WHERE user_id % 25 = 0),
             |ch AS (
             |  SELECT *, lag(state) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM e),
             |keep AS (SELECT * FROM ch WHERE prev IS NULL OR prev <> state),
             |iv AS (
             |  SELECT *, lead(ts) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_ts
             |  FROM keep)
             |SELECT user_id, state,
             |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
             |  strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
             |  event_id
             |FROM iv ORDER BY user_id, valid_from, event_id""".stripMargin)),


    // ---------------------------------------------------------------------
    // q82: daily + rolling-7-day distinct users (DAU/WAU) — the windowed
    // COUNT DISTINCT shape, which no window frame computes scalably
    // (distinct doesn't decompose over sliding frames). The scale form:
    // distinct (day, user) once, then EXPLODE each activity day into the
    // <=7 window-end days it contributes to and re-aggregate — a bounded
    // 7x fan-out of the distinct frame with partial aggregation, instead
    // of a per-day range self-join over raw events.
    QueryDef("q82_rolling_actives",
      (s, dir) => {
        val du = t(s, dir, "events")
          .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        val daily = du.groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("dau"))
        val rolling = du
          .select(explode(sequence(col("day"), date_add(col("day"), 6)))
            .as("wday"), col("user_id"))
          .groupBy(col("wday"))
          .agg(countDistinct(col("user_id")).as("wau7"))
        daily.join(rolling, col("day") === col("wday"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dau"), col("wau7"))
          .orderBy(col("day"))
      },
      Some("""WITH du AS (
             |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
             |daily AS (
             |  SELECT day, count(DISTINCT user_id) AS dau FROM du GROUP BY 1),
             |contrib AS (
             |  SELECT day + CAST(i AS INTEGER) AS wday, user_id
             |  FROM du CROSS JOIN (SELECT unnest(range(7)) AS i) t),
             |rolling AS (
             |  SELECT wday, count(DISTINCT user_id) AS wau7
             |  FROM contrib GROUP BY 1)
             |SELECT strftime(d.day, '%Y-%m-%d') AS day, dau, wau7
             |FROM daily d JOIN rolling r ON r.wday = d.day
             |ORDER BY day""".stripMargin)),


    // ---------------------------------------------------------------------
    // q83: time-weighted average value per user — each event's value holds
    // until the user's next event; the mean weights by exact holding
    // microseconds (unix_micros/epoch_us, the q32-proven portable pair)
    // rather than event count. The metrics/finance aggregation shape where
    // a plain avg() over irregular samples is simply wrong. One user-key
    // shuffle serves the lead() and the final aggregate.
    QueryDef("q83_time_weighted_avg",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us").asc, col("event_id").asc)
        val iv = t(s, dir, "events")
          .filter(col("user_id") % 3 === 0)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("value"))
          .withColumn("next_us", lead(col("us"), 1).over(w))
          .filter(col("next_us").isNotNull)
        iv.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_intervals"),
            // twa rounds to 4: the numerator sums ~1e13-magnitude doubles
            // (value x holding-micros), so order-dependent ulps reach ~1e0;
            // the ratio error ~1e-11 must sit far from a rounding boundary
            round(sum(col("value") * (col("next_us") - col("us"))) /
              sum(col("next_us") - col("us")), 4).as("twa"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us, value
             |  FROM events WHERE user_id % 3 = 0),
             |x AS (
             |  SELECT *, lead(us) OVER (
             |      PARTITION BY user_id ORDER BY us, event_id) AS next_us
             |  FROM e)
             |SELECT user_id, count(*) AS n_intervals,
             |  round(sum(value * (next_us - us)) / sum(next_us - us), 4)
             |    AS twa
             |FROM x WHERE next_us IS NOT NULL
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),


    // ---------------------------------------------------------------------
    // q105: trajectory assembly — per-session ordered event sequences (the
    // agent-trace / clickstream-pretraining dataset constructor): q24's
    // gap sessionization, then each session collapses to one row with its
    // event types joined in (ts, event_id) order. collect_list is
    // order-nondeterministic under partial agg, so the operator sorts the
    // collected structs on the total order first; the twin's
    // string_agg(... ORDER BY) restates it exactly, making the full
    // concatenated string hash-gradable.
    QueryDef("q105_trajectories",
      (s, dir) => {
        val e = t(s, dir, "events")
        graft.operators.Sessionize.trajectories(e, col("user_id"),
            col("ts"), col("event_id"), col("event_type"),
            gapSeconds = 1800)
          .select(col("key").as("user_id"),
            col("session_id").cast("long").as("session_id"),
            col("n_events"), col("trajectory"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH flags AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             |         THEN 1 ELSE 0 END AS is_start
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT *, sum(is_start) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
             |    AS session_id
             |  FROM flags)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |  count(*) AS n_events,
             |  string_agg(event_type, ' ' ORDER BY ts, event_id)
             |    AS trajectory
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),


    // ---------------------------------------------------------------------
    // q131: curation attrition funnel — the per-stage survival table every
    // corpus paper reports (C4 Table 1, RefinedWeb Fig. 2, Dolma §4):
    // exact dedup -> min length -> language-ID -> stopword-ratio prose
    // check, each stage's in/out counts plus cumulative retention. Flags are
    // computed once per doc (one dedup window + one TextProfile pass),
    // the funnel itself is a single 1-row aggregate exploded into stage
    // rows — the whole report costs two corpus scans regardless of how
    // many stages stack.
    QueryDef("q131_attrition_funnel",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val all = d.unionByName(d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
        val winners = Dedup.exactText(all, "text", "doc_id")
          .select(col("doc_id"), lit(true).as("f_dedup"))
        val prof = graft.operators.TextProfile.profile(all, "doc_id", "text")
        val flags = prof
          .select(col("doc_id"), col("n_tokens"), col("lang_pred"),
            col("stopword_ratio"))
          .join(winners, Seq("doc_id"), "left")
          .select(coalesce(col("f_dedup"), lit(false)).as("f1"),
            (col("n_tokens") >= 20).as("f2"),
            (col("lang_pred") =!= "und").as("f3"),
            (round(col("stopword_ratio"), 6) >= 0.05).as("f4"))
        val c = flags.agg(
          count(lit(1)).as("c0"),
          sum(when(col("f1"), 1L).otherwise(0L)).as("c1"),
          sum(when(col("f1") && col("f2"), 1L).otherwise(0L)).as("c2"),
          sum(when(col("f1") && col("f2") && col("f3"), 1L).otherwise(0L))
            .as("c3"),
          sum(when(col("f1") && col("f2") && col("f3") && col("f4"), 1L)
            .otherwise(0L)).as("c4"))
        def st(i: Int, rule: String, nin: String, nout: String) =
          struct(lit(i.toLong).as("stage"), lit(rule).as("rule"),
            col(nin).as("n_in"), col(nout).as("n_out"),
            col("c0").as("n_corpus"))
        c.select(explode(array(
            st(1, "exact_dedup", "c0", "c1"),
            st(2, "min_length", "c1", "c2"),
            st(3, "lang_id", "c2", "c3"),
            st(4, "stopword_ratio", "c3", "c4"))).as("s"))
          .select(col("s.stage").as("stage"), col("s.rule").as("rule"),
            col("s.n_in").as("n_in"), col("s.n_out").as("n_out"),
            round(col("s.n_out").cast("double") / col("s.n_in"), 6)
              .as("kept_frac"),
            round(col("s.n_out").cast("double") / col("s.n_corpus"), 6)
              .as("cum_frac"))
          .orderBy(col("stage"))
      },
      Some(s"""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 10000, text FROM documents
             |  WHERE doc_id % 5 = 0),
             |prof AS (
             |${docStatsSql("all_docs").stripSuffix(" ORDER BY doc_id")}),
             |winners AS (
             |  SELECT doc_id FROM (
             |    SELECT doc_id, row_number() OVER (
             |      PARTITION BY k ORDER BY doc_id) AS rn
             |    FROM (SELECT doc_id,
             |      lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS k
             |      FROM all_docs))
             |  WHERE rn = 1),
             |flags AS (
             |  SELECT (w.doc_id IS NOT NULL) AS f1, n_tokens >= 20 AS f2,
             |    lang_pred <> 'und' AS f3, stopword_ratio >= 0.05 AS f4
             |  FROM prof p LEFT JOIN winners w ON p.doc_id = w.doc_id),
             |c AS (SELECT count(*) AS c0,
             |    CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |    CAST(sum(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS c2,
             |    CAST(sum(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c3,
             |    CAST(sum(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 ELSE 0
             |      END) AS BIGINT) AS c4
             |  FROM flags)
             |SELECT stage, rule, n_in, n_out,
             |  round(CAST(n_out AS DOUBLE) / n_in, 6) AS kept_frac,
             |  round(CAST(n_out AS DOUBLE) / c0, 6) AS cum_frac
             |FROM (
             |  SELECT c0, CAST(1 AS BIGINT) AS stage, 'exact_dedup' AS rule,
             |    c0 AS n_in, c1 AS n_out FROM c
             |  UNION ALL SELECT c0, 2, 'min_length', c1, c2 FROM c
             |  UNION ALL SELECT c0, 3, 'lang_id', c2, c3 FROM c
             |  UNION ALL SELECT c0, 4, 'stopword_ratio', c3, c4 FROM c)
             |ORDER BY stage""".stripMargin)),


    // ---------------------------------------------------------------------
    // q142: dense time series with gap filling — hourly per-type counts
    // zero-filled over the global [min, max] hour span. The grid is
    // |types| x |hours| (metadata-sized: types and the span are 1-row /
    // distinct aggregates broadcast back); the dense axis is GENERATED
    // (sequence + explode), never scanned, and the left join back to the
    // sparse aggregate is the only corpus-sized shuffle. The standard
    // prep for window/trend analytics over sparse event streams, where a
    // missing bucket must read as zero, not absent (q39's moving average
    // family silently skips empty hours without this).
    QueryDef("q142_dense_timeseries",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("event_type"),
          date_trunc("hour", col("ts")).as("h"), col("value"))
        val agg = e.groupBy(col("event_type"), col("h")).agg(
          count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("value_sum"))
        val span = e.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        val types = e.select(col("event_type")).distinct()
        val grid = types.crossJoin(broadcast(span))
          .select(col("event_type"),
            explode(sequence(col("h0"), col("h1"),
              expr("interval 1 hour"))).as("h"))
        grid.join(agg, Seq("event_type", "h"), "left")
          .select(col("event_type"),
            date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            coalesce(col("n_events"), lit(0L)).as("n_events"),
            coalesce(col("value_sum"), lit(0.0)).as("value_sum"))
          .orderBy(col("event_type"), col("hour"))
      },
      Some("""WITH e AS (SELECT event_type, date_trunc('hour', ts) AS h,
             |    value FROM events),
             |agg AS (SELECT event_type, h, count(*) AS n_events,
             |    round(sum(value), 4) AS value_sum FROM e GROUP BY 1, 2),
             |span AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
             |types AS (SELECT DISTINCT event_type FROM e),
             |grid AS (SELECT event_type,
             |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
             |  FROM types CROSS JOIN span)
             |SELECT g.event_type,
             |  strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
             |  coalesce(n_events, 0) AS n_events,
             |  coalesce(value_sum, 0.0) AS value_sum
             |FROM grid g LEFT JOIN agg a
             |  ON g.event_type = a.event_type AND g.h = a.h
             |ORDER BY g.event_type, hour""".stripMargin)),


    // ---------------------------------------------------------------------
    // q143: per-group OLS trend — slope / intercept / r^2 of event value
    // against time, per event type, via the closed-form regression
    // aggregates (one scan, map-side combined; |types| output rows). The
    // time axis is hours since the corpus epoch as EXACT integer-derived
    // doubles (unix_micros minus a constant, then one division — both
    // engines do identical IEEE ops), which also removes the catastrophic
    // cancellation a raw epoch axis feeds into E[x^2] - E[x]^2.
    QueryDef("q143_trend_slopes",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("event_type"),
          ((unix_micros(col("ts")) - lit(1704067200000000L))
            / lit(3.6e9)).as("x"),
          col("value").as("y"))
        e.groupBy(col("event_type")).agg(
            count(lit(1)).as("n"),
            round(regr_slope(col("y"), col("x")), 6).as("slope"),
            round(regr_intercept(col("y"), col("x")), 4).as("intercept"),
            round(regr_r2(col("y"), col("x")), 6).as("r2"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT event_type,
             |    (epoch_us(ts) - 1704067200000000) / 3.6e9 AS x,
             |    value AS y FROM events)
             |SELECT event_type, count(*) AS n,
             |  round(regr_slope(y, x), 6) AS slope,
             |  round(regr_intercept(y, x), 4) AS intercept,
             |  round(regr_r2(y, x), 6) AS r2
             |FROM e GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),


    // ---------------------------------------------------------------------
    // q144: CDC MERGE (SCD1 upsert/delete) — the lakehouse `MERGE INTO`
    // primitive over a derived change batch: keys %10==0 get two
    // conflicting upserts (seq 2 must win), %10==1 an upsert superseded
    // by a delete (the key must vanish), %97==0 brand-new negative keys
    // (must insert). The batch collapses latest-per-key with a window
    // over the BATCH only; the snapshot is touched by exactly one
    // left-anti key join (AQE broadcasts the collapsed batch) plus a
    // union — the 100-TB side never sorts and never windows.
    QueryDef("q144_merge_upsert",
      (s, dir) => {
        val snap = t(s, dir, "orders").select(
          col("o_orderkey").as("k"), col("o_custkey").as("cust"),
          col("o_orderstatus").as("status"),
          round(col("o_totalprice"), 2).as("price"))
        val base = snap.select(col("k"), col("cust"), col("price"))
        val up1 = base.filter(col("k") % 10 === 0).select(col("k"),
          lit("upsert").as("op"), lit(1L).as("seq"), col("cust"),
          lit("U1").as("status"), (col("price") * 0.5).as("price"))
        val up2 = base.filter(col("k") % 10 === 0).select(col("k"),
          lit("upsert").as("op"), lit(2L).as("seq"), col("cust"),
          lit("U2").as("status"), (col("price") * 2.0).as("price"))
        val delPre = base.filter(col("k") % 10 === 1).select(col("k"),
          lit("upsert").as("op"), lit(1L).as("seq"), col("cust"),
          lit("GHOST").as("status"), col("price"))
        val del = base.filter(col("k") % 10 === 1).select(col("k"),
          lit("delete").as("op"), lit(2L).as("seq"), col("cust"),
          lit(null).cast("string").as("status"),
          lit(null).cast("double").as("price"))
        val ins = base.filter(col("k") % 97 === 0).select(
          (-col("k")).as("k"), lit("upsert").as("op"), lit(1L).as("seq"),
          col("cust"), lit("NEW").as("status"), lit(1.0).as("price"))
        val changes = up1.unionByName(up2).unionByName(delPre)
          .unionByName(del).unionByName(ins)
        graft.operators.Merge.applyChanges(snap, changes, Seq("k"))
          .orderBy(col("k"))
      },
      Some("""WITH snap AS (SELECT o_orderkey AS k, o_custkey AS cust,
             |    o_orderstatus AS status, round(o_totalprice, 2) AS price
             |  FROM orders),
             |changes AS (
             |  SELECT k, 'upsert' AS op, 1 AS seq, cust, 'U1' AS status,
             |      price * 0.5 AS price FROM snap WHERE k % 10 = 0
             |  UNION ALL
             |  SELECT k, 'upsert', 2, cust, 'U2',
             |      price * 2.0 FROM snap WHERE k % 10 = 0
             |  UNION ALL
             |  SELECT k, 'upsert', 1, cust, 'GHOST', price
             |    FROM snap WHERE k % 10 = 1
             |  UNION ALL
             |  SELECT k, 'delete', 2, cust, NULL, NULL
             |    FROM snap WHERE k % 10 = 1
             |  UNION ALL
             |  SELECT -k, 'upsert', 1, cust, 'NEW', 1.0
             |    FROM snap WHERE k % 97 = 0),
             |latest AS (SELECT * FROM (
             |    SELECT k, op, cust, status, price,
             |      row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
             |    FROM changes) WHERE rn = 1),
             |kept AS (SELECT s.* FROM snap s
             |  LEFT JOIN latest l ON s.k = l.k WHERE l.k IS NULL),
             |ups AS (SELECT k, cust, status, price FROM latest
             |  WHERE op = 'upsert')
             |SELECT * FROM (SELECT * FROM kept UNION ALL SELECT * FROM ups)
             |ORDER BY k""".stripMargin)),


    // ---------------------------------------------------------------------
    // q151: CUSUM mean-shift detection (Page 1954) per event type, with a
    // planted +40 level step on 'click' after the 70%-of-max-id point and
    // a -30 step on 'error' after 75% — the positive statistic must alarm
    // on click, the negative on error, and localize the step near the
    // plant. The in-control reference is the first-half slice (pre-plant
    // by construction); standardizing against the monitored series' own
    // pooled stats would make both sides alarm (the operator refuses
    // that). The max-reset recursion S_t = max(0, S_{t-1}+x_t) is
    // computed by its closed form S = C - min(0, running-min C) — two
    // windowed prefix aggregates over one (type, id) sort; no UDF, no
    // state, one shuffle.
    QueryDef("q151_cusum_shift",
      (s, dir) => {
        val e0 = t(s, dir, "events").select(col("event_type"),
          col("event_id"), col("value"))
        val mx = e0.agg(max(col("event_id")).as("__mx"))
        val e = e0.crossJoin(broadcast(mx)).select(col("event_type"),
          col("event_id"), col("__mx"),
          (col("value")
            + when(col("event_type") === "click" &&
                col("event_id") > col("__mx") * 0.7, 40.0).otherwise(0.0)
            - when(col("event_type") === "error" &&
                col("event_id") > col("__mx") * 0.75, 30.0).otherwise(0.0))
            .as("value"))
        val baseline = e.filter(col("event_id") <= col("__mx") * 0.5)
        graft.operators.Changepoint.cusum(
            baseline, e, "event_type", "event_id", "value")
          .orderBy(col("event_type"))
      },
      Some("""WITH mx AS (SELECT max(event_id) AS m FROM events),
             |e AS (SELECT event_type, event_id, m,
             |    value
             |      + CASE WHEN event_type = 'click' AND event_id > 0.7 * m
             |        THEN 40.0 ELSE 0.0 END
             |      - CASE WHEN event_type = 'error' AND event_id > 0.75 * m
             |        THEN 30.0 ELSE 0.0 END AS v
             |  FROM events CROSS JOIN mx),
             |st AS (SELECT event_type, avg(v) AS mu,
             |    stddev_pop(v) AS sigma FROM e
             |  WHERE event_id <= 0.5 * m GROUP BY 1),
             |z AS (SELECT e.event_type, event_id, mu, sigma,
             |    round((v - mu) / sigma, 6) AS z
             |  FROM e JOIN st USING (event_type) WHERE sigma > 0),
             |c AS (SELECT event_type, event_id, mu, sigma,
             |    sum(z - 0.5) OVER w AS cpos,
             |    sum(-z - 0.5) OVER w AS cneg
             |  FROM z WINDOW w AS (PARTITION BY event_type
             |    ORDER BY event_id ROWS UNBOUNDED PRECEDING)),
             |sc AS (SELECT event_type, event_id, mu, sigma,
             |    round(cpos - least(0, min(cpos) OVER w), 4) AS s_pos,
             |    round(cneg - least(0, min(cneg) OVER w), 4) AS s_neg
             |  FROM c WINDOW w AS (PARTITION BY event_type
             |    ORDER BY event_id ROWS UNBOUNDED PRECEDING))
             |SELECT event_type, count(*) AS n,
             |  round(any_value(mu), 6) AS mu,
             |  round(any_value(sigma), 6) AS sigma,
             |  max(s_pos) AS max_s_pos, max(s_neg) AS max_s_neg,
             |  min(CASE WHEN s_pos > 5.0 THEN event_id END) AS cp_pos,
             |  min(CASE WHEN s_neg > 5.0 THEN event_id END) AS cp_neg,
             |  min(CASE WHEN s_pos > 5.0 THEN event_id END) IS NOT NULL
             |    AS alarm_pos,
             |  min(CASE WHEN s_neg > 5.0 THEN event_id END) IS NOT NULL
             |    AS alarm_neg
             |FROM sc GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),


    // ---------------------------------------------------------------------
    // q156: Kaplan-Meier time-to-conversion per signup cohort —
    // subjects are users, the event is the first high-value purchase
    // (value >= 90, rare enough that ~1 in 7 users never converts and
    // is right-censored at their last observed event), durations
    // coarsened to whole hours so event times tie. The subject frame
    // is one user-keyed aggregate over the corpus; the KM product
    // rides cohort-partitioned prefix windows over distinct durations.
    QueryDef("q156_kaplan_meier",
      (s, dir) => {
        val e = t(s, dir, "events")
        val perUser = e.groupBy(col("user_id")).agg(
          min(col("ts")).as("t0"), max(col("ts")).as("t_last"),
          min(when(col("event_type") === "purchase"
            && col("value") >= 90.0, col("ts"))).as("t_ev"))
        val gmin = e.agg(min(col("ts")).as("g0"))
        val subj = perUser.crossJoin(broadcast(gmin)).select(
          concat(lit("w"), floor(
            (unix_micros(col("t0")) - unix_micros(col("g0")))
              / lit(604800000000L)).cast("string")).as("cohort"),
          floor((unix_micros(coalesce(col("t_ev"), col("t_last")))
            - unix_micros(col("t0"))) / lit(3600000000L)).as("dur_h"),
          col("t_ev").isNotNull.as("ev"))
        graft.operators.Survival.kaplanMeier(
            subj, "cohort", "dur_h", "ev")
          .orderBy(col("cohort"), col("t"))
      },
      Some("""WITH g AS (SELECT min(ts) AS g0 FROM events),
             |pu AS (SELECT user_id, min(ts) AS t0, max(ts) AS t_last,
             |    min(CASE WHEN event_type = 'purchase'
             |      AND value >= 90.0 THEN ts END) AS t_ev
             |  FROM events GROUP BY 1),
             |subj AS (SELECT
             |    'w' || CAST(CAST(floor((epoch_us(t0) - epoch_us(g0))
             |      / 604800000000) AS BIGINT) AS VARCHAR) AS cohort,
             |    CAST(floor((epoch_us(coalesce(t_ev, t_last))
             |      - epoch_us(t0)) / 3600000000) AS BIGINT) AS dur_h,
             |    t_ev IS NOT NULL AS ev
             |  FROM pu CROSS JOIN g),
             |pt AS (SELECT cohort, dur_h AS t,
             |    sum(CASE WHEN ev THEN 1 ELSE 0 END) AS d,
             |    sum(CASE WHEN ev THEN 0 ELSE 1 END) AS c
             |  FROM subj GROUP BY 1, 2),
             |km1 AS (SELECT cohort, t, d, c,
             |    sum(d + c) OVER (PARTITION BY cohort)
             |      - sum(d + c) OVER w + (d + c) AS n_risk
             |  FROM pt WINDOW w AS (PARTITION BY cohort ORDER BY t
             |    ROWS UNBOUNDED PRECEDING)),
             |km2 AS (SELECT cohort, t, n_risk, d, c,
             |    max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER w
             |      AS dead,
             |    sum(CASE WHEN d > 0 AND d < n_risk
             |      THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
             |      ELSE 0.0 END) OVER w AS lsum
             |  FROM km1 WINDOW w AS (PARTITION BY cohort ORDER BY t
             |    ROWS UNBOUNDED PRECEDING))
             |SELECT cohort, t, CAST(n_risk AS BIGINT) AS n_risk,
             |  CAST(d AS BIGINT) AS n_event,
             |  CAST(c AS BIGINT) AS n_censored,
             |  CASE WHEN dead = 1 THEN 0.0
             |    ELSE round(exp(lsum), 6) END AS survival
             |FROM km2 WHERE d > 0
             |ORDER BY cohort, t""".stripMargin)),


    // ---------------------------------------------------------------------
    // q158: multi-touch attribution over the event stream — view/click
    // touches credit each same-user purchase inside a 72h lookback
    // under all five standard models at once (first/last/linear/
    // position 40-20-40/time-decay hl=24h); channels derive from the
    // props JSON campaign key mod 4. The assignment is one user-keyed
    // equi-join with a range predicate; per-conversion ordering rides
    // (user, conversion) windows; the rollup is |channels|-keyed.
    QueryDef("q158_attribution",
      (s, dir) => {
        val e = t(s, dir, "events")
        val touches = e.filter(col("event_type").isin("view", "click"))
          .select(col("user_id"), col("ts"), col("event_id"),
            concat(lit("ch"),
              (get_json_object(col("props"), "$.k").cast("int") % 4)
                .cast("string")).as("channel"))
        val convs = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"))
        graft.operators.Attribution.multiTouch(touches, convs,
            "user_id", "ts", "event_id", "channel",
            lookbackHours = 72, halfLifeHours = 24.0)
          .orderBy(col("channel"))
      },
      Some("""WITH t AS (SELECT user_id AS u, epoch_us(ts) AS tus,
             |    event_id AS tid,
             |    'ch' || CAST(CAST(json_extract_string(props, '$.k')
             |      AS INTEGER) % 4 AS VARCHAR) AS channel
             |  FROM events WHERE event_type IN ('view', 'click')),
             |c AS (SELECT user_id AS u, epoch_us(ts) AS cus,
             |    event_id AS cid
             |  FROM events WHERE event_type = 'purchase'),
             |a AS (SELECT t.channel, t.u, t.tus, t.tid, c.cus, c.cid
             |  FROM t JOIN c ON t.u = c.u
             |  WHERE t.tus < c.cus AND t.tus >= c.cus - 259200000000),
             |s AS (SELECT channel, cid,
             |    row_number() OVER (PARTITION BY u, cid
             |      ORDER BY tus, tid) AS pos,
             |    count(*) OVER (PARTITION BY u, cid) AS k,
             |    pow(0.5, (cus - tus) / 86400000000.0) AS dw,
             |    sum(pow(0.5, (cus - tus) / 86400000000.0))
             |      OVER (PARTITION BY u, cid) AS dwt
             |  FROM a),
             |cr AS (SELECT channel, cid,
             |    CASE WHEN pos = 1 THEN 1.0 ELSE 0.0 END AS c_first,
             |    CASE WHEN pos = k THEN 1.0 ELSE 0.0 END AS c_last,
             |    1.0 / k AS c_linear,
             |    CASE WHEN k = 1 THEN 1.0 WHEN k = 2 THEN 0.5
             |      WHEN pos = 1 OR pos = k THEN 0.4
             |      ELSE 0.2 / (k - 2) END AS c_position,
             |    dw / dwt AS c_decay
             |  FROM s)
             |SELECT channel, count(*) AS n_touches,
             |  count(DISTINCT cid) AS n_convs,
             |  round(sum(c_first), 4) AS credit_first,
             |  round(sum(c_last), 4) AS credit_last,
             |  round(sum(c_linear), 4) AS credit_linear,
             |  round(sum(c_position), 4) AS credit_position,
             |  round(sum(c_decay), 4) AS credit_decay
             |FROM cr GROUP BY channel ORDER BY channel""".stripMargin)),


    // ---------------------------------------------------------------------
    // q180: inter-arrival traffic-model audit — per event type, the
    // exponential MLE fit to per-user event gaps plus a one-sample KS
    // goodness-of-fit against the fitted CDF (Lilliefors caveat noted
    // in the operator). Where Poisson-arrival assumptions (capacity
    // models, anomaly baselines, load generators) actually hold. The
    // mean comes from exact integer-microsecond sums; lambda freezes
    // at 6 decimals; ECDF rides type-partitioned prefix windows over
    // distinct integer gaps.
    QueryDef("q180_interarrival_fit",
      (s, dir) => graft.operators.Sessionize.interArrivalExpFit(
          t(s, dir, "events"), "event_type", col("user_id"), col("ts"),
          col("event_id"))
        .orderBy(col("event_type")),
      Some("""WITH g0 AS (SELECT event_type,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |      PARTITION BY event_type, user_id
             |      ORDER BY ts, event_id) AS gus
             |  FROM events),
             |g AS (SELECT event_type, gus FROM g0
             |  WHERE gus IS NOT NULL AND gus > 0),
             |fit AS (SELECT event_type,
             |    CAST(count(*) AS BIGINT) AS n_gaps,
             |    round(sum(gus) / (count(*) * 1e6), 6) AS mean_gap_s
             |  FROM g GROUP BY 1),
             |fit2 AS (SELECT *, round(1.0 / mean_gap_s, 6) AS lambda
             |  FROM fit),
             |pv AS (SELECT event_type, gus, count(*) AS c FROM g
             |  GROUP BY 1, 2),
             |ec AS (SELECT event_type, gus,
             |    CAST(sum(c) OVER w2 AS DOUBLE)
             |      / sum(c) OVER (PARTITION BY event_type) AS femp
             |  FROM pv WINDOW w2 AS (PARTITION BY event_type
             |    ORDER BY gus ROWS UNBOUNDED PRECEDING)),
             |ec2 AS (SELECT *, coalesce(lag(femp) OVER (
             |      PARTITION BY event_type ORDER BY gus), 0.0)
             |    AS femp_prev
             |  FROM ec),
             |dd AS (SELECT e.event_type,
             |    max(greatest(
             |      abs(femp - (1.0 - exp(-lambda * (gus / 1e6)))),
             |      abs((1.0 - exp(-lambda * (gus / 1e6)))
             |        - femp_prev))) AS d
             |  FROM ec2 e JOIN fit2 USING (event_type) GROUP BY 1)
             |SELECT f.event_type, n_gaps, mean_gap_s, lambda,
             |  round(d, 6) AS d_stat,
             |  round(sqrt(n_gaps) * d, 4) AS ks_stat,
             |  sqrt(n_gaps) * d <= 1.358 AS exp_ok
             |FROM fit2 f JOIN dd USING (event_type)
             |ORDER BY event_type""".stripMargin)),


    // ---------------------------------------------------------------------
    // q182: Markov transition model + 3-iteration stationary estimate
    // over per-user event sequences — where does behavior settle. P
    // rounds at 6; each power iteration re-rounds at 6 (freezing
    // summation-order drift); the twin unrolls the identical 3
    // iterations. One lag window + one (from, to) count aggregate;
    // iterations are |types|²-frame arithmetic.
    QueryDef("q182_markov_stationary",
      (s, dir) => {
        val e = t(s, dir, "events")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        // pre-aggregation columns carry the DOMAIN names (from_s/to_s —
        // few-valued event types) so PlanGuardSpec's few-key sweep can
        // see that the |states|^2 transition aggregate is metadata
        val trans = e
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("prev").as("from_s"), col("event_type").as("to_s"))
        graft.operators.Graphs.markovStationary(trans, "from_s", "to_s",
            iters = 3)
          .orderBy(col("from_s"), col("to_s"))
      },
      Some("""WITH tr AS (SELECT lag(event_type) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS f,
             |    event_type AS t0
             |  FROM events),
             |cnt AS (SELECT f, t0, count(*) AS n FROM tr
             |  WHERE f IS NOT NULL GROUP BY 1, 2),
             |p AS (SELECT f, t0, n, round(CAST(n AS DOUBLE)
             |    / sum(n) OVER (PARTITION BY f), 6) AS p
             |  FROM cnt),
             |st AS (SELECT DISTINCT f AS s FROM cnt
             |  UNION SELECT DISTINCT t0 FROM cnt),
             |k AS (SELECT count(*) AS k FROM st),
             |pi0 AS (SELECT s, round(1.0 / k, 6) AS pi
             |  FROM st CROSS JOIN k),
             |pi1 AS (SELECT p.t0 AS s, round(sum(p.p * q.pi), 6) AS pi
             |  FROM p JOIN pi0 q ON q.s = p.f GROUP BY 1),
             |pi2 AS (SELECT p.t0 AS s, round(sum(p.p * q.pi), 6) AS pi
             |  FROM p JOIN pi1 q ON q.s = p.f GROUP BY 1),
             |pi3 AS (SELECT p.t0 AS s, round(sum(p.p * q.pi), 6) AS pi
             |  FROM p JOIN pi2 q ON q.s = p.f GROUP BY 1)
             |SELECT p.f AS from_s, p.t0 AS to_s, n, p,
             |  coalesce(q.pi, 0.0) AS pi_from
             |FROM p LEFT JOIN pi3 q ON q.s = p.f
             |ORDER BY from_s, to_s""".stripMargin))
  )
}
