package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Cleaning, Text, Vec}
import graft.operators.{Dedup, Similarity}
import graft.pipeline.{Fill, GoldenRecord, Validate}

/** The driver-graded query registry: every SURVEY.md §2 operator family is
  * exercised by at least one query over the TESTDATA corpus, each with an
  * equivalent DuckDB oracle SQL twin (hash-compared at sf0.01).
  *
  * Conventions that make the hash compare work (see the driver contract):
  *  - every computed column is aliased identically in Spark and SQL;
  *  - aggregated doubles are rounded (summation order differs across engines
  *    in the last bits — rounding removes it); per-row double arithmetic is
  *    left exact (identical IEEE ops on identical inputs);
  *  - timestamps are emitted as formatted strings;
  *  - every ranking has a total order (explicit unique tiebreak column).
  */
object Queries {

  case class QueryDef(name: String,
      spark: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val all: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------------
    // q1: scan -> filter -> hash aggregate (A1/A4 analogue; TPC-H Q1 shape).
    // Partial aggregation (map-side combine) keeps the shuffle at
    // |groups| x partitions regardless of corpus size.
    QueryDef("q1_pricing_summary",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---------------------------------------------------------------------
    // q2: tight filter + single aggregate (TPC-H Q6 shape). Predicate reaches
    // the parquet scan (PushedFilters), only 4 columns are read.
    QueryDef("q2_revenue_filter",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.filter(
            col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
            .as("revenue"))
      },
      Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // ---------------------------------------------------------------------
    // q3: 3-way join -> aggregate -> top-k (TPC-H Q3 shape). customer is the
    // small side (broadcast); ranking totally ordered via orderkey tiebreak.
    QueryDef("q3_top_orders",
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY o_orderkey, order_date
             |ORDER BY revenue DESC, o_orderkey ASC
             |LIMIT 10""".stripMargin)),

    // ---------------------------------------------------------------------
    // q4: snowflake dimension joins (both broadcast) + rollup per region.
    QueryDef("q4_region_suppliers",
      (s, dir) => {
        val sup = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        sup.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_suppliers"),
            round(sum(col("s_acctbal")), 2).as("total_acctbal"))
          .orderBy(col("r_name"))
      },
      Some("""SELECT r_name, count(*) AS n_suppliers,
             |  round(sum(s_acctbal), 2) AS total_acctbal
             |FROM supplier
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // ---------------------------------------------------------------------
    // q5: window ranking (P7/P8/J4 analogue): top-3 orders per customer,
    // totally ordered (price desc, orderkey asc).
    QueryDef("q5_top_orders_per_cust",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        o.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("rn"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // ---------------------------------------------------------------------
    // q6: exact dedup with deterministic survivor (S12/A8: min id per key),
    // via the library operator (window row_number, one shuffle on the key).
    QueryDef("q6_dedup_orders",
      (s, dir) => {
        val o = t(s, dir, "orders")
        Dedup.exact(o, Seq(col("o_custkey"), col("o_orderstatus")),
            col("o_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus FROM (
             |  SELECT o_orderkey, o_custkey, o_orderstatus,
             |    row_number() OVER (PARTITION BY o_custkey, o_orderstatus
             |      ORDER BY o_orderkey ASC) AS rn
             |  FROM orders)
             |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin)),

    // ---------------------------------------------------------------------
    // q7: set operation (§2.7): distinct union of nation keys from two tables.
    QueryDef("q7_union_nations",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        c.union(sup).distinct().orderBy(col("nationkey"))
      },
      Some("""SELECT DISTINCT nationkey FROM (
             |  SELECT c_nationkey AS nationkey FROM customer
             |  UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
             |ORDER BY nationkey""".stripMargin)),

    // ---------------------------------------------------------------------
    // q8: semi/anti joins (F6 guard analogue): per segment, customers with
    // and without orders. Semi/anti are shuffle-free on the small build side.
    QueryDef("q8_cust_order_activity",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").select(col("o_custkey"))
        val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_orders"))
        val withoutO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without_orders"))
        withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
          .select(col("c_mktsegment"),
            coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
            coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment,
             |  count(CASE WHEN has_o THEN 1 END) AS n_with_orders,
             |  count(CASE WHEN NOT has_o THEN 1 END) AS n_without_orders
             |FROM (SELECT c_mktsegment,
             |        EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
             |      FROM customer)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ---------------------------------------------------------------------
    // q9: scalar string functions (C1-C7): pure per-row projection — fuses
    // into the scan under whole-stage codegen.
    QueryDef("q9_part_text",
      (s, dir) => {
        val p = t(s, dir, "part")
        p.filter(col("p_partkey") % 10 === 0)
          .select(col("p_partkey"),
            upper(col("p_brand")).as("brand_u"),
            substring(col("p_name"), 1, 5).as("name5"),
            regexp_replace(col("p_type"), " ", "_").as("type_u"),
            length(col("p_name")).as("name_len"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
            trim(lower(col("p_name"))).as("name_norm"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, upper(p_brand) AS brand_u,
             |  substr(p_name, 1, 5) AS name5,
             |  replace(p_type, ' ', '_') AS type_u,
             |  length(p_name) AS name_len,
             |  concat_ws('|', p_brand, p_type) AS brand_type,
             |  trim(lower(p_name)) AS name_norm
             |FROM part WHERE p_partkey % 10 = 0 ORDER BY p_partkey""".stripMargin)),

    // ---------------------------------------------------------------------
    // q10: date bucketing (C8) + aggregate; month emitted as a string.
    QueryDef("q10_orders_by_month",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("total_price"))
          .orderBy(col("month"), col("o_orderstatus"))
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus,
             |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
             |FROM orders GROUP BY month, o_orderstatus
             |ORDER BY month, o_orderstatus""".stripMargin)),

    // ---------------------------------------------------------------------
    // q11: conditional aggregation (A4: one pass, many conditional counts).
    QueryDef("q11_status_matrix",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.groupBy(col("o_orderpriority"))
          .agg(count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
            count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
            count(when(col("o_orderstatus") === "P", 1)).as("n_p"),
            count(lit(1)).as("n_total"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
             |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
             |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
             |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
             |  count(*) AS n_total
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---------------------------------------------------------------------
    // q12: the golden-record mostComplete aggregate (A1) — longest value wins,
    // ties -> earliest row — via the library's max_by-with-strict-order
    // formulation (partial-agg friendly: one shuffle of per-group winners).
    QueryDef("q12_golden_name",
      (s, dir) => {
        val c = t(s, dir, "customer")
        c.groupBy(col("c_nationkey"))
          .agg(GoldenRecord.mostComplete(col("c_name"),
              lit(null).cast("timestamp"), col("c_custkey")).as("best_name"),
            count(lit(1)).as("n_customers"))
          .orderBy(col("c_nationkey"))
      },
      Some("""SELECT c_nationkey, best_name, n_customers FROM (
             |  SELECT c_nationkey, c_name AS best_name,
             |    count(*) OVER (PARTITION BY c_nationkey) AS n_customers,
             |    row_number() OVER (PARTITION BY c_nationkey
             |      ORDER BY length(c_name) DESC, c_custkey ASC) AS rn
             |  FROM customer)
             |WHERE rn = 1 ORDER BY c_nationkey""".stripMargin)),

    // ---------------------------------------------------------------------
    // q13: the validation stage (F1/F2/F4/F5) over a contacts-shaped frame
    // derived deterministically from customer. Exercises the real library
    // rules; the SQL twin re-states them relationally.
    QueryDef("q13_validate_contacts",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val contacts = c.select(
          col("c_custkey").cast("long").as("row_id"),
          when(col("c_custkey") % 7 === 0, lit(null))
            .otherwise(concat(lit("Cust"), col("c_custkey"))).as("FIRSTNAME"),
          when(col("c_custkey") % 11 === 0, lit(""))
            .otherwise(concat(lit("Key"), col("c_custkey"))).as("LASTNAME"),
          when(col("c_custkey") % 5 === 0, lit(null))
            .when(col("c_custkey") % 10 === 3, lit("bad-email"))
            .otherwise(concat(lit("user"), col("c_custkey"), lit("@ex.com")))
            .as("EMAIL"),
          when(col("c_custkey") % 6 === 0, lit(null))
            .when(col("c_custkey") % 6 === 1, lit("12345"))
            .otherwise(concat(lit("555000"), lpad(col("c_custkey").cast("string"), 6, "0")))
            .as("MOBILE"))
        Validate.errors(contacts).orderBy(col("row_id"), col("field"), col("error"))
      },
      Some("""WITH contacts AS (
             |  SELECT CAST(c_custkey AS BIGINT) AS row_id,
             |    CASE WHEN c_custkey % 7 = 0 THEN NULL
             |         ELSE 'Cust' || c_custkey END AS firstname,
             |    CASE WHEN c_custkey % 11 = 0 THEN ''
             |         ELSE 'Key' || c_custkey END AS lastname,
             |    CASE WHEN c_custkey % 5 = 0 THEN NULL
             |         WHEN c_custkey % 10 = 3 THEN 'bad-email'
             |         ELSE 'user' || c_custkey || '@ex.com' END AS email,
             |    CASE WHEN c_custkey % 6 = 0 THEN NULL
             |         WHEN c_custkey % 6 = 1 THEN '12345'
             |         ELSE '555000' || lpad(CAST(c_custkey AS VARCHAR), 6, '0') END AS mobile
             |  FROM customer),
             |flags AS (
             |  SELECT *,
             |    (firstname IS NULL OR trim(firstname) = ''
             |      OR trim(firstname) IN ('nan','None','NaN')) AS miss_first,
             |    (lastname IS NULL OR trim(lastname) = ''
             |      OR trim(lastname) IN ('nan','None','NaN')) AS miss_last,
             |    (email IS NULL OR trim(email) = ''
             |      OR trim(email) IN ('nan','None','NaN')) AS miss_email,
             |    (mobile IS NULL OR trim(mobile) = ''
             |      OR trim(mobile) IN ('nan','None','NaN')) AS miss_phone
             |  FROM contacts),
             |errs AS (
             |  SELECT row_id, 'FIRSTNAME' AS field, 'Missing first name' AS error,
             |    coalesce(firstname, '') AS value FROM flags WHERE miss_first
             |  UNION ALL
             |  SELECT row_id, 'LASTNAME', 'Missing last name', coalesce(lastname, '')
             |  FROM flags WHERE miss_last
             |  UNION ALL
             |  SELECT row_id, 'EMAIL', 'Missing email address', coalesce(email, '')
             |  FROM flags WHERE miss_email
             |  UNION ALL
             |  SELECT row_id, 'EMAIL', 'Invalid email format', coalesce(email, '')
             |  FROM flags WHERE NOT miss_email
             |    AND NOT regexp_matches(lower(trim(email)), '^[^@]+@[^@]+\.[^@]+')
             |  UNION ALL
             |  SELECT row_id, 'MOBILE', 'Missing phone number', coalesce(mobile, '')
             |  FROM flags WHERE miss_phone
             |  UNION ALL
             |  SELECT row_id, 'MOBILE', 'Invalid phone number', coalesce(mobile, '')
             |  FROM flags WHERE NOT miss_phone
             |    AND length(regexp_replace(mobile, '[^0-9]', '', 'g')) NOT BETWEEN 7 AND 15)
             |SELECT row_id, field, error, value FROM errs
             |WHERE row_id NOT IN (
             |  SELECT row_id FROM flags
             |  WHERE miss_first AND miss_last AND miss_email AND miss_phone)
             |ORDER BY row_id, field, error""".stripMargin)),

    // ---------------------------------------------------------------------
    // q14: 2-key correlated-lookup fill (J1, the Mailchimp special case):
    // fill missing emails from a source by exact (name, phone) match,
    // first source row wins, via the library's broadcast-join operator.
    QueryDef("q14_fill_twokey",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val master = c.select(
          col("c_custkey").cast("long").as("row_id"),
          Cleaning.normName(col("c_name")).as("_name"),
          when(col("c_custkey") % 3 === 0, lit(""))
            .otherwise(concat(lit("u"), col("c_custkey"), lit("@ex.com")))
            .as("email"),
          concat(lit("555"), lpad(col("c_custkey").cast("string"), 7, "0"))
            .as("mobile"))
          .withColumn("_email", Cleaning.normEmail(col("email")))
          .withColumn("_phone", Cleaning.normPhone(col("mobile")))
        // source knows emails for even custkeys, keyed by (name, phone)
        val mc = c.filter(col("c_custkey") % 2 === 0).select(
          col("c_custkey").cast("long").as("src_order"),
          Cleaning.normName(col("c_name")).as("_name"),
          concat(lit("filled"), col("c_custkey"), lit("@mc.com")).as("email"),
          lit("").as("mobile"),
          Cleaning.normPhone(concat(lit("555"),
            lpad(col("c_custkey").cast("string"), 7, "0"))).as("_phone"))
          .withColumn("_email", Cleaning.normEmail(col("email")))
        Fill.mailchimpFill(master, mc)
          .select(col("row_id"), col("email"), col("mobile"))
          .orderBy(col("row_id"))
      },
      Some("""WITH master AS (
             |  SELECT CAST(c_custkey AS BIGINT) AS row_id,
             |    lower(trim(regexp_replace(c_name, '\s+', ' ', 'g'))) AS _name,
             |    CASE WHEN c_custkey % 3 = 0 THEN ''
             |         ELSE 'u' || c_custkey || '@ex.com' END AS email,
             |    '555' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS mobile
             |  FROM customer),
             |mkeys AS (
             |  SELECT *, CASE WHEN length(regexp_replace(mobile, '[^0-9]', '', 'g')) >= 10
             |    THEN right(regexp_replace(mobile, '[^0-9]', '', 'g'), 10)
             |    ELSE regexp_replace(mobile, '[^0-9]', '', 'g') END AS _phone
             |  FROM master),
             |src AS (
             |  SELECT CAST(c_custkey AS BIGINT) AS src_order,
             |    lower(trim(regexp_replace(c_name, '\s+', ' ', 'g'))) AS _name,
             |    'filled' || c_custkey || '@mc.com' AS s_email,
             |    CASE WHEN length(regexp_replace('555' || lpad(CAST(c_custkey AS VARCHAR), 7, '0'), '[^0-9]', '', 'g')) >= 10
             |      THEN right('555' || lpad(CAST(c_custkey AS VARCHAR), 7, '0'), 10)
             |      ELSE '555' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') END AS _phone,
             |    row_number() OVER (
             |      PARTITION BY lower(trim(regexp_replace(c_name, '\s+', ' ', 'g'))),
             |        CASE WHEN length(regexp_replace('555' || lpad(CAST(c_custkey AS VARCHAR), 7, '0'), '[^0-9]', '', 'g')) >= 10
             |          THEN right('555' || lpad(CAST(c_custkey AS VARCHAR), 7, '0'), 10)
             |          ELSE '555' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') END
             |      ORDER BY c_custkey ASC) AS rn
             |  FROM customer WHERE c_custkey % 2 = 0)
             |SELECT m.row_id,
             |  CASE WHEN m.email IS NULL OR trim(m.email) = ''
             |         OR trim(m.email) IN ('nan','None','NaN')
             |       THEN s.s_email ELSE m.email END AS email,
             |  m.mobile
             |FROM mkeys m
             |LEFT JOIN (SELECT * FROM src WHERE rn = 1) s
             |  ON m._name = s._name AND m._phone = s._phone
             |ORDER BY m.row_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q15: text analysis (language-ID, quality, token counts) — pure per-row
    // expressions over documents; every metric has an exact SQL twin because
    // all arithmetic is integer-derived.
    QueryDef("q15_doc_stats",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(col("doc_id"),
            Text.tokenCount(col("text")).as("n_tokens"),
            Text.langId(col("text")).as("lang_pred"),
            round(Text.stopwordRatio(col("text")), 6).as("stopword_ratio"),
            round(Text.meanWordLen(col("text")), 6).as("mean_word_len"),
            Text.qualityScore(col("text")).as("quality"))
          .orderBy(col("doc_id"))
      },
      Some(docStatsOracle)),

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
             |FROM events WHERE event_id % 20 = 0 ORDER BY event_id""".stripMargin))
  )

  /** Oracle twin of q15 — the language-ID / quality formulas restated over
    * DuckDB list functions. Token model: lower(trim(text)) split on \s+. */
  private lazy val docStatsOracle: String = {
    def hits(words: Seq[String]): String =
      s"len(list_filter(toks, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
    val en = hits(Text.LangMarkers.find(_._1 == "en").get._2)
    val de = hits(Text.LangMarkers.find(_._1 == "de").get._2)
    val fr = hits(Text.LangMarkers.find(_._1 == "fr").get._2)
    val es = hits(Text.LangMarkers.find(_._1 == "es").get._2)
    val zh = hits(Text.LangMarkers.find(_._1 == "zh").get._2)
    val stop = Text.StopwordsEn.map(w => s"'$w'").mkString(",")
    s"""WITH tok AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |      t -> t <> '') AS toks
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, text, toks, len(toks) AS n_tokens,
       |    $en AS h_en, $de AS h_de, $fr AS h_fr, $es AS h_es, $zh AS h_zh,
       |    len(list_filter(toks, t -> t IN ($stop))) AS n_stop,
       |    list_sum(list_transform(toks, t -> length(t))) AS tok_chars
       |  FROM tok)
       |SELECT doc_id, n_tokens,
       |  CASE
       |    WHEN greatest(h_en, h_de, h_fr, h_es, h_zh) = 0 THEN 'und'
       |    WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_zh THEN 'en'
       |    WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_zh THEN 'de'
       |    WHEN h_fr >= h_es AND h_fr >= h_zh THEN 'fr'
       |    WHEN h_es >= h_zh THEN 'es'
       |    ELSE 'zh' END AS lang_pred,
       |  round(CASE WHEN n_tokens > 0
       |    THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END, 6) AS stopword_ratio,
       |  round(CASE WHEN n_tokens > 0
       |    THEN CAST(tok_chars AS DOUBLE) / n_tokens ELSE 0.0 END, 6) AS mean_word_len,
       |  round((
       |    least(CAST(n_tokens AS DOUBLE) / 20.0, 1.0)
       |    + CASE WHEN n_tokens > 0
       |        AND CAST(tok_chars AS DOUBLE) / n_tokens >= 3.0
       |        AND CAST(tok_chars AS DOUBLE) / n_tokens <= 10.0
       |        THEN 1.0 ELSE 0.5 END
       |    + CASE WHEN n_tokens > 0
       |        AND CAST(n_stop AS DOUBLE) / n_tokens > 0.01 THEN 1.0 ELSE 0.5 END
       |    + CASE WHEN (CASE WHEN length(text) > 0
       |        THEN CAST(length(text) - length(regexp_replace(text, '[\\p{Punct}]', '', 'g')) AS DOUBLE) / length(text)
       |        ELSE 0.0 END) < 0.2 THEN 1.0 ELSE 0.5 END
       |  ) / 4.0, 4) AS quality
       |FROM scored ORDER BY doc_id""".stripMargin
  }
}
