package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Cleaning, Text, Vec}
import graft.operators.{AllPairs, Boilerplate, Classify, Dedup, Mix, Multimodal, Sessionize, Similarity, SuffixArray}
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
             |    trim(concat_ws(' ', trim(coalesce(firstname, '')),
             |      trim(coalesce(lastname, '')))) AS full_name,
             |    (firstname IS NULL OR trim(firstname) = ''
             |      OR lower(trim(firstname)) = 'nan') AS rm_first,
             |    (lastname IS NULL OR trim(lastname) = ''
             |      OR lower(trim(lastname)) = 'nan') AS rm_last,
             |    (email IS NULL OR trim(email) = ''
             |      OR lower(trim(email)) = 'nan') AS rm_email,
             |    (mobile IS NULL OR trim(mobile) = ''
             |      OR lower(trim(mobile)) = 'nan') AS rm_phone,
             |    coalesce(trim(mobile) <> '' AND lower(trim(mobile)) <> 'nan',
             |      false) AS phone_present
             |  FROM contacts),
             |kept AS (
             |  SELECT * FROM flags
             |  WHERE NOT ((rm_first AND rm_last AND rm_email AND rm_phone)
             |    OR full_name = '' OR lower(full_name) IN ('nan nan', 'nan'))),
             |errs AS (
             |  SELECT row_id, 'FIRSTNAME' AS field,
             |    'Missing FIRSTNAME' AS error, coalesce(firstname, '') AS value
             |  FROM kept WHERE firstname IS NULL OR trim(firstname) = ''
             |  UNION ALL
             |  SELECT row_id, 'LASTNAME', 'Missing LASTNAME', coalesce(lastname, '')
             |  FROM kept WHERE lastname IS NULL OR trim(lastname) = ''
             |  UNION ALL
             |  SELECT row_id, 'EMAIL', 'Missing EMAIL', coalesce(email, '')
             |  FROM kept WHERE email IS NULL OR trim(email) = ''
             |  UNION ALL
             |  SELECT row_id, 'EMAIL', 'Invalid email format', coalesce(email, '')
             |  FROM kept WHERE NOT (email IS NULL OR trim(email) = '')
             |    AND NOT regexp_matches(lower(trim(email)), '^[^@]+@[^@]+\.[^@]+')
             |  UNION ALL
             |  SELECT row_id, 'MOBILE', 'Invalid phone in MOBILE', coalesce(mobile, '')
             |  FROM kept WHERE trim(mobile) <> '' AND lower(trim(mobile)) <> 'nan'
             |    AND length(regexp_replace(mobile, '[^0-9]', '', 'g')) NOT BETWEEN 7 AND 15
             |  UNION ALL
             |  SELECT row_id, 'PHONE',
             |    'Missing phone number (MOBILE, DIRECTPHONE, or HOMEPHONE)', ''
             |  FROM kept WHERE NOT phone_present)
             |SELECT row_id, field, error, value FROM errs
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
             |       THEN coalesce(s.s_email, m.email) ELSE m.email END AS email,
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
        // explode-once -> codegen'd conditional-sum aggregate -> join back:
        // the corpus-scale shape (interpreted per-row lambdas would burn
        // cores on dispatch at 100 TB) — see operators.TextProfile
        graft.operators.TextProfile.profile(d, "doc_id", "text")
          .select(col("doc_id"), col("n_tokens"), col("lang_pred"),
            round(col("stopword_ratio"), 6).as("stopword_ratio"),
            round(col("mean_word_len"), 6).as("mean_word_len"),
            col("quality"))
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
             |FROM events WHERE event_id % 20 = 0 ORDER BY event_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q18: exact text dedup at corpus scale (hash-shuffle on the normalized
    // content key, deterministic min-id survivor). Exact duplicates are
    // planted (the synthetic corpus has none) so the operator does real work.
    QueryDef("q18_dedup_docs",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val dup = d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 10000).as("doc_id"), col("text"))
        Dedup.exactText(d.unionByName(dup), "text", "doc_id")
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 5 = 0),
             |keyed AS (SELECT doc_id,
             |  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS k
             |  FROM all_docs)
             |SELECT doc_id FROM (
             |  SELECT doc_id, row_number() OVER (PARTITION BY k ORDER BY doc_id) AS rn
             |  FROM keyed)
             |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q19: exact word-3-gram Jaccard near-dup pairs via the inverted-index
    // self-join (never a cross product). Near-dups are planted by dropping
    // the first token of every 7th doc.
    QueryDef("q19_jaccard_pairs",
      (s, dir) => {
        val all = plantedNearDups(s, dir, 7)
        Dedup.ngramJaccardPairs(all, "doc_id", "text",
            shingleSize = 3, threshold = 0.7)
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(jaccardOracle)),

    // ---------------------------------------------------------------------
    // q20: MinHash + LSH banding near-dup candidates with exact-Jaccard
    // rescoring. Oracle = the SAME exact-closure SQL as q19: rescoring makes
    // precision exact, and at this operating point (fixed seed, r=4 b=16,
    // true pairs at j >= 0.8, per-pair recall 0.9998) the LSH pair set
    // equals the exact inverted-index set — verified 107/107 (sf0.001) and
    // 106/106 (sf0.01). A recall regression drops rows and fails the
    // compare, so the probabilistic stage is held to the exact answer.
    QueryDef("q20_minhash_lsh_pairs",
      (s, dir) => {
        // 64 hashes / 16 bands (r=4): the planted corpus's true pairs sit at
        // j >= 0.8 where per-pair recall is 1-(1-0.8^4)^16 ~= 0.9998 — the
        // same recall as 128/32 at half the signature + banding cost, and
        // HALF the false-candidate rate at low j (S-curve at j=0.3: 12% vs
        // 23%), so the exact rescoring stage shrinks too.
        val all = plantedNearDups(s, dir, 7)
        Dedup.minhashLshPairs(all, "doc_id", "text", shingleSize = 3,
            numHashes = 64, bands = 16, threshold = 0.7)
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(jaccardOracle)),

    // ---------------------------------------------------------------------
    // q21: exact top-10 cosine ANN, query side broadcast against one corpus
    // scan (zero corpus shuffle). Ranking on round(cosine, 6) with id
    // tiebreak so the order is identical in both engines.
    QueryDef("q21_ann_topk",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), Vec.asDouble(col("embedding")).as("vec"))
          .withColumn("nrm", Vec.norm(col("vec"))) // norms once per row, not per pair
        val q = e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
            col("nrm").as("qnrm"))
        val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            round(Vec.cosineFromParts(Vec.dot(col("qvec"), col("vec")),
              col("qnrm"), col("nrm")), 6).as("cosine"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
             |scored AS (
             |  SELECT query_id, e.vec_id AS neighbor_id,
             |    round(list_cosine_similarity(qv, e.v), 6) AS cosine
             |  FROM e, q WHERE e.vec_id <> query_id),
             |r AS (SELECT *, row_number() OVER (
             |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
             |  FROM scored)
             |SELECT query_id, neighbor_id, cosine, rank FROM r
             |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // ---------------------------------------------------------------------
    // q22: stride byte-sampling (the video frame-grab plan shape) over a
    // GENUINELY DECODED raster: per-doc ARGB PNGs encoded on the executors
    // (dimensions arithmetic in doc_id, pixel p(x,y) = (x*31+y*17)|FF<<24 —
    // encodePng's formula), pixel-decoded back by Multimodal.decodePixels
    // (real ImageIO decode to row-major ARGB bytes), then every 97th pixel
    // byte hex-sampled by the SAME sampleBytes stride projection. The
    // oracle reconstructs the pixel byte stream arithmetically — only a
    // real decode of the PNG the engine itself wrote matches. Pure per-row
    // projection; no shuffle until the final sort. (Until r12 this query
    // sampled UTF-8 text blobs — real plumbing, but no codec in the loop.)
    QueryDef("q22_pixel_sample",
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents").select(col("doc_id")).as[Long]
        val px = ids.mapPartitions(_.map { id =>
          val blob = graft.operators.Multimodal.encodePng(
            ((id % 31) + 1).toInt, ((id % 17) + 1).toInt, 4)
          val bytes = graft.operators.Multimodal.decodePixels(blob)
            .getOrElse(Array.empty[Byte])
          graft.operators.Multimodal.MediaRow(id, bytes)
        }).toDF("doc_id", "pixels")
        px.select(col("doc_id"),
            octet_length(col("pixels")).cast("long").as("n_pixel_bytes"),
            upper(Multimodal.sampleBytes(col("pixels"), 97)).as("pixel_sample"))
          .orderBy(col("doc_id"))
      },
      // pixel byte stream: index i (0-based) -> component i%4 of pixel
      // i//4 = (y*w+x); A=255, R=(v>>16)&255 = 0 (v <= 30*31+16*17 = 1202),
      // G=v//256, B=v%256 for v = x*31+y*17. Sampled at 0,97,194,...
      Some("""WITH dims AS (
             |  SELECT doc_id, (doc_id % 31) + 1 AS w, (doc_id % 17) + 1 AS h
             |  FROM documents),
             |samp AS (
             |  SELECT doc_id, w * h * 4 AS n_pixel_bytes,
             |    list_transform(range(0, CAST(w * h * 4 AS BIGINT), 97), i ->
             |      CASE CAST(i % 4 AS INT)
             |        WHEN 0 THEN 255
             |        WHEN 1 THEN 0
             |        WHEN 2 THEN (((i // 4) % w) * 31 + ((i // 4) // w) * 17) // 256
             |        ELSE (((i // 4) % w) * 31 + ((i // 4) // w) * 17) % 256
             |      END) AS vals
             |  FROM dims)
             |SELECT doc_id, CAST(n_pixel_bytes AS BIGINT) AS n_pixel_bytes,
             |  upper(array_to_string(list_transform(vals,
             |    v -> lpad(to_hex(v), 2, '0')), '')) AS pixel_sample
             |FROM samp ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q23: mapPartitions feature extraction over binary media blobs — the
    // batch shape a codec-backed featurizer needs — answering from a
    // GENUINE parse since r12: per-doc ARGB PNGs encoded on the executors,
    // fully pixel-decoded back by Multimodal.pixelStats (real ImageIO
    // decode, exact per-channel byte sums — integer features, so the
    // compare is exact, no float rounding seam). The oracle recomputes the
    // channel sums arithmetically from encodePng's pixel formula
    // p(x,y) = (x*31+y*17)|FF<<24, so a fake featurizer, a channel-order
    // slip, or a colorspace-converting decode all move every hash. (The
    // rolling-hash fake featurizer q23 graded until r12 was DELETED in
    // r13; featurize's default is now the real imageFeatures, graded as
    // q201.)
    QueryDef("q23_pixel_features",
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents").select(col("doc_id")).as[Long]
        val media = ids.mapPartitions(_.map { id =>
          graft.operators.Multimodal.MediaRow(id,
            graft.operators.Multimodal.encodePng(
              ((id % 31) + 1).toInt, ((id % 17) + 1).toInt, 4))
        })
        graft.operators.Multimodal.pixelStats(media).toDF()
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      // v = x*31+y*17 <= 1202 < 2^16, so R=(v>>16)&255 = 0, G=v//256,
      // B=v%256, A=255 per pixel; sums over the w x h raster.
      Some("""WITH dims AS (
             |  SELECT doc_id, (doc_id % 31) + 1 AS w, (doc_id % 17) + 1 AS h
             |  FROM documents),
             |px AS (
             |  SELECT doc_id, w, h,
             |    unnest(range(0, CAST(w * h AS BIGINT))) AS p
             |  FROM dims),
             |v AS (SELECT doc_id, (p % w) * 31 + (p // w) * 17 AS val FROM px)
             |SELECT doc_id,
             |  CAST(count(*) AS BIGINT) AS n_pixels,
             |  CAST(255 * count(*) AS BIGINT) AS sum_a,
             |  CAST(0 AS BIGINT) AS sum_r,
             |  CAST(sum(val // 256) AS BIGINT) AS sum_g,
             |  CAST(sum(val % 256) AS BIGINT) AS sum_b
             |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

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
    // q25: engine-portable document fingerprints: rolling md5-based
    // polynomial hash (order-sensitive) + BPE-ish subword token count.
    QueryDef("q25_doc_fingerprint",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(col("doc_id"),
            Text.fingerprint(col("text")).as("fp"),
            Text.bpeTokenCount(col("text")).as("n_bpe"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, text,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM documents),
             |h AS (SELECT doc_id, text,
             |    list_transform(toks,
             |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647) AS hs
             |  FROM tok)
             |SELECT doc_id,
             |  CASE WHEN len(hs) = 0 THEN 0
             |       ELSE list_reduce(hs, (a, b) -> (a * 1000003 + b) % 2147483647)
             |  END AS fp,
             |  CAST(coalesce(list_sum(list_transform(
             |    regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'),
             |    p -> CAST(ceil(length(p) / 4.0) AS BIGINT))), 0) AS BIGINT)
             |    AS n_bpe
             |FROM h ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q26: portable 32-bit SimHash (md5 token hashes, per-bit vote fold) —
    // the oracle-checkable twin of the xxhash64 simhash used for near-dup
    // bucketing in q30.
    QueryDef("q26_simhash32",
      (s, dir) => {
        val d = t(s, dir, "documents")
        // aggregation form (codegen conditional sums) with the portable md5
        // token hash — same values as Text.simhashPortable, ~5x faster;
        // left join restores zero-token docs as simhash 0
        val sims = Dedup.simhashAgg(d, "doc_id", "text", bits = 32,
          tokenHash = Text.md5Long)
        d.select(col("doc_id")).join(sims.withColumnRenamed("id", "doc_id"),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("simhash"), lit(0L)).as("simhash32"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM documents),
             |h AS (SELECT doc_id,
             |    list_transform(toks,
             |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
             |  FROM tok)
             |SELECT doc_id,
             |  CAST(CASE WHEN len(hs) = 0 THEN 0 ELSE
             |    list_sum(list_transform(range(32), b ->
             |      CASE WHEN list_sum(list_transform(hs, h ->
             |             CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
             |           THEN (CAST(1 AS BIGINT) << b) ELSE 0 END))
             |  END AS BIGINT) AS simhash32
             |FROM h ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q27: multi-column golden-record merge with the full tie-break chain:
    // longest valid value -> latest timestamp -> earliest row; sentinel
    // values ("", "nan") excluded; all-missing groups yield null.
    QueryDef("q27_golden_contacts",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val base = c.select(
          col("c_custkey").cast("long").as("row_id"),
          (col("c_custkey") % 211).as("grp"),
          when(col("c_custkey") % 13 === 0, lit(""))
            .when(col("c_custkey") % 17 === 0, lit("nan"))
            .otherwise(concat(col("c_mktsegment"), lit("-"),
              col("c_custkey").cast("string"))).as("addr"),
          when(col("c_custkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("555-"),
              (col("c_custkey") % 10000).cast("string"))).as("phone"),
          timestamp_seconds(lit(1577836800L) + col("c_custkey")).as("ts"))
        base.groupBy(col("grp"))
          .agg(
            GoldenRecord.mostComplete(col("addr"), col("ts"), col("row_id"))
              .as("best_addr"),
            GoldenRecord.mostComplete(col("phone"), col("ts"), col("row_id"))
              .as("best_phone"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("grp"))
      },
      Some("""WITH base AS (
             |  SELECT CAST(c_custkey AS BIGINT) AS row_id,
             |    c_custkey % 211 AS grp,
             |    CASE WHEN c_custkey % 13 = 0 THEN ''
             |         WHEN c_custkey % 17 = 0 THEN 'nan'
             |         ELSE c_mktsegment || '-' || c_custkey END AS addr,
             |    CASE WHEN c_custkey % 7 = 0 THEN NULL
             |         ELSE '555-' || (c_custkey % 10000) END AS phone,
             |    to_timestamp(1577836800 + c_custkey) AS ts
             |  FROM customer),
             |a AS (SELECT grp, addr, row_number() OVER (PARTITION BY grp
             |    ORDER BY length(addr) DESC, ts DESC, row_id ASC) AS rn
             |  FROM base WHERE addr IS NOT NULL AND trim(addr) <> ''
             |    AND trim(addr) NOT IN ('nan', 'None', 'NaN')),
             |p AS (SELECT grp, phone, row_number() OVER (PARTITION BY grp
             |    ORDER BY length(phone) DESC, ts DESC, row_id ASC) AS rn
             |  FROM base WHERE phone IS NOT NULL AND trim(phone) <> ''
             |    AND trim(phone) NOT IN ('nan', 'None', 'NaN')),
             |g AS (SELECT grp, count(*) AS n_rows FROM base GROUP BY grp)
             |SELECT g.grp, a.addr AS best_addr, p.phone AS best_phone, g.n_rows
             |FROM g
             |LEFT JOIN (SELECT grp, addr FROM a WHERE rn = 1) a USING (grp)
             |LEFT JOIN (SELECT grp, phone FROM p WHERE rn = 1) p USING (grp)
             |ORDER BY g.grp""".stripMargin)),

    // ---------------------------------------------------------------------
    // q28: embedding-cosine near-dup pairs, exact (planted perturbed copies;
    // double-precision arithmetic on both sides for bit parity).
    QueryDef("q28_embed_neardup",
      (s, dir) => {
        val all = plantedVecs(s, dir)
        Dedup.embeddingNearDup(all, "vec_id", "vec", threshold = 0.98)
          .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(embedNearDupOracle)),

    // ---------------------------------------------------------------------
    // q29: the same near-dup search through random-hyperplane LSH buckets
    // (the 100-TB path: only same-bucket pairs are scored). Probabilistic
    // recall -> no SQL oracle; the spec checks recall against q28's exact
    // ground truth.
    QueryDef("q29_embed_neardup_lsh",
      (s, dir) => {
        // shares q28's EXACT oracle: rescoring makes precision exact, and
        // at 12 planes x 16 tables recall is 100% on the planted corpus at
        // sf0.001, sf0.01 AND sf0.1 — a recall regression now fails the
        // hash compare. (Recall here is DETERMINISTIC: seeded planes +
        // fixed corpus. Probed: tables=4 missed 2/100 at sf0.01; tables=8
        // missed the worst planted pair — cosine 0.9871, per-table bucket
        // collision 0.53 — at sf0.1's 400 pairs; 16 tables put the worst
        // pair's miss odds at 5e-6.)
        val all = plantedVecs(s, dir)
        Dedup.embeddingNearDupLsh(all, "vec_id", "vec", threshold = 0.98,
            planes = 12, tables = 16)
          .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(embedNearDupOracle)),

    // ---------------------------------------------------------------------
    // q31: hierarchical ROLLUP totals (subtotal + grand-total rows) — one
    // aggregation with grouping-set expansion, partial-agg friendly.
    QueryDef("q31_rollup_returns",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
            count(lit(1)).as("n_rows"))
          .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("sum_qty"), col("n_rows"))
          .orderBy(col("returnflag"), col("linestatus"))
      },
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             |  coalesce(l_linestatus, 'ALL') AS linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
             |FROM lineitem
             |GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY returnflag, linestatus""".stripMargin)),

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
    // q33: blocked fuzzy (Levenshtein) matching — the scalable form of the
    // reference's latent fuzzywuzzy intent. Typo'd copies are planted; the
    // suffix block key is typo-tolerant, so candidates meet in a bucket
    // shuffle, never a cross join.
    QueryDef("q33_fuzzy_pairs",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val base = c.select(col("c_custkey").cast("long").as("id"),
          concat(lit("cust"), col("c_custkey").cast("string")).as("name"))
        val dirty = base.filter(col("id") % 4 === 0)
          .select((col("id") + 1000000).as("id"),
            regexp_replace(col("name"), "^cust", "cusst").as("name"))
        val all = base.unionByName(dirty)
        graft.operators.Fuzzy.blockedPairs(all, "id", "name",
            substring(col("name"), -4, 4), maxDist = 1)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH base AS (
             |  SELECT CAST(c_custkey AS BIGINT) AS id,
             |    'cust' || c_custkey AS name FROM customer),
             |dirty AS (
             |  SELECT id + 1000000 AS id,
             |    regexp_replace(name, '^cust', 'cusst') AS name
             |  FROM base WHERE id % 4 = 0),
             |allr AS (SELECT * FROM base UNION ALL SELECT * FROM dirty),
             |blocked AS (SELECT id, name, right(name, 4) AS blk FROM allr)
             |SELECT a.id AS id_a, b.id AS id_b,
             |  levenshtein(a.name, b.name) AS dist
             |FROM blocked a JOIN blocked b
             |  ON a.blk = b.blk AND a.id < b.id
             |WHERE levenshtein(a.name, b.name) <= 1
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---------------------------------------------------------------------
    // q30: SimHash near-dup pairs via the pigeonhole chunk trick (64-bit
    // xxhash simhash, hamming <= 6 found with a bucket shuffle, never a
    // cross join). xxhash64 is Spark-only -> no SQL oracle; spec-tested.
    QueryDef("q30_simhash_pairs",
      (s, dir) => {
        // portable md5 token hash (not xxhash64) so the DuckDB twin computes
        // bit-identical fingerprints; the pigeonhole candidate generation is
        // EXACT for hamming <= maxHamming, so the oracle is the full
        // closure — the bucket shuffle must find every qualifying pair.
        val all = plantedNearDups(s, dir, 7)
        Dedup.simhashPairs(all, "doc_id", "text", maxHamming = 6, bits = 64,
            tokenHash = Text.md5Long)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 10000, regexp_replace(text, '^\S+\s+', '')
             |  FROM documents WHERE doc_id % 7 = 0),
             |tok AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM all_docs),
             |h AS (SELECT doc_id,
             |    list_transform(toks,
             |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
             |  FROM tok),
             |sims AS (
             |  SELECT doc_id,
             |    CAST(CASE WHEN len(hs) = 0 THEN 0 ELSE
             |      list_sum(list_transform(range(64), b ->
             |        CASE WHEN list_sum(list_transform(hs, x ->
             |               CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
             |             THEN (CAST(1 AS BIGINT) << b) ELSE 0 END))
             |    END AS BIGINT) AS s
             |  FROM h),
             |pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
             |  FROM sims a JOIN sims b ON a.doc_id < b.doc_id)
             |SELECT id_a, id_b, hamming FROM pairs
             |WHERE hamming <= 6 ORDER BY id_a, id_b""".stripMargin)),

    // ---------------------------------------------------------------------
    // q36: statistics per group — exact interpolated median + sample
    // stddev + avg (rounded: summation/merge order differs across engines
    // in the last bits).
    QueryDef("q36_group_stats",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"))
          .agg(round(avg(col("l_quantity")), 6).as("avg_qty"),
            round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
            round(percentile(col("l_quantity"), lit(0.5)), 6).as("median_qty"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  round(avg(l_quantity), 6) AS avg_qty,
             |  round(stddev_samp(l_quantity), 6) AS sd_qty,
             |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---------------------------------------------------------------------
    // q37: set operations (intersect / except) on order-status key sets.
    QueryDef("q37_setops",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val f = o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey"))
        val p = o.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("custkey"))
        val both = f.intersect(p).withColumn("set_op", lit("both"))
        val onlyF = f.except(p).withColumn("set_op", lit("only_f"))
        both.unionByName(onlyF).orderBy(col("set_op"), col("custkey"))
      },
      Some("""WITH f AS (SELECT DISTINCT o_custkey AS custkey FROM orders
             |          WHERE o_orderstatus = 'F'),
             |     p AS (SELECT DISTINCT o_custkey AS custkey FROM orders
             |          WHERE o_orderstatus = 'O')
             |SELECT custkey, 'both' AS set_op FROM f INTERSECT SELECT custkey, 'both' FROM p
             |UNION ALL
             |(SELECT custkey, 'only_f' AS set_op FROM f EXCEPT SELECT custkey, 'only_f' FROM p)
             |ORDER BY set_op, custkey""".stripMargin)),

    // ---------------------------------------------------------------------
    // q38: salted two-phase aggregation over a deliberately skewed key
    // (~60% of rows share one key) — result identical to a direct groupBy,
    // hot key spread across phase-1 reducers (operators.Skew).
    QueryDef("q38_skewed_agg",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val keyed = li.select(
          when(col("l_orderkey") % 5 < 3, lit("HOT"))
            .otherwise(concat(lit("k"), (col("l_orderkey") % 97).cast("string")))
            .as("skew_key"),
          col("l_quantity"))
        graft.operators.Skew.saltedAggregate(keyed, col("skew_key"), 16,
            graft.operators.Skew.countAndSum(col("l_quantity")))
          .select(col("key"), col("count").as("n"),
            round(col("sum"), 2).as("sum_qty"))
          .orderBy(col("key"))
      },
      Some("""SELECT CASE WHEN l_orderkey % 5 < 3 THEN 'HOT'
             |  ELSE 'k' || (l_orderkey % 97) END AS key,
             |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem
             |GROUP BY key ORDER BY key""".stripMargin)),

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
    // q40: pivot (long -> wide) with explicit value list: revenue by
    // market segment x order status. Explicit values keep the plan a single
    // pass (no extra distinct-values job).
    QueryDef("q40_pivot",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(round(sum(col("o_totalprice")), 2))
          .select(col("c_mktsegment"),
            coalesce(col("F"), lit(0.0)).as("rev_f"),
            coalesce(col("O"), lit(0.0)).as("rev_o"),
            coalesce(col("P"), lit(0.0)).as("rev_p"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment,
             |  coalesce(round(sum(CASE WHEN o_orderstatus = 'F'
             |    THEN o_totalprice END), 2), 0.0) AS rev_f,
             |  coalesce(round(sum(CASE WHEN o_orderstatus = 'O'
             |    THEN o_totalprice END), 2), 0.0) AS rev_o,
             |  coalesce(round(sum(CASE WHEN o_orderstatus = 'P'
             |    THEN o_totalprice END), 2), 0.0) AS rev_p
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ---------------------------------------------------------------------
    // q41: corpus vocabulary — word frequency top-20 (explode -> count ->
    // top-k with total tie order). The canonical corpus-analysis scan.
    QueryDef("q41_word_freq",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(explode(Text.tokens(col("text"))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word").asc)
          .limit(20)
      },
      Some("""SELECT word, count(*) AS n FROM (
             |  SELECT unnest(list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '')) AS word
             |  FROM documents)
             |GROUP BY word ORDER BY n DESC, word ASC LIMIT 20""".stripMargin)),

    // ---------------------------------------------------------------------
    // q42: 6-way snowflake join (TPC-H Q5 shape): revenue by nation where
    // customer and supplier share the nation. Dimensions broadcast; the
    // lineitem<->orders join carries the bulk.
    QueryDef("q42_local_supplier_volume",
      (s, dir) => {
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        val c = t(s, dir, "customer"); val sup = t(s, dir, "supplier")
        val n = t(s, dir, "nation"); val r = t(s, dir, "region")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("n_name").asc)
      },
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |  AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin)),

    // ---------------------------------------------------------------------
    // q43: correlated-subquery semantics — orders above their customer's
    // average order value, decorrelated into a window aggregate (one
    // shuffle; the SQL twin states it as the correlated form).
    QueryDef("q43_above_cust_avg",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
        // the MEMBERSHIP test must also be rounding-stable: engines sum in
        // different orders, so an unrounded avg could sit one ulp apart and
        // flip a boundary row's row-set membership — round the threshold to
        // cents (input precision) on both sides before comparing
        o.withColumn("cust_avg", round(avg(col("o_totalprice")).over(w), 2))
          .filter(col("o_totalprice") > col("cust_avg") * 1.5)
          .select(col("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice"), 2).as("price"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  round(o_totalprice, 2) AS price
             |FROM (
             |  SELECT o_orderkey, o_custkey, o_totalprice,
             |    round(avg(o_totalprice) OVER (PARTITION BY o_custkey), 2)
             |      AS cust_avg
             |  FROM orders)
             |WHERE o_totalprice > cust_avg * 1.5
             |ORDER BY o_orderkey""".stripMargin)),

    // ---------------------------------------------------------------------
    // q44: duplicate-CLUSTER formation — connected components (min-label
    // propagation) over the exact near-dup pair set; the oracle states the
    // same closure as a recursive CTE.
    QueryDef("q44_dup_clusters",
      (s, dir) => {
        val all = plantedNearDups(s, dir, 7)
        val pairs = Dedup.ngramJaccardPairs(all, "doc_id", "text",
          shingleSize = 3, threshold = 0.7)
        Dedup.connectedComponents(
            all.select(col("doc_id").as("id")), pairs)
          .orderBy(col("id"))
      },
      Some(ccReachCtes7 +
        """
          |SELECT id, min(r) AS cluster FROM reach GROUP BY id
          |ORDER BY id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q45: stratified sampling with per-stratum quotas — at most 30 docs per
    // language, picked in deterministic pseudo-random order (md5 of the id:
    // engine-portable, seed-free, reproducible). The data-mixing primitive
    // of training-corpus construction.
    QueryDef("q45_stratified_sample",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
        d.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 30)
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang FROM (
             |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
             |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents)
             |WHERE rn <= 30 ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q46: token-budget selection — order the corpus by quality (best
    // first), keep documents while the cumulative token count fits the
    // budget. Two-phase distributed prefix sum (Budget.tokenBudgetSelect):
    // value-identical to the naive global window, no single-task stage.
    QueryDef("q46_token_budget",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val scored = graft.operators.TextProfile.profile(d, "doc_id", "text")
        graft.operators.Budget.tokenBudgetSelect(scored,
            Seq(col("quality").desc, col("doc_id").asc), col("n_tokens"),
            budget = 20000)
          .select(col("doc_id"), col("n_tokens"), col("cum_tokens"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
              |FROM (
              |  SELECT doc_id, n_tokens,
              |    sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
              |      ROWS UNBOUNDED PRECEDING) AS cum_tokens
              |  FROM (${docStatsNoOrder.replace("\n", "\n  ")}))
              |WHERE cum_tokens <= 20000 ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q47: END-TO-END corpus dedup — the canonical training-data flow:
    // near-dup pairs (inverted-index Jaccard) -> duplicate clusters
    // (connected components) -> keep the best-quality representative per
    // cluster. Composes three library operators in one plan.
    QueryDef("q47_dedup_keep_best",
      (s, dir) => {
        // consumed 3x (pair generation, CC nodes, quality profile): cache
        // the planted corpus once instead of re-reading + perturbing per use
        val all = graft.pipeline.Pins.pin(plantedNearDups(s, dir, 7))
        val pairs = Dedup.ngramJaccardPairs(all, "doc_id", "text",
          shingleSize = 3, threshold = 0.7)
        val cc = Dedup.connectedComponents(
          all.select(col("doc_id").as("id")), pairs)
        val stats = graft.operators.TextProfile.profile(all, "doc_id", "text")
          .select(col("doc_id"), col("quality"))
        val joined = cc.join(stats, cc("id") === stats("doc_id"))
        val w = Window.partitionBy(col("cluster"))
          .orderBy(col("quality").desc, col("doc_id").asc)
        joined
          .withColumn("rn", row_number().over(w))
          .withColumn("n_members",
            count(lit(1)).over(Window.partitionBy(col("cluster"))))
          .filter(col("rn") === 1)
          .select(col("cluster"), col("doc_id").as("kept_doc_id"),
            col("n_members"))
          .orderBy(col("cluster"))
      },
      Some(s"""WITH RECURSIVE
              |all_docs AS (
              |  SELECT doc_id, text FROM documents
              |  UNION ALL
              |  SELECT doc_id + 10000, regexp_replace(text, '^\\S+\\s+', '')
              |  FROM documents WHERE doc_id % 7 = 0),
              |stats AS (
              |  SELECT doc_id, quality FROM (
              |    ${docStatsSql("all_docs").stripSuffix(" ORDER BY doc_id")
                     .replace("\n", "\n    ")})),
              |tok2 AS (SELECT doc_id,
              |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
              |      t -> t <> '') AS toks
              |  FROM all_docs),
              |sh AS (SELECT doc_id,
              |    CASE WHEN len(toks) >= 3
              |         THEN list_distinct(list_transform(range(len(toks) - 2),
              |                i -> array_to_string(toks[i + 1:i + 3], ' ')))
              |         ELSE [array_to_string(toks, ' ')] END AS shingles
              |  FROM tok2),
              |posts AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
              |sizes AS (SELECT doc_id, count(*) AS n FROM posts GROUP BY doc_id),
              |inter AS (
              |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
              |  FROM posts a JOIN posts b
              |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |pairs AS (
              |  SELECT id_a, id_b FROM inter
              |  JOIN sizes sa ON sa.doc_id = id_a
              |  JOIN sizes sb ON sb.doc_id = id_b
              |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7),
              |edges AS (
              |  SELECT id_a AS src, id_b AS dst FROM pairs
              |  UNION ALL SELECT id_b, id_a FROM pairs),
              |reach(id, r) AS (
              |  SELECT doc_id, doc_id FROM all_docs
              |  UNION
              |  SELECT reach.id, edges.dst FROM reach
              |  JOIN edges ON edges.src = reach.r),
              |comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
              |best AS (
              |  SELECT comp.cluster, stats.doc_id,
              |    row_number() OVER (PARTITION BY comp.cluster
              |      ORDER BY stats.quality DESC, stats.doc_id ASC) AS rn,
              |    count(*) OVER (PARTITION BY comp.cluster) AS n_members
              |  FROM comp JOIN stats ON stats.doc_id = comp.id)
              |SELECT cluster, doc_id AS kept_doc_id, n_members
              |FROM best WHERE rn = 1 ORDER BY cluster""".stripMargin)),

    // ---------------------------------------------------------------------
    // q48: approximate distinct counting (HyperLogLog++) next to the exact
    // count — the cardinality-sketch surface for 100-TB profiling, where
    // exact countDistinct's shuffle is the bottleneck. Sketches are
    // engine-specific -> no SQL oracle; the spec bounds the relative error.
    QueryDef("q48_approx_distinct",
      (s, dir) => {
        // tolerance-based oracle (same pattern as q55): emit the EXACT
        // distinct counts plus a within-5% flag for the HLL++ sketch; the
        // DuckDB twin emits the exact counts and literal TRUE, so sketch
        // drift beyond tolerance fails the hash compare.
        val li = t(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_partkey"), 0.02).as("a"),
            countDistinct(col("l_partkey")).as("exact_parts"))
          .select(col("l_returnflag"), col("exact_parts"),
            (abs(col("a") - col("exact_parts"))
              <= col("exact_parts") * 0.05).as("approx_within_5pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_partkey) AS exact_parts,
             |  TRUE AS approx_within_5pct
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---------------------------------------------------------------------
    // q49: range (band) join — pairs of events by the same user within 10
    // minutes of each other. The scalable plan: equi-join on the user key
    // carries the shuffle, the time band is a residual predicate (a pure
    // band join without an equi-key would be a BNLJ — avoided by
    // construction, same stance as the Fill disjunction).
    QueryDef("q49_range_join",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"))
        e.as("a").join(e.as("b"),
            col("a.user_id") === col("b.user_id") &&
            col("a.event_id") < col("b.event_id") &&
            abs(unix_micros(col("a.ts")) - unix_micros(col("b.ts")))
              <= 600000000L)
          .select(col("a.event_id").as("id_a"), col("b.event_id").as("id_b"),
            (abs(unix_micros(col("a.ts")) - unix_micros(col("b.ts"))) / 1000000L)
              .cast("long").as("gap_s")) // floor-division, matching DuckDB //
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""SELECT a.event_id AS id_a, b.event_id AS id_b,
             |  abs(epoch_us(a.ts) - epoch_us(b.ts)) // 1000000 AS gap_s
             |FROM events a JOIN events b
             |  ON a.user_id = b.user_id AND a.event_id < b.event_id
             |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 600000000
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---------------------------------------------------------------------
    // q50: incremental ingest dedup — keep only incoming docs whose
    // normalized content does NOT already exist in the corpus (left-anti on
    // the content key; the join shuffles key hashes, not documents).
    QueryDef("q50_incremental_new_docs",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val existing = d.filter(col("doc_id") % 3 =!= 0)
        // incoming: new ids; every 2nd one duplicates an existing doc's text
        val incoming = d.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 50000).as("doc_id"),
            when(col("doc_id") % 6 === 0,
              concat(col("text"), lit(" genuinely new tail")))
              .otherwise(col("text")).as("text"))
        val key = Cleaning.normName(col("text"))
        incoming.withColumn("__k", key)
          .join(existing.select(key.as("__k")).distinct(), Seq("__k"), "left_anti")
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some("""WITH existing AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
             |incoming AS (
             |  SELECT doc_id + 50000 AS doc_id,
             |    CASE WHEN doc_id % 6 = 0 THEN text || ' genuinely new tail'
             |         ELSE text END AS text
             |  FROM documents WHERE doc_id % 3 = 0),
             |ek AS (SELECT DISTINCT
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS k
             |  FROM existing)
             |SELECT doc_id FROM incoming
             |WHERE lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) NOT IN
             |  (SELECT k FROM ek)
             |ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q51: shipping-priority matrix (TPC-H Q12 shape): join + conditional
    // counts by line status over a date band.
    QueryDef("q51_ship_priority",
      (s, dir) => {
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1997-01-01")))
          .groupBy(col("l_linestatus"))
          .agg(
            count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
              .as("high_line_count"),
            count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
              .as("low_line_count"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus,
             |  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |    THEN 1 END) AS high_line_count,
             |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |    THEN 1 END) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // ---------------------------------------------------------------------
    // q52: revenue-share ratio (TPC-H Q14 shape): share of revenue from
    // small-quantity lines per month. The ratio is derived from the two
    // ROUNDED sums so both engines divide identical inputs.
    QueryDef("q52_revenue_share",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
        li.filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1997-07-01")))
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
          .agg(
            round(sum(when(col("l_quantity") < 10, rev).otherwise(lit(0.0))), 2)
              .as("small_rev"),
            round(sum(rev), 2).as("total_rev"))
          .withColumn("small_share",
            round(col("small_rev") / col("total_rev"), 6))
          .orderBy(col("month"))
      },
      Some("""WITH m AS (
             |  SELECT strftime(l_shipdate, '%Y-%m') AS month,
             |    round(sum(CASE WHEN l_quantity < 10
             |      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 2)
             |      AS small_rev,
             |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |    AND l_shipdate < TIMESTAMP '1997-07-01'
             |  GROUP BY month)
             |SELECT month, small_rev, total_rev,
             |  round(small_rev / total_rev, 6) AS small_share
             |FROM m ORDER BY month""".stripMargin)),

    // ---------------------------------------------------------------------
    // q53: correlated EXISTS as a LEFT SEMI join (TPC-H Q4 shape; the
    // testdata lacks commit/receipt dates, so "problem line" = returned
    // flag). The semi join hashes on the join key and short-circuits per
    // probe row — no row multiplication, one shuffle on orderkey.
    QueryDef("q53_priority_exists",
      (s, dir) => {
        val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
        o.filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1996-07-01")))
          .join(li.filter(col("l_returnflag") === "R").select("l_orderkey"),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-07-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_returnflag = 'R')
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---------------------------------------------------------------------
    // q54: EXISTS + NOT EXISTS as LEFT SEMI + LEFT ANTI joins (TPC-H Q21
    // shape): suppliers whose returned line sits in a finished
    // multi-supplier order where NO other supplier also returned. Both
    // subqueries become hash joins on l_orderkey with the supplier
    // inequality as a residual predicate — the scale plan for correlated
    // subqueries (never a per-row re-scan).
    QueryDef("q54_sole_blame",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val finished = t(s, dir, "orders")
          .filter(col("o_orderstatus") === "F").select("o_orderkey")
        val returned = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_suppkey"))
        val others = li.select(col("l_orderkey").as("a_orderkey"),
          col("l_suppkey").as("a_suppkey"))
        val othersReturned = returned.select(
          col("l_orderkey").as("r_orderkey"), col("l_suppkey").as("r_suppkey"))
        returned
          .join(finished, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .join(others, col("l_orderkey") === col("a_orderkey") &&
            col("l_suppkey") =!= col("a_suppkey"), "left_semi")
          .join(othersReturned, col("l_orderkey") === col("r_orderkey") &&
            col("l_suppkey") =!= col("r_suppkey"), "left_anti")
          .groupBy(col("l_suppkey").as("suppkey"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("suppkey"))
          .limit(20)
      },
      Some("""SELECT l1.l_suppkey AS suppkey, count(*) AS numwait
             |FROM lineitem l1
             |WHERE l1.l_returnflag = 'R'
             |  AND EXISTS (SELECT 1 FROM orders
             |              WHERE o_orderkey = l1.l_orderkey
             |                AND o_orderstatus = 'F')
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_returnflag = 'R')
             |GROUP BY suppkey
             |ORDER BY numwait DESC, suppkey
             |LIMIT 20""".stripMargin)),

    // ---------------------------------------------------------------------
    // q55: approximate quantiles (Greenwald-Khanna sketch via
    // percentile_approx) — the mergeable-sketch path for 100-TB quantiles
    // (exact interpolated percentile, q36, buffers each group's values;
    // the GK sketch is bounded-memory and partial-aggregable). Sketch
    // values are accuracy-dependent, so the oracle is TOLERANCE-based
    // inside the exact-hash harness: the query emits the EXACT quantiles
    // plus a Spark-computed within-1%-of-exact flag for the sketch; the
    // DuckDB twin emits the same exact quantiles and literal TRUE. Sketch
    // drift beyond tolerance flips the flag and fails the hash compare.
    QueryDef("q55_approx_quantiles",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val qs = Seq(0.25, 0.5, 0.9, 0.99)
        val agged = li.groupBy(col("l_returnflag"))
          .agg(
            percentile_approx(col("l_extendedprice"),
              array(qs.map(lit): _*), lit(10000)).as("a"),
            percentile(col("l_extendedprice"),
              array(qs.map(lit): _*)).as("e"),
            count(lit(1)).as("n"))
        val withinTol = (1 to qs.size).map(i =>
          abs(element_at(col("a"), i) - element_at(col("e"), i))
            <= element_at(col("e"), i) * 0.01).reduce(_ && _)
        agged.select(col("l_returnflag"),
            round(element_at(col("e"), 1), 4).as("p25"),
            round(element_at(col("e"), 2), 4).as("p50"),
            round(element_at(col("e"), 3), 4).as("p90"),
            round(element_at(col("e"), 4), 4).as("p99"),
            withinTol.as("approx_within_1pct"),
            col("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
             |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
             |  TRUE AS approx_within_1pct,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---------------------------------------------------------------------
    // q58: customer order-count distribution (TPC-H Q13 shape): LEFT OUTER
    // join so zero-order customers survive with count 0, then a second
    // aggregation over the counts. Both aggs partial-combine; the outer
    // join shuffles once on custkey.
    QueryDef("q58_cust_distribution",
      (s, dir) => {
        val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
        c.join(o.filter(col("o_orderpriority") =!= "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT OUTER JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey)
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // ---------------------------------------------------------------------
    // q59: ranking/distribution window-function family (rank, dense_rank,
    // percent_rank, cume_dist, ntile, lag/lead, first value). The
    // partition key is FEW-valued (5 priorities), so since r10 no
    // per-priority window touches the data-sized frame: the whole family
    // derives from ONE two-phase grouped prefix count — the order
    // (totalprice desc, orderkey) is total, so rank == dense_rank ==
    // running count; percent_rank/cume_dist/ntile are exact integer
    // arithmetic on (rank, N) with |priorities|-row broadcast totals
    // (the Lift closed form, per group); lag/lead are fine-grained
    // equi-joins on (priority, rank∓1); first_value is the rank-1 row
    // broadcast back. The oracle keeps the REAL window functions — the
    // hash match proves the derived family equivalent.
    QueryDef("q59_window_family",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1997-02-01")))
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"))
        val ranked = graft.operators.Budget.groupedRunning(o,
          "o_orderpriority",
          Seq(col("o_totalprice").desc, col("o_orderkey")),
          Seq(graft.operators.Budget.RunSum(lit(1L), "__rn")))
        val totals = o.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("__N"))
        val tops = ranked.filter(col("__rn") === 1)
          .select(col("o_orderpriority"), col("o_orderkey").as("top_key"))
        val prevs = ranked.select(col("o_orderpriority"),
          (col("__rn") + 1).as("__rn"), col("o_orderkey").as("prev_key"))
        val nexts = ranked.select(col("o_orderpriority"),
          (col("__rn") - 1).as("__rn"), col("o_orderkey").as("next_key"))
        ranked
          .join(broadcast(totals), Seq("o_orderpriority"))
          .join(broadcast(tops), Seq("o_orderpriority"))
          .join(prevs, Seq("o_orderpriority", "__rn"), "left")
          .join(nexts, Seq("o_orderpriority", "__rn"), "left")
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"),
            col("__rn").cast("int").as("rnk"),
            col("__rn").cast("int").as("drnk"),
            round(when(col("__N") === 1, lit(0.0))
              .otherwise((col("__rn") - 1).cast("double")
                / (col("__N") - 1)), 6).as("prank"),
            round(col("__rn").cast("double") / col("__N"), 6).as("cdist"),
            expr("""cast(case
              |  when __rn <= (__N % 4) * (__N div 4 + 1)
              |    then (__rn - 1) div (__N div 4 + 1) + 1
              |  else __N % 4 + (__rn - (__N % 4) * (__N div 4 + 1) - 1)
              |    div greatest(__N div 4, 1) + 1
              |end as int)""".stripMargin).as("quartile"),
            col("prev_key"), col("next_key"), col("top_key"))
          .orderBy(col("o_orderpriority"), col("rnk"))
      },
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice,
             |  rank() OVER w AS rnk,
             |  dense_rank() OVER w AS drnk,
             |  round(percent_rank() OVER w, 6) AS prank,
             |  round(cume_dist() OVER w, 6) AS cdist,
             |  ntile(4) OVER w AS quartile,
             |  lag(o_orderkey, 1) OVER w AS prev_key,
             |  lead(o_orderkey, 1) OVER w AS next_key,
             |  first_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED
             |    PRECEDING AND UNBOUNDED FOLLOWING) AS top_key
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-02-01'
             |WINDOW w AS (PARTITION BY o_orderpriority
             |  ORDER BY o_totalprice DESC, o_orderkey)
             |ORDER BY o_orderpriority, rnk""".stripMargin)),

    // ---------------------------------------------------------------------
    // q62: benchmark decontamination — flag training documents that share
    // >= 2 distinct word-3-gram shingles with any held-out eval document
    // (the train/test overlap scrub every LLM corpus pipeline runs).
    // Inverted-index join between the two sides (shuffle on shingle), never
    // a doc x doc cross join; same skew-cap story as q19.
    // ---------------------------------------------------------------------
    // q63: Gopher-style repetition/quality rules (QualityRules.signals) —
    // duplicate-token fraction, top-2-gram character fraction, and
    // symbol-to-word ratio, each thresholded into a keep flag. Symbol noise
    // ('## ####' + an ellipsis) is planted deterministically on every 7th
    // doc (same device as q56's planted PII) so the symbol rule actually
    // fires. Thresholds sit at this corpus's observed medians so keep
    // varies. Plan: two explode->count aggs on (doc, token) / (doc, 2gram)
    // composite keys, partial agg on both, order-free struct-max for the
    // top gram — no window, no per-doc sort.
    QueryDef("q63_quality_rules",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val planted = d.select(col("doc_id"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" ## #### and then ...")))
            .otherwise(col("text")).as("text"))
        graft.operators.QualityRules.signals(planted, "doc_id", "text",
            maxDupTokFrac = 0.5, maxTop2gramCharFrac = 0.08,
            maxSymbolWordRatio = 0.1)
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 7 = 0 THEN text || ' ## #### and then ...'
             |         ELSE text END AS text
             |  FROM documents),
             |b AS (
             |  SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks,
             |    CAST(len(text) - len(replace(text, '#', '')) AS BIGINT)
             |      + CAST((len(text) - len(replace(text, '...', ''))) / 3
             |             AS BIGINT) AS n_symbols
             |  FROM d),
             |tok AS (SELECT doc_id, unnest(toks) AS tok FROM b),
             |ts AS (SELECT doc_id, count(*) AS n_tokens,
             |         count(DISTINCT tok) AS n_distinct
             |       FROM tok GROUP BY doc_id),
             |gr AS (SELECT doc_id,
             |    CASE WHEN len(toks) >= 2
             |         THEN list_transform(range(len(toks) - 1),
             |                i -> toks[i + 1] || ' ' || toks[i + 2])
             |         ELSE [array_to_string(toks, ' ')] END AS grams
             |  FROM b),
             |g AS (SELECT doc_id, unnest(grams) AS gram FROM gr),
             |gc AS (SELECT doc_id, gram, count(*) AS cnt
             |       FROM g GROUP BY doc_id, gram),
             |top AS (SELECT doc_id, gram, cnt FROM (
             |    SELECT doc_id, gram, cnt, row_number() OVER (
             |      PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn
             |    FROM gc) WHERE rn = 1),
             |m AS (
             |  -- LEFT joins + coalesce: a tokenless doc keeps its row with
             |  -- all-zero ratios (the operator contract); a doc with < 2
             |  -- tokens has NO 2-gram, so the fallback shingle is gated out
             |  SELECT b.doc_id, coalesce(ts.n_tokens, 0) AS n_tokens,
             |    round(CASE WHEN coalesce(ts.n_tokens, 0) > 0
             |      THEN (ts.n_tokens - ts.n_distinct) * 1.0 / ts.n_tokens
             |      ELSE 0.0 END, 6) AS dup_tok_frac,
             |    CASE WHEN coalesce(ts.n_tokens, 0) >= 2
             |      THEN coalesce(top.gram, '') ELSE '' END AS top_2gram,
             |    CASE WHEN coalesce(ts.n_tokens, 0) >= 2
             |      THEN coalesce(top.cnt, 0) ELSE 0 END AS top_2gram_cnt,
             |    round(CASE WHEN coalesce(ts.n_tokens, 0) >= 2 AND b.n_chars > 0
             |      THEN coalesce(top.cnt, 0) * len(coalesce(top.gram, '')) * 1.0
             |           / b.n_chars
             |      ELSE 0.0 END, 6) AS top2gram_char_frac,
             |    round(CASE WHEN coalesce(ts.n_tokens, 0) > 0
             |      THEN b.n_symbols * 1.0 / ts.n_tokens
             |      ELSE 0.0 END, 6) AS symbol_word_ratio
             |  FROM b LEFT JOIN ts USING (doc_id) LEFT JOIN top USING (doc_id))
             |SELECT doc_id, n_tokens, dup_tok_frac, top_2gram, top_2gram_cnt,
             |  top2gram_char_frac, symbol_word_ratio,
             |  (dup_tok_frac <= 0.5 AND top2gram_char_frac <= 0.08
             |    AND symbol_word_ratio <= 0.1) AS keep
             |FROM m ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    QueryDef("q62_decontaminate",
      (s, dir) => {
        // shingle ONCE for the whole corpus, cache, split train/eval by
        // filter — halves the tokenize+explode work vs two posting builds
        val d = t(s, dir, "documents")
        val posts = graft.pipeline.Pins.pin(
          Dedup.shinglePostings(d, "doc_id", "text", 3))
        val isEval = pmod(col("id"), lit(50)) === 0
        val trainPosts = posts.filter(!isEval)
          .select(col("id").as("train_id"), col("shingle"))
        val evalPosts = posts.filter(isEval)
          .select(col("id").as("eval_id"), col("shingle"))
        trainPosts.join(evalPosts, "shingle")
          .groupBy(col("train_id"), col("eval_id"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
          .orderBy(col("train_id"), col("eval_id"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM documents),
             |sh AS (SELECT doc_id,
             |    CASE WHEN len(toks) >= 3
             |         THEN list_distinct(list_transform(range(len(toks) - 2),
             |                i -> array_to_string(toks[i + 1:i + 3], ' ')))
             |         ELSE [array_to_string(toks, ' ')] END AS shingles
             |  FROM tok),
             |posts AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
             |train AS (SELECT doc_id AS train_id, shingle FROM posts
             |          WHERE doc_id % 50 <> 0),
             |eval AS (SELECT doc_id AS eval_id, shingle FROM posts
             |         WHERE doc_id % 50 = 0)
             |SELECT train_id, eval_id, count(*) AS n_shared
             |FROM train JOIN eval USING (shingle)
             |GROUP BY train_id, eval_id
             |HAVING count(*) >= 2
             |ORDER BY train_id, eval_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q61: global-sales-opportunity (TPC-H Q22 shape): scalar aggregate
    // subquery as a broadcast 1-row join (never a driver-side collect),
    // NOT EXISTS as a LEFT ANTI hash join, conditional grouping. The
    // 1-row broadcast is the one place a nested-loop join is the right
    // plan (1 x N comparisons, no shuffle).
    QueryDef("q61_sales_opportunity",
      (s, dir) => {
        val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
        // rounded to cents so the membership test is identical across
        // engines (see q43)
        val threshold = c.filter(col("c_acctbal") > 0.0)
          .agg(round(avg(col("c_acctbal")), 2).as("avg_bal"))
        c.join(broadcast(threshold))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(o.filter(col("o_orderpriority") === "1-URGENT")
            .select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy((col("c_nationkey") % 5).as("cntrycode"))
          .agg(count(lit(1)).as("numcust"),
            round(sum(col("c_acctbal")), 2).as("totacctbal"))
          .orderBy(col("cntrycode"))
      },
      Some("""SELECT c_nationkey % 5 AS cntrycode, count(*) AS numcust,
             |  round(sum(c_acctbal), 2) AS totacctbal
             |FROM customer
             |WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2)
             |                   FROM customer WHERE c_acctbal > 0.0)
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderpriority = '1-URGENT')
             |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin)),

    // ---------------------------------------------------------------------
    // q60: data-mixture construction — an INDEPENDENT token budget per
    // domain (language), the per-source quota step of training-corpus
    // mixing. Languages are FEW, so a lang-partitioned cumulative window
    // would run each domain's corpus slice in ONE task; the per-domain
    // prefix rides Budget.groupedCumulativeSum instead (two-phase
    // distributed prefix over the composite (lang, n_chars desc, doc_id)
    // sort — the q167/q180 plan), value-identical in exact long
    // arithmetic.
    QueryDef("q60_domain_mix",
      (s, dir) => {
        val d = t(s, dir, "documents")
        graft.operators.Budget.groupedCumulativeSum(
            d.select(col("doc_id"), col("lang"),
              Text.tokenCount(col("text")).cast("long").as("n_tokens"),
              col("n_chars")),
            "lang", Seq(col("n_chars").desc, col("doc_id")),
            col("n_tokens"), "cum_tokens")
          .filter(col("cum_tokens") <= 8000)
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            col("cum_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tc AS (
             |  SELECT doc_id, lang, n_chars,
             |    CAST(len(list_filter(
             |      string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, lang, n_tokens,
             |    sum(n_tokens) OVER (PARTITION BY lang
             |      ORDER BY n_chars DESC, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS cum_tokens
             |  FROM tc)
             |SELECT doc_id, lang, n_tokens,
             |  CAST(cum_tokens AS BIGINT) AS cum_tokens
             |FROM c WHERE cum_tokens <= 8000 ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q56: PII redaction (emails + NANP phones -> typed placeholders) — the
    // scrubbing step of a training-data pipeline. The corpus text carries no
    // PII, so each doc gets a deterministic planted email+phone (same
    // construction in the oracle); the redactor must find and replace
    // exactly those. Pure per-row regex columns — no shuffle.
    QueryDef("q56_pii_redact",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val planted = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"),
          when(pmod(col("doc_id"), lit(2)) === 0, lit(" or call 555-867-"))
            .otherwise(lit(" or call +1-555-867-")),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
        d.select(col("doc_id"),
            Text.emailCount(planted).cast("long").as("n_emails"),
            Text.phoneCount(planted).cast("long").as("n_phones"),
            md5(Text.redactPii(planted)).as("redacted_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH p AS (
             |  SELECT doc_id,
             |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
             |    '@example.com' ||
             |    CASE WHEN doc_id % 2 = 0 THEN ' or call 555-867-'
             |         ELSE ' or call +1-555-867-' END ||
             |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t2
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(t2,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             |    AS n_emails,
             |  CAST(len(regexp_extract_all(t2,
             |    '(\+?1[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}'))
             |    AS BIGINT) AS n_phones,
             |  md5(regexp_replace(regexp_replace(t2,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             |    '<EMAIL>', 'g'),
             |    '(\+?1[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}',
             |    '<PHONE>', 'g')) AS redacted_md5
             |FROM p ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q57: boilerplate-line removal (CCNet/RefinedWeb line dedup): lines in
    // >= 100 distinct docs are site furniture and get stripped. Planted:
    // NAV + COPYRIGHT on every doc, PROMO on half (all >= 100 -> stripped),
    // a per-doc-group 'ref section' line on ~1/7 (< 100 -> kept).
    QueryDef("q57_boilerplate",
      (s, dir) => {
        val planted = t(s, dir, "documents").select(col("doc_id"),
          concat_ws("\n",
            lit("NAV home products pricing"),
            col("text"),
            when(pmod(col("doc_id"), lit(2)) === 0,
              lit("PROMO subscribe to newsletter")),
            concat(lit("ref section "), pmod(col("doc_id"), lit(7)).cast("string")),
            lit("COPYRIGHT example corp")).as("text"))
        Boilerplate.strip(planted, "doc_id", "text", minDocs = 100)
          .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
            size(split(col("clean_text"), "\n")).cast("long").as("n_lines"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH p AS (
             |  SELECT doc_id, concat_ws(chr(10),
             |    'NAV home products pricing',
             |    text,
             |    CASE WHEN doc_id % 2 = 0 THEN 'PROMO subscribe to newsletter' END,
             |    'ref section ' || CAST(doc_id % 7 AS VARCHAR),
             |    'COPYRIGHT example corp') AS t2
             |  FROM documents),
             |lines AS (
             |  SELECT doc_id,
             |    unnest(range(1, len(string_split(t2, chr(10))) + 1)) AS pos,
             |    unnest(string_split(t2, chr(10))) AS line
             |  FROM p),
             |freq AS (
             |  SELECT line FROM (SELECT DISTINCT doc_id, line FROM lines)
             |  GROUP BY line HAVING count(*) >= 100),
             |kept AS (SELECT * FROM lines WHERE line NOT IN (SELECT line FROM freq)),
             |agg AS (
             |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
             |  FROM kept GROUP BY doc_id)
             |SELECT p.doc_id, md5(coalesce(a.clean_text, '')) AS clean_md5,
             |  CAST(len(string_split(coalesce(a.clean_text, ''), chr(10))) AS BIGINT)
             |    AS n_lines
             |FROM p LEFT JOIN agg a ON p.doc_id = a.doc_id
             |ORDER BY p.doc_id""".stripMargin)),

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
    // q66: numeric-profile aggregate family (corr / covar_samp / stddev /
    // variance) — the statistical-profiling surface for corpus QA. All are
    // single-pass mergeable co-moment aggregates: partial aggregation on
    // every mapper, |groups| rows shuffled, identical plan shape at 100 TB.
    // Rounding absorbs engine-order float summation differences (file
    // header convention).
    QueryDef("q66_numeric_profile",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"))
          .agg(
            round(corr(col("l_quantity"), col("l_extendedprice")), 6)
              .as("corr_qty_price"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
              .as("covar_qty_price"),
            round(stddev_samp(col("l_extendedprice")), 4).as("std_price"),
            round(var_samp(col("l_discount")), 6).as("var_disc"),
            round(avg(col("l_tax")), 6).as("avg_tax"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
             |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
             |  round(stddev_samp(l_extendedprice), 4) AS std_price,
             |  round(var_samp(l_discount), 6) AS var_disc,
             |  round(avg(l_tax), 6) AS avg_tax,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

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
    // q34: LSH-bucketed ANN top-k, tolerance-oracled (q48/q55 pattern). The
    // raw synthetic embeddings are near-uniform noise — a random vector's
    // "top-10 neighbors" sit at cosine ~0.5 with nothing to separate them,
    // and measured LSH recall against that noise floor is ~0.1 at every SF,
    // so grading it would grade the corpus, not the operator. Instead the
    // query set is the planted-near-duplicate corpus (q28/q29's): each query
    // has a KNOWN true nearest neighbor (its +0.02-shifted twin, cosine
    // ~0.999 vs <=0.52 for any unrelated pair). The DuckDB twin brute-forces
    // the exact top-1 over the same planted corpus — so the hash grades (a)
    // that the planted twin really is the global exact top-1 with the exact
    // pair cosine, and (b) via the folded flag, that the LSH index finds it
    // in its top-10 (the ANN contract: recall of true near-neighbors, not of
    // noise). Hyperplane collision for the twin pair is (1 - θ/π)^planes ≈
    // 0.89 per table, miss ≈ 1.8e-8 across 8 tables — deterministic under
    // the fixed plane seed, re-verify if a new SF joins the gate
    // (RegistrySpec recall-vs-SF note).
    QueryDef("q34_ann_lsh",
      (s, dir) => {
        val e = plantedVecs(s, dir)
        val q = e.filter(col("vec_id") % 5 === 0 && col("vec_id") < 100000)
          .select(col("vec_id").as("qid"), col("vec").as("qvec"))
        val ann = Similarity.lshTopK(e, "vec_id", "vec", q, "qid", "qvec",
          k = 10, planes = 8, tables = 8)
        gradePlantedTwins(ann, q, e)
      },
      Some(annPlantedOracle)),

    // ---------------------------------------------------------------------
    // q35: IVF-style ANN top-k (coarse centroid lists, nprobe probing — the
    // FAISS IVF-Flat layout as a relational plan), tolerance-oracled the
    // same way as q34: the DuckDB twin brute-forces the exact top-1 over the
    // planted corpus; the folded flag asserts the IVF probe finds the
    // planted twin (query and twin quantize to the same coarse list, and the
    // query probes its nprobe nearest lists).
    QueryDef("q35_ann_ivf",
      (s, dir) => {
        val e = plantedVecs(s, dir)
        val q = e.filter(col("vec_id") % 5 === 0 && col("vec_id") < 100000)
          .select(col("vec_id").as("qid"), col("vec").as("qvec"))
        // trainIters=2: the graded query exercises the k-means-trained
        // quantizer (the production IVF path) at the same depth q77 grades,
        // not the seed sample
        val ann = Similarity.ivfTopK(e, "vec_id", "vec", q, "qid", "qvec",
          k = 10, nlist = 16, nprobe = 4, trainIters = 2)
        gradePlantedTwins(ann, q, e)
      },
      Some(annPlantedOracle)),

    // ---------------------------------------------------------------------
    // q69: the reference's CENTERPIECE fill, oracle-backed end to end (J2 +
    // F7 + J4 + X6; fill_missing_contacts.py:47-138, first-match :134-136):
    // three per-field hash indexes -> union of three equi-joins, >=2-of-3
    // exact-match verification, first-match-wins by source order, coalesce
    // into missing cells only, change-log provenance folded into the graded
    // output (filled_fields + matched_on columns). Synthetic master/source
    // both derive from customer: master misses emails (key%3=0) and phones
    // (key%5=0); missing emails fill via name+phone sources (two eligible
    // sources for key%4=0 rows must resolve to the EARLIER src_order);
    // missing phones fill via a name+email source (key%7=0); a name-only
    // decoy source carries the globally earliest src_order, so it wins
    // whenever the >=2-of-3 threshold fails to reject it — the oracle makes
    // the verification rule load-bearing, not decorative.
    QueryDef("q69_fill_threekey",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .select(col("c_custkey").cast("long").as("k"), col("c_name"))
        def pad(prefix: String) =
          concat(lit(prefix), lpad(col("k").cast("string"), 7, "0"))
        val master = Fill.withMatchKeys(
          c.select(col("k").as("row_id"), col("c_name").as("name"),
            when(col("k") % 3 === 0, lit(""))
              .otherwise(concat(lit("u"), col("k"), lit("@ex.com")))
              .as("email"),
            when(col("k") % 5 === 0, lit("")).otherwise(pad("555"))
              .as("mobile")),
          col("name"), col("email"), col("mobile"))
        def src(mod: Int, order: Column, email: Column, mobile: Column) =
          Fill.withMatchKeys(
            c.filter(col("k") % mod === 0)
              .select(order.as("src_order"), col("c_name").as("name"),
                email.as("email"), mobile.as("mobile")),
            col("name"), col("email"), col("mobile"))
        // src_order lanes are disjoint mod 10, so every source row has a
        // globally unique order and first-match-wins is deterministic
        val source =
          src(2, col("k") * 10 + 2,
              concat(lit("filla"), col("k"), lit("@s.com")), pad("555"))
            .unionByName(src(4, col("k") * 10 + 1,
              concat(lit("fillb"), col("k"), lit("@s.com")), pad("555")))
            .unionByName(src(7, col("k") * 10 + 5,
              concat(lit("u"), col("k"), lit("@ex.com")), pad("777")))
            .unionByName(src(6, col("k") * 10,
              concat(lit("zz"), col("k"), lit("@bad.com")), pad("999")))
        val r = Fill.fillFromSource(master, source,
          Map("email" -> "email", "mobile" -> "mobile"), "threekey_src")
        val prov = r.changeLog.groupBy(col("row_id"))
          .agg(array_join(array_sort(collect_list(col("field"))), ",")
              .as("filled_fields"),
            max(col("matched_on")).as("matched_on"))
        r.filled.select("row_id", "email", "mobile")
          .join(prov, Seq("row_id"), "left")
          .orderBy(col("row_id"))
      },
      Some("""WITH c AS (
             |  SELECT CAST(c_custkey AS BIGINT) AS k,
             |    lower(trim(regexp_replace(c_name, '\s+', ' ', 'g'))) AS _name
             |  FROM customer),
             |mk AS (
             |  SELECT k AS row_id, _name,
             |    CASE WHEN k % 3 = 0 THEN '' ELSE 'u' || k || '@ex.com' END AS email,
             |    CASE WHEN k % 5 = 0 THEN ''
             |         ELSE '555' || lpad(CAST(k AS VARCHAR), 7, '0') END AS mobile
             |  FROM c),
             |mkk AS (
             |  SELECT row_id, _name, email, mobile,
             |    lower(trim(email)) AS _email,
             |    CASE WHEN length(regexp_replace(mobile, '[^0-9]', '', 'g')) >= 10
             |      THEN right(regexp_replace(mobile, '[^0-9]', '', 'g'), 10)
             |      ELSE regexp_replace(mobile, '[^0-9]', '', 'g') END AS _phone,
             |    (trim(email) = '') AS no_email,
             |    (trim(mobile) = '') AS no_mobile
             |  FROM mk),
             |rawsrc AS (
             |  SELECT k * 10 + 2 AS src_order, _name,
             |    'filla' || k || '@s.com' AS email,
             |    '555' || lpad(CAST(k AS VARCHAR), 7, '0') AS mobile
             |  FROM c WHERE k % 2 = 0
             |  UNION ALL
             |  SELECT k * 10 + 1, _name, 'fillb' || k || '@s.com',
             |    '555' || lpad(CAST(k AS VARCHAR), 7, '0') FROM c WHERE k % 4 = 0
             |  UNION ALL
             |  SELECT k * 10 + 5, _name, 'u' || k || '@ex.com',
             |    '777' || lpad(CAST(k AS VARCHAR), 7, '0') FROM c WHERE k % 7 = 0
             |  UNION ALL
             |  SELECT k * 10, _name, 'zz' || k || '@bad.com',
             |    '999' || lpad(CAST(k AS VARCHAR), 7, '0') FROM c WHERE k % 6 = 0),
             |sk AS (
             |  SELECT src_order, _name, email, mobile,
             |    lower(trim(email)) AS _email,
             |    CASE WHEN length(regexp_replace(mobile, '[^0-9]', '', 'g')) >= 10
             |      THEN right(regexp_replace(mobile, '[^0-9]', '', 'g'), 10)
             |      ELSE regexp_replace(mobile, '[^0-9]', '', 'g') END AS _phone
             |  FROM rawsrc),
             |probe AS (SELECT * FROM mkk WHERE no_email OR no_mobile),
             |cand AS (
             |  SELECT m.row_id, s.src_order FROM probe m JOIN sk s
             |    ON m._name <> '' AND m._name = s._name
             |  UNION
             |  SELECT m.row_id, s.src_order FROM probe m JOIN sk s
             |    ON m._email <> '' AND m._email = s._email
             |  UNION
             |  SELECT m.row_id, s.src_order FROM probe m JOIN sk s
             |    ON m._phone <> '' AND m._phone = s._phone),
             |ver AS (
             |  SELECT cd.row_id, cd.src_order,
             |    (CASE WHEN m._name <> '' AND s._name <> ''
             |            AND m._name = s._name THEN 1 ELSE 0 END
             |     + CASE WHEN m._email <> '' AND s._email <> ''
             |            AND m._email = s._email THEN 1 ELSE 0 END
             |     + CASE WHEN m._phone <> '' AND s._phone <> ''
             |            AND m._phone = s._phone THEN 1 ELSE 0 END) AS nmatch,
             |    concat_ws('+',
             |      CASE WHEN m._name <> '' AND m._name = s._name THEN 'name' END,
             |      CASE WHEN m._email <> '' AND m._email = s._email THEN 'email' END,
             |      CASE WHEN m._phone <> '' AND m._phone = s._phone THEN 'phone' END)
             |      AS matched_on,
             |    m.no_email, m.no_mobile, s.email AS s_email, s.mobile AS s_mobile
             |  FROM cand cd JOIN mkk m ON m.row_id = cd.row_id
             |    JOIN sk s ON s.src_order = cd.src_order),
             |win AS (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY row_id ORDER BY src_order ASC) AS rn
             |  FROM ver WHERE nmatch >= 2),
             |fills AS (
             |  SELECT row_id, matched_on,
             |    CASE WHEN no_email AND trim(s_email) <> '' THEN s_email END
             |      AS new_email,
             |    CASE WHEN no_mobile AND trim(s_mobile) <> '' THEN s_mobile END
             |      AS new_mobile
             |  FROM win WHERE rn = 1),
             |prov AS (
             |  SELECT row_id,
             |    concat_ws(',',
             |      CASE WHEN new_email IS NOT NULL THEN 'email' END,
             |      CASE WHEN new_mobile IS NOT NULL THEN 'mobile' END)
             |      AS filled_fields,
             |    matched_on
             |  FROM fills WHERE new_email IS NOT NULL OR new_mobile IS NOT NULL)
             |SELECT m.row_id,
             |  CASE WHEN m.no_email THEN coalesce(f.new_email, m.email)
             |       ELSE m.email END AS email,
             |  CASE WHEN m.no_mobile THEN coalesce(f.new_mobile, m.mobile)
             |       ELSE m.mobile END AS mobile,
             |  p.filled_fields, p.matched_on
             |FROM mkk m
             |LEFT JOIN fills f ON f.row_id = m.row_id
             |LEFT JOIN prov p ON p.row_id = m.row_id
             |ORDER BY m.row_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q70: CUBE / grouping-sets aggregate — all 2^2 grouping combinations in
    // ONE pass (Spark expands the grouping sets BEFORE the shuffle, so this
    // stays a single partial-aggregated exchange, not four scans).
    // grouping_id() disambiguates a cube-generated null from a null in the
    // data, and both engines emit the same bitmask for the same column
    // order.
    QueryDef("q70_cube_pricing",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.cube(col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().as("gid"),
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_price"),
            count(lit(1)).as("n"))
          .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  GROUPING(l_returnflag, l_linestatus) AS gid,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_price,
             |  count(*) AS n
             |FROM lineitem
             |GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin)),

    // ---------------------------------------------------------------------
    // q71: TF-IDF distinctive terms per source — ONE pass over the token
    // stream: explode -> (source, word) partial-agg shuffle, then doc-freq
    // as a PARTITIONED window over the tf frame (tf rows are distinct
    // (source, word), so count-over-word == sources containing the word —
    // no second aggregation lineage re-scanning the corpus, which is what
    // a separate groupBy(word) frame would cost without exchange reuse).
    // n_sources comes from a one-column pruned scan (dimension-sized).
    // Ranking and the graded score use round(score, 6): ln() can differ
    // across engines in the last ulp (and mathematically equal products
    // like 2*ln(4) = 4*ln(2) land on different doubles), so ranking the
    // raw double would be engine-dependent on ties.
    QueryDef("q71_tfidf_sources",
      (s, dir) => {
        val words = t(s, dir, "documents")
          .select(col("source"), explode(Text.tokens(col("text"))).as("word"))
        val tf = words.groupBy(col("source"), col("word"))
          .agg(count(lit(1)).as("tf"))
        val withDf = tf.withColumn("df",
          count(lit(1)).over(Window.partitionBy(col("word"))))
        // non-null distinct sources over documents — countDistinct, so the
        // null-handling matches the twin's count(DISTINCT source) even for
        // corpora with a null or all-empty-text source
        val ns = t(s, dir, "documents")
          .agg(countDistinct(col("source")).as("n_sources"))
        val scored = withDf.crossJoin(broadcast(ns))
          .withColumn("score",
            round(col("tf") * log(col("n_sources") / col("df")), 6))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("score").desc, col("word").asc)
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("source"), col("word"), col("tf"), col("df"),
            col("score"), col("rank"))
          .orderBy(col("source"), col("rank"))
      },
      Some("""WITH w AS (
             |  SELECT source, unnest(list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '')) AS word
             |  FROM documents),
             |tf AS (SELECT source, word, count(*) AS tf FROM w GROUP BY 1, 2),
             |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
             |ns AS (SELECT count(DISTINCT source) AS n_sources FROM documents),
             |scored AS (
             |  SELECT source, word, tf, df,
             |    round(tf * ln(n_sources / df), 6) AS score
             |  FROM tf JOIN df USING (word) CROSS JOIN ns),
             |r AS (SELECT *, row_number() OVER (
             |    PARTITION BY source ORDER BY score DESC, word) AS rank
             |  FROM scored)
             |SELECT source, word, tf, df, score, rank FROM r WHERE rank <= 5
             |ORDER BY source, rank""".stripMargin)),

    // ---------------------------------------------------------------------
    // q72: heavy hitters via the native Misra-Gries sketch (two-pass plan):
    // pass 1 folds the token stream into one 64-counter summary per map
    // task (merged associatively — O(k) shuffle instead of a
    // vocabulary-sized exchange); pass 2 exact-counts ONLY the <=64
    // candidate keys (broadcast semi-join filters the shuffle to candidate
    // rows). The sketch is load-bearing for the compare: its n/(k+1)
    // guarantee must retain every word above total/33 or the row is missing
    // from the hashed result. The DuckDB twin states the exact semantics.
    QueryDef("q72_heavy_hitters",
      (s, dir) => {
        val words = t(s, dir, "documents")
          .select(explode(Text.tokens(col("text"))).as("word"))
        val sketch = words.agg(
          Text.heavyHitterCandidates(col("word"), 64).as("cands"),
          count(lit(1)).as("total"))
        val cands = sketch.select(explode(col("cands")).as("word"),
          col("total"))
        words.join(broadcast(cands), "word")
          .groupBy(col("word"), col("total"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") * 33 > col("total"))
          .select(col("word"), col("n"))
          .orderBy(col("n").desc, col("word").asc)
      },
      Some("""WITH w AS (
             |  SELECT unnest(list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '')) AS word
             |  FROM documents),
             |c AS (SELECT word, count(*) AS n FROM w GROUP BY word),
             |tot AS (SELECT count(*) AS total FROM w)
             |SELECT word, n FROM c, tot WHERE n * 33 > total
             |ORDER BY n DESC, word""".stripMargin)),

    // ---------------------------------------------------------------------
    // q73: int8 embedding quantization fidelity — the memory/shuffle scale
    // path for ANN (4x smaller vectors). Per-vector max-abs scale, floor(x/
    // scale + 0.5) quantization (floor is bit-identical across engines;
    // round() half-rule is not), dequantize, cosine against the original.
    // min() is order-independent (round 6); avg is rounded to 4 to absorb
    // summation-order ulps.
    QueryDef("q73_quantized_cosine",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            Vec.asDouble(col("embedding")).as("vec"))
        val amax = array_max(transform(col("vec"), x => abs(x)))
        val scaled = e.withColumn("scale", amax / lit(127.0))
        val dq = transform(col("vec"),
          x => floor(x / col("scale") + lit(0.5)) * col("scale"))
        val withCos = scaled.withColumn("cos",
          when(col("scale") > 0.0, Vec.cosine(col("vec"), dq))
            .otherwise(lit(null).cast("double")))
        // asc_nulls_last: Spark ASC is NULLS FIRST, DuckDB's is NULLS LAST —
        // a null label (q78 filters for exactly this hazard) would reorder
        // rows between engines and break the hash grade (round 6)
        withCos.groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"),
            round(min(col("cos")), 6).as("min_fidelity"),
            round(avg(col("cos")), 4).as("avg_fidelity"))
          .orderBy(col("label").asc_nulls_last)
      },
      Some("""WITH e AS (
             |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |s AS (
             |  SELECT label, v,
             |    list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127.0
             |      AS scale
             |  FROM e),
             |c AS (
             |  SELECT label,
             |    CASE WHEN scale > 0 THEN list_cosine_similarity(v,
             |      list_transform(v, x -> floor(x / scale + 0.5) * scale))
             |    END AS cos
             |  FROM s)
             |SELECT label, count(*) AS n_vecs,
             |  round(min(cos), 6) AS min_fidelity,
             |  round(avg(cos), 4) AS avg_fidelity
             |FROM c GROUP BY label ORDER BY label NULLS LAST""".stripMargin)),

    // ---------------------------------------------------------------------
    // q74: sliding-window document chunking (context-window packing for
    // training): 32-token chunks every 24 tokens (8-token overlap), chunk
    // identity graded via md5 of the joined tokens. Pure per-row compute —
    // tokenize once, explode computed chunk indices, slice — no shuffle at
    // all until the output sort, so the operator streams at scan speed on
    // any corpus size. Integer chunk math uses floor() on small-int doubles
    // (exact below 2^53, portable across engines).
    QueryDef("q74_doc_chunks",
      (s, dir) => {
        val C = 32; val S = 24
        val d = t(s, dir, "documents")
          .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
          .withColumn("len", size(col("toks")))
          .filter(col("len") > 0)
          .withColumn("nch",
            floor((col("len") - 1) / lit(S)).cast("long") + 1)
        d.select(col("doc_id"), col("toks"), col("len"),
            explode(sequence(lit(0L), col("nch") - 1)).as("chunk_idx"))
          .select(col("doc_id"), col("chunk_idx"),
            slice(col("toks"), (col("chunk_idx") * S + 1).cast("int"), lit(C))
              .as("chunk"))
          .select(col("doc_id"), col("chunk_idx"),
            size(col("chunk")).cast("long").as("n_tok"),
            md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '') AS toks
             |  FROM documents),
             |sized AS (
             |  SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
             |idx AS (
             |  SELECT doc_id, toks,
             |    unnest(range(0, CAST(floor((n - 1) / 24) AS BIGINT) + 1))
             |      AS chunk_idx
             |  FROM sized),
             |ch AS (
             |  SELECT doc_id, chunk_idx,
             |    list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32)
             |      AS chunk
             |  FROM idx)
             |SELECT doc_id, chunk_idx,
             |  CAST(len(chunk) AS BIGINT) AS n_tok,
             |  md5(array_to_string(chunk, ' ')) AS chunk_md5
             |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ---------------------------------------------------------------------
    // q75: intra-document repetition — duplicate bigram/trigram fractions
    // (the Gopher repetition signals, Rae et al. 2021 §A1.1: high
    // duplicate-n-gram mass marks boilerplate/spam). Planted repetitive
    // docs (constant 3-token loop) make the keep-rule load-bearing: they
    // must classify keep=false or the hash diverges. Per-row
    // tokenize/shingle/distinct only — no shuffle before the output sort.
    // The keep threshold compares the RAW ratio (small-int division is
    // exact in doubles, identical across engines); only the emitted
    // ratios are rounded.
    QueryDef("q75_repetition",
      (s, dir) => {
        val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val planted = base.filter(col("doc_id") % 37 === 0)
          .select((col("doc_id") + 20000).as("doc_id"),
            concat(lit("start marker "), repeat(lit("spam ham eggs "), 20))
              .as("text"))
        base.unionByName(planted)
          .withColumn("len", size(Text.tokens(col("text"))))
          .filter(col("len") >= 3)
          .withColumn("d2",
            lit(1) - size(array_distinct(Text.wordShingles(col("text"), 2)))
              / (col("len") - 1))
          .withColumn("d3",
            lit(1) - size(array_distinct(Text.wordShingles(col("text"), 3)))
              / (col("len") - 2))
          .select(col("doc_id"), col("len").cast("long").as("n_tok"),
            round(col("d2"), 6).as("dup2"),
            round(col("d3"), 6).as("dup3"),
            (col("d3") <= 0.15).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (SELECT doc_id, text FROM documents),
             |planted AS (
             |  SELECT doc_id + 20000 AS doc_id,
             |    'start marker ' || repeat('spam ham eggs ', 20) AS text
             |  FROM base WHERE doc_id % 37 = 0),
             |ad AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
             |tok AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '') AS toks
             |  FROM ad),
             |s AS (SELECT doc_id, toks, len(toks) AS n FROM tok
             |      WHERE len(toks) >= 3),
             |g AS (
             |  SELECT doc_id, n,
             |    1 - len(list_distinct(list_transform(range(n - 1),
             |      i -> array_to_string(toks[i + 1:i + 2], ' ')))) / (n - 1)
             |      AS d2,
             |    1 - len(list_distinct(list_transform(range(n - 2),
             |      i -> array_to_string(toks[i + 1:i + 3], ' ')))) / (n - 2)
             |      AS d3
             |  FROM s)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_tok,
             |  round(d2, 6) AS dup2, round(d3, 6) AS dup3,
             |  (d3 <= 0.15) AS keep
             |FROM g ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q76: quality-weighted corpus sampling — accept each document with
    // probability proportional to its quality score (importance sampling
    // for data mixing), but DETERMINISTICALLY: the uniform draw is the
    // portable md5-derived hash of the doc id mapped to [0,1), so the
    // sample is reproducible across runs, engines, and partitionings (and
    // hash-gradable — rand() would be none of those). Per-row filter over
    // one scan; the acceptance compare uses raw doubles (identical md5 ->
    // identical u; identical quality arithmetic on both sides).
    QueryDef("q76_quality_sample",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val scored = graft.operators.TextProfile.profile(d, "doc_id", "text")
        scored
          .withColumn("u",
            Text.md5Mod(col("doc_id")) / lit(Text.P31.toDouble))
          .filter(col("u") < col("quality") * 0.9)
          .select(col("doc_id"), col("n_tokens"),
            round(col("quality"), 6).as("quality"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, n_tokens, round(quality, 6) AS quality
              |FROM ($docStatsNoOrder)
              |WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              |        % 2147483647) / 2147483647.0 < quality * 0.9
              |ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q77: embedding clustering — TWO spherical Lloyd iterations from the
    // md5-ordered seed sample, then per-cluster membership stats. The
    // DuckDB twin restates the SAME deterministic algorithm independently
    // (seed order, max-cosine/smallest-id assignment, per-component mean
    // rounded to 6, then the second assign/update pass unrolled), so the
    // trainer is graded end to end at depth, not just spec-checked.
    // The graded output also carries the per-iteration OBJECTIVE (mean
    // best-cosine after iteration 1 and 2) and a monotone flag — the Lloyd
    // improvement property the spec proves is now oracle-proved too: both
    // engines must derive the same objectives from their own intermediate
    // centroid states. obj_iter1 costs one broadcast-assignment scan (the
    // same linear shape as the final stats pass); obj_iter2 is a global
    // round(avg) over the SAME kept-assignment rows as the twin's obj2 CTE
    // — grouping mirrored exactly so no cross-engine rounding seam exists
    // (r7: previously derived as sum-of-cluster-sums / total members,
    // which could round differently within ~1 ulp of a 0.00005 boundary).
    // The identical kept-rows subtree feeds stats and obj2; its exchanges
    // dedupe at runtime. min is order-independent (round 6);
    // avg/objectives absorb summation order at round 4; the 6-decimal
    // centroid rounding is what makes the intermediate state
    // engine-portable (see trainCentroids).
    QueryDef("q77_kmeans_clusters",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), Vec.asDouble(col("embedding")).as("vec"))
        val hist = graft.operators.Similarity.centroidHistory(
          e, "vec_id", "vec", nlist = 8, iters = 2)
        def best(cents: DataFrame) = {
          val scored = e.join(broadcast(cents))
            .select(col("vec_id"), col("cent_id"),
              Vec.cosine(col("vec"), col("cent_vec")).as("sim"))
          val w = Window.partitionBy(col("vec_id"))
            .orderBy(col("sim").desc, col("cent_id").asc)
          scored.withColumn("rk", row_number().over(w))
            .filter(col("rk") === 1)
        }
        val obj1 = best(hist(1))
          .agg(round(avg(col("sim")), 4).as("obj_iter1"))
        val kept2 = best(hist(2))
        val obj2 = kept2.agg(round(avg(col("sim")), 4).as("obj_iter2"))
        val stats = kept2
          .groupBy(col("cent_id"))
          .agg(count(lit(1)).as("n_members"),
            round(min(col("sim")), 6).as("min_sim"),
            round(avg(col("sim")), 4).as("avg_sim"))
        stats
          .crossJoin(broadcast(obj1))
          .crossJoin(broadcast(obj2))
          .select(col("cent_id"), col("n_members"), col("min_sim"),
            col("avg_sim"), col("obj_iter1"), col("obj_iter2"),
            (col("obj_iter2") >= col("obj_iter1")).as("monotone"))
          .orderBy(col("cent_id"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |seeds AS (
             |  SELECT row_number() OVER (
             |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
             |      AS cent_id, v
             |  FROM (SELECT vec_id, v FROM e
             |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8)),
             |assign0 AS (
             |  SELECT vec_id, e.v AS v, cent_id, row_number() OVER (
             |      PARTITION BY vec_id
             |      ORDER BY list_cosine_similarity(e.v, s.v) DESC, cent_id)
             |      AS rk
             |  FROM e CROSS JOIN seeds s),
             |comp1 AS (
             |  SELECT cent_id, pos, round(avg(val), 6) AS m
             |  FROM (SELECT cent_id, unnest(v) AS val,
             |          generate_subscripts(v, 1) AS pos
             |        FROM assign0 WHERE rk = 1)
             |  GROUP BY cent_id, pos),
             |cents1 AS (
             |  SELECT cent_id, list(m ORDER BY pos) AS cv
             |  FROM comp1 GROUP BY cent_id),
             |assign1 AS (
             |  SELECT vec_id, e.v AS v, c.cent_id,
             |    list_cosine_similarity(e.v, c.cv) AS sim,
             |    row_number() OVER (PARTITION BY vec_id
             |      ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cent_id)
             |      AS rk
             |  FROM e CROSS JOIN cents1 c),
             |obj1 AS (
             |  SELECT round(avg(sim), 4) AS obj_iter1
             |  FROM assign1 WHERE rk = 1),
             |comp2 AS (
             |  SELECT cent_id, pos, round(avg(val), 6) AS m
             |  FROM (SELECT cent_id, unnest(v) AS val,
             |          generate_subscripts(v, 1) AS pos
             |        FROM assign1 WHERE rk = 1)
             |  GROUP BY cent_id, pos),
             |cents2 AS (
             |  SELECT cent_id, list(m ORDER BY pos) AS cv
             |  FROM comp2 GROUP BY cent_id),
             |fin AS (
             |  SELECT vec_id, c.cent_id,
             |    list_cosine_similarity(e.v, c.cv) AS sim,
             |    row_number() OVER (PARTITION BY vec_id
             |      ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cent_id)
             |      AS rk
             |  FROM e CROSS JOIN cents2 c),
             |kept AS (SELECT * FROM fin WHERE rk = 1),
             |obj2 AS (SELECT round(avg(sim), 4) AS obj_iter2 FROM kept)
             |SELECT cent_id, count(*) AS n_members,
             |  round(min(sim), 6) AS min_sim, round(avg(sim), 4) AS avg_sim,
             |  obj_iter1, obj_iter2, (obj_iter2 >= obj_iter1) AS monotone
             |FROM kept CROSS JOIN obj1 CROSS JOIN obj2
             |GROUP BY cent_id, obj_iter1, obj_iter2 ORDER BY cent_id"""
        .stripMargin)),

    // ---------------------------------------------------------------------
    // q78: per-label prototype embeddings — the class-centroid kernel
    // (few-shot prototypes, label-drift monitoring) via the native VecSum
    // aggregate: ONE dim-length partial buffer per (map task, label)
    // through a |labels|-sized exchange; a posexplode formulation would
    // shuffle corpus x dim rows. Graded on scalar projections of the mean
    // vector (first component, L2 norm) — array-typed outputs are avoided
    // in the registry because the hash canonicalizer stringifies cells.
    // Components round to 6 before the norm so summation order can't leak
    // (same stance as q77's centroids).
    QueryDef("q78_label_prototypes",
      (s, dir) => {
        // null labels excluded EXPLICITLY: Spark's groupBy would keep a
        // null-label group that the twin's inner join on label drops
        val e = t(s, dir, "embeddings")
          .filter(col("label").isNotNull)
          .select(col("label"), Vec.asDouble(col("embedding")).as("vec"))
        e.groupBy(col("label"))
          .agg(Vec.sumAgg(col("vec")).as("sum"), count(lit(1)).as("n_vecs"))
          .select(col("label"), col("n_vecs"),
            transform(col("sum"), x => round(x / col("n_vecs"), 6)).as("m"))
          .select(col("label"), col("n_vecs"),
            element_at(col("m"), 1).as("m0"),
            round(sqrt(aggregate(col("m"), lit(0.0),
              (acc, x) => acc + x * x)), 6).as("mean_norm"))
          .orderBy(col("label"))
      },
      Some("""WITH e AS (
             |  SELECT label, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE label IS NOT NULL),
             |comp AS (
             |  SELECT label, pos, round(avg(val), 6) AS m
             |  FROM (SELECT label, unnest(v) AS val,
             |          generate_subscripts(v, 1) AS pos FROM e)
             |  GROUP BY label, pos),
             |protos AS (
             |  SELECT label, list(m ORDER BY pos) AS mv FROM comp
             |  GROUP BY label),
             |n AS (SELECT label, count(*) AS n_vecs FROM e GROUP BY label)
             |SELECT n.label, n_vecs, mv[1] AS m0,
             |  round(sqrt(list_reduce(list_transform(mv, x -> x * x),
             |    (a, b) -> a + b)), 6) AS mean_norm
             |FROM protos JOIN n ON protos.label = n.label
             |ORDER BY n.label""".stripMargin)),

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
    // q80: ANN over the int8-QUANTIZED corpus — the end-to-end form of
    // q73's fidelity claim: after per-vector int8 quantization (4x smaller
    // index), full-precision queries against the dequantized corpus must
    // still resolve every planted near-duplicate twin as the exact top-1.
    // Quantization uses the floor-based portable rounding (q73); ranking
    // margins are huge (twin cosine ~0.999 vs ~0.5 background), so the
    // graded twin_is_top1 flag is robust, and the graded cosine itself is
    // deterministic because both engines dequantize to identical doubles.
    QueryDef("q80_quantized_ann",
      (s, dir) => {
        val e = plantedVecs(s, dir)
        val amax = array_max(transform(col("vec"), x => abs(x)))
        val qz = e.withColumn("scale", amax / lit(127.0))
          .select(col("vec_id"),
            when(col("scale") > 0.0,
              transform(col("vec"),
                x => floor(x / col("scale") + lit(0.5)) * col("scale")))
              .otherwise(col("vec")).as("dvec"))
        val q = e.filter(col("vec_id") % 5 === 0 && col("vec_id") < 100000)
          .select(col("vec_id").as("qid"), col("vec").as("qvec"))
        graft.operators.Similarity.bruteForceTopK(
            qz, "vec_id", "dvec", q, "qid", "qvec", k = 1)
          .select(col("query_id"), col("neighbor_id"),
            round(col("cosine"), 6).as("nn_cosine"),
            (col("neighbor_id") === col("query_id") + 100000)
              .as("twin_is_top1"))
          .orderBy(col("query_id"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |allv AS (
             |  SELECT * FROM e
             |  UNION ALL
             |  SELECT vec_id + 100000, list_transform(v, x -> x + 0.02)
             |  FROM e WHERE vec_id % 5 = 0),
             |qz AS (
             |  SELECT vec_id,
             |    CASE WHEN s > 0 THEN list_transform(v,
             |           x -> floor(x / s + 0.5) * s)
             |         ELSE v END AS dv
             |  FROM (SELECT vec_id, v,
             |          list_aggregate(list_transform(v, x -> abs(x)), 'max')
             |            / 127.0 AS s
             |        FROM allv)),
             |q AS (
             |  SELECT vec_id AS query_id, v AS qv FROM allv
             |  WHERE vec_id % 5 = 0 AND vec_id < 100000),
             |scored AS (
             |  SELECT query_id, p.vec_id AS neighbor_id,
             |    list_cosine_similarity(qv, p.dv) AS c
             |  FROM q, qz p WHERE p.vec_id <> query_id),
             |top AS (
             |  SELECT *, row_number() OVER (
             |      PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
             |  FROM scored)
             |SELECT query_id, neighbor_id, round(c, 6) AS nn_cosine,
             |  (neighbor_id = query_id + 100000) AS twin_is_top1
             |FROM top WHERE rn = 1 ORDER BY query_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q81: event-type co-occurrence with PMI — association statistics over
    // per-user baskets (the market-basket/feature-co-occurrence shape).
    // distinct (user, type) -> within-user self-join (per-user type sets
    // are tiny, so the join fans out |types|^2 per user, not |events|^2) ->
    // pair counts vs marginals. Output is ordered by the pair key, not the
    // score, so the ln() engine-ulp caveat only touches the rounded score
    // column, never row membership.
    QueryDef("q81_cooccurrence_pmi",
      (s, dir) => {
        // null keys excluded EXPLICITLY: Spark's distinct would keep a null
        // user/type row that count(DISTINCT ...) in the twin ignores
        val u = t(s, dir, "events")
          .filter(col("user_id").isNotNull && col("event_type").isNotNull)
          .select(col("user_id"), col("event_type")).distinct()
        val nUsers = u.agg(countDistinct(col("user_id")).as("n_users"))
        val singles = u.groupBy(col("event_type"))
          .agg(count(lit(1)).as("c_single"))
        val pairs = u.as("a")
          .join(u.as("b"), col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"))
          .agg(count(lit(1)).as("c_pair"))
        pairs
          .join(broadcast(singles)
            .select(col("event_type").as("type_a"), col("c_single").as("c_a")),
            "type_a")
          .join(broadcast(singles)
            .select(col("event_type").as("type_b"), col("c_single").as("c_b")),
            "type_b")
          .crossJoin(broadcast(nUsers))
          .select(col("type_a"), col("type_b"), col("c_pair"),
            round(log(col("c_pair") * col("n_users") /
              (col("c_a") * col("c_b"))), 6).as("pmi"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""WITH u AS (
             |  SELECT DISTINCT user_id, event_type FROM events
             |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
             |n AS (SELECT count(DISTINCT user_id) AS n_users FROM u),
             |s AS (SELECT event_type, count(*) AS c_single FROM u GROUP BY 1),
             |p AS (
             |  SELECT a.event_type AS type_a, b.event_type AS type_b,
             |    count(*) AS c_pair
             |  FROM u a JOIN u b ON a.user_id = b.user_id
             |    AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT type_a, type_b, c_pair,
             |  round(ln(c_pair * n_users / (sa.c_single * sb.c_single)), 6)
             |    AS pmi
             |FROM p
             |JOIN s sa ON sa.event_type = type_a
             |JOIN s sb ON sb.event_type = type_b
             |CROSS JOIN n
             |ORDER BY type_a, type_b""".stripMargin)),

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
    // q84: fixed-width value histogram — the distribution-profiling binning
    // shape (equi-width buckets with pinned under/overflow sentinels).
    // floor(value / width) is a pure projection, so at any scale this is a
    // single partial-aggregated pass whose exchange carries |buckets| rows;
    // floor on identical doubles is bit-identical across engines, making
    // bucket membership (not just counts) hash-gradable.
    QueryDef("q84_value_histogram",
      (s, dir) => {
        val bucket = when(col("value") < 0, lit(-1L))
          .when(col("value") >= 500, lit(10L))
          .otherwise(floor(col("value") / 50).cast("long"))
        t(s, dir, "events")
          .select(bucket.as("bucket"), col("value"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            round(min(col("value")), 2).as("lo"),
            round(max(col("value")), 2).as("hi"),
            round(sum(col("value")), 2).as("total"))
          .orderBy(col("bucket"))
      },
      Some("""SELECT bucket, count(*) AS n,
             |  round(min(value), 2) AS lo, round(max(value), 2) AS hi,
             |  round(sum(value), 2) AS total
             |FROM (
             |  SELECT CASE WHEN value < 0 THEN -1
             |              WHEN value >= 500 THEN 10
             |              ELSE CAST(floor(value / 50) AS BIGINT) END
             |           AS bucket, value
             |  FROM events)
             |GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // ---------------------------------------------------------------------
    // q85: weighted sampling WITHOUT replacement, exact size k=50 — the
    // Efraimidis-Spirakis race: each doc draws u in (0,1] and the k largest
    // u^(1/weight) win (heavier docs race with flatter curves). Complements
    // q76's Bernoulli acceptance (random size): this one is exact-k, the
    // form data-mixing recipes ask for. The draw is md5-derived (portable,
    // partitioning-independent); the race key is rounded to 9 before
    // ranking so a pow() last-ulp difference across engines cannot flip
    // the cutoff; top-k runs as orderBy+limit (TakeOrderedAndProject),
    // never a global window.
    QueryDef("q85_weighted_sample_k",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val scored = graft.operators.TextProfile.profile(d, "doc_id", "text")
          .filter(col("quality") > 0)
          .withColumn("u",
            (Text.md5Mod(col("doc_id")) + 1) / lit(Text.P31.toDouble + 1))
          .withColumn("race",
            round(pow(col("u"), lit(1.0) / col("quality")), 9))
        scored.orderBy(col("race").desc, col("doc_id").asc).limit(50)
          .select(col("doc_id"), round(col("quality"), 6).as("quality"),
            col("race"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, round(quality, 6) AS quality, race FROM (
              |  SELECT doc_id, quality,
              |    round(pow(
              |      ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              |          ::BIGINT % 2147483647) + 1) / 2147483648.0,
              |      1.0 / quality), 9) AS race
              |  FROM ($docStatsNoOrder)
              |  WHERE quality > 0
              |  ORDER BY race DESC, doc_id LIMIT 50)
              |ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q86: chi-squared contingency test — market segment x order priority
    // independence: observed vs expected cell counts and the summed
    // statistic (the categorical-association screen for feature/label
    // leakage checks). One join + one contingency aggregate; marginals are
    // tiny re-aggregations of the cell frame joined back by key, and the
    // grand chi2 is a 1-row broadcast folded into every cell row. Expected
    // counts are exact integer products in double division (deterministic);
    // the summed chi2 rounds to 4 against summation-order ulps.
    QueryDef("q86_chi_squared",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val cells = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"),
            col("o_orderpriority").as("prio"))
          .agg(count(lit(1)).as("obs"))
        val rowT = cells.groupBy(col("seg")).agg(sum(col("obs")).as("row_t"))
        val colT = cells.groupBy(col("prio")).agg(sum(col("obs")).as("col_t"))
        val n = cells.agg(sum(col("obs")).as("n_total"))
        val withExp = cells
          .join(broadcast(rowT), "seg").join(broadcast(colT), "prio")
          .crossJoin(broadcast(n))
          .withColumn("exp",
            col("row_t") * col("col_t") / col("n_total"))
          .withColumn("cell_chi2",
            (col("obs") - col("exp")) * (col("obs") - col("exp")) / col("exp"))
        // grand chi2 as an unpartitioned window over withExp, NOT a separate
        // scalar aggregate cross-joined back: the latter evaluates the whole
        // join tree twice (no exchange reuse). The single-task window is
        // safe here because its input is the post-aggregate cell frame —
        // |segments| x |priorities| ~ 25 rows at any corpus scale (round 6).
        val wAll = Window.partitionBy()
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        withExp
          .withColumn("chi2", round(sum(col("cell_chi2")).over(wAll), 4))
          .select(col("seg"), col("prio"), col("obs"),
            round(col("exp"), 4).as("expected"),
            round(col("cell_chi2"), 6).as("cell_chi2"), col("chi2"))
          .orderBy(col("seg"), col("prio"))
      },
      Some("""WITH cells AS (
             |  SELECT c_mktsegment AS seg, o_orderpriority AS prio,
             |    count(*) AS obs
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |rt AS (SELECT seg, sum(obs) AS row_t FROM cells GROUP BY 1),
             |ct AS (SELECT prio, sum(obs) AS col_t FROM cells GROUP BY 1),
             |n AS (SELECT sum(obs) AS n_total FROM cells),
             |wexp AS (
             |  SELECT seg, prio, obs,
             |    row_t * col_t / n_total AS exp,
             |    (obs - row_t * col_t / n_total)
             |      * (obs - row_t * col_t / n_total)
             |      / (row_t * col_t / n_total) AS cell_chi2
             |  FROM cells JOIN rt USING (seg) JOIN ct USING (prio)
             |  CROSS JOIN n),
             |tot AS (SELECT round(sum(cell_chi2), 4) AS chi2 FROM wexp)
             |SELECT seg, prio, obs, round(exp, 4) AS expected,
             |  round(cell_chi2, 6) AS cell_chi2, chi2
             |FROM wexp CROSS JOIN tot
             |ORDER BY seg, prio""".stripMargin)),

    // ---------------------------------------------------------------------
    // q87: int8-quantized IVF ANN — the COMPOSITION of q73/q80's
    // quantization scheme with q35's trained-IVF layout, i.e. the actual
    // production ANN path at 100 TB (inverted lists storing 1-byte codes +
    // a per-vector scale, ~8x smaller candidate shuffle than float64
    // lists). Graded like q34/q35 on the planted-twin corpus, against the
    // QUANTIZED ground truth: the DuckDB twin brute-forces the exact top-1
    // over the dequantized int8 corpus (q80's qz), so the graded cosine
    // proves the quantized scoring arithmetic and the folded flag proves
    // the trained quantizer still routes each query to its twin's list and
    // surfaces it through int8 rescoring.
    QueryDef("q87_quantized_ivf",
      (s, dir) => {
        val e = plantedVecs(s, dir)
        val q = e.filter(col("vec_id") % 5 === 0 && col("vec_id") < 100000)
          .select(col("vec_id").as("qid"), col("vec").as("qvec"))
        val ann = Similarity.ivfTopKQuantized(e, "vec_id", "vec",
          q, "qid", "qvec", k = 10, nlist = 16, nprobe = 4, trainIters = 1)
        val hits = ann
          .filter(col("neighbor_id") === col("query_id") + 100000)
          .select(col("query_id"), lit(true).as("hit"))
        // graded cosine vs the DEQUANTIZED twin (what the index stores)
        val dqTwin = e.filter(col("vec_id") >= 100000)
          .withColumn("scale",
            array_max(transform(col("vec"), x => abs(x))) / lit(127.0))
          .select((col("vec_id") - 100000).as("qid"),
            when(col("scale") > 0.0,
              transform(col("vec"),
                x => floor(x / col("scale") + lit(0.5)) * col("scale")))
              .otherwise(col("vec")).as("tvec"))
        val twins = q.join(dqTwin, "qid")
          .select(col("qid").as("query_id"),
            (col("qid") + 100000).as("twin_id"),
            round(Vec.cosine(col("qvec"), col("tvec")), 6).as("twin_cosine"))
        twins.join(hits, Seq("query_id"), "left")
          .select(col("query_id"), col("twin_id"), col("twin_cosine"),
            coalesce(col("hit"), lit(false)).as("twin_in_top10"))
          .orderBy(col("query_id"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |allv AS (
             |  SELECT * FROM e
             |  UNION ALL
             |  SELECT vec_id + 100000, list_transform(v, x -> x + 0.02)
             |  FROM e WHERE vec_id % 5 = 0),
             |qz AS (
             |  SELECT vec_id,
             |    CASE WHEN s > 0 THEN list_transform(v,
             |           x -> floor(x / s + 0.5) * s)
             |         ELSE v END AS dv
             |  FROM (SELECT vec_id, v,
             |          list_aggregate(list_transform(v, x -> abs(x)), 'max')
             |            / 127.0 AS s
             |        FROM allv)),
             |q AS (
             |  SELECT vec_id AS query_id, v AS qv FROM allv
             |  WHERE vec_id % 5 = 0 AND vec_id < 100000),
             |scored AS (
             |  SELECT query_id, p.vec_id AS neighbor_id,
             |    round(list_cosine_similarity(qv, p.dv), 6) AS cosine
             |  FROM q, qz p WHERE p.vec_id <> query_id),
             |top1 AS (
             |  SELECT query_id, neighbor_id, cosine, row_number() OVER (
             |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
             |  FROM scored)
             |SELECT query_id, neighbor_id AS twin_id, cosine AS twin_cosine,
             |  TRUE AS twin_in_top10
             |FROM top1 WHERE rn = 1 ORDER BY query_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q88: BM25 keyword retrieval (Robertson k1=1.2 b=0.75, Lucene's
    // ln(1 + (N-df+0.5)/(df+0.5)) positive IDF) — the classic sparse
    // retrieval kernel the corpus-construction family was missing (TF-IDF
    // q71 ranks terms per source; this ranks DOCS per query). Plan shape:
    // ONE token-stream scan; the broadcast query-term set prunes the
    // stream BEFORE the (term, doc) partial agg, so the aggregate is
    // candidate-sized, not vocabulary-sized; df folds out of the candidate
    // frame; dl rides along from the same scan (no second corpus scan for
    // lengths); N/avgdl is a 1-row broadcast. Per-term scores round to 6
    // before the per-doc sum and the summed score rounds again — ln() and
    // 2-3-term summation order both differ across engines in the last ulp
    // (q71 stance).
    QueryDef("q88_bm25_retrieval",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val q = retrievalQueries(s)
        // dtf feeds both the df aggregate and the scoring join; the two
        // consumers hang off ONE definition, so the identical aggregate
        // exchange is deduped at runtime (ReusedExchange — cheaper than a
        // persist pin, which the r7 A/B measured ~0.3 s slower here)
        val dtf = graft.operators.Retrieval
          .docTermFreq(d, "doc_id", "text", q)
        val byDoc = graft.operators.Retrieval.bm25ScoresOf(
          dtf, graft.operators.Retrieval.corpusStats(d, "text"), q)
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id").asc)
        byDoc.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("rank"), col("doc_id"),
            col("score"), col("n_terms_hit"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH q(query_id, term) AS (VALUES
             |    (1, 'vector'), (1, 'join'),
             |    (2, 'customer'), (2, 'batch'), (2, 'window'),
             |    (3, 'slow'), (3, 'scan')),
             |toks AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    x -> x <> '') AS tk
             |  FROM documents),
             |words AS (
             |  SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl, unnest(tk) AS term
             |  FROM toks),
             |dtf AS (
             |  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl
             |  FROM words WHERE term IN (SELECT term FROM q)
             |  GROUP BY 1, 2),
             |dfx AS (SELECT term, count(*) AS df FROM dtf GROUP BY 1),
             |st AS (
             |  SELECT count(*) AS n_docs, avg(len(tk)) AS avgdl FROM toks),
             |sc AS (
             |  SELECT q.query_id, dtf.doc_id,
             |    round(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
             |      * (tf * 2.2)
             |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 6) AS ts
             |  FROM dtf JOIN dfx USING (term) JOIN q USING (term)
             |  CROSS JOIN st),
             |agg AS (
             |  SELECT query_id, doc_id, round(sum(ts), 6) AS score,
             |    count(*) AS n_terms_hit
             |  FROM sc GROUP BY 1, 2),
             |r AS (
             |  SELECT *, row_number() OVER (
             |      PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
             |  FROM agg)
             |SELECT query_id, rank, doc_id, score, n_terms_hit
             |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // ---------------------------------------------------------------------
    // q89: exact-substring containment dedup (token-level) — the
    // suffix-array-style complement to shingle Jaccard (q19): doc A is a
    // duplicate-by-containment of doc B when A's token sequence appears
    // contiguously inside B's. Plant: q19's corpus — every 7th doc re-added
    // (+10000) minus its first token, i.e. a TRUE SUFFIX of the original,
    // so each planted doc must surface as contained. Plan shape (never a
    // doc x doc product): if A's tokens appear inside B, then A's FIRST
    // 8-token gram is one of B's 8-grams — so probe = one hashed gram per
    // doc, postings = every doc's hashed 8-grams (distinct), and the
    // equi-join yields candidates that a token-boundary-safe contains()
    // (space-padded normalized text) verifies. Texts join back by id AFTER
    // the slim hash-join, so the wide columns never ride the postings
    // shuffle. Gram df is naturally tiny here (30-word vocab, 30^8 gram
    // space) and min doc length is 10 tokens at every SF, but the
    // operator now CODES the real-corpus guards (r7): a maxGramDf
    // postings cap with rarest-gram probing, and a broadcast whole-text
    // fallback for docs under the gram floor (both spec'd in
    // OperatorsSpec with planted hot-gram / short-doc fixtures).
    QueryDef("q89_substring_dedup",
      (s, dir) => {
        // operator call (Dedup.substringContainment) — the inline r6 plan
        // plus the coded guards: rarest-gram probing under a maxGramDf
        // postings cap and the short-doc whole-text fallback, both no-ops
        // on this corpus (min doc length 10 tokens, 30-word vocab) and
        // spec'd with planted hot-gram / short-doc fixtures
        graft.operators.Dedup.substringContainment(
            plantedNearDups(s, dir, 7), "doc_id", "text", gram = 8)
          .orderBy(col("contained_id"), col("container_id"))
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 10000, regexp_replace(text, '^\S+\s+', '')
             |  FROM documents WHERE doc_id % 7 = 0),
             |norm AS (
             |  SELECT doc_id, array_to_string(list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    x -> x <> ''), ' ') AS ntext
             |  FROM all_docs WHERE length(trim(text)) > 0)
             |SELECT a.doc_id AS contained_id, b.doc_id AS container_id
             |FROM norm a JOIN norm b ON a.doc_id <> b.doc_id
             |WHERE position((' ' || a.ntext || ' ')
             |               IN (' ' || b.ntext || ' ')) > 0
             |ORDER BY contained_id, container_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q90: cross-document repeated spans — every 16-token run that occurs
    // in >=2 DISTINCT documents, with doc and occurrence counts (the
    // repeated-substring primitive behind suffix-array train-data dedup,
    // Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    // Better": boilerplate/license spans repeat verbatim across docs and
    // should be counted, located, and stripped). Plan: stride-1 16-gram
    // shingles per doc (codegen'd WordShingles — pure per-row compute),
    // md5 at the map side so the ONLY shuffle key is a 32-char digest,
    // never the raw span text; one partial-agg exchange; the >=2-docs
    // filter runs post-aggregate. Docs under 16 tokens are excluded on
    // BOTH sides (WordShingles' whole-text fallback would otherwise emit
    // a <16-token pseudo-span the twin's window generator never produces).
    // The q19 planted corpus guarantees hits: each +10000 suffix twin
    // shares all but one of its original's 16-gram windows.
    QueryDef("q90_repeated_spans",
      (s, dir) => {
        val L = 16
        val all = plantedNearDups(s, dir, 7)
          .filter(Text.tokenCount(col("text")) >= L)
        // Generators can't nest inside expressions: explode in its own
        // projection, then hash the exploded column.
        val spans = all
          .select(col("doc_id"),
            explode(Text.wordShingles(col("text"), L)).as("span"))
          .select(col("doc_id"), md5(col("span")).as("span_md5"))
        spans.groupBy(col("span_md5"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_occ"))
          .filter(col("n_docs") >= 2)
          .orderBy(col("span_md5"))
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 10000, regexp_replace(text, '^\S+\s+', '')
             |  FROM documents WHERE doc_id % 7 = 0),
             |d AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    x -> x <> '') AS toks
             |  FROM all_docs),
             |ok AS (
             |  SELECT doc_id, toks, len(toks) AS n FROM d
             |  WHERE len(toks) >= 16),
             |w AS (
             |  SELECT doc_id, md5(array_to_string(
             |      list_slice(toks, i + 1, i + 16), ' ')) AS span_md5
             |  FROM (SELECT doc_id, toks,
             |          unnest(range(0, n - 15)) AS i
             |        FROM ok))
             |SELECT span_md5, count(DISTINCT doc_id) AS n_docs,
             |  count(*) AS n_occ
             |FROM w GROUP BY span_md5 HAVING count(DISTINCT doc_id) >= 2
             |ORDER BY span_md5""".stripMargin)),

    // ---------------------------------------------------------------------
    // q91: hybrid retrieval via reciprocal-rank fusion (Cormack et al.
    // 2009, c=60) — BM25 (q88's ranker) fused with a plain TF-IDF ranker
    // over the SAME candidate set and query set (retrievalQueries; both
    // scorers share Retrieval.docTermFreq's one-scan broadcast-pruned
    // shape). Ranks are integers, so 1/(60+ra) + 1/(60+rb) is a
    // commutative-exact two-term double sum — portable across engines
    // before the round-6 canon. The fused top-5 per query is graded with
    // both source ranks visible, so a regression in EITHER ranker (or in
    // the fusion) moves the hash.
    QueryDef("q91_rank_fusion",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val q = retrievalQueries(s)
        // one token-stream scan + one stats scan feed BOTH rankers: dtf
        // and stats are single definitions shared by the *Of scorers, so
        // the identical exchanges/subqueries dedupe at runtime
        // (ReusedExchange; a persist pin benched ~0.3 s slower in r7)
        val R = graft.operators.Retrieval
        val dtf = R.docTermFreq(d, "doc_id", "text", q)
        val stats = R.corpusStats(d, "text")
        val bm = R.bm25ScoresOf(dtf, stats, q)
        val ti = R.tfidfScoresOf(dtf, stats, q)
        val fused = R.rrfFuse(bm, ti, c = 60)
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("doc_id").asc)
        fused.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("rank"), col("doc_id"), col("rrf"),
            col("rank_a").cast("long").as("bm25_rank"),
            col("rank_b").cast("long").as("tfidf_rank"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH q(query_id, term) AS (VALUES
             |    (1, 'vector'), (1, 'join'),
             |    (2, 'customer'), (2, 'batch'), (2, 'window'),
             |    (3, 'slow'), (3, 'scan')),
             |toks AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    x -> x <> '') AS tk
             |  FROM documents),
             |words AS (
             |  SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl, unnest(tk) AS term
             |  FROM toks),
             |dtf AS (
             |  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl
             |  FROM words WHERE term IN (SELECT term FROM q)
             |  GROUP BY 1, 2),
             |dfx AS (SELECT term, count(*) AS df FROM dtf GROUP BY 1),
             |st AS (
             |  SELECT count(*) AS n_docs, avg(len(tk)) AS avgdl FROM toks),
             |bm AS (
             |  SELECT query_id, doc_id, round(sum(round(
             |      ln(1 + (n_docs - df + 0.5) / (df + 0.5))
             |      * (tf * 2.2)
             |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 6)), 6)
             |    AS score
             |  FROM dtf JOIN dfx USING (term) JOIN q USING (term)
             |  CROSS JOIN st GROUP BY 1, 2),
             |ti AS (
             |  SELECT query_id, doc_id, round(sum(round(
             |      tf * ln(CAST(n_docs AS DOUBLE) / df), 6)), 6) AS score
             |  FROM dtf JOIN dfx USING (term) JOIN q USING (term)
             |  CROSS JOIN st GROUP BY 1, 2),
             |ra AS (
             |  SELECT query_id, doc_id, row_number() OVER (
             |      PARTITION BY query_id ORDER BY score DESC, doc_id)
             |    AS rank_a
             |  FROM bm),
             |rb AS (
             |  SELECT query_id, doc_id, row_number() OVER (
             |      PARTITION BY query_id ORDER BY score DESC, doc_id)
             |    AS rank_b
             |  FROM ti),
             |fused AS (
             |  SELECT query_id, doc_id, rank_a, rank_b,
             |    round(CAST(1.0 AS DOUBLE) / (60 + rank_a)
             |        + CAST(1.0 AS DOUBLE) / (60 + rank_b), 6) AS rrf
             |  FROM ra JOIN rb USING (query_id, doc_id)),
             |r AS (
             |  SELECT *, row_number() OVER (
             |      PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank
             |  FROM fused)
             |SELECT query_id, rank, doc_id, rrf,
             |  rank_a AS bm25_rank, rank_b AS tfidf_rank
             |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // ---------------------------------------------------------------------
    // q92: product-quantization encoding + reconstruction fidelity — the
    // next ANN compression tier beyond q87's int8 (FAISS IVF-PQ's storage:
    // m=8 one-byte codes per 64-dim vector vs 64 bytes for SQ8, 64x
    // smaller lists than float64). Codebooks are the SAMPLED path
    // (slices of the 16 smallest-id vectors — deterministic and
    // independently restatable, the coarseCentroids stance; k-means
    // refinement exists behind pqTrain(trainIters>0) and is spec'd).
    // Graded at full strength: the code ASSIGNMENT is exact-match (both
    // engines must pick identical argmin-L2 codes for every doc — keys
    // rounded to 6 before the argmin, ties to the smallest code), and the
    // reconstruction cosine proves decode + the disjoint-subspace norm
    // identity. Grading the whole corpus (500 rows/SF) keeps every code
    // path load-bearing.
    QueryDef("q92_pq_codes",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), Vec.asDouble(col("embedding")).as("vec"))
        val model = Similarity.pqTrain(e, "vec_id", "vec", m = 8, k = 16)
        val enc = Similarity.pqEncode(e, "vec_id", "vec", model)
        enc.join(e.select(col("vec_id").as("id"), col("vec")), "id")
          .select(col("id").as("vec_id"),
            concat_ws(",", col("codes").cast("array<string>")).as("codes"),
            round(Vec.cosineFromParts(
              Similarity.pqReconDot(col("vec"), col("codes"), model),
              Vec.norm(col("vec")), col("rnorm")), 6).as("recon_cosine"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |cbsrc AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
             |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
             |cb AS (
             |  SELECT m, code, cv, list_inner_product(cv, cv) AS c2
             |  FROM (SELECT ms.m, code, v[ms.m*8+1 : ms.m*8+8] AS cv
             |        FROM cbsrc CROSS JOIN
             |          (SELECT unnest(range(0, 8)) AS m) ms)),
             |keys AS (
             |  SELECT d.vec_id, cb.m, cb.code, cb.cv,
             |    round(cb.c2
             |      - 2 * list_inner_product(d.v[cb.m*8+1 : cb.m*8+8], cb.cv),
             |      6) AS key
             |  FROM e d CROSS JOIN cb),
             |pick AS (
             |  SELECT vec_id, m, code, cv FROM (
             |    SELECT vec_id, m, code, cv, row_number() OVER (
             |      PARTITION BY vec_id, m ORDER BY key, code) AS rn
             |    FROM keys)
             |  WHERE rn = 1),
             |enc AS (
             |  SELECT vec_id,
             |    array_to_string(list(code ORDER BY m), ',') AS codes,
             |    flatten(list(cv ORDER BY m)) AS rv
             |  FROM pick GROUP BY vec_id)
             |SELECT e.vec_id, codes,
             |  round(list_cosine_similarity(e.v, rv), 6) AS recon_cosine
             |FROM e JOIN enc USING (vec_id)
             |ORDER BY vec_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q93: IVF-PQ ANN with ADC scoring, graded EXACTLY: nprobe = nlist
    // probes every list, so IVF recall is out of the picture and the twin
    // can brute-force the identical PQ space (rank on the ROUND-6 cosine
    // then neighbor id — PQ code collisions make exact ties common, which
    // is WHY pqTopK rounds before ranking; an unrounded rank would be
    // engine-divergent by an ulp). What this grades end to end: coarse
    // routing arithmetic, code assignment, the per-query ADC lookup
    // tables, and the reconstruction-norm denominator. The recall-bearing
    // nprobe < nlist configuration is spec'd against the exhaustive path
    // in OperatorsSpec (planted twins).
    QueryDef("q93_pq_ann",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), Vec.asDouble(col("embedding")).as("vec"))
        val q = e.filter(col("vec_id") % 25 === 0)
          .select(col("vec_id").as("qid"), col("vec").as("qvec"))
        val model = Similarity.pqTrain(e, "vec_id", "vec", m = 8, k = 16)
        Similarity.pqTopK(e, "vec_id", "vec", q, "qid", "qvec",
            k = 3, model, nlist = 8, nprobe = 8)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            col("cosine").as("pq_cosine"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |cbsrc AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
             |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
             |cb AS (
             |  SELECT m, code, cv
             |  FROM (SELECT ms.m, code, v[ms.m*8+1 : ms.m*8+8] AS cv
             |        FROM cbsrc CROSS JOIN
             |          (SELECT unnest(range(0, 8)) AS m) ms)),
             |keys AS (
             |  SELECT d.vec_id, cb.m, cb.code, cb.cv,
             |    round(list_inner_product(cb.cv, cb.cv)
             |      - 2 * list_inner_product(d.v[cb.m*8+1 : cb.m*8+8], cb.cv),
             |      6) AS key
             |  FROM e d CROSS JOIN cb),
             |recon AS (
             |  SELECT vec_id, flatten(list(cv ORDER BY m)) AS rv
             |  FROM (SELECT vec_id, m, code, cv, row_number() OVER (
             |          PARTITION BY vec_id, m ORDER BY key, code) AS rn
             |        FROM keys)
             |  WHERE rn = 1 GROUP BY vec_id),
             |qs AS (SELECT vec_id AS query_id, v AS qv FROM e
             |       WHERE vec_id % 25 = 0),
             |scored AS (
             |  SELECT query_id, r.vec_id AS neighbor_id,
             |    round(list_cosine_similarity(qv, r.rv), 6) AS pq_cosine
             |  FROM qs JOIN recon r ON r.vec_id <> query_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id, pq_cosine, row_number() OVER (
             |      PARTITION BY query_id
             |      ORDER BY pq_cosine DESC, neighbor_id) AS rank
             |  FROM scored)
             |SELECT query_id, rank, neighbor_id, pq_cosine
             |FROM ranked WHERE rank <= 3
             |ORDER BY query_id, rank""".stripMargin)),

    // ---------------------------------------------------------------------
    // q95: RESIDUAL IVF-PQ (FAISS IVFPQ proper) — q93 quantized raw
    // vectors; here the codebooks quantize the residual x - c(x), the
    // distribution that actually sits in an inverted list. The encode
    // FOLDS the residual algebra into per-(list, code) literals (see
    // pqEncode scaladoc) so no residual array is ever materialized, and
    // scoring decomposes as dot(q, c_list) + residual ADC. Same exact
    // grading stance as q93: nprobe = nlist removes IVF recall from the
    // contract, the twin computes assignments/residuals/codes/
    // reconstructions from scratch (list arithmetic in SQL) and must land
    // the identical round-6 ranking. Coarse set = 8 smallest-id vectors
    // dense-reindexed; codebook sample = the NEXT 16 ids (the centroid
    // rows' own residuals are identically zero and would waste half the
    // codebook).
    QueryDef("q95_pq_residual",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), Vec.asDouble(col("embedding")).as("vec"))
        val q = e.filter(col("vec_id") % 25 === 0)
          .select(col("vec_id").as("qid"), col("vec").as("qvec"))
        val model = Similarity.pqTrainResidual(e, "vec_id", "vec",
          m = 8, k = 16, nlist = 8)
        Similarity.pqTopK(e, "vec_id", "vec", q, "qid", "qvec",
            k = 3, model, nlist = 8, nprobe = 8)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            col("cosine").as("pq_cosine"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |cc AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx,
             |    v AS cv
             |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
             |asg AS (
             |  SELECT vec_id, v, cidx, cv FROM (
             |    SELECT e.vec_id, e.v, cc.cidx, cc.cv, row_number() OVER (
             |      PARTITION BY e.vec_id
             |      ORDER BY list_cosine_similarity(e.v, cc.cv) DESC, cc.cidx)
             |      AS rn
             |    FROM e CROSS JOIN cc) WHERE rn = 1),
             |res AS (
             |  SELECT vec_id, cidx, cv,
             |    list_transform(range(64), i -> v[i+1] - cv[i+1]) AS r
             |  FROM asg),
             |cbsrc AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, r
             |  FROM (SELECT vec_id, r FROM res
             |        ORDER BY vec_id LIMIT 16 OFFSET 8)),
             |cb AS (
             |  SELECT ms.m, code, r[ms.m*8+1 : ms.m*8+8] AS cbv
             |  FROM cbsrc CROSS JOIN (SELECT unnest(range(0, 8)) AS m) ms),
             |keys AS (
             |  SELECT d.vec_id, cb.m, cb.code, cb.cbv,
             |    round(list_inner_product(cb.cbv, cb.cbv)
             |      - 2 * list_inner_product(d.r[cb.m*8+1 : cb.m*8+8], cb.cbv),
             |      6) AS key
             |  FROM res d CROSS JOIN cb),
             |pick AS (
             |  SELECT vec_id, m, code, cbv FROM (
             |    SELECT vec_id, m, code, cbv, row_number() OVER (
             |      PARTITION BY vec_id, m ORDER BY key, code) AS rn
             |    FROM keys)
             |  WHERE rn = 1),
             |recon AS (
             |  SELECT p.vec_id,
             |    list_transform(range(64), i -> r.cv[i+1] + p.rh[i+1])
             |      AS xhat
             |  FROM (SELECT vec_id, flatten(list(cbv ORDER BY m)) AS rh
             |        FROM pick GROUP BY vec_id) p
             |  JOIN res r USING (vec_id)),
             |qs AS (SELECT vec_id AS query_id, v AS qv FROM e
             |       WHERE vec_id % 25 = 0),
             |scored AS (
             |  SELECT query_id, rc.vec_id AS neighbor_id,
             |    round(list_cosine_similarity(qv, rc.xhat), 6) AS pq_cosine
             |  FROM qs JOIN recon rc ON rc.vec_id <> query_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id, pq_cosine, row_number() OVER (
             |      PARTITION BY query_id
             |      ORDER BY pq_cosine DESC, neighbor_id) AS rank
             |  FROM scored)
             |SELECT query_id, rank, neighbor_id, pq_cosine
             |FROM ranked WHERE rank <= 3
             |ORDER BY query_id, rank""".stripMargin)),

    // ---------------------------------------------------------------------
    // q94: k-means CONVERGENCE stop — trainLloyd with an objective-delta
    // rule (stop when the round-4 mean best-cosine improves by less than
    // epsilon), graded end to end: the twin restates three unrolled Lloyd
    // iterations (the q77 structure plus the seed-assignment objective),
    // derives the SAME deltas and the SAME stop point, and emits exactly
    // the rows Spark's early exit produced — so failing to stop (5 rows
    // vs 3) or stopping at the wrong iteration moves the hash, not just a
    // value. epsilon = 0.0155 sits strictly between round-4 delta
    // multiples and >= 0.002 away from the observed deltas at both graded
    // SFs (iter-3 delta ~0.0133 < eps < iter-2 delta ~0.05), so the rule
    // is ulp-robust. The twin mirrors trainLloyd's two-level objective
    // grouping (per-cluster sums, then sum/sum) to avoid the q77
    // avg-structure seam the round-6 advice flagged.
    QueryDef("q94_kmeans_converged",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), Vec.asDouble(col("embedding")).as("vec"))
        val r = Similarity.trainLloyd(e, "vec_id", "vec", nlist = 8,
          maxIters = 5, epsilon = Some(0.0155))
        val rows = r.objectives.zipWithIndex.map { case (o, i) =>
          val delta = if (i == 0) None
            else Some(BigDecimal(o - r.objectives(i - 1))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          (i + 1, o, delta, r.converged && (i + 1) == r.itersRun)
        }
        rows.toDF("iter", "objective", "delta", "stopped_early")
          .orderBy(col("iter"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |seeds AS (
             |  SELECT row_number() OVER (
             |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
             |      AS cent_id, v
             |  FROM (SELECT vec_id, v FROM e
             |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8)),
             |a0 AS (
             |  SELECT vec_id, e.v AS v, cent_id,
             |    list_cosine_similarity(e.v, s.v) AS sim,
             |    row_number() OVER (PARTITION BY vec_id
             |      ORDER BY list_cosine_similarity(e.v, s.v) DESC, cent_id)
             |      AS rk
             |  FROM e CROSS JOIN seeds s),
             |o1v AS (
             |  SELECT round(sum(s) / sum(n), 4) AS o FROM (
             |    SELECT cent_id, sum(sim) AS s, count(*) AS n
             |    FROM a0 WHERE rk = 1 GROUP BY 1)),
             |comp1 AS (
             |  SELECT cent_id, pos, round(avg(val), 6) AS m
             |  FROM (SELECT cent_id, unnest(v) AS val,
             |          generate_subscripts(v, 1) AS pos
             |        FROM a0 WHERE rk = 1)
             |  GROUP BY cent_id, pos),
             |cents1 AS (
             |  SELECT cent_id, list(m ORDER BY pos) AS cv
             |  FROM comp1 GROUP BY cent_id),
             |a1 AS (
             |  SELECT vec_id, e.v AS v, c.cent_id,
             |    list_cosine_similarity(e.v, c.cv) AS sim,
             |    row_number() OVER (PARTITION BY vec_id
             |      ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cent_id)
             |      AS rk
             |  FROM e CROSS JOIN cents1 c),
             |o2v AS (
             |  SELECT round(sum(s) / sum(n), 4) AS o FROM (
             |    SELECT cent_id, sum(sim) AS s, count(*) AS n
             |    FROM a1 WHERE rk = 1 GROUP BY 1)),
             |comp2 AS (
             |  SELECT cent_id, pos, round(avg(val), 6) AS m
             |  FROM (SELECT cent_id, unnest(v) AS val,
             |          generate_subscripts(v, 1) AS pos
             |        FROM a1 WHERE rk = 1)
             |  GROUP BY cent_id, pos),
             |cents2 AS (
             |  SELECT cent_id, list(m ORDER BY pos) AS cv
             |  FROM comp2 GROUP BY cent_id),
             |a2 AS (
             |  SELECT vec_id, c.cent_id,
             |    list_cosine_similarity(e.v, c.cv) AS sim,
             |    row_number() OVER (PARTITION BY vec_id
             |      ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cent_id)
             |      AS rk
             |  FROM e CROSS JOIN cents2 c),
             |o3v AS (
             |  SELECT round(sum(s) / sum(n), 4) AS o FROM (
             |    SELECT cent_id, sum(sim) AS s, count(*) AS n
             |    FROM a2 WHERE rk = 1 GROUP BY 1)),
             |objs AS (
             |  SELECT 1 AS iter, o AS objective FROM o1v
             |  UNION ALL SELECT 2, o FROM o2v
             |  UNION ALL SELECT 3, o FROM o3v),
             |d AS (
             |  SELECT iter, objective,
             |    round(objective - lag(objective) OVER (ORDER BY iter), 4)
             |      AS delta
             |  FROM objs),
             |sp AS (
             |  SELECT coalesce(min(iter), 3) AS s FROM d
             |  WHERE iter >= 2 AND delta < 0.0155)
             |SELECT iter, objective, delta,
             |  (iter = s AND delta < 0.0155) AS stopped_early
             |FROM d CROSS JOIN sp WHERE iter <= s
             |ORDER BY iter""".stripMargin)),

    // ---------------------------------------------------------------------
    // q96: SemDeDup (Abbas et al. 2023) — embedding-space near-dup removal
    // made tractable by clustering first: k-means (the q77/q94 shared
    // trainCentroids) partitions the corpus, the quadratic pair search runs
    // only WITHIN clusters (n²/nlist, one cent_id shuffle), and the paper's
    // keep policy preserves the member of each similar pair with the LOWER
    // centroid similarity (semantic outliers survive, cluster-core
    // redundancy drops). Graded on the planted corpus (q34/q35's +100000
    // twins at cosine ≈ 0.999; unrelated pairs max ≈ 0.52, so tau = 0.9 is
    // decisive): recall is load-bearing — a twin pair the clustering keeps
    // together MUST be flagged with the right survivor, and the twin
    // recomputes training, assignment, pairs, and domination from scratch.
    QueryDef("q96_semdedup",
      (s, dir) => Dedup.semDedup(plantedVecs(s, dir), "vec_id", "vec",
          nlist = 8, iters = 2, tau = 0.9)
        .orderBy(col("id")),
      Some("""WITH e0 AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |e AS (
             |  SELECT * FROM e0
             |  UNION ALL
             |  SELECT vec_id + 100000, list_transform(v, x -> x + 0.02)
             |  FROM e0 WHERE vec_id % 5 = 0),
             |seeds AS (
             |  SELECT row_number() OVER (
             |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
             |      AS cent_id, v
             |  FROM (SELECT vec_id, v FROM e
             |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8)),
             |assign0 AS (
             |  SELECT vec_id, e.v AS v, cent_id, row_number() OVER (
             |      PARTITION BY vec_id
             |      ORDER BY list_cosine_similarity(e.v, s.v) DESC, cent_id)
             |      AS rk
             |  FROM e CROSS JOIN seeds s),
             |comp1 AS (
             |  SELECT cent_id, pos, round(avg(val), 6) AS m
             |  FROM (SELECT cent_id, unnest(v) AS val,
             |          generate_subscripts(v, 1) AS pos
             |        FROM assign0 WHERE rk = 1)
             |  GROUP BY cent_id, pos),
             |cents1 AS (
             |  SELECT cent_id, list(m ORDER BY pos) AS cv
             |  FROM comp1 GROUP BY cent_id),
             |assign1 AS (
             |  SELECT vec_id, e.v AS v, c.cent_id, row_number() OVER (
             |      PARTITION BY vec_id
             |      ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cent_id)
             |      AS rk
             |  FROM e CROSS JOIN cents1 c),
             |comp2 AS (
             |  SELECT cent_id, pos, round(avg(val), 6) AS m
             |  FROM (SELECT cent_id, unnest(v) AS val,
             |          generate_subscripts(v, 1) AS pos
             |        FROM assign1 WHERE rk = 1)
             |  GROUP BY cent_id, pos),
             |cents2 AS (
             |  SELECT cent_id, list(m ORDER BY pos) AS cv
             |  FROM comp2 GROUP BY cent_id),
             |asg AS (
             |  SELECT vec_id AS id, v, cent_id, c_sim FROM (
             |    SELECT e.vec_id, e.v, c.cent_id,
             |      round(list_cosine_similarity(e.v, c.cv), 6) AS c_sim,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY round(list_cosine_similarity(e.v, c.cv), 6)
             |          DESC, c.cent_id) AS rk
             |    FROM e CROSS JOIN cents2 c)
             |  WHERE rk = 1),
             |pairs AS (
             |  SELECT a.id AS a_id, a.c_sim AS a_csim,
             |         b.id AS b_id, b.c_sim AS b_csim
             |  FROM asg a JOIN asg b
             |    ON a.cent_id = b.cent_id AND a.id <> b.id
             |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.9),
             |agg AS (
             |  SELECT a_id, count(*) AS n_sim,
             |    min(CASE WHEN b_csim < a_csim
             |             OR (b_csim = a_csim AND b_id < a_id)
             |        THEN b_id END) AS dup_of
             |  FROM pairs GROUP BY a_id)
             |SELECT asg.id, cent_id, c_sim,
             |  coalesce(n_sim, 0) AS n_similar, dup_of,
             |  (dup_of IS NOT NULL) AS is_dup
             |FROM asg LEFT JOIN agg ON asg.id = agg.a_id
             |ORDER BY asg.id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q97: binary (1-bit) quantization ANN — sign bits packed into two
    // 32-bit words (16 bytes/vector, the most aggressive compression tier
    // below int8/PQ), Hamming pre-rank via codegen'd bit_count(xor), exact
    // cosine re-rank of the 64 best candidates per query. Graded exactly
    // like q34/q35 on the planted corpus: the shared twin brute-forces the
    // exact top-1 (the +100000 twin at its exact cosine) and the folded
    // flag asserts the binary index surfaced it — a twin differs from its
    // query only in components the +0.02 shift pushed across zero (~0-4
    // sign flips vs ~32 for unrelated pairs), so recall is load-bearing.
    QueryDef("q97_ann_binary",
      (s, dir) => {
        val e = plantedVecs(s, dir)
        val q = e.filter(col("vec_id") % 5 === 0 && col("vec_id") < 100000)
          .select(col("vec_id").as("qid"), col("vec").as("qvec"))
        val ann = Similarity.binaryTopK(e, "vec_id", "vec", q, "qid", "qvec",
          k = 10, candidates = 64)
        gradePlantedTwins(ann, q, e)
      },
      Some(annPlantedOracle)),

    // ---------------------------------------------------------------------
    // q98: CCNet-style LM quality scoring (Wenzek et al. 2020) — a bigram
    // LM with add-alpha smoothing trained on the corpus itself, each doc
    // scored by its mean token-transition log-prob (exp(-score) = its
    // perplexity), worst tail flagged. The model-based complement to q63's
    // rule-based quality gates. Count tables are hash-aggregated and
    // hash-joined (never broadcast — web-scale bigram tables are
    // data-sized); the twin retrains the identical model in SQL.
    QueryDef("q98_lm_score",
      (s, dir) => {
        // planted gibberish (md5-hex token soup) makes the flag
        // load-bearing: unseen-transition docs score ≈ -5 (singleton
        // transitions against this corpus's small vocabulary; lower still
        // at larger V) vs ≥ -3.9 for corpus text, so threshold -4.5 sits
        // in the gap and must flag exactly the planted ids
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val junk = d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat_ws(" ", (0 until 8).map(i =>
              md5((col("doc_id") + lit(i)).cast("string").cast("binary")))
              : _*).as("text"))
        graft.operators.LmScore.lmScore(d.unionByName(junk),
            "doc_id", "text", alpha = 0.5, threshold = -4.5)
          .orderBy(col("id"))
      },
      Some("""WITH pl AS (
             |  SELECT doc_id + 10000 AS id,
             |    concat_ws(' ', md5(CAST(doc_id + 0 AS VARCHAR)),
             |      md5(CAST(doc_id + 1 AS VARCHAR)),
             |      md5(CAST(doc_id + 2 AS VARCHAR)),
             |      md5(CAST(doc_id + 3 AS VARCHAR)),
             |      md5(CAST(doc_id + 4 AS VARCHAR)),
             |      md5(CAST(doc_id + 5 AS VARCHAR)),
             |      md5(CAST(doc_id + 6 AS VARCHAR)),
             |      md5(CAST(doc_id + 7 AS VARCHAR))) AS text
             |  FROM documents WHERE doc_id % 10 = 0),
             |corpus AS (
             |  SELECT doc_id AS id, text FROM documents
             |  UNION ALL SELECT id, text FROM pl),
             |d AS (
             |  SELECT id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM corpus),
             |bg AS (
             |  SELECT id, unnest(toks[1:len(toks)-1]) AS u,
             |         unnest(toks[2:len(toks)]) AS v
             |  FROM d WHERE len(toks) >= 2),
             |bgc AS (SELECT u, v, count(*) AS c_uv FROM bg GROUP BY u, v),
             |uc AS (
             |  SELECT u, count(*) AS c_u
             |  FROM (SELECT unnest(toks) AS u FROM d) GROUP BY u),
             |vv AS (SELECT count(*) AS vsz FROM uc),
             |lp AS (
             |  SELECT id, ln((coalesce(c_uv, 0) + 0.5)
             |    / (coalesce(c_u, 0) + 0.5 * vsz)) AS lp
             |  FROM bg LEFT JOIN bgc USING (u, v) LEFT JOIN uc USING (u)
             |  CROSS JOIN vv),
             |sc AS (
             |  SELECT id, count(*) AS n_bigrams, round(avg(lp), 4) AS lm_score
             |  FROM lp GROUP BY id)
             |SELECT d.id, coalesce(n_bigrams, 0) AS n_bigrams, lm_score,
             |  coalesce(lm_score < -4.5, false) AS low_quality
             |FROM d LEFT JOIN sc USING (id)
             |ORDER BY d.id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q99: distributed BPE tokenizer training (Sennrich et al. 2016) — 3
    // merge rounds learned from the documents corpus, graded on the merge
    // table AND the resulting top-25 symbol vocabulary. The twin restates
    // the identical algorithm unrolled in SQL (same symbolized-string
    // representation, same greedy left-to-right replace, same
    // (weight desc, pair asc) argmax), so a wrong pair count, wrong
    // tie-break, or non-greedy merge application moves the hash.
    QueryDef("q99_bpe_train",
      (s, dir) => {
        import s.implicits._
        val r = graft.operators.BpeTrain.train(
          t(s, dir, "documents"), "text", numMerges = 3)
        val m = r.merges.map(mg => (mg.iter, "merge", mg.left, mg.right,
            mg.weight)).toDF("ord", "kind", "sym_a", "sym_b", "freq")
        val vw = Window.orderBy(col("freq").desc, col("sym").asc)
        val v = r.vocab.withColumn("rk", row_number().over(vw))
          .filter(col("rk") <= 25)
          .select((col("rk") + 100).as("ord"), lit("vocab").as("kind"),
            col("sym").as("sym_a"), lit("").as("sym_b"), col("freq"))
        m.unionByName(v).orderBy(col("ord"))
      },
      Some("""WITH w AS (
             |  SELECT word, count(*) AS cnt FROM (
             |    SELECT unnest(list_filter(
             |      string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '')) AS word
             |    FROM documents)
             |  GROUP BY word),
             |s0 AS (
             |  SELECT regexp_replace(word, '(.)', ' \1 ', 'g') AS s, cnt
             |  FROM w),
             |p1 AS (
             |  SELECT u, v, CAST(sum(cnt) AS BIGINT) AS wt FROM (
             |    SELECT unnest(toks[1:len(toks)-1]) AS u,
             |           unnest(toks[2:len(toks)]) AS v, cnt
             |    FROM (SELECT string_split(trim(s), '  ') AS toks, cnt
             |          FROM s0)
             |    WHERE len(toks) >= 2)
             |  GROUP BY u, v),
             |m1 AS (SELECT u, v, wt FROM p1 ORDER BY wt DESC, u, v LIMIT 1),
             |s1 AS (
             |  SELECT replace(s, ' ' || u || '  ' || v || ' ',
             |    ' ' || u || v || ' ') AS s, cnt
             |  FROM s0 CROSS JOIN m1),
             |p2 AS (
             |  SELECT u, v, CAST(sum(cnt) AS BIGINT) AS wt FROM (
             |    SELECT unnest(toks[1:len(toks)-1]) AS u,
             |           unnest(toks[2:len(toks)]) AS v, cnt
             |    FROM (SELECT string_split(trim(s), '  ') AS toks, cnt
             |          FROM s1)
             |    WHERE len(toks) >= 2)
             |  GROUP BY u, v),
             |m2 AS (SELECT u, v, wt FROM p2 ORDER BY wt DESC, u, v LIMIT 1),
             |s2 AS (
             |  SELECT replace(s, ' ' || u || '  ' || v || ' ',
             |    ' ' || u || v || ' ') AS s, cnt
             |  FROM s1 CROSS JOIN m2),
             |p3 AS (
             |  SELECT u, v, CAST(sum(cnt) AS BIGINT) AS wt FROM (
             |    SELECT unnest(toks[1:len(toks)-1]) AS u,
             |           unnest(toks[2:len(toks)]) AS v, cnt
             |    FROM (SELECT string_split(trim(s), '  ') AS toks, cnt
             |          FROM s2)
             |    WHERE len(toks) >= 2)
             |  GROUP BY u, v),
             |m3 AS (SELECT u, v, wt FROM p3 ORDER BY wt DESC, u, v LIMIT 1),
             |s3 AS (
             |  SELECT replace(s, ' ' || u || '  ' || v || ' ',
             |    ' ' || u || v || ' ') AS s, cnt
             |  FROM s2 CROSS JOIN m3),
             |vocab AS (
             |  SELECT sym, CAST(sum(cnt) AS BIGINT) AS freq FROM (
             |    SELECT unnest(string_split(trim(s), '  ')) AS sym, cnt
             |    FROM s3)
             |  GROUP BY sym),
             |vtop AS (
             |  SELECT sym, freq,
             |    row_number() OVER (ORDER BY freq DESC, sym) AS rk
             |  FROM vocab QUALIFY rk <= 25)
             |SELECT * FROM (
             |  SELECT 1 AS ord, 'merge' AS kind, u AS sym_a, v AS sym_b,
             |    wt AS freq FROM m1
             |  UNION ALL SELECT 2, 'merge', u, v, wt FROM m2
             |  UNION ALL SELECT 3, 'merge', u, v, wt FROM m3
             |  UNION ALL SELECT rk + 100, 'vocab', sym, '', freq FROM vtop)
             |ORDER BY ord""".stripMargin)),

    // ---------------------------------------------------------------------
    // q100: incremental LSH dedup — the ingest path: a NEW batch (q19's
    // perturbed docs, ids +10000) checked against the already-indexed
    // corpus plus itself, with zero corpus-corpus candidates regenerated.
    // Same fixed-seed signature family and operating point as q20
    // (r=4 b=16, planted pairs at j >= 0.8, per-pair recall ~0.9998), exact
    // rescoring, so the twin holds the probabilistic stage to the exact
    // batch-touching closure: q19's inverted-index oracle restricted to
    // pairs with a batch-side member (id_b >= 10000). A recall miss drops
    // a row; a corpus-corpus leak adds one — both move the hash.
    QueryDef("q100_incremental_lsh",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val batch = d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
        Dedup.incrementalLshPairs(d, batch, "doc_id", "text",
            shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.7)
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(jaccardOracle.replace(
        "WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7",
        "WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7\n" +
          "  AND id_b >= 10000"))),

    // ---------------------------------------------------------------------
    // q101: BPE encoding (the q99 tokenizer APPLIED) — per-document token
    // counts under the learned 3-merge vocabulary, via tokenization-by-
    // lookup: the merge chain runs once per DISTINCT word, documents
    // resolve tokens with a hash join on the word table. The twin re-learns
    // the identical merges (q99's unrolled rounds, word column carried) and
    // re-encodes from scratch, so a drifting merge table, a per-occurrence
    // re-merge bug, or a wrong join all move per-doc counts.
    QueryDef("q101_bpe_encode",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val r = graft.operators.BpeTrain.train(d, "text", numMerges = 3)
        graft.operators.BpeTrain.tokenCounts(d, "doc_id", "text", r.merges)
          .orderBy(col("id"))
      },
      Some(s"""$bpeWmapCtes
             |SELECT id, count(*) AS n_words,
             |  CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens
             |FROM tok JOIN wmap USING (word)
             |GROUP BY id ORDER BY id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q102: sequence packing — documents concatenated in a deterministic
    // md5-shuffled order and cut into fixed 512-token training windows
    // (packed pretraining: docs span cuts, attention masking owns the
    // seam). Per-bin stats grade the whole layout: doc counts, started
    // tokens, and boundary crossers per window. The cumsum is the
    // distributed prefix sum (Budget.cumulativeSum — no global window), so
    // the layout computes with one range exchange at any corpus size.
    QueryDef("q102_pack_sequences",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens"))
        val packed = graft.operators.Budget.packSequences(d,
          Seq(md5(col("doc_id").cast("string")), col("doc_id")),
          col("n_tokens"), ctxLen = 512)
        packed.groupBy(col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_started_tokens"),
            sum(when(col("crosses_boundary"), 1L).otherwise(0L))
              .as("n_crossers"))
          .orderBy(col("bin"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, CAST(len(list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |o AS (
             |  SELECT doc_id, n_tokens, sum(n_tokens) OVER (
             |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM d),
             |b AS (
             |  SELECT doc_id, n_tokens,
             |    CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS bin,
             |    (n_tokens > 0 AND floor((cum - 1) / 512.0)
             |      > floor((cum - n_tokens) / 512.0)) AS crosses
             |  FROM o)
             |SELECT bin, count(*) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS n_started_tokens,
             |  CAST(sum(CASE WHEN crosses THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_crossers
             |FROM b GROUP BY bin ORDER BY bin""".stripMargin)),

    // ---------------------------------------------------------------------
    // q103: PageRank (Page et al. 1999) — the crawl-corpus link-quality
    // signal, run on the undirected customer<->supplier order graph (both
    // directions unioned, so no dangling mass). Two unrolled power
    // iterations; per-iteration round-9 makes the vector engine-portable
    // (the q77 centroid stance). The twin recomputes edges, degrees, and
    // both iterations from scratch; node identity is LONG-encoded
    // (2*custkey / 2*suppkey+1) so the key spaces cannot collide and the
    // |edges|-proportional iteration shuffles move 8-byte keys, not
    // strings — the registry's honest graph heavyweight (~1.2M edges at
    // sf0.1), priced at what distributed PageRank costs per iteration.
    QueryDef("q103_pagerank",
      (s, dir) => {
        val e0 = t(s, dir, "orders")
          .join(t(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).cast("long").as("c"),
            (col("l_suppkey") * 2 + 1).cast("long").as("sn"))
          .distinct()
        val edges = e0.select(col("c").as("src"), col("sn").as("dst"))
          .unionByName(e0.select(col("sn").as("src"), col("c").as("dst")))
        graft.operators.Graphs.pageRank(edges, iters = 2)
          .orderBy(col("node"))
      },
      Some("""WITH e0 AS (
             |  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS c,
             |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS sn
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |e AS (
             |  SELECT c AS src, sn AS dst FROM e0
             |  UNION ALL SELECT sn, c FROM e0),
             |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
             |nn AS (SELECT count(*) AS cnt FROM n),
             |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
             |pr0 AS (SELECT node, 1.0 / cnt AS pr FROM n CROSS JOIN nn),
             |c1 AS (
             |  SELECT dst AS node, sum(pr / deg) AS m
             |  FROM e JOIN pr0 ON pr0.node = e.src JOIN deg USING (src)
             |  GROUP BY dst),
             |pr1 AS (
             |  SELECT n.node,
             |    round((1.0 - 0.85) / cnt + 0.85 * coalesce(m, 0), 9) AS pr
             |  FROM n LEFT JOIN c1 USING (node) CROSS JOIN nn),
             |c2 AS (
             |  SELECT dst AS node, sum(pr / deg) AS m
             |  FROM e JOIN pr1 ON pr1.node = e.src JOIN deg USING (src)
             |  GROUP BY dst),
             |pr2 AS (
             |  SELECT n.node,
             |    round((1.0 - 0.85) / cnt + 0.85 * coalesce(m, 0), 9) AS pr
             |  FROM n LEFT JOIN c2 USING (node) CROSS JOIN nn)
             |SELECT node, pr FROM pr2 ORDER BY node""".stripMargin)),

    // ---------------------------------------------------------------------
    // q104: PCA power iteration (covariance-free) — the dominant principal
    // direction of the embedding corpus via two w = Σ x·(x·v) passes (one
    // scalar dot + the native VecSum aggregate per scan; no d×d matrix),
    // graded on every vector's 1-d projection. Sign-fixed (first
    // |component| > 1e-9 positive) and round-6 per iterate so the
    // direction is engine-portable; the twin unrolls both iterations,
    // normalization, and the sign rule from scratch in SQL.
    QueryDef("q104_pca_power",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), Vec.asDouble(col("embedding")).as("vec"))
        val v = graft.operators.Similarity.powerIteration(e, "vec", 2)
        val vLit = array(v.map(lit): _*)
        e.select(col("vec_id"),
            round(Vec.dot(col("vec"), vLit), 6).as("proj"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH x AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |d AS (SELECT len(v) AS dim FROM x LIMIT 1),
             |v0 AS (
             |  SELECT list_transform(range(1, dim + 1),
             |    i -> round(1.0 / sqrt(dim), 6)) AS v
             |  FROM d),
             |s1 AS (
             |  SELECT x.v AS xv, list_inner_product(x.v, v0.v) AS s
             |  FROM x CROSS JOIN v0),
             |w1c AS (
             |  SELECT pos, sum(val * s) AS w FROM (
             |    SELECT s, unnest(xv) AS val,
             |      generate_subscripts(xv, 1) AS pos FROM s1)
             |  GROUP BY pos),
             |w1 AS (SELECT list(w ORDER BY pos) AS w FROM w1c),
             |n1 AS (
             |  SELECT sqrt(list_sum(list_transform(w, y -> y * y))) AS nrm,
             |    coalesce((SELECT CASE WHEN y < 0 THEN -1.0 ELSE 1.0 END
             |      FROM (SELECT unnest(w) AS y,
             |              generate_subscripts(w, 1) AS p FROM w1)
             |      WHERE abs(y) > 1e-9 ORDER BY p LIMIT 1), 1.0) AS sgn
             |  FROM w1),
             |v1 AS (
             |  SELECT list_transform(w, y -> round(y * sgn / nrm, 6)) AS v
             |  FROM w1 CROSS JOIN n1),
             |s2 AS (
             |  SELECT x.v AS xv, list_inner_product(x.v, v1.v) AS s
             |  FROM x CROSS JOIN v1),
             |w2c AS (
             |  SELECT pos, sum(val * s) AS w FROM (
             |    SELECT s, unnest(xv) AS val,
             |      generate_subscripts(xv, 1) AS pos FROM s2)
             |  GROUP BY pos),
             |w2 AS (SELECT list(w ORDER BY pos) AS w FROM w2c),
             |n2 AS (
             |  SELECT sqrt(list_sum(list_transform(w, y -> y * y))) AS nrm,
             |    coalesce((SELECT CASE WHEN y < 0 THEN -1.0 ELSE 1.0 END
             |      FROM (SELECT unnest(w) AS y,
             |              generate_subscripts(w, 1) AS p FROM w2)
             |      WHERE abs(y) > 1e-9 ORDER BY p LIMIT 1), 1.0) AS sgn
             |  FROM w2),
             |v2 AS (
             |  SELECT list_transform(w, y -> round(y * sgn / nrm, 6)) AS v
             |  FROM w2 CROSS JOIN n2)
             |SELECT vec_id, round(list_inner_product(x.v, v2.v), 6) AS proj
             |FROM x CROSS JOIN v2 ORDER BY vec_id""".stripMargin)),

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
    // q106: DSIR importance resampling (Xie et al. 2023) — hashed-bigram
    // importance weights against the corpus's own English subset as the
    // target distribution, then Gumbel-top-100 resampling (the paper's
    // without-replacement sampler) on the portable md5 uniform. The twin
    // re-fits both multinomials, the per-bucket log-ratios, the per-doc
    // weight sums, the Gumbel draws, and the top-k cut from scratch, so a
    // wrong hash bucket, smoothing term, or selection boundary moves the
    // hash. Weight sums round to 4 BEFORE the noise add (summation-order
    // canon), draws to 6; the final 2-term sum is IEEE-exact both sides.
    QueryDef("q106_dsir_select",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val w = graft.operators.Dsir.importanceWeights(
          d, "doc_id", "text", col("lang") === "en",
          buckets = 256, alpha = 0.5)
        graft.operators.Dsir.resample(w, k = 100)
          .select(col("id").as("doc_id"), col("n_feats"),
            col("logw"), col("score"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, lang = 'en' AS is_t, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    x -> x <> '') AS toks
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, is_t, array_to_string(
             |      list_slice(toks, i + 1, i + 2), ' ') AS f
             |  FROM (SELECT doc_id, is_t, toks,
             |          unnest(range(0, len(toks) - 1)) AS i
             |        FROM d WHERE len(toks) >= 2)
             |  UNION ALL
             |  SELECT doc_id, is_t, array_to_string(toks, ' ') AS f
             |  FROM d WHERE len(toks) < 2),
             |sh AS (
             |  SELECT doc_id, is_t,
             |    ('0x' || substr(md5(f), 1, 15))::BIGINT % 256 AS b
             |  FROM f),
             |db AS (
             |  SELECT doc_id, is_t, b, count(*) AS c
             |  FROM sh GROUP BY doc_id, is_t, b),
             |bs AS (
             |  SELECT b, sum(c) AS cr,
             |    sum(CASE WHEN is_t THEN c ELSE 0 END) AS ct
             |  FROM db GROUP BY b),
             |tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM bs),
             |lam AS (
             |  SELECT b, ln((ct + 0.5) / (tt + 0.5 * 256))
             |         - ln((cr + 0.5) / (tr + 0.5 * 256)) AS lam
             |  FROM bs CROSS JOIN tot),
             |w AS (
             |  SELECT doc_id, round(sum(c * lam), 4) AS logw,
             |    CAST(sum(c) AS BIGINT) AS n_feats
             |  FROM db JOIN lam USING (b) GROUP BY doc_id),
             |g AS (
             |  SELECT doc_id, n_feats, logw,
             |    round(-ln(-ln(
             |      ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             |          ::BIGINT % 2147483647) + 1) / 2147483648.0)), 6) AS gb
             |  FROM w),
             |sel AS (
             |  SELECT doc_id, n_feats, logw, round(logw + gb, 6) AS score
             |  FROM g ORDER BY score DESC, doc_id LIMIT 100)
             |SELECT doc_id, n_feats, logw, score FROM sel
             |ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q107: k-center greedy coreset selection (Gonzalez 1985 max-min;
    // Sener & Savarese 2018) — 4 deterministic farthest-point rounds over
    // the embedding corpus, graded on EVERY vector's assignment (center
    // rank, center id, squared distance): a wrong argmax in any round
    // reshuffles all downstream assignments and moves the hash. The twin
    // unrolls all four selections and the final nearest-center argmin from
    // scratch in SQL (distances round to 9 before every comparison — the
    // k-means iterate canon; earlier-chosen center keeps ties).
    QueryDef("q107_kcenter_coreset",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), Vec.asDouble(col("embedding")).as("vec"))
        val centers = graft.operators.Similarity.kCenterGreedy(
          e, "vec_id", "vec", k = 4)
        graft.operators.Similarity.kCenterAssign(e, "vec_id", "vec", centers)
          .select(col("id").as("vec_id"), col("center_rank"),
            col("center_id"), round(col("d2"), 6).as("d2"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH x AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |c1 AS (
             |  SELECT vec_id, v FROM x
             |  ORDER BY round(list_inner_product(v, v), 9) DESC, vec_id
             |  LIMIT 1),
             |d1 AS (
             |  SELECT x.vec_id, x.v, round(list_inner_product(x.v, x.v)
             |    - 2 * list_inner_product(x.v, (SELECT v FROM c1))
             |    + list_inner_product((SELECT v FROM c1),
             |                         (SELECT v FROM c1)), 9) AS m
             |  FROM x),
             |c2 AS (SELECT vec_id, v FROM d1 ORDER BY m DESC, vec_id LIMIT 1),
             |d2 AS (
             |  SELECT d1.vec_id, d1.v, least(d1.m,
             |    round(list_inner_product(d1.v, d1.v)
             |      - 2 * list_inner_product(d1.v, (SELECT v FROM c2))
             |      + list_inner_product((SELECT v FROM c2),
             |                           (SELECT v FROM c2)), 9)) AS m
             |  FROM d1),
             |c3 AS (SELECT vec_id, v FROM d2 ORDER BY m DESC, vec_id LIMIT 1),
             |d3 AS (
             |  SELECT d2.vec_id, d2.v, least(d2.m,
             |    round(list_inner_product(d2.v, d2.v)
             |      - 2 * list_inner_product(d2.v, (SELECT v FROM c3))
             |      + list_inner_product((SELECT v FROM c3),
             |                           (SELECT v FROM c3)), 9)) AS m
             |  FROM d2),
             |c4 AS (SELECT vec_id, v FROM d3 ORDER BY m DESC, vec_id LIMIT 1),
             |cents AS (
             |  SELECT 1 AS rk, vec_id AS cid, v FROM c1
             |  UNION ALL SELECT 2, vec_id, v FROM c2
             |  UNION ALL SELECT 3, vec_id, v FROM c3
             |  UNION ALL SELECT 4, vec_id, v FROM c4),
             |scored AS (
             |  SELECT x.vec_id, cents.rk, cents.cid,
             |    round(list_inner_product(x.v, x.v)
             |      - 2 * list_inner_product(x.v, cents.v)
             |      + list_inner_product(cents.v, cents.v), 9) AS d2v,
             |    row_number() OVER (PARTITION BY x.vec_id
             |      ORDER BY round(list_inner_product(x.v, x.v)
             |        - 2 * list_inner_product(x.v, cents.v)
             |        + list_inner_product(cents.v, cents.v), 9) ASC,
             |        cents.rk ASC) AS rn
             |  FROM x CROSS JOIN cents)
             |SELECT vec_id, rk AS center_rank, cid AS center_id,
             |  round(d2v, 6) AS d2
             |FROM scored WHERE rn = 1 ORDER BY vec_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q108: Bloom-pruned star join — the explicit runtime-row-filter
    // pattern: the urgent-orders key set folds into a 2^16-bit native
    // Bloom sketch ([[graft.expressions.Bloom]]), shipped to the lineitem
    // scan as ONE literal, so non-joining fact rows die before the join
    // (at 100 TB: before the fact exchange). False positives pass the
    // sketch and die in the exact join, so the graded result IS the plain
    // join's — the twin needs no Bloom at all, and any false NEGATIVE
    // (a pruned joining row) shows up as a wrong aggregate.
    QueryDef("q108_bloom_join",
      (s, dir) => {
        val dim = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderdate"))
        val bloom = graft.expressions.Bloom.buildFrom(
          dim, col("o_orderkey"), numBits = 1 << 16, numHashes = 5)
        val pruned = t(s, dir, "lineitem")
          .filter(graft.expressions.Bloom.mightContainCol(
            lit(bloom.toArray), col("l_orderkey"),
            numBits = 1 << 16, numHashes = 5))
        pruned.join(broadcast(dim), col("l_orderkey") === col("o_orderkey"))
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
              2).as("revenue"))
          .orderBy(col("month"))
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
             |  count(*) AS n_items,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |GROUP BY month ORDER BY month""".stripMargin)),

    // ---------------------------------------------------------------------
    // q109: Count-Min sketch point estimates (Cormode & Muthukrishnan
    // 2005) vs exact counts — the top-50 tokens are graded on their exact
    // counts PLUS the sketch's two contracts as flags the twin asserts
    // TRUE (the q34/q35 tolerance-flag pattern): estimates never
    // undercount (hard guarantee), and overcount stays within the
    // (e/w)*N_stream bound (w=1024, d=4 -> eps ~ 0.27% of the stream at
    // 98% per-key confidence). A wrong update, merge, or row hash breaks
    // a flag and moves the hash; the sketch collect is w*d longs,
    // stream-size-independent.
    QueryDef("q109_cms_counts",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(explode(Text.tokens(col("text"))).as("tok"))
        val m = graft.expressions.CountMin.buildFrom(
          toks, col("tok"), w = 1024, d = 4)
        val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val tot = counts.agg(sum(col("cnt")).as("n_stream"))
        val est = graft.expressions.CountMin.estimateCol(
          lit(m.toArray), col("tok"), w = 1024, d = 4)
        counts
          .orderBy(col("cnt").desc, col("tok").asc).limit(50)
          .crossJoin(broadcast(tot))
          .withColumn("est", est)
          .select(col("tok"), col("cnt"),
            (col("est") >= col("cnt")).as("no_undercount"),
            (col("est") <= col("cnt") +
              ceil(lit(math.E / 1024.0) * col("n_stream")))
              .as("within_eps"))
          .orderBy(col("tok"))
      },
      Some("""WITH tok AS (
             |  SELECT unnest(list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '')) AS tok
             |  FROM documents),
             |c AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
             |top AS (SELECT tok, cnt FROM c ORDER BY cnt DESC, tok LIMIT 50)
             |SELECT tok, cnt, TRUE AS no_undercount, TRUE AS within_eps
             |FROM top ORDER BY tok""".stripMargin)),

    // ---------------------------------------------------------------------
    // q110: split assignment + cross-split leakage audit — the train/val/
    // test constructor every eval-honest pipeline needs: docs split 80/10/10
    // by the portable md5 hash (content-stable, partitioning-independent),
    // then the q19 near-dup closure is graded as an audit: each split's doc
    // count plus how many near-dup pairs CROSS it into another split (the
    // planted +10000 twins hash independently, so crossings provably
    // exist). A wrong split hash, boundary, or pair set moves the hash.
    // Scale: split is pure expression work on the scan; the audit joins the
    // (tiny) pair set to the split map twice.
    QueryDef("q110_split_leakage",
      (s, dir) => {
        val all = plantedNearDups(s, dir, 7)
        val split = all.select(col("doc_id"),
          when(pmod(Text.md5Long(col("doc_id")), lit(10)) < 8, "train")
            .when(pmod(Text.md5Long(col("doc_id")), lit(10)) === 8, "val")
            .otherwise("test").as("split"))
        val pairs = Dedup.ngramJaccardPairs(all, "doc_id", "text",
            shingleSize = 3, threshold = 0.7)
          .select(col("id_a"), col("id_b"))
        val cross = pairs
          .join(split.select(col("doc_id").as("id_a"),
            col("split").as("split_a")), "id_a")
          .join(split.select(col("doc_id").as("id_b"),
            col("split").as("split_b")), "id_b")
          .filter(col("split_a") =!= col("split_b"))
        val leaks = cross.select(col("split_a").as("split"))
          .unionAll(cross.select(col("split_b").as("split")))
          .groupBy(col("split")).agg(count(lit(1)).as("n_cross_pairs"))
        split.groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
          .join(leaks, Seq("split"), "left")
          .select(col("split"), col("n_docs"),
            coalesce(col("n_cross_pairs"), lit(0L)).as("n_cross_pairs"))
          .orderBy(col("split"))
      },
      Some(s"""WITH all_docs AS (
              |  SELECT doc_id, text FROM documents
              |  UNION ALL
              |  SELECT doc_id + 10000, regexp_replace(text, '^\\S+\\s+', '')
              |  FROM documents WHERE doc_id % 7 = 0),
              |sp AS (
              |  SELECT doc_id,
              |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
              |        1, 15))::BIGINT % 10 < 8 THEN 'train'
              |      WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
              |        1, 15))::BIGINT % 10 = 8 THEN 'val'
              |      ELSE 'test' END AS split
              |  FROM all_docs),
              |pairs AS (SELECT id_a, id_b FROM ($jaccardOracle)),
              |x AS (
              |  SELECT pa.split AS split_a, pb.split AS split_b
              |  FROM pairs
              |  JOIN sp pa ON pa.doc_id = id_a
              |  JOIN sp pb ON pb.doc_id = id_b
              |  WHERE pa.split <> pb.split),
              |l AS (
              |  SELECT split, count(*) AS n_cross_pairs FROM (
              |    SELECT split_a AS split FROM x
              |    UNION ALL SELECT split_b FROM x)
              |  GROUP BY split)
              |SELECT sp.split, count(*) AS n_docs,
              |  coalesce(any_value(l.n_cross_pairs), 0) AS n_cross_pairs
              |FROM sp LEFT JOIN l ON l.split = sp.split
              |GROUP BY sp.split ORDER BY sp.split""".stripMargin)),

    // ---------------------------------------------------------------------
    // q111: n-gram novelty scoring — per-doc fraction of 3-gram shingles
    // that are corpus-UNIQUE (df = 1): the cheap self-information signal
    // data-pruning recipes rank by before paying for embeddings (a doc
    // whose shingles all appear elsewhere is template/boilerplate; the
    // planted +10000 near-dups make the low-novelty tail load-bearing).
    // One shingle explode -> one df agg -> join back on the SAME shingle
    // key -> id agg: two partial-agg shuffles on a stream that only ships
    // 8-byte xxhash64 keys (exactness birthday-bounded, the q19 postings
    // stance; the twin counts raw strings and the gate pins the graded SFs
    // collision-free).
    QueryDef("q111_ngram_novelty",
      (s, dir) => {
        val all = plantedNearDups(s, dir, 7)
        val posts = Dedup.shinglePostings(all, "doc_id", "text", 3)
        // df as a partition-only window, NOT a groupBy + self-join: the
        // postings then explode ONCE and shuffle ONCE (by shingle) — the
        // join form re-ran the tokenize+explode subtree for the probe side
        // (PlanGuardSpec counts the Generate nodes)
        val w = Window.partitionBy(col("shingle"))
        posts.withColumn("df", count(lit(1)).over(w))
          .groupBy(col("id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
          .select(col("id").as("doc_id"), col("n_shingles"), col("n_unique"),
            round(col("n_unique").cast("double") / col("n_shingles"), 6)
              .as("novelty"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 10000, regexp_replace(text, '^\S+\s+', '')
             |  FROM documents WHERE doc_id % 7 = 0),
             |tok AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '') AS toks
             |  FROM all_docs),
             |sh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(toks) >= 3
             |         THEN list_distinct(list_transform(range(len(toks) - 2),
             |                i -> array_to_string(toks[i + 1:i + 3], ' ')))
             |         ELSE [array_to_string(toks, ' ')] END AS shingles
             |  FROM tok),
             |posts AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
             |dfq AS (SELECT shingle, count(*) AS df FROM posts
             |        GROUP BY shingle)
             |SELECT doc_id, count(*) AS n_shingles,
             |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_unique,
             |  round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / count(*), 6) AS novelty
             |FROM posts JOIN dfq USING (shingle)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q112: NB quality classifier (Brown et al. 2020 App. A — train
    // known-good vs junk, keep what scores good). Train: real docs (good)
    // vs planted md5 token soup (junk), 3/4 of the corpus; score: the
    // held-out 1/4 plus soup for those ids. The planted score-soup tokens
    // are DISJOINT from the train-soup tokens (different ids -> different
    // md5), so the junk verdicts ride entirely on the unseen-token
    // smoothing asymmetry (t_pos >> t_neg) — the load-bearing NB property
    // for hash-soup spam. Stray-label train rows (label 'dubious') are
    // planted and must be dropped by the operator's label filter: the twin
    // simply never includes them, so a filter regression moves every
    // hash. Whole model is relational: token-keyed hash agg + one
    // vocab hash join + per-doc agg; priors/totals are 1-row broadcasts.
    QueryDef("q112_nb_quality_classifier",
      (s, dir) => nbPlantScored(s, dir).orderBy(col("id")),
      Some(s"""$nbScoreCtes
             |SELECT id, n_tokens, log_odds,
             |  CASE WHEN log_odds > 0 THEN 'good' ELSE 'junk' END
             |    AS prediction
             |FROM sc ORDER BY id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q123: calibration audit of the q112 classifier (Guo et al. 2017
    // reliability diagram + ECE) — before a score threshold becomes a
    // data-selection knob (the FineWeb-Edu stance), the score must be
    // checked against empirical truth. Shares q112's plant + scoring CTEs
    // verbatim (factored, so the two queries cannot drift); truth = the
    // plant itself (ids >= 10000 are soup). NB log-odds grow with doc
    // length and saturate the sigmoid, so the diagram is read at T=100
    // (Guo et al.'s temperature scaling) to spread the bins. The binning
    // is a <= 10-group hash aggregate; the ECE window runs over the
    // 10-row bin frame.
    QueryDef("q123_calibration",
      (s, dir) => {
        val scored = nbPlantScored(s, dir)
          .withColumn("is_pos", col("id") < 10000)
        Classify.calibration(scored, "log_odds", "is_pos", bins = 10,
            temperature = 100.0)
          .orderBy(col("bin"))
      },
      Some(s"""$nbScoreCtes,
             |cal AS (SELECT id,
             |    round(1.0 / (1.0 + exp(-log_odds / 100.0)), 6) AS p,
             |    CASE WHEN id < 10000 THEN 1.0 ELSE 0.0 END AS y
             |  FROM sc),
             |b AS (SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS bin,
             |    count(*) AS n, round(avg(p), 6) AS mean_conf,
             |    round(avg(y), 6) AS frac_pos
             |  FROM cal GROUP BY 1),
             |g AS (SELECT bin, n, mean_conf, frac_pos,
             |    round(abs(frac_pos - mean_conf), 6) AS abs_gap
             |  FROM b)
             |SELECT bin, n, mean_conf, frac_pos, abs_gap,
             |  round(sum(n * abs_gap) OVER () / sum(n) OVER (), 6) AS ece
             |FROM g ORDER BY bin""".stripMargin)),

    // ---------------------------------------------------------------------
    // q124: hard-negative mining for contrastive training (DPR /
    // ANCE) — per anchor (every 10th vector), the best same-label
    // neighbor (mined positive) and top-3 different-label neighbors
    // (hard negatives) from the 32 nearest candidates. Candidate gen is
    // the exact verifier (anchors broadcast, corpus streams); at index
    // scale the same downstream runs off ivfTopK/pqTopK candidates.
    QueryDef("q124_hard_negatives",
      (s, dir) => {
        val e = t(s, dir, "embeddings").select(col("vec_id"),
          Vec.asDouble(col("embedding")).as("vec"), col("label"))
        val anchors = e.filter(col("vec_id") % 10 === 0)
        Similarity.hardNegatives(e, "vec_id", "vec", "label",
            anchors, "vec_id", "vec", "label", kNeg = 3, kCand = 32)
          .orderBy(col("anchor_id"), col("role"), col("rnk"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
             |  FROM embeddings),
             |q AS (SELECT vec_id AS qid, v AS qv, label AS ql
             |  FROM e WHERE vec_id % 10 = 0),
             |scored AS (
             |  SELECT qid, ql, e.vec_id AS nid, e.label AS nl,
             |    list_cosine_similarity(qv, e.v) AS cos
             |  FROM q JOIN e ON e.vec_id <> qid),
             |cand AS (SELECT *, row_number() OVER (
             |    PARTITION BY qid ORDER BY cos DESC, nid) AS rk
             |  FROM scored),
             |roled AS (SELECT qid, nid, cos,
             |    CASE WHEN nl = ql THEN 'pos' ELSE 'neg' END AS role
             |  FROM cand WHERE rk <= 32),
             |rr AS (SELECT *, row_number() OVER (
             |    PARTITION BY qid, role ORDER BY cos DESC, nid) AS rrk
             |  FROM roled)
             |SELECT qid AS anchor_id, role, CAST(rrk AS BIGINT) AS rnk,
             |  nid AS cand_id, round(cos, 6) AS cosine
             |FROM rr
             |WHERE (role = 'pos' AND rrk = 1) OR (role = 'neg' AND rrk <= 3)
             |ORDER BY anchor_id, role, rnk""".stripMargin)),

    // ---------------------------------------------------------------------
    // q125: KMV-sketch overlap audit (Beyer et al. SIGMOD'07) between two
    // corpus slices (bigram vocabularies of even vs %3 docs) — distinct
    // counts, the composed union sketch, and the Jaccard/intersection
    // estimates that HLL cannot provide. ONE gram-keyed shuffle feeds a
    // single 1-row aggregate computing both k=64 sketches (filtered
    // kmv_agg inputs), the exact counts (the verifier — dropped at
    // 100 TB), and their membership flags; every estimate is derived
    // from the sketches with engine-portable arithmetic, so the grading
    // is hash-exact, not tolerance-banded (the sketch itself is
    // deterministic: the k smallest md5-60bit hashes).
    QueryDef("q125_kmv_overlap",
      (s, dir) => {
        import graft.expressions.Kmv
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val grams = d.select(col("doc_id"),
          explode(Text.wordShingles(col("text"), 2)).as("g"))
        val gsets = grams.groupBy(col("g")).agg(
            (max(when(col("doc_id") % 2 === 0, 1).otherwise(0)) === 1)
              .as("a"),
            (max(when(col("doc_id") % 3 === 0, 1).otherwise(0)) === 1)
              .as("b"))
          .filter(col("a") || col("b"))
          .select(col("g"), col("a"), col("b"),
            Text.md5Long(col("g")).as("h"))
        val row = gsets.agg(
          Kmv.column(when(col("a"), col("h")), 64).as("sk_a"),
          Kmv.column(when(col("b"), col("h")), 64).as("sk_b"),
          sum(when(col("a"), 1L).otherwise(0L)).as("d_a_exact"),
          sum(when(col("b"), 1L).otherwise(0L)).as("d_b_exact"),
          sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("d_ab_exact"),
          count(lit(1)).as("union_exact"))
        row.select(
            col("d_a_exact"), col("d_b_exact"), col("union_exact"),
            round(col("d_ab_exact").cast("double") / col("union_exact"), 6)
              .as("jacc_exact"),
            round(Kmv.estimate(col("sk_a"), 64), 2).as("d_a_est"),
            round(Kmv.estimate(col("sk_b"), 64), 2).as("d_b_est"),
            round(Kmv.estimate(
              Kmv.unionSketch(col("sk_a"), col("sk_b"), 64), 64), 2)
              .as("union_est"),
            round(Kmv.jaccard(col("sk_a"), col("sk_b"), 64), 6)
              .as("jacc_est"))
          .withColumn("inter_est",
            round(col("jacc_est") * col("union_est"), 2))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '') AS toks
             |  FROM documents),
             |gr AS (
             |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
             |    THEN list_transform(range(len(toks) - 1),
             |      i -> array_to_string(toks[i + 1:i + 2], ' '))
             |    ELSE [array_to_string(toks, ' ')] END) AS g
             |  FROM tok),
             |gsets AS (
             |  SELECT g, max(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) = 1
             |      AS a,
             |    max(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) = 1 AS b
             |  FROM gr GROUP BY g),
             |hh AS (SELECT g, a, b,
             |    ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
             |  FROM gsets WHERE a OR b),
             |ska AS (SELECT list(h ORDER BY h) AS sk FROM
             |  (SELECT h FROM hh WHERE a ORDER BY h LIMIT 64) t),
             |skb AS (SELECT list(h ORDER BY h) AS sk FROM
             |  (SELECT h FROM hh WHERE b ORDER BY h LIMIT 64) t),
             |ex AS (SELECT
             |    sum(CASE WHEN a THEN 1 ELSE 0 END) AS d_a_exact,
             |    sum(CASE WHEN b THEN 1 ELSE 0 END) AS d_b_exact,
             |    sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS d_ab_exact,
             |    count(*) AS union_exact
             |  FROM hh),
             |comb AS (SELECT ska.sk AS sk_a, skb.sk AS sk_b,
             |    list_sort(list_distinct(list_concat(ska.sk, skb.sk)))[1:64]
             |      AS sku
             |  FROM ska, skb),
             |est AS (SELECT
             |    CASE WHEN len(sk_a) < 64 THEN CAST(len(sk_a) AS DOUBLE)
             |      ELSE 63.0 * 1152921504606846976.0
             |        / CAST(sk_a[64] AS DOUBLE) END AS d_a_raw,
             |    CASE WHEN len(sk_b) < 64 THEN CAST(len(sk_b) AS DOUBLE)
             |      ELSE 63.0 * 1152921504606846976.0
             |        / CAST(sk_b[64] AS DOUBLE) END AS d_b_raw,
             |    CASE WHEN len(sku) < 64 THEN CAST(len(sku) AS DOUBLE)
             |      ELSE 63.0 * 1152921504606846976.0
             |        / CAST(sku[64] AS DOUBLE) END AS u_raw,
             |    CASE WHEN len(sku) = 0 THEN 0.0
             |      ELSE CAST(len(list_intersect(sku,
             |          list_intersect(sk_a, sk_b))) AS DOUBLE) / len(sku)
             |      END AS jacc_raw
             |  FROM comb)
             |SELECT CAST(d_a_exact AS BIGINT) AS d_a_exact,
             |  CAST(d_b_exact AS BIGINT) AS d_b_exact,
             |  CAST(union_exact AS BIGINT) AS union_exact,
             |  round(CAST(d_ab_exact AS DOUBLE) / union_exact, 6)
             |    AS jacc_exact,
             |  round(d_a_raw, 2) AS d_a_est, round(d_b_raw, 2) AS d_b_est,
             |  round(u_raw, 2) AS union_est, round(jacc_raw, 6) AS jacc_est,
             |  round(round(jacc_raw, 6) * round(u_raw, 2), 2) AS inter_est
             |FROM ex, est""".stripMargin)),

    // ---------------------------------------------------------------------
    // q126: deterministic shard assignment + per-epoch dataloader order —
    // the content-addressed "global shuffle" of pretraining runs: shard
    // and order are pure functions of (content, epoch), so a resumed or
    // re-provisioned job reads the identical stream and epochs 0/1 get
    // different permutations with zero stored state. Shard needs no
    // shuffle; both epoch positions ride ONE shard-keyed exchange (two
    // in-partition sorts — the dataloader's own read order, so the sort
    // is the product).
    QueryDef("q126_shard_order",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"))
        graft.operators.Sharding.deterministicShards(
            d, "doc_id", numShards = 8, epochs = Seq(0, 1))
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("shard"), col("pos_e0"))
      },
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             |      ::BIGINT % 8 AS shard,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':0'),
             |      1, 15))::BIGINT AS h0,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':1'),
             |      1, 15))::BIGINT AS h1
             |  FROM documents)
             |SELECT doc_id, shard,
             |  row_number() OVER (PARTITION BY shard ORDER BY h0, doc_id)
             |    AS pos_e0,
             |  row_number() OVER (PARTITION BY shard ORDER BY h1, doc_id)
             |    AS pos_e1
             |FROM h ORDER BY shard, pos_e0""".stripMargin)),

    // ---------------------------------------------------------------------
    // q127: leakage-SAFE train/val/test split — the constructive
    // counterpart of q110's leakage AUDIT: split keyed on the near-dup
    // CLUSTER representative (not the document), so every near-duplicate
    // family lands in one split and cross-split contamination is zero BY
    // CONSTRUCTION (Lee et al. 2022 §6 document the eval inflation when
    // it is not). The graded `crossings` column re-derives that guarantee
    // from the pair frame (a mis-assignment would flip every row's hash).
    // Pair gen + CC are the q44 machinery; the pair frame is pinned
    // across its two consumers (CC and the crossing check).
    QueryDef("q127_leakage_safe_split",
      (s, dir) => {
        val all = plantedNearDups(s, dir, 7)
        val pairs = graft.pipeline.Pins.pin(
          Dedup.ngramJaccardPairs(all, "doc_id", "text",
            shingleSize = 3, threshold = 0.7))
        val cc = Dedup.connectedComponents(
          all.select(col("doc_id").as("id")), pairs)
        val h = pmod(Text.md5Long(col("cluster")), lit(10))
        val withSplit = cc.withColumn("split",
          when(h < 8, "train").when(h === 8, "val").otherwise("test"))
        val sa = withSplit.select(col("id").as("id_a"),
          col("split").as("split_a"))
        val sb = withSplit.select(col("id").as("id_b"),
          col("split").as("split_b"))
        val crossings = pairs.join(sa, "id_a").join(sb, "id_b")
          .agg(coalesce(sum(when(col("split_a") =!= col("split_b"), 1L)
            .otherwise(0L)), lit(0L)).as("crossings"))
        withSplit.crossJoin(broadcast(crossings)).orderBy(col("id"))
      },
      Some("""WITH RECURSIVE
             |all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 10000, regexp_replace(text, '^\S+\s+', '')
             |  FROM documents WHERE doc_id % 7 = 0),
             |tok AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM all_docs),
             |sh AS (SELECT doc_id,
             |    CASE WHEN len(toks) >= 3
             |         THEN list_distinct(list_transform(range(len(toks) - 2),
             |                i -> array_to_string(toks[i + 1:i + 3], ' ')))
             |         ELSE [array_to_string(toks, ' ')] END AS shingles
             |  FROM tok),
             |posts AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
             |sizes AS (SELECT doc_id, count(*) AS n FROM posts GROUP BY doc_id),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
             |  FROM posts a JOIN posts b
             |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |pairs AS (
             |  SELECT id_a, id_b FROM inter
             |  JOIN sizes sa ON sa.doc_id = id_a
             |  JOIN sizes sb ON sb.doc_id = id_b
             |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7),
             |edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION ALL SELECT id_b, id_a FROM pairs),
             |reach(id, r) AS (
             |  SELECT doc_id, doc_id FROM all_docs
             |  UNION
             |  SELECT reach.id, edges.dst FROM reach
             |  JOIN edges ON edges.src = reach.r),
             |cc AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
             |sp AS (SELECT id, cluster,
             |    CASE WHEN ('0x' || substr(md5(CAST(cluster AS VARCHAR)),
             |        1, 15))::BIGINT % 10 < 8 THEN 'train'
             |      WHEN ('0x' || substr(md5(CAST(cluster AS VARCHAR)),
             |        1, 15))::BIGINT % 10 = 8 THEN 'val'
             |      ELSE 'test' END AS split
             |  FROM cc),
             |cr AS (SELECT CAST(coalesce(sum(CASE WHEN x.split <> y.split
             |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS crossings
             |  FROM pairs p
             |  JOIN sp x ON x.id = p.id_a JOIN sp y ON y.id = p.id_b)
             |SELECT id, cluster, split, crossings
             |FROM sp CROSS JOIN cr ORDER BY id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q128: T5 span-corruption construction (Raffel et al. 2020 §3.1.4) —
    // the denoising-objective (input, target) pairs materialized from raw
    // documents. Span starts are content-hash draws (hash(doc:pos) <
    // 0.05 * 2^60 for noise 0.15 / span 3), overlapping spans merge, and
    // the sentinel numbering/joins ride doc-partitioned windows — no
    // state crosses documents. 57646075230342348 = floor(0.05 * 2^60),
    // the same literal the operator computes.
    QueryDef("q128_span_corruption",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        graft.operators.SpanCorrupt.t5SpanCorruption(
            d, "doc_id", "text", noiseDensity = 0.15, spanLen = 3)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '') AS toks
             |  FROM documents),
             |p AS (SELECT doc_id, unnest(list_transform(range(len(toks)),
             |    i -> {'pos': i, 'tok': toks[i + 1]}), recursive := true)
             |  FROM tok),
             |f AS (SELECT doc_id, pos, tok,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
             |      || CAST(pos AS VARCHAR)), 1, 15))::BIGINT
             |      < 57646075230342348 AS start
             |  FROM p),
             |c AS (SELECT *, max(CASE WHEN start THEN 1 ELSE 0 END)
             |    OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 1 AS covered
             |  FROM f),
             |n AS (SELECT *, covered AND coalesce(
             |    NOT lag(covered) OVER (PARTITION BY doc_id ORDER BY pos),
             |    TRUE) AS new_run
             |  FROM c),
             |r AS (SELECT *, sum(CASE WHEN new_run THEN 1 ELSE 0 END)
             |    OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
             |  FROM n),
             |pc AS (SELECT doc_id, pos, covered, new_run,
             |    CASE WHEN NOT covered THEN tok
             |      WHEN new_run THEN '<extra_id_'
             |        || CAST(run_id - 1 AS VARCHAR) || '>'
             |      ELSE NULL END AS in_piece,
             |    CASE WHEN covered AND new_run THEN '<extra_id_'
             |        || CAST(run_id - 1 AS VARCHAR) || '>' || ' ' || tok
             |      WHEN covered THEN tok ELSE NULL END AS tgt_piece
             |  FROM r)
             |SELECT doc_id, count(*) AS n_tokens,
             |  CAST(sum(CASE WHEN new_run THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_spans,
             |  CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_masked,
             |  round(CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END)
             |    AS DOUBLE) / count(*), 6) AS mask_frac,
             |  coalesce(string_agg(in_piece, ' ' ORDER BY pos), '')
             |    AS input_text,
             |  coalesce(string_agg(tgt_piece, ' ' ORDER BY pos), '')
             |    AS target_text
             |FROM pc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q129: Z-order layout audit (Morton interleave — the Delta/Iceberg
    // OPTIMIZE ZORDER technique): events bucketized equi-width on
    // (user_id, value), bit-interleaved to a 16-bit code, grouped into
    // 64 zcode-contiguous "files". Graded per file: row count and the
    // (za, zb) bounding box the file's min-max stats would advertise —
    // bbox_frac is the fraction of the 2-D domain a scan of that file
    // can touch (the file-skipping bound; z-ordered files stay small on
    // BOTH dims, a single-column sort's boxes span one full dim). The
    // bounds are a 1-row broadcast; the code is a codegen'd projection.
    QueryDef("q129_zorder_layout",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"))
        val z = graft.operators.ZOrder.zCode(e, "user_id", "value",
          bits = 8)
        z.withColumn("file_id", shiftright(col("zcode"), 10))
          .groupBy(col("file_id")).agg(
            count(lit(1)).as("n"),
            min(col("za")).as("a_min"), max(col("za")).as("a_max"),
            min(col("zb")).as("b_min"), max(col("zb")).as("b_max"))
          .withColumn("bbox_frac", round(
            ((col("a_max") - col("a_min") + 1)
              * (col("b_max") - col("b_min") + 1)).cast("double")
              / (256.0 * 256.0), 6))
          .orderBy(col("file_id"))
      },
      Some(s"""WITH bounds AS (
             |  SELECT min(user_id) AS amin, max(user_id) AS amax,
             |    min(value) AS bmin, max(value) AS bmax
             |  FROM events),
             |z AS (SELECT event_id,
             |    CASE WHEN amax > amin THEN CAST(floor(
             |      CAST(user_id - amin AS DOUBLE) / (amax - amin) * 255)
             |      AS BIGINT) ELSE 0 END AS za,
             |    CASE WHEN bmax > bmin THEN CAST(floor(
             |      (value - bmin) / (bmax - bmin) * 255)
             |      AS BIGINT) ELSE 0 END AS zb
             |  FROM events CROSS JOIN bounds),
             |zz AS (SELECT za, zb, ${mortonSql("za", "zb", 8)} AS zcode
             |  FROM z),
             |f AS (SELECT za, zb, zcode >> 10 AS file_id FROM zz)
             |SELECT file_id, count(*) AS n,
             |  min(za) AS a_min, max(za) AS a_max,
             |  min(zb) AS b_min, max(zb) AS b_max,
             |  round(CAST((max(za) - min(za) + 1) * (max(zb) - min(zb) + 1)
             |    AS DOUBLE) / (256.0 * 256.0), 6) AS bbox_frac
             |FROM f GROUP BY file_id ORDER BY file_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q130: tokenizer fertility audit per language (Acs 2019; the XLM-R /
    // NLLB tokenizer-equity check): subword tokens per word under the
    // corpus-trained BPE, aggregated by language. High-fertility
    // languages pay more sequence length for the same text — the signal
    // that feeds vocabulary-size and mixing decisions. Shares q101's
    // merge-learning CTEs verbatim (factored); the per-doc frame then
    // rolls up by a broadcast lang join — nothing new shuffles wider
    // than q101 itself.
    QueryDef("q130_tokenizer_fertility",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val r = graft.operators.BpeTrain.train(d, "text", numMerges = 3)
        val tc = graft.operators.BpeTrain.tokenCounts(
          d, "doc_id", "text", r.merges)
        tc.join(d.select(col("doc_id").as("id"), col("lang")), "id")
          .groupBy(col("lang")).agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_words")).as("n_words"),
            sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
          .withColumn("fertility", round(
            col("n_bpe_tokens").cast("double") / col("n_words"), 6))
          .orderBy(col("lang"))
      },
      Some(s"""$bpeWmapCtes,
             |per_doc AS (
             |  SELECT id, count(*) AS n_words,
             |    CAST(sum(n_sym) AS BIGINT) AS n_bpe
             |  FROM tok JOIN wmap USING (word) GROUP BY id)
             |SELECT lang, count(*) AS n_docs,
             |  CAST(sum(n_words) AS BIGINT) AS n_words,
             |  CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
             |  round(CAST(sum(n_bpe) AS DOUBLE) / sum(n_words), 6)
             |    AS fertility
             |FROM per_doc JOIN documents ON documents.doc_id = per_doc.id
             |GROUP BY lang ORDER BY lang""".stripMargin)),

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
    // q132: per-group top-k via the native bounded TopKAgg — the O(k)-state
    // replacement for `row_number() OVER (...) <= k`: the window form
    // shuffles and sorts EVERY row of every group; the aggregate's partial
    // buffers ship at most k entries per map task, so the exchange carries
    // k*partitions rows and nothing sorts more than k elements. Graded
    // bit-equal against the window formulation (the DuckDB twin), ties
    // pinned by smallest id.
    QueryDef("q132_grouped_topk",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.groupBy(col("lang")).agg(
            graft.expressions.TopK.column(
              col("n_chars").cast("double"), col("doc_id"), 5).as("top"))
          .select(col("lang"), posexplode(col("top")).as(Seq("i", "e")))
          .select(col("lang"), (col("i") + 1).cast("long").as("rnk"),
            col("e.id").as("doc_id"),
            col("e.score").cast("long").as("n_chars"))
          .orderBy(col("lang"), col("rnk"))
      },
      Some("""SELECT lang, rnk, doc_id, n_chars FROM (
             |  SELECT lang, doc_id, n_chars, row_number() OVER (
             |    PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rnk
             |  FROM documents)
             |WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin)),

    // ---------------------------------------------------------------------
    // q133: cross-source contamination matrix — pairwise shingle-overlap
    // estimates between every source pair from ONE sketch per source
    // (the q125 KMV machinery applied the way a lake audit actually runs:
    // |sources| k-entry sketches, then all O(|sources|^2) pair scores
    // from the sketches alone — no pair ever rescans the corpus; with
    // HLL this matrix is impossible, intersections don't compose).
    // One token-stream scan, one source-keyed aggregate; the pair join
    // is a broadcast self-join of a |sources|-row frame.
    QueryDef("q133_source_overlap_matrix",
      (s, dir) => {
        import graft.expressions.Kmv
        val d = t(s, dir, "documents").select(col("source"), col("text"))
        val sk = d.select(col("source"),
            explode(Text.wordShingles(col("text"), 3)).as("g"))
          .select(col("source"), Text.md5Long(col("g")).as("h"))
          .groupBy(col("source"))
          .agg(Kmv.column(col("h"), 128).as("sk"))
        sk.as("x").join(broadcast(sk.as("y")),
            col("x.source") < col("y.source"))
          .select(col("x.source").as("src_a"), col("y.source").as("src_b"),
            round(Kmv.jaccard(col("x.sk"), col("y.sk"), 128), 6)
              .as("jacc_est"),
            round(Kmv.estimate(
              Kmv.unionSketch(col("x.sk"), col("y.sk"), 128), 128), 2)
              .as("union_est"))
          .withColumn("inter_est",
            round(col("jacc_est") * col("union_est"), 2))
          .orderBy(col("src_a"), col("src_b"))
      },
      Some("""WITH tok AS (
             |  SELECT source, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '') AS toks
             |  FROM documents),
             |gr AS (
             |  SELECT source, unnest(CASE WHEN len(toks) >= 3
             |    THEN list_transform(range(len(toks) - 2),
             |      i -> array_to_string(toks[i + 1:i + 3], ' '))
             |    ELSE [array_to_string(toks, ' ')] END) AS g
             |  FROM tok),
             |hh AS (SELECT DISTINCT source,
             |    ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
             |  FROM gr),
             |rk AS (SELECT source, h, row_number() OVER (
             |    PARTITION BY source ORDER BY h) AS r
             |  FROM hh),
             |sk AS (SELECT source, list(h ORDER BY h) AS sk
             |  FROM rk WHERE r <= 128 GROUP BY source),
             |pr AS (
             |  SELECT x.source AS src_a, y.source AS src_b,
             |    x.sk AS sa, y.sk AS sb,
             |    list_sort(list_distinct(list_concat(x.sk, y.sk)))[1:128]
             |      AS sku
             |  FROM sk x JOIN sk y ON x.source < y.source),
             |est AS (SELECT src_a, src_b,
             |    CASE WHEN len(sku) = 0 THEN 0.0
             |      ELSE CAST(len(list_intersect(sku,
             |          list_intersect(sa, sb))) AS DOUBLE) / len(sku)
             |      END AS jacc_raw,
             |    CASE WHEN len(sku) < 128 THEN CAST(len(sku) AS DOUBLE)
             |      ELSE 127.0 * 1152921504606846976.0
             |        / CAST(sku[128] AS DOUBLE) END AS u_raw
             |  FROM pr)
             |SELECT src_a, src_b, round(jacc_raw, 6) AS jacc_est,
             |  round(u_raw, 2) AS union_est,
             |  round(round(jacc_raw, 6) * round(u_raw, 2), 2) AS inter_est
             |FROM est ORDER BY src_a, src_b""".stripMargin)),

    // ---------------------------------------------------------------------
    // q113: temperature-mixed corpus sampling rates (mT5/XLM-R alpha=0.3)
    // over the documents corpus, domains = lang, weighted by n_chars,
    // budget 1000 rows apportioned by largest remainder over integer
    // micro-shares (sum(budget_rows) == budget exactly — both engines do
    // the identical integer arithmetic, so no floor-at-a-boundary skew).
    // One |domains|-row aggregate + 1-row broadcasts; the ranking windows
    // run on the domain frame, not the corpus.
    QueryDef("q113_temperature_mix",
      (s, dir) => {
        val d = t(s, dir, "documents")
        Mix.temperatureWeights(d, "lang", col("n_chars"),
            alpha = 0.3, budget = 1000L)
          .orderBy(col("lang"))
      },
      Some("""WITH bd AS (
             |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS n_weight
             |  FROM documents GROUP BY lang),
             |tot AS (SELECT sum(n_weight) AS n_total FROM bd),
             |sh AS (SELECT lang, n_weight,
             |    CAST(n_weight AS DOUBLE) / n_total AS p,
             |    pow(CAST(n_weight AS DOUBLE) / n_total, 0.3) AS p_a
             |  FROM bd CROSS JOIN tot),
             |nz AS (SELECT sum(p_a) AS z FROM sh),
             |mi AS (SELECT lang, n_weight, round(p, 6) AS nat_share,
             |    CAST(round(p_a / z * 1000000, 0) AS BIGINT) AS q6
             |  FROM sh CROSS JOIN nz),
             |fr AS (SELECT *, q6 * 1000 // 1000000 AS fl,
             |    (q6 * 1000) % 1000000 AS rem FROM mi),
             |df AS (SELECT 1000 - sum(fl) AS deficit FROM fr),
             |rk AS (SELECT *,
             |    row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk_up,
             |    row_number() OVER (ORDER BY rem ASC, lang DESC) AS rk_down
             |  FROM fr)
             |SELECT lang, n_weight, nat_share,
             |  round(CAST(q6 AS DOUBLE) / 1000000, 6) AS temp_share,
             |  CAST(fl + CASE WHEN rk_up <= deficit THEN 1 ELSE 0 END
             |          - CASE WHEN rk_down <= -deficit THEN 1 ELSE 0 END
             |    AS BIGINT) AS budget_rows
             |FROM rk CROSS JOIN df ORDER BY lang""".stripMargin)),

    // ---------------------------------------------------------------------
    // q114: Gopher repetition filters (Rae et al. 2021 Table A1) — the
    // within-document repetition family: dup-line fraction + char
    // fraction (row-wise HOFs, ZERO shuffle), top-2-gram and dup-5-gram
    // occurrence-char fractions (one explode per n, (doc,gram)- then
    // doc-keyed partial aggs; no window wider than a document). The
    // corpus has no newlines, so lines = 'fast'-token-split chunks, and
    // planted docs (+10000, doc_id%9) append ' fast alpha beta' x3 —
    // three identical chunks plus repeated 5-gram windows, making every
    // metric's nonzero tail load-bearing.
    QueryDef("q114_gopher_repetition",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val planted = d.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat(col("text"),
              lit(" fast alpha beta fast alpha beta fast alpha beta"))
              .as("text"))
        graft.operators.Repetition.gopherRepetition(
            d.unionByName(planted), "doc_id", "text", lineSep = "fast")
          .orderBy(col("doc_id"))
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 10000,
             |    text || ' fast alpha beta fast alpha beta fast alpha beta'
             |  FROM documents WHERE doc_id % 9 = 0),
             |ln AS (
             |  SELECT doc_id,
             |    list_filter(list_transform(string_split(text, 'fast'),
             |      x -> trim(x)), x -> x <> '') AS lines
             |  FROM all_docs),
             |lm AS (
             |  SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
             |    CASE WHEN len(lines) > 0 THEN
             |      round(CAST(len(lines) - len(list_distinct(lines))
             |        AS DOUBLE) / len(lines), 6) ELSE 0.0 END
             |      AS dup_line_frac,
             |    CASE WHEN coalesce(list_sum(list_transform(lines,
             |        x -> length(x))), 0) > 0 THEN
             |      round(CAST(list_sum(list_transform(lines,
             |          x -> length(x)))
             |        - list_sum(list_transform(list_distinct(lines),
             |          x -> length(x))) AS DOUBLE)
             |        / list_sum(list_transform(lines, x -> length(x))), 6)
             |      ELSE 0.0 END AS dup_line_char_frac
             |  FROM ln),
             |tok AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '') AS toks
             |  FROM all_docs),
             |g2 AS (
             |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
             |    THEN list_transform(range(len(toks) - 1),
             |      i -> array_to_string(toks[i + 1:i + 2], ' '))
             |    ELSE [array_to_string(toks, ' ')] END) AS gram
             |  FROM tok),
             |c2 AS (SELECT doc_id, gram, count(*) AS cnt
             |  FROM g2 GROUP BY doc_id, gram),
             |s2 AS (SELECT doc_id, sum(cnt * length(gram)) AS tot
             |  FROM c2 GROUP BY doc_id),
             |t2 AS (
             |  SELECT doc_id, cnt * length(gram) AS top_chars,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY cnt DESC, gram DESC) AS rn
             |  FROM c2),
             |top2 AS (
             |  SELECT t2.doc_id,
             |    round(CAST(top_chars AS DOUBLE) / tot, 6)
             |      AS top_2gram_char_frac
             |  FROM t2 JOIN s2 ON t2.doc_id = s2.doc_id
             |  WHERE rn = 1 AND tot > 0),
             |g5 AS (
             |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 5
             |    THEN list_transform(range(len(toks) - 4),
             |      i -> array_to_string(toks[i + 1:i + 5], ' '))
             |    ELSE [array_to_string(toks, ' ')] END) AS gram
             |  FROM tok),
             |c5 AS (SELECT doc_id, gram, count(*) AS cnt
             |  FROM g5 GROUP BY doc_id, gram),
             |d5 AS (
             |  SELECT doc_id,
             |    CASE WHEN sum(cnt * length(gram)) > 0 THEN
             |      round(CAST(sum(CASE WHEN cnt > 1
             |          THEN cnt * length(gram) ELSE 0 END) AS DOUBLE)
             |        / sum(cnt * length(gram)), 6) ELSE 0.0 END
             |      AS dup_5gram_char_frac
             |  FROM c5 GROUP BY doc_id)
             |SELECT lm.doc_id, n_lines, dup_line_frac, dup_line_char_frac,
             |  coalesce(top_2gram_char_frac, 0.0) AS top_2gram_char_frac,
             |  coalesce(dup_5gram_char_frac, 0.0) AS dup_5gram_char_frac,
             |  (dup_line_frac > 0.30 OR dup_line_char_frac > 0.20
             |    OR coalesce(top_2gram_char_frac, 0.0) > 0.20
             |    OR coalesce(dup_5gram_char_frac, 0.0) > 0.15) AS flagged
             |FROM lm LEFT JOIN top2 USING (doc_id)
             |LEFT JOIN d5 USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q115: CCNet head/middle/tail perplexity bucketing (Wenzek et al.
    // 2020 §4.3) — the q98 self-trained bigram LM scores partitioned at
    // tercile cutoffs. The cutoffs are a 1-row broadcast computed ONCE
    // (CCNet's own deployment shape: calibrate cutoffs, apply as
    // constants); grading uses exact interpolated percentile, the 100-TB
    // path is the mergeable approx_percentile sketch (same operator,
    // exact=false). Planted md5 soup (q98's plant) pins the tail bucket.
    QueryDef("q115_perplexity_buckets",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val junk = d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat_ws(" ", (0 until 8).map(i =>
              md5((col("doc_id") + lit(i)).cast("string").cast("binary")))
              : _*).as("text"))
        val scored = graft.operators.LmScore.lmScore(
          d.unionByName(junk), "doc_id", "text", alpha = 0.5)
        val cuts = graft.operators.LmScore.tercileCuts(
          scored, "lm_score", exact = true)
        graft.operators.LmScore.perplexityBuckets(scored, cuts)
          .select(col("id"), col("n_bigrams"), col("lm_score"),
            col("ppl_bucket"))
          .orderBy(col("id"))
      },
      Some("""WITH pl AS (
             |  SELECT doc_id + 10000 AS id,
             |    concat_ws(' ', md5(CAST(doc_id + 0 AS VARCHAR)),
             |      md5(CAST(doc_id + 1 AS VARCHAR)),
             |      md5(CAST(doc_id + 2 AS VARCHAR)),
             |      md5(CAST(doc_id + 3 AS VARCHAR)),
             |      md5(CAST(doc_id + 4 AS VARCHAR)),
             |      md5(CAST(doc_id + 5 AS VARCHAR)),
             |      md5(CAST(doc_id + 6 AS VARCHAR)),
             |      md5(CAST(doc_id + 7 AS VARCHAR))) AS text
             |  FROM documents WHERE doc_id % 10 = 0),
             |corpus AS (
             |  SELECT doc_id AS id, text FROM documents
             |  UNION ALL SELECT id, text FROM pl),
             |d AS (
             |  SELECT id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM corpus),
             |bg AS (
             |  SELECT id, unnest(toks[1:len(toks)-1]) AS u,
             |         unnest(toks[2:len(toks)]) AS v
             |  FROM d WHERE len(toks) >= 2),
             |bgc AS (SELECT u, v, count(*) AS c_uv FROM bg GROUP BY u, v),
             |uc AS (
             |  SELECT u, count(*) AS c_u
             |  FROM (SELECT unnest(toks) AS u FROM d) GROUP BY u),
             |vv AS (SELECT count(*) AS vsz FROM uc),
             |lp AS (
             |  SELECT id, ln((coalesce(c_uv, 0) + 0.5)
             |    / (coalesce(c_u, 0) + 0.5 * vsz)) AS lp
             |  FROM bg LEFT JOIN bgc USING (u, v) LEFT JOIN uc USING (u)
             |  CROSS JOIN vv),
             |sc AS (
             |  SELECT id, count(*) AS n_bigrams, round(avg(lp), 4) AS lm_score
             |  FROM lp GROUP BY id),
             |scored AS (
             |  SELECT d.id, coalesce(n_bigrams, 0) AS n_bigrams, lm_score
             |  FROM d LEFT JOIN sc USING (id)),
             |cuts AS (SELECT
             |    round(quantile_cont(lm_score, CAST(1 AS DOUBLE)/3), 6) AS c1,
             |    round(quantile_cont(lm_score, CAST(2 AS DOUBLE)/3), 6) AS c2
             |  FROM scored)
             |SELECT id, n_bigrams, lm_score,
             |  CASE WHEN lm_score IS NULL THEN 'unscored'
             |       WHEN lm_score >= c2 THEN 'head'
             |       WHEN lm_score >= c1 THEN 'middle'
             |       ELSE 'tail' END AS ppl_bucket
             |FROM scored CROSS JOIN cuts ORDER BY id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q116: DoReMi loss-driven domain reweighting (Xie et al. 2023) — one
    // exponentiated-gradient step over per-lang mean LM loss
    // (loss = -q98-style lm_score, the bigram cross-entropy), smoothed
    // with uniform mass. The data-side computation of one DoReMi step:
    // corpus scan -> |domains|-row hash agg -> 1-row broadcasts; pairs
    // with q113 (sizes set rates there, losses set them here).
    QueryDef("q116_doremi_reweight",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val scored = graft.operators.LmScore.lmScore(
          d.select(col("doc_id"), col("text")), "doc_id", "text",
          alpha = 0.5)
        val withDom = scored.join(
          d.select(col("doc_id").as("id"), col("lang")), "id")
        graft.operators.Doremi.domainReweight(withDom, "lang",
            -col("lm_score"), eta = 5.0, smoothing = 0.2)
          .orderBy(col("lang"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id AS id, lang,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM documents),
             |bg AS (
             |  SELECT id, unnest(toks[1:len(toks)-1]) AS u,
             |         unnest(toks[2:len(toks)]) AS v
             |  FROM d WHERE len(toks) >= 2),
             |bgc AS (SELECT u, v, count(*) AS c_uv FROM bg GROUP BY u, v),
             |uc AS (
             |  SELECT u, count(*) AS c_u
             |  FROM (SELECT unnest(toks) AS u FROM d) GROUP BY u),
             |vv AS (SELECT count(*) AS vsz FROM uc),
             |lp AS (
             |  SELECT id, ln((coalesce(c_uv, 0) + 0.5)
             |    / (coalesce(c_u, 0) + 0.5 * vsz)) AS lp
             |  FROM bg LEFT JOIN bgc USING (u, v) LEFT JOIN uc USING (u)
             |  CROSS JOIN vv),
             |sc AS (SELECT id, round(avg(lp), 4) AS lm_score
             |  FROM lp GROUP BY id),
             |wl AS (
             |  SELECT d.lang,
             |    CAST(round(-sc.lm_score * 10000) AS BIGINT) AS li
             |  FROM d LEFT JOIN sc USING (id)),
             |bd AS (
             |  SELECT lang, count(li) AS n_docs,
             |    round(sum(li) / (10000.0 * count(li)), 6) AS mean_loss
             |  FROM wl GROUP BY lang),
             |rf AS (SELECT round(sum(li) / (10000.0 * count(li)), 6)
             |  AS ref_loss FROM wl),
             |ex AS (
             |  SELECT lang, n_docs, mean_loss,
             |    round(greatest(mean_loss - ref_loss, 0.0), 6) AS excess
             |  FROM bd CROSS JOIN rf),
             |ew AS (SELECT *, exp(5.0 * excess) AS w FROM ex),
             |nz AS (SELECT sum(w) AS z, count(*) AS k FROM ew)
             |SELECT lang, n_docs, mean_loss, excess,
             |  round(0.8 * w / z + 0.2 / k, 6) AS weight
             |FROM ew CROSS JOIN nz ORDER BY lang""".stripMargin)),

    // ---------------------------------------------------------------------
    // q117: margin-based bitext mining (Artetxe & Schwenk 2019 — the
    // LASER/CCMatrix aligned-pair recipe): best partner per source vector
    // by RATIO margin cos/(neighborhood mean), which discounts hubs. Side
    // a = every 5th vector; side b = their +0.02 planted twins plus
    // %5==2 distractors — the twin must win every a's mining slot at a
    // margin its distractors can't reach, so both the pairing and the
    // margin arithmetic are load-bearing. Candidate gen is the exact
    // top-k (the ANN index family slots in at scale); the margin stage is
    // top-k-frame joins + per-id partial aggs only.
    QueryDef("q117_bitext_margin",
      (s, dir) => {
        val e = plantedVecs(s, dir)
        val a = e.filter(col("vec_id") % 5 === 0 && col("vec_id") < 100000)
        val b = e.filter(col("vec_id") >= 100000 ||
          col("vec_id") % 5 === 2)
        Similarity.marginMining(a, "vec_id", "vec", b, "vec_id", "vec",
            k = 4)
          .orderBy(col("a_id"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |a AS (SELECT vec_id AS id, v FROM e WHERE vec_id % 5 = 0),
             |b AS (
             |  SELECT vec_id + 100000 AS id,
             |    list_transform(v, x -> x + 0.02) AS v
             |  FROM e WHERE vec_id % 5 = 0
             |  UNION ALL
             |  SELECT vec_id AS id, v FROM e WHERE vec_id % 5 = 2),
             |ab AS (
             |  SELECT a.id AS a_id, b.id AS b_id,
             |    list_cosine_similarity(a.v, b.v) AS cosine,
             |    row_number() OVER (PARTITION BY a.id
             |      ORDER BY list_cosine_similarity(a.v, b.v) DESC,
             |        b.id ASC) AS rn
             |  FROM a, b),
             |ka AS (SELECT a_id, avg(cosine) AS a_avgk
             |  FROM ab WHERE rn <= 4 GROUP BY a_id),
             |ba AS (
             |  SELECT b.id AS b_id, a.id AS a_id,
             |    list_cosine_similarity(b.v, a.v) AS cosine,
             |    row_number() OVER (PARTITION BY b.id
             |      ORDER BY list_cosine_similarity(b.v, a.v) DESC,
             |        a.id ASC) AS rn
             |  FROM b, a),
             |kb AS (SELECT b_id, avg(cosine) AS b_avgk
             |  FROM ba WHERE rn <= 4 GROUP BY b_id),
             |sc AS (
             |  SELECT ab.a_id, ab.b_id, ab.cosine,
             |    round(ab.cosine / ((a_avgk + b_avgk) / 2), 6) AS margin
             |  FROM ab JOIN ka USING (a_id) JOIN kb USING (b_id)
             |  WHERE ab.rn <= 4),
             |best AS (
             |  SELECT *, row_number() OVER (PARTITION BY a_id
             |    ORDER BY margin DESC, b_id ASC) AS brn
             |  FROM sc)
             |SELECT a_id, b_id, round(cosine, 6) AS cosine, margin
             |FROM best WHERE brn = 1 ORDER BY a_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q118: the composed curation pipeline (RefinedWeb/Dolma shape) —
    // raw corpus in, per-document verdicts out: exact-dedup survivor
    // status (one shuffle on the normalized-content key), Gopher
    // repetition flag (q114's operator), CCNet perplexity bucket (q115's
    // operator), and the final kept = not-dup AND not-repetitive AND
    // not-tail. Each constituent is independently graded with plants
    // (q18/q114/q115); what THIS query grades is the composition — three
    // verdict frames all keyed by doc, joined doc-keyed, one pass each.
    // Planted exact copies (doc_id%11, +10000) make is_dup load-bearing.
    QueryDef("q118_curation_pipeline",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val copies = d.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 10000).as("doc_id"), col("text"))
        val all = d.unionByName(copies)
        val w = Window
          .partitionBy(Cleaning.normName(col("text")))
          .orderBy(col("doc_id").asc)
        val dd = all.select(col("doc_id"),
          (row_number().over(w) > 1).as("is_dup"))
        val rp = graft.operators.Repetition.gopherRepetition(
            all, "doc_id", "text", lineSep = "fast")
          .select(col("doc_id"), col("flagged").as("rep_flagged"))
        val scored = graft.operators.LmScore.lmScore(
          all, "doc_id", "text", alpha = 0.5)
        val bk = graft.operators.LmScore.perplexityBuckets(scored,
            graft.operators.LmScore.tercileCuts(scored, "lm_score",
              exact = true))
          .select(col("id").as("doc_id"), col("ppl_bucket"))
        dd.join(rp, "doc_id").join(bk, "doc_id")
          .select(col("doc_id"), col("is_dup"), col("rep_flagged"),
            col("ppl_bucket"),
            (!col("is_dup") && !col("rep_flagged") &&
              col("ppl_bucket") =!= "tail").as("kept"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 10000, text FROM documents
             |  WHERE doc_id % 11 = 0),
             |dd AS (
             |  SELECT doc_id, row_number() OVER (
             |    PARTITION BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
             |    ORDER BY doc_id) > 1 AS is_dup
             |  FROM all_docs),
             |ln AS (
             |  SELECT doc_id,
             |    list_filter(list_transform(string_split(text, 'fast'),
             |      x -> trim(x)), x -> x <> '') AS lines
             |  FROM all_docs),
             |lm AS (
             |  SELECT doc_id,
             |    CASE WHEN len(lines) > 0 THEN
             |      round(CAST(len(lines) - len(list_distinct(lines))
             |        AS DOUBLE) / len(lines), 6) ELSE 0.0 END
             |      AS dup_line_frac,
             |    CASE WHEN coalesce(list_sum(list_transform(lines,
             |        x -> length(x))), 0) > 0 THEN
             |      round(CAST(list_sum(list_transform(lines,
             |          x -> length(x)))
             |        - list_sum(list_transform(list_distinct(lines),
             |          x -> length(x))) AS DOUBLE)
             |        / list_sum(list_transform(lines, x -> length(x))), 6)
             |      ELSE 0.0 END AS dup_line_char_frac
             |  FROM ln),
             |tok AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '') AS toks
             |  FROM all_docs),
             |g2 AS (
             |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
             |    THEN list_transform(range(len(toks) - 1),
             |      i -> array_to_string(toks[i + 1:i + 2], ' '))
             |    ELSE [array_to_string(toks, ' ')] END) AS gram
             |  FROM tok),
             |c2 AS (SELECT doc_id, gram, count(*) AS cnt
             |  FROM g2 GROUP BY doc_id, gram),
             |s2 AS (SELECT doc_id, sum(cnt * length(gram)) AS tot
             |  FROM c2 GROUP BY doc_id),
             |t2 AS (
             |  SELECT doc_id, cnt * length(gram) AS top_chars,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY cnt DESC, gram DESC) AS rn
             |  FROM c2),
             |top2 AS (
             |  SELECT t2.doc_id,
             |    round(CAST(top_chars AS DOUBLE) / tot, 6) AS top2
             |  FROM t2 JOIN s2 ON t2.doc_id = s2.doc_id
             |  WHERE rn = 1 AND tot > 0),
             |g5 AS (
             |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 5
             |    THEN list_transform(range(len(toks) - 4),
             |      i -> array_to_string(toks[i + 1:i + 5], ' '))
             |    ELSE [array_to_string(toks, ' ')] END) AS gram
             |  FROM tok),
             |c5 AS (SELECT doc_id, gram, count(*) AS cnt
             |  FROM g5 GROUP BY doc_id, gram),
             |d5 AS (
             |  SELECT doc_id,
             |    CASE WHEN sum(cnt * length(gram)) > 0 THEN
             |      round(CAST(sum(CASE WHEN cnt > 1
             |          THEN cnt * length(gram) ELSE 0 END) AS DOUBLE)
             |        / sum(cnt * length(gram)), 6) ELSE 0.0 END AS dup5
             |  FROM c5 GROUP BY doc_id),
             |rp AS (
             |  SELECT lm.doc_id,
             |    (dup_line_frac > 0.30 OR dup_line_char_frac > 0.20
             |      OR coalesce(top2, 0.0) > 0.20
             |      OR coalesce(dup5, 0.0) > 0.15) AS rep_flagged
             |  FROM lm LEFT JOIN top2 USING (doc_id)
             |  LEFT JOIN d5 USING (doc_id)),
             |bg AS (
             |  SELECT doc_id AS id, unnest(toks[1:len(toks)-1]) AS u,
             |         unnest(toks[2:len(toks)]) AS v
             |  FROM tok WHERE len(toks) >= 2),
             |bgc AS (SELECT u, v, count(*) AS c_uv FROM bg GROUP BY u, v),
             |uc AS (
             |  SELECT u, count(*) AS c_u
             |  FROM (SELECT unnest(toks) AS u FROM tok) GROUP BY u),
             |vv AS (SELECT count(*) AS vsz FROM uc),
             |lp AS (
             |  SELECT id, ln((coalesce(c_uv, 0) + 0.5)
             |    / (coalesce(c_u, 0) + 0.5 * vsz)) AS lp
             |  FROM bg LEFT JOIN bgc USING (u, v) LEFT JOIN uc USING (u)
             |  CROSS JOIN vv),
             |sc AS (
             |  SELECT id, round(avg(lp), 4) AS lm_score
             |  FROM lp GROUP BY id),
             |scored AS (
             |  SELECT doc_id, lm_score
             |  FROM all_docs LEFT JOIN sc ON all_docs.doc_id = sc.id),
             |cuts AS (SELECT
             |    round(quantile_cont(lm_score, CAST(1 AS DOUBLE)/3), 6) AS c1,
             |    round(quantile_cont(lm_score, CAST(2 AS DOUBLE)/3), 6) AS c2
             |  FROM scored),
             |bk AS (
             |  SELECT doc_id,
             |    CASE WHEN lm_score IS NULL THEN 'unscored'
             |         WHEN lm_score >= c2 THEN 'head'
             |         WHEN lm_score >= c1 THEN 'middle'
             |         ELSE 'tail' END AS ppl_bucket
             |  FROM scored CROSS JOIN cuts)
             |SELECT dd.doc_id, is_dup, rep_flagged, ppl_bucket,
             |  (NOT is_dup AND NOT rep_flagged AND ppl_bucket <> 'tail')
             |    AS kept
             |FROM dd JOIN rp USING (doc_id) JOIN bk USING (doc_id)
             |ORDER BY dd.doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q119: retrieval-quality evaluation — recall@10 and reciprocal rank
    // of the q88 BM25 ranking against boolean-AND relevance (docs
    // containing every query term), the labels-free graded-retrieval
    // ground truth. Ranking, truth, AND the df aggregate all hang off ONE
    // docTermFreq definition, so the token stream is scanned once and the
    // identical exchanges dedupe at runtime (the q88/q91 reuse stance).
    QueryDef("q119_retrieval_eval",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val q = retrievalQueries(s)
        val R = graft.operators.Retrieval
        val dtf = R.docTermFreq(d, "doc_id", "text", q)
        val byDoc = R.bm25ScoresOf(dtf, R.corpusStats(d, "text"), q)
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id").asc)
        val ranked = byDoc
          .withColumn("rank", row_number().over(w).cast("long"))
        R.evalRanking(ranked, R.conjunctiveTruth(dtf, q), k = 10)
          .orderBy(col("query_id"))
      },
      Some("""WITH q(query_id, term) AS (VALUES
             |    (1, 'vector'), (1, 'join'),
             |    (2, 'customer'), (2, 'batch'), (2, 'window'),
             |    (3, 'slow'), (3, 'scan')),
             |toks AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    x -> x <> '') AS tk
             |  FROM documents),
             |words AS (
             |  SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl, unnest(tk) AS term
             |  FROM toks),
             |dtf AS (
             |  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl
             |  FROM words WHERE term IN (SELECT term FROM q)
             |  GROUP BY 1, 2),
             |dfx AS (SELECT term, count(*) AS df FROM dtf GROUP BY 1),
             |st AS (
             |  SELECT count(*) AS n_docs, avg(len(tk)) AS avgdl FROM toks),
             |sc AS (
             |  SELECT q.query_id, dtf.doc_id,
             |    round(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
             |      * (tf * 2.2)
             |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 6) AS ts
             |  FROM dtf JOIN dfx USING (term) JOIN q USING (term)
             |  CROSS JOIN st),
             |agg AS (
             |  SELECT query_id, doc_id, round(sum(ts), 6) AS score,
             |    count(*) AS n_terms_hit
             |  FROM sc GROUP BY 1, 2),
             |r AS (
             |  SELECT query_id, doc_id, row_number() OVER (
             |      PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
             |  FROM agg),
             |qn AS (SELECT query_id, count(DISTINCT term) AS qn
             |  FROM q GROUP BY 1),
             |truth AS (
             |  SELECT query_id, doc_id
             |  FROM (SELECT q.query_id, dtf.doc_id,
             |          count(DISTINCT dtf.term) AS nt
             |        FROM dtf JOIN q USING (term) GROUP BY 1, 2)
             |  JOIN qn USING (query_id) WHERE nt = qn),
             |hits AS (
             |  SELECT r.query_id, count(*) AS hits_at_k,
             |    min(rank) AS first_rank
             |  FROM r JOIN truth USING (query_id, doc_id)
             |  WHERE rank <= 10 GROUP BY 1),
             |nrel AS (SELECT query_id, count(*) AS n_relevant
             |  FROM truth GROUP BY 1)
             |SELECT query_id, n_relevant,
             |  coalesce(hits_at_k, 0) AS hits_at_k,
             |  CASE WHEN n_relevant > 0 THEN
             |    round(CAST(coalesce(hits_at_k, 0) AS DOUBLE) / n_relevant, 6)
             |  ELSE 0.0 END AS recall_at_k,
             |  coalesce(round(1.0 / first_rank, 6), 0.0) AS rr_at_k
             |FROM nrel LEFT JOIN hits USING (query_id)
             |ORDER BY query_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q120: exact phrase search over the positional inverted index — the
    // positions-file algorithm (Manning et al. IR 2008 §2.4.2): postings
    // (doc, pos, term) join the phrase's (term, offset) rows, every hit
    // shifts to its implied start (pos - offset), and a start holding ALL
    // offsets is a match (overlaps counted). ONE posting shuffle however
    // many phrases; no per-phrase text re-scan. The twin restates the
    // identical index join.
    QueryDef("q120_phrase_search",
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents")
        val phrases = Seq((1L, "fast column"), (2L, "the customer"),
          (3L, "group query"), (4L, "join join"))
          .toDF("phrase_id", "phrase")
        graft.operators.Retrieval.phraseSearch(d, "doc_id", "text", phrases)
          .orderBy(col("phrase_id"), col("doc_id"))
      },
      Some("""WITH ph(phrase_id, off, term) AS (VALUES
             |    (1, 0, 'fast'), (1, 1, 'column'),
             |    (2, 0, 'the'), (2, 1, 'customer'),
             |    (3, 0, 'group'), (3, 1, 'query'),
             |    (4, 0, 'join'), (4, 1, 'join')),
             |plen AS (SELECT phrase_id, count(*) AS plen
             |  FROM ph GROUP BY 1),
             |tok AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '') AS toks
             |  FROM documents),
             |posting AS (
             |  SELECT doc_id, unnest(range(len(toks))) AS pos,
             |         unnest(toks) AS term
             |  FROM tok),
             |starts AS (
             |  SELECT ph.phrase_id, posting.doc_id,
             |    pos - off AS start
             |  FROM posting JOIN ph USING (term)
             |  WHERE pos - off >= 0),
             |full_hits AS (
             |  SELECT phrase_id, doc_id, start, count(*) AS nhit
             |  FROM starts GROUP BY 1, 2, 3),
             |matches AS (
             |  SELECT f.phrase_id, doc_id
             |  FROM full_hits f JOIN plen USING (phrase_id)
             |  WHERE nhit = plen)
             |SELECT CAST(phrase_id AS BIGINT) AS phrase_id, doc_id,
             |  count(*) AS n_matches
             |FROM matches GROUP BY 1, 2
             |ORDER BY phrase_id, doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q121: the sampler consuming q113's rates — draw each lang's
    // largest-remainder budget_rows by deterministic md5 order (the
    // engine-portable uniform, q106's Gumbel stance): rates -> an actual
    // sampled corpus, the full mT5 sampling loop. One |domains| broadcast
    // join + one domain-PARTITIONED window; membership is exactly graded
    // (a wrong budget, hash, or tie-break moves rows across the cut).
    QueryDef("q121_temperature_sample",
      (s, dir) => {
        val d = t(s, dir, "documents")
        Mix.temperatureSample(d, "lang", col("n_chars"), "doc_id",
            alpha = 0.3, budget = 300L)
          .select(col("lang"), col("doc_id"))
          .orderBy(col("lang"), col("doc_id"))
      },
      Some("""WITH bd AS (
             |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS n_weight
             |  FROM documents GROUP BY lang),
             |tot AS (SELECT sum(n_weight) AS n_total FROM bd),
             |sh AS (SELECT lang, n_weight,
             |    CAST(n_weight AS DOUBLE) / n_total AS p,
             |    pow(CAST(n_weight AS DOUBLE) / n_total, 0.3) AS p_a
             |  FROM bd CROSS JOIN tot),
             |nz AS (SELECT sum(p_a) AS z FROM sh),
             |mi AS (SELECT lang,
             |    CAST(round(p_a / z * 1000000, 0) AS BIGINT) AS q6
             |  FROM sh CROSS JOIN nz),
             |fr AS (SELECT *, q6 * 300 // 1000000 AS fl,
             |    (q6 * 300) % 1000000 AS rem FROM mi),
             |df AS (SELECT 300 - sum(fl) AS deficit FROM fr),
             |rk AS (SELECT *,
             |    row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk_up,
             |    row_number() OVER (ORDER BY rem ASC, lang DESC) AS rk_down
             |  FROM fr),
             |bud AS (
             |  SELECT lang,
             |    fl + CASE WHEN rk_up <= deficit THEN 1 ELSE 0 END
             |       - CASE WHEN rk_down <= -deficit THEN 1 ELSE 0 END
             |      AS budget_rows
             |  FROM rk CROSS JOIN df),
             |ranked AS (
             |  SELECT d.lang, d.doc_id, row_number() OVER (
             |      PARTITION BY d.lang
             |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
             |    AS rnk
             |  FROM documents d)
             |SELECT r.lang, r.doc_id
             |FROM ranked r JOIN bud USING (lang)
             |WHERE rnk <= budget_rows
             |ORDER BY lang, doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q122: C4-style line-level cleaning (Raffel et al. 2020 §2.2) — the
    // first filter of a web-corpus pipeline, and deliberately the
    // cheapest: every rule is row-local HOF arithmetic inside the scan
    // (zero shuffle, zero UDF, full codegen; the only exchange is the
    // grading ORDER BY). Plants make every rule load-bearing: each doc
    // gains a kept line (terminal '.'), a no-punctuation line (dropped),
    // %3 a second kept line (so minKeptLines=2 splits the corpus), %7 a
    // well-formed line containing "JavaScript" (dropped by the word rule
    // despite passing punctuation+length), %5 a curly-brace line (page
    // dropped), %11 a lorem-ipsum line (page dropped).
    QueryDef("q122_c4_line_filter",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val aug = d.select(col("doc_id"), concat(
            col("text"), lit("."),
            lit("%%no punct line here"),
            when(col("doc_id") % 3 === 0,
              lit("%%the quick brown fox jumps over the lazy dog!"))
              .otherwise(lit("")),
            when(col("doc_id") % 7 === 0,
              lit("%%please enable JavaScript to continue viewing."))
              .otherwise(lit("")),
            when(col("doc_id") % 5 === 0, lit("%%config { nested }"))
              .otherwise(lit("")),
            when(col("doc_id") % 11 === 0,
              lit("%%Lorem ipsum dolor sit amet.")).otherwise(lit("")))
          .as("text"))
        graft.operators.C4Filter.c4Lines(aug, "doc_id", "text",
            lineSep = "%%", minWords = 5, minKeptLines = 2)
          .select(col("id").as("doc_id"), col("n_lines"), col("n_kept"),
            col("kept_char_frac"), col("has_lorem"), col("has_brace"),
            col("keep"), md5(col("clean_text")).as("clean_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH aug AS (
             |  SELECT doc_id, text || '.'
             |    || '%%no punct line here'
             |    || CASE WHEN doc_id % 3 = 0
             |         THEN '%%the quick brown fox jumps over the lazy dog!'
             |         ELSE '' END
             |    || CASE WHEN doc_id % 7 = 0
             |         THEN '%%please enable JavaScript to continue viewing.'
             |         ELSE '' END
             |    || CASE WHEN doc_id % 5 = 0
             |         THEN '%%config { nested }' ELSE '' END
             |    || CASE WHEN doc_id % 11 = 0
             |         THEN '%%Lorem ipsum dolor sit amet.' ELSE '' END
             |    AS text
             |  FROM documents),
             |ln AS (
             |  SELECT doc_id, text,
             |    list_filter(list_transform(string_split(text, '%%'),
             |      x -> trim(x)), x -> x <> '') AS lines
             |  FROM aug),
             |k AS (
             |  SELECT doc_id, text, lines,
             |    list_filter(lines, l -> regexp_matches(l, '[.!?"]$')
             |      AND len(list_filter(string_split_regex(l, '\s+'),
             |            w -> w <> '')) >= 5
             |      AND NOT contains(lower(l), 'javascript')) AS kept
             |  FROM ln)
             |SELECT doc_id,
             |  CAST(len(lines) AS BIGINT) AS n_lines,
             |  CAST(len(kept) AS BIGINT) AS n_kept,
             |  CASE WHEN coalesce(list_sum(list_transform(lines,
             |      x -> length(x))), 0) > 0
             |    THEN round(CAST(coalesce(list_sum(list_transform(kept,
             |        x -> length(x))), 0) AS DOUBLE)
             |      / list_sum(list_transform(lines, x -> length(x))), 6)
             |    ELSE 0.0 END AS kept_char_frac,
             |  contains(lower(text), 'lorem ipsum') AS has_lorem,
             |  contains(text, '{') AS has_brace,
             |  (len(kept) >= 2 AND NOT contains(lower(text), 'lorem ipsum')
             |    AND NOT contains(text, '{')) AS keep,
             |  md5(array_to_string(kept, chr(10))) AS clean_md5
             |FROM k ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q134: Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter
    // 1969) — the statistical generalization of the reference's rule-based
    // ">= 2 of 3 keys" contacts matcher (fill_missing_contact_info.py:64-99).
    // Planted corpus: exact duplicates (agree on every field -> 'match'),
    // near-duplicates with a perturbed name (disagree name, agree the rest
    // -> 'possible'), blocked on nation. u-probabilities are estimated from
    // the value distributions in ONE scan (collision mass sum (n_v/N)^2,
    // rounded 9); scoring is two id-keyed hash joins + a 1-row broadcast of
    // the u's; weights are a fixed-order 3-term sum rounded 6. Blocking
    // keeps the pair space linear-ish; the all-pairs-in-block join here is
    // the caller's blocking contract, not the operator's.
    QueryDef("q134_record_linkage",
      (s, dir) => {
        import graft.operators.Linkage
        import graft.operators.Linkage.FsField
        val base = t(s, dir, "customer").select(
          col("c_custkey").cast("long").as("id"),
          concat(lit("cust"), col("c_custkey").cast("string")).as("name"),
          col("c_mktsegment").as("seg"),
          col("c_nationkey").cast("long").as("nat"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
        val dirty = base.filter(col("id") % 4 === 0)
          .withColumn("id", col("id") + 1000000)
          .withColumn("name", concat(col("name"), lit("x")))
        val exact = base.filter(col("id") % 10 === 0)
          .withColumn("id", col("id") + 2000000)
        val recs = base.unionByName(dirty).unionByName(exact)
        // two-key blocking (nation x coarse balance bucket) keeps the
        // candidate space ~|block|^2/20 of single-key nation blocking
        // (8.2M -> ~0.6M pairs at sf0.1, measured 15.4 s -> ~2 s).
        // bal_bucket is also a scored field, so its agreement weight is
        // constant over candidates — the planted match/possible classes
        // separate exactly as before (both dup classes preserve the
        // bucket); the standard don't-score-your-block-key caveat is
        // deliberate and documented here.
        val pairs = recs.select(col("id"), col("nat"), col("bal_bucket"))
          .as("a")
          .join(recs.select(col("id"), col("nat"), col("bal_bucket"))
            .as("b"),
            col("a.nat") === col("b.nat")
              && col("a.bal_bucket") === col("b.bal_bucket")
              && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        Linkage.fellegiSunter(recs, "id", pairs,
            Seq(FsField("name", 0.95), FsField("seg", 0.9),
              FsField("bal_bucket", 0.85)),
            upperT = 4.0, lowerT = 0.0)
          .filter(col("decision") =!= "non_match")
          .orderBy(col("weight").desc, col("id_a"), col("id_b"))
      },
      Some("""WITH base AS (
             |  SELECT CAST(c_custkey AS BIGINT) AS id,
             |    'cust' || c_custkey AS name,
             |    c_mktsegment AS seg,
             |    CAST(c_nationkey AS BIGINT) AS nat,
             |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket
             |  FROM customer),
             |dirty AS (SELECT id + 1000000 AS id, name || 'x' AS name,
             |    seg, nat, bal_bucket FROM base WHERE id % 4 = 0),
             |exact AS (SELECT id + 2000000 AS id, name, seg, nat,
             |    bal_bucket FROM base WHERE id % 10 = 0),
             |recs AS (SELECT * FROM base UNION ALL SELECT * FROM dirty
             |  UNION ALL SELECT * FROM exact),
             |un AS (SELECT round(least(greatest(
             |    sum(n * n) / (sum(n) * sum(n)), 1e-9), 1 - 1e-9), 9) AS u
             |  FROM (SELECT count(*) AS n FROM recs
             |        WHERE name IS NOT NULL GROUP BY name)),
             |us AS (SELECT round(least(greatest(
             |    sum(n * n) / (sum(n) * sum(n)), 1e-9), 1 - 1e-9), 9) AS u
             |  FROM (SELECT count(*) AS n FROM recs
             |        WHERE seg IS NOT NULL GROUP BY seg)),
             |ub AS (SELECT round(least(greatest(
             |    sum(n * n) / (sum(n) * sum(n)), 1e-9), 1 - 1e-9), 9) AS u
             |  FROM (SELECT count(*) AS n FROM recs
             |        WHERE bal_bucket IS NOT NULL GROUP BY bal_bucket)),
             |pr AS (SELECT a.id AS id_a, b.id AS id_b,
             |    a.name AS an, b.name AS bn, a.seg AS asg, b.seg AS bsg,
             |    a.bal_bucket AS ab, b.bal_bucket AS bb
             |  FROM recs a JOIN recs b ON a.nat = b.nat
             |    AND a.bal_bucket = b.bal_bucket AND a.id < b.id),
             |sc AS (SELECT id_a, id_b,
             |    CASE WHEN an IS NULL OR bn IS NULL THEN NULL
             |         WHEN an = bn THEN 1 ELSE 0 END AS agree_name,
             |    CASE WHEN asg IS NULL OR bsg IS NULL THEN NULL
             |         WHEN asg = bsg THEN 1 ELSE 0 END AS agree_seg,
             |    CASE WHEN ab IS NULL OR bb IS NULL THEN NULL
             |         WHEN ab = bb THEN 1 ELSE 0 END AS agree_bal_bucket,
             |    round(
             |      (CASE WHEN an IS NULL OR bn IS NULL THEN 0.0
             |            WHEN an = bn THEN log2(0.95 / un.u)
             |            ELSE log2(0.05 / (1 - un.u)) END)
             |      + (CASE WHEN asg IS NULL OR bsg IS NULL THEN 0.0
             |              WHEN asg = bsg THEN log2(0.9 / us.u)
             |              ELSE log2(0.1 / (1 - us.u)) END)
             |      + (CASE WHEN ab IS NULL OR bb IS NULL THEN 0.0
             |              WHEN ab = bb THEN log2(0.85 / ub.u)
             |              ELSE log2(0.15 / (1 - ub.u)) END), 6) AS weight
             |  FROM pr CROSS JOIN un CROSS JOIN us CROSS JOIN ub)
             |SELECT id_a, id_b, agree_name, agree_seg, agree_bal_bucket,
             |  weight,
             |  CASE WHEN weight >= 4.0 THEN 'match'
             |       WHEN weight <= 0.0 THEN 'non_match'
             |       ELSE 'possible' END AS decision
             |FROM sc WHERE weight > 0.0
             |ORDER BY weight DESC, id_a, id_b""".stripMargin)),

    // ---------------------------------------------------------------------
    // q135: sorted-neighborhood candidate generation (Hernandez-Stolfo
    // merge/purge) — the complementary blocking pass to q33's suffix
    // blocks: planted END-of-name typos sort adjacent to their source, so
    // the rank window catches pairs equality blocking splits. Global rank
    // via the two-phase range-partition scheme (NO single-task window);
    // pairing is a bucket-keyed equi-join (two probe buckets per row,
    // n * (window-1) candidates). The oracle restates the definition with
    // a row_number window + rank-gap join — same pair set by construction.
    QueryDef("q135_sorted_neighborhood",
      (s, dir) => {
        val base = t(s, dir, "customer").select(
          col("c_custkey").cast("long").as("id"),
          concat(lit("cust"),
            lpad(col("c_custkey").cast("string"), 9, "0")).as("name"))
        val dirty = base.filter(col("id") % 4 === 0)
          .select((col("id") + 1000000).as("id"),
            concat(col("name"), lit("x")).as("name"))
        val recs = base.unionByName(dirty)
        val names = recs.select(col("id"), col("name"))
        graft.operators.Fuzzy.sortedNeighborhood(recs, "id", col("name"), 5)
          .join(names.select(col("id").as("id_a"), col("name").as("name_a")),
            Seq("id_a"))
          .join(names.select(col("id").as("id_b"), col("name").as("name_b")),
            Seq("id_b"))
          .select(col("id_a"), col("id_b"), col("gap"),
            levenshtein(col("name_a"), col("name_b")).as("dist"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH base AS (
             |  SELECT CAST(c_custkey AS BIGINT) AS id,
             |    'cust' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS name
             |  FROM customer),
             |dirty AS (SELECT id + 1000000 AS id, name || 'x' AS name
             |  FROM base WHERE id % 4 = 0),
             |recs AS (SELECT * FROM base UNION ALL SELECT * FROM dirty),
             |rk AS (SELECT id, name,
             |    row_number() OVER (ORDER BY name, id) AS rn FROM recs)
             |SELECT a.id AS id_a, b.id AS id_b,
             |  b.rn - a.rn AS gap, levenshtein(a.name, b.name) AS dist
             |FROM rk a JOIN rk b
             |  ON b.rn > a.rn AND b.rn - a.rn < 5
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---------------------------------------------------------------------
    // q136: market-basket association rules (Apriori's 2-itemset tier) over
    // order baskets — support / confidence / lift for co-ordered part
    // pairs, top-100 by lift. The pair expansion is a basket-keyed
    // self-join (quadratic in BASKET size only, capped at 15 items); all
    // supports are hash aggregates; the basket total is a 1-row broadcast.
    // Complements q81's PMI scoring of the same co-occurrence counts.
    QueryDef("q136_basket_rules",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
        graft.operators.Baskets.pairRules(li, "l_orderkey", "l_partkey",
          minPairCount = 2, maxBasketSize = 15, topK = 100)
      },
      Some("""WITH member AS (
             |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
             |  FROM lineitem),
             |sized AS (SELECT bk FROM member GROUP BY bk
             |  HAVING count(*) <= 15),
             |kept AS (SELECT m.* FROM member m JOIN sized USING (bk)),
             |nb AS (SELECT count(DISTINCT bk) AS n FROM kept),
             |ic AS (SELECT it, count(*) AS cnt FROM kept GROUP BY it),
             |pc AS (SELECT a.it AS item_a, b.it AS item_b,
             |    count(*) AS pair_cnt
             |  FROM kept a JOIN kept b ON a.bk = b.bk AND a.it < b.it
             |  GROUP BY 1, 2 HAVING count(*) >= 2)
             |SELECT item_a, item_b, pair_cnt,
             |  ca.cnt AS cnt_a, cb.cnt AS cnt_b,
             |  round(CAST(pair_cnt AS DOUBLE) / n, 6) AS support,
             |  round(CAST(pair_cnt AS DOUBLE) / ca.cnt, 6) AS conf_ab,
             |  round(CAST(pair_cnt AS DOUBLE) / cb.cnt, 6) AS conf_ba,
             |  round(CAST(pair_cnt AS DOUBLE) * n / (ca.cnt * cb.cnt), 6)
             |    AS lift
             |FROM pc JOIN ic ca ON pc.item_a = ca.it
             |  JOIN ic cb ON pc.item_b = cb.it
             |CROSS JOIN nb
             |ORDER BY lift DESC, item_a, item_b LIMIT 100""".stripMargin)),

    // ---------------------------------------------------------------------
    // q137: per-node triangle counts (clustering-coefficient numerator)
    // over the co-purchase graph — parts co-ordered in >= 2 baskets.
    // Degree-ordered orientation (Suri-Vassilvitskii) bounds the wedge
    // join's per-node fan-out at O(sqrt(E)) regardless of hub skew; the
    // oracle restates the naive a<b<c triple join, so the orientation
    // trick is graded against the definition. Third graph kernel beside
    // connectedComponents (q44) and PageRank (q103).
    QueryDef("q137_triangle_counts",
      (s, dir) => {
        val member = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("bk"), col("l_partkey").as("it"))
          .distinct()
        val sized = member.groupBy(col("bk"))
          .agg(count(lit(1)).as("n")).filter(col("n") <= 15).select("bk")
        val kept = member.join(sized, Seq("bk"))
        val edges = kept.as("a").join(kept.as("b"),
            col("a.bk") === col("b.bk") && col("a.it") < col("b.it"))
          .groupBy(col("a.it").as("src"), col("b.it").as("dst"))
          .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 2)
          .select(col("src"), col("dst"))
        graft.operators.Graphs.triangleCounts(edges)
          .orderBy(col("triangles").desc, col("node"))
      },
      Some("""WITH member AS (
             |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
             |  FROM lineitem),
             |sized AS (SELECT bk FROM member GROUP BY bk
             |  HAVING count(*) <= 15),
             |kept AS (SELECT m.* FROM member m JOIN sized USING (bk)),
             |ed AS (SELECT a.it AS u, b.it AS v
             |  FROM kept a JOIN kept b ON a.bk = b.bk AND a.it < b.it
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
             |  FROM ed e1 JOIN ed e2 ON e1.v = e2.u
             |  JOIN ed e3 ON e3.u = e1.u AND e3.v = e2.v),
             |nodes AS (SELECT a AS node FROM tri
             |  UNION ALL SELECT b FROM tri
             |  UNION ALL SELECT c FROM tri)
             |SELECT node, count(*) AS triangles FROM nodes GROUP BY node
             |ORDER BY triangles DESC, node""".stripMargin)),

    // ---------------------------------------------------------------------
    // q138: MinHash-LSH banding design audit (MMDS §3.4.3 S-curve): every
    // (b, r) factorization of k=24 scored by integrated false-positive /
    // false-negative mass against the 0.7 Jaccard threshold — the planner
    // behind q20/q29's band choices. Pure closed-form arithmetic over a
    // divisors(k) x 19 grid; the planner reads the data MODEL, not the
    // data, so it is metadata-sized at any corpus scale.
    QueryDef("q138_lsh_scurve",
      (s, dir) => {
        graft.operators.LshPlan.sCurve(s, k = 24, threshold = 0.7)
      },
      Some("""WITH cfg AS (
             |  SELECT b, 24 // b AS r FROM range(1, 25) t(b)
             |  WHERE 24 % b = 0),
             |grid AS (SELECT b, r, round(CAST(i AS DOUBLE) / 20, 6) AS s
             |  FROM cfg CROSS JOIN range(1, 20) g(i)),
             |pp AS (SELECT b, r, s,
             |    round(1 - pow(1 - pow(s, r), b), 6) AS p FROM grid),
             |ag AS (SELECT b, r,
             |    round(sum(CASE WHEN s < 0.7 THEN p ELSE 0 END) / 20, 6)
             |      AS fp_mass,
             |    round(sum(CASE WHEN s >= 0.7 THEN 1 - p ELSE 0 END) / 20, 6)
             |      AS fn_mass
             |  FROM pp GROUP BY b, r),
             |tot AS (SELECT *, round(fp_mass + fn_mass, 6) AS total_err
             |  FROM ag)
             |SELECT b, r, fp_mass, fn_mass, total_err,
             |  (row_number() OVER (ORDER BY total_err, b) = 1) AS chosen
             |FROM tot ORDER BY b""".stripMargin)),

    // ---------------------------------------------------------------------
    // q139: join-skew audit / salt planner — per-key output-row products
    // for a planned self-equi-join with a planted Zipf-style hot key (5%
    // of the fact rows collapse onto one key). Two count aggregates and a
    // count-frame join; the INPUTS are never joined, so the audit costs
    // O(|keys|) shuffle where the join it plans would cost O(out_rows).
    // The flagged salt factor is what AQE skew-split / a salted
    // replicate-join would need per key.
    QueryDef("q139_join_skew_plan",
      (s, dir) => {
        val f = t(s, dir, "lineitem").select(
          when(col("l_orderkey") % 20 === 0, lit(1L))
            .otherwise(col("l_partkey")).as("part"))
        graft.operators.Skew.joinSkewPlan(f, f, "part",
          targetRowsPerTask = 100000L, topK = 50)
      },
      Some("""WITH f AS (
             |  SELECT CASE WHEN l_orderkey % 20 = 0 THEN 1
             |    ELSE l_partkey END AS part FROM lineitem),
             |lc AS (SELECT part, count(*) AS n_left FROM f GROUP BY part),
             |rc AS (SELECT part, count(*) AS n_right FROM f GROUP BY part),
             |per AS (SELECT part, n_left, n_right,
             |    n_left * n_right AS out_rows
             |  FROM lc JOIN rc USING (part)),
             |tot AS (SELECT sum(out_rows) AS total_out FROM per)
             |SELECT part, n_left, n_right, out_rows,
             |  round(CAST(out_rows AS DOUBLE) / total_out, 6) AS share,
             |  out_rows > 100000 AS needs_salt,
             |  CAST(ceil(CAST(out_rows AS DOUBLE) / 100000) AS BIGINT)
             |    AS salt_factor
             |FROM per CROSS JOIN tot
             |ORDER BY out_rows DESC, part LIMIT 50""".stripMargin)),

    // ---------------------------------------------------------------------
    // q140: content-defined chunk dedup (LBFS rule) — per-doc fraction of
    // characters living in chunks shared with ANOTHER document. Chunk
    // boundaries are content-local (md5 of an 8-char window), so shifted /
    // partially-edited duplicate passages still align — the dedup signal
    // fixed-grid chunking (and whole-doc hashing, q18) cannot see.
    // Chunking is a pure per-row expression (zero shuffle); the corpus
    // side is one chunk-hash aggregate + one hash-keyed join back.
    QueryDef("q140_cdc_chunk_dedup",
      (s, dir) => {
        // chunking is row-local but md5-per-position CPU-heavy; spread
        // the compact single-row-group local scan across cores first
        // (a lake-scale scan arrives already split — this shuffle moves
        // ~raw-text bytes and buys 32x on the chunking stage). Explicit
        // numPartitions: AQE would coalesce a small-byte shuffle back
        // to one partition, re-serializing the CPU-bound stage.
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        val inst = d.select(col("doc_id"),
            explode(Text.cdcChunks(col("text"), 8)).as("chunk"))
          .select(col("doc_id"), md5(col("chunk")).as("h"),
            length(col("chunk")).as("clen"))
        val dfreq = inst.select(col("h"), col("doc_id")).distinct()
          .groupBy(col("h")).agg(count(lit(1)).as("df"))
        inst.join(dfreq, Seq("h"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"),
            round(sum(when(col("df") >= 2, col("clen")).otherwise(0))
              .cast("double") / sum(col("clen")), 6)
              .as("shared_char_frac"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (SELECT doc_id, text,
             |    CASE WHEN length(text) >= 8 THEN
             |      list_filter(range(8, length(text)::BIGINT + 1),
             |        e -> substr(md5(substr(text, (e - 7)::INT, 8)), 1, 1)
             |          = '0')
             |    ELSE [] END AS ends0 FROM documents),
             |e AS (SELECT doc_id, text,
             |    list_sort(list_distinct(list_append(ends0,
             |      length(text)::BIGINT))) AS ends FROM b),
             |ch AS (SELECT doc_id, unnest(list_filter(list_transform(
             |      range(1, len(ends)::BIGINT + 1),
             |      j -> substr(text,
             |        (CASE WHEN j = 1 THEN 0
             |          ELSE ends[j::INT - 1] END)::INT + 1,
             |        (ends[j::INT] - CASE WHEN j = 1 THEN 0
             |          ELSE ends[j::INT - 1] END)::INT)),
             |    c -> length(c) > 0)) AS chunk FROM e),
             |inst AS (SELECT doc_id, md5(chunk) AS h,
             |    length(chunk) AS clen FROM ch),
             |dfreq AS (SELECT h, count(DISTINCT doc_id) AS df
             |  FROM inst GROUP BY h)
             |SELECT doc_id, count(*) AS n_chunks,
             |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_shared,
             |  round(sum(CASE WHEN df >= 2 THEN clen ELSE 0 END)::DOUBLE
             |    / sum(clen), 6) AS shared_char_frac
             |FROM inst JOIN dfreq USING (h)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q141: the COMPOSED entity-resolution pipeline — the full merge/purge
    // loop the reference's contacts scripts approximate by hand: TWO
    // blocking passes (q33's equality blocks + q135's sorted neighborhood,
    // unioned — each catches pairs the other splits), Fellegi-Sunter
    // scoring (q134), weight>0 links, connected components (q44's kernel),
    // cluster sizes. Every stage is the already-graded operator; this
    // grades their composition. The oracle restates all four stages,
    // closing the clusters with a recursive CTE.
    QueryDef("q141_er_pipeline",
      (s, dir) => {
        import graft.operators.{Dedup, Fuzzy, Linkage}
        import graft.operators.Linkage.FsField
        val base = t(s, dir, "customer").select(
          col("c_custkey").cast("long").as("id"),
          concat(lit("cust"),
            lpad(col("c_custkey").cast("string"), 9, "0")).as("name"),
          col("c_mktsegment").as("seg"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
        val dirty = base.filter(col("id") % 4 === 0)
          .withColumn("id", col("id") + 1000000)
          .withColumn("name", concat(col("name"), lit("x")))
        val exact = base.filter(col("id") % 10 === 0)
          .withColumn("id", col("id") + 2000000)
        val recs = base.unionByName(dirty).unionByName(exact)
        val p1 = Fuzzy.blockedPairs(recs, "id", "name",
            substring(col("name"), 5, 8), maxDist = 2)
          .select(col("id_a"), col("id_b"))
        val p2 = Fuzzy.sortedNeighborhood(recs, "id", col("name"), 5)
          .select(least(col("id_a"), col("id_b")).as("id_a"),
            greatest(col("id_a"), col("id_b")).as("id_b"))
        val cand = p1.unionByName(p2).distinct()
        val links = Linkage.fellegiSunter(recs, "id", cand,
            Seq(FsField("name", 0.95), FsField("seg", 0.9),
              FsField("bal_bucket", 0.85)),
            upperT = 4.0, lowerT = 0.0)
          .filter(col("weight") > 0)
          .select(col("id_a"), col("id_b"))
        val cc = Dedup.connectedComponents(recs.select(col("id")), links)
        val sz = cc.groupBy(col("cluster"))
          .agg(count(lit(1)).as("cluster_size"))
        cc.join(sz, Seq("cluster"))
          .select(col("id"), col("cluster"), col("cluster_size"))
          .orderBy(col("id"))
      },
      Some("""WITH RECURSIVE
             |base AS (
             |  SELECT CAST(c_custkey AS BIGINT) AS id,
             |    'cust' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS name,
             |    c_mktsegment AS seg,
             |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket
             |  FROM customer),
             |dirty AS (SELECT id + 1000000 AS id, name || 'x' AS name,
             |    seg, bal_bucket FROM base WHERE id % 4 = 0),
             |exact AS (SELECT id + 2000000 AS id, name, seg, bal_bucket
             |  FROM base WHERE id % 10 = 0),
             |recs AS (SELECT * FROM base UNION ALL SELECT * FROM dirty
             |  UNION ALL SELECT * FROM exact),
             |blk AS (SELECT id, name, substr(name, 5, 8) AS b FROM recs),
             |p1 AS (SELECT a.id AS id_a, b.id AS id_b
             |  FROM blk a JOIN blk b ON a.b = b.b AND a.id < b.id
             |  WHERE levenshtein(a.name, b.name) <= 2),
             |rk AS (SELECT id, row_number() OVER (ORDER BY name, id) AS rn
             |  FROM recs),
             |p2 AS (SELECT least(a.id, b.id) AS id_a,
             |    greatest(a.id, b.id) AS id_b
             |  FROM rk a JOIN rk b ON b.rn > a.rn AND b.rn - a.rn < 5),
             |cand AS (SELECT DISTINCT id_a, id_b FROM
             |  (SELECT * FROM p1 UNION ALL SELECT * FROM p2)),
             |un AS (SELECT round(least(greatest(
             |    sum(n * n) / (sum(n) * sum(n)), 1e-9), 1 - 1e-9), 9) AS u
             |  FROM (SELECT count(*) AS n FROM recs
             |        WHERE name IS NOT NULL GROUP BY name)),
             |us AS (SELECT round(least(greatest(
             |    sum(n * n) / (sum(n) * sum(n)), 1e-9), 1 - 1e-9), 9) AS u
             |  FROM (SELECT count(*) AS n FROM recs
             |        WHERE seg IS NOT NULL GROUP BY seg)),
             |ub AS (SELECT round(least(greatest(
             |    sum(n * n) / (sum(n) * sum(n)), 1e-9), 1 - 1e-9), 9) AS u
             |  FROM (SELECT count(*) AS n FROM recs
             |        WHERE bal_bucket IS NOT NULL GROUP BY bal_bucket)),
             |pr AS (SELECT c.id_a, c.id_b, ra.name AS an, rb.name AS bn,
             |    ra.seg AS asg, rb.seg AS bsg,
             |    ra.bal_bucket AS ab, rb.bal_bucket AS bb
             |  FROM cand c JOIN recs ra ON c.id_a = ra.id
             |  JOIN recs rb ON c.id_b = rb.id),
             |sc AS (SELECT id_a, id_b,
             |    round(
             |      (CASE WHEN an = bn THEN log2(0.95 / un.u)
             |            ELSE log2(0.05 / (1 - un.u)) END)
             |      + (CASE WHEN asg = bsg THEN log2(0.9 / us.u)
             |              ELSE log2(0.1 / (1 - us.u)) END)
             |      + (CASE WHEN ab = bb THEN log2(0.85 / ub.u)
             |              ELSE log2(0.15 / (1 - ub.u)) END), 6) AS weight
             |  FROM pr CROSS JOIN un CROSS JOIN us CROSS JOIN ub),
             |links AS (SELECT id_a, id_b FROM sc WHERE weight > 0),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM links
             |  UNION ALL SELECT id_b, id_a FROM links),
             |reach(id, r) AS (
             |  SELECT id, id FROM recs
             |  UNION
             |  SELECT reach.id, edges.dst FROM reach
             |  JOIN edges ON edges.src = reach.r),
             |cl AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
             |sz AS (SELECT cluster, count(*) AS cluster_size FROM cl
             |  GROUP BY cluster)
             |SELECT cl.id, cl.cluster, sz.cluster_size
             |FROM cl JOIN sz USING (cluster)
             |ORDER BY cl.id""".stripMargin)),

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
    // q145: small-file compaction plan — each document stands in for one
    // ingested file (part = source, bytes = n_chars); the planner packs
    // sub-threshold files into ~1000-byte merge bins by the slab rule
    // (exclusive-cumsum div target over a bytes-desc total order) and
    // rolls up to one row per (partition, bin) with the merge/noop/keep
    // verdict. The window runs over the file MANIFEST (metadata-sized),
    // never the data — the 100-TB small-file fix costs one
    // |files|-row window + one |files|-row aggregate.
    QueryDef("q145_compaction_plan",
      (s, dir) => {
        val manifest = t(s, dir, "documents").select(
          col("source").as("part"), col("doc_id").as("file"),
          col("n_chars").cast("long").as("bytes"))
        val plan = graft.operators.Compaction.planBins(
          manifest, "part", "file", "bytes", targetBytes = 1000L)
        graft.operators.Compaction.binSummary(plan, "part", "bytes")
          .orderBy(col("part"), col("bin"))
      },
      Some("""WITH m AS (SELECT source AS part, doc_id AS file,
             |    CAST(n_chars AS BIGINT) AS bytes FROM documents),
             |plan AS (SELECT part, file, bytes,
             |    CASE WHEN bytes < 750 THEN
             |      CAST(floor((sum(CASE WHEN bytes < 750 THEN bytes
             |            ELSE 0 END) OVER (PARTITION BY part
             |          ORDER BY bytes DESC, file ASC
             |          ROWS UNBOUNDED PRECEDING)
             |        - (CASE WHEN bytes < 750 THEN bytes ELSE 0 END))
             |        / 1000.0) AS BIGINT)
             |    ELSE -1 END AS bin
             |  FROM m),
             |su AS (SELECT part, bin, count(*) AS n_files,
             |    CAST(sum(bytes) AS BIGINT) AS bytes_total
             |  FROM plan GROUP BY 1, 2)
             |SELECT part, bin, n_files, bytes_total,
             |  CASE WHEN bin = -1 THEN 'keep'
             |       WHEN n_files >= 2 THEN 'merge'
             |       ELSE 'noop' END AS action
             |FROM su ORDER BY part, bin""".stripMargin)),

    // ---------------------------------------------------------------------
    // q146: Unicode NFC normalization — the native NfcNormalize expression
    // (JDK Normalizer under whole-stage codegen) graded against DuckDB's
    // independent nfc_normalize (both implement UAX #15, so canonical
    // composition must agree byte-for-byte). The corpus is ASCII, so every
    // third doc gets a planted decomposed suffix (e+U+0301, A+U+030A,
    // o+U+0308, and the U+FB01 ligature that NFC must NOT fold — that
    // fold is NFKC's, a content-altering choice this pass refuses).
    // Row-local projection, zero shuffle: the pass that must run BEFORE
    // any byte-keyed fingerprint (q6/q18 exact dedup, q19/q20 shingles,
    // BPE) or two spellings of one word hash apart.
    QueryDef("q146_nfc_normalize",
      (s, dir) => {
        val suffix = "Café ﬁne Ångström"
        val d = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(substring(col("text"), 1, 20), lit(suffix)))
            .otherwise(substring(col("text"), 1, 20)).as("raw"))
        val norm = graft.expressions.NfcNormalize.column(col("raw"))
        d.select(col("doc_id"), norm.as("norm_text"),
            (norm =!= col("raw")).as("changed"),
            length(col("raw")).as("len_raw"),
            length(norm).as("len_norm"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |    CASE WHEN doc_id % 3 = 0 THEN substr(text, 1, 20) ||
             |      'Café ﬁne Ångström'
             |    ELSE substr(text, 1, 20) END AS raw
             |  FROM documents)
             |SELECT doc_id, nfc_normalize(raw) AS norm_text,
             |  nfc_normalize(raw) <> raw AS changed,
             |  length(raw) AS len_raw,
             |  length(nfc_normalize(raw)) AS len_norm
             |FROM d ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q147: label-noise audit (confident-learning-lite, Northcutt 2021)
    // over a deliberately corrupted training set: the q112 plant (real
    // docs good, md5-soup junk) with labels FLIPPED on real docs
    // %17==3 and soup docs %17==5. The NB model trained on the noisy
    // labels is scored back over its own training rows; every
    // disagreement is emitted with the model's log-odds and the planted
    // ground truth (`flipped`) — the audit is correct iff the suspect
    // list is exactly the flip set (NB's bag-of-tokens capacity cannot
    // memorize a lone flipped row against thousands of consistent ones).
    // Same scale shape as q112: vocab-keyed hash join + doc-keyed
    // aggregate; the label join-back is batch-sized.
    QueryDef("q147_label_noise",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 4 =!= 0)
        val soup = d.select(col("doc_id"),
          concat_ws(" ", (0 until 8).map(i =>
            md5((col("doc_id") + lit(i)).cast("string").cast("binary")))
            : _*).as("text"))
        val train = d.select(col("doc_id").as("id"), col("text"),
            when(col("doc_id") % 17 === 3, "junk").otherwise("good")
              .as("label"))
          .unionByName(soup.select((col("doc_id") + 10000).as("id"),
            col("text"),
            when(col("doc_id") % 17 === 5, "good").otherwise("junk")
              .as("label")))
        Classify.labelNoise(train, "id", "text", "label", "good", "junk")
          .withColumn("flipped",
            (col("id") < 10000 && col("id") % 17 === 3) ||
              (col("id") >= 10000 && (col("id") - 10000) % 17 === 5))
          .orderBy(col("id"))
      },
      Some("""WITH base AS (SELECT doc_id, text FROM documents
             |  WHERE doc_id % 4 <> 0),
             |soup AS (
             |  SELECT doc_id, concat_ws(' ',
             |    md5(CAST(doc_id + 0 AS VARCHAR)),
             |    md5(CAST(doc_id + 1 AS VARCHAR)),
             |    md5(CAST(doc_id + 2 AS VARCHAR)),
             |    md5(CAST(doc_id + 3 AS VARCHAR)),
             |    md5(CAST(doc_id + 4 AS VARCHAR)),
             |    md5(CAST(doc_id + 5 AS VARCHAR)),
             |    md5(CAST(doc_id + 6 AS VARCHAR)),
             |    md5(CAST(doc_id + 7 AS VARCHAR))) AS text
             |  FROM base),
             |trainr AS (
             |  SELECT doc_id AS id, text,
             |    CASE WHEN doc_id % 17 = 3 THEN 'junk' ELSE 'good' END
             |      AS label
             |  FROM base
             |  UNION ALL
             |  SELECT doc_id + 10000, text,
             |    CASE WHEN doc_id % 17 = 5 THEN 'good' ELSE 'junk' END
             |  FROM soup),
             |ttok AS (
             |  SELECT label = 'good' AS is_pos, unnest(list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '')) AS tok
             |  FROM trainr),
             |tt AS (SELECT tok,
             |    sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS c_pos,
             |    sum(CASE WHEN NOT is_pos THEN 1 ELSE 0 END) AS c_neg
             |  FROM ttok GROUP BY tok),
             |tot AS (SELECT sum(c_pos) AS t_pos, sum(c_neg) AS t_neg,
             |    count(*) AS vsz FROM tt),
             |pri AS (SELECT
             |    sum(CASE WHEN label = 'good' THEN 1 ELSE 0 END) AS d_pos,
             |    sum(CASE WHEN label <> 'good' THEN 1 ELSE 0 END) AS d_neg
             |  FROM trainr),
             |stok AS (
             |  SELECT id, unnest(list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '')) AS tok
             |  FROM trainr),
             |lp AS (SELECT id,
             |    ln((coalesce(c_pos, 0) + 1.0)
             |      / (t_pos + 1.0 * vsz)) AS lp_pos,
             |    ln((coalesce(c_neg, 0) + 1.0)
             |      / (t_neg + 1.0 * vsz)) AS lp_neg
             |  FROM stok LEFT JOIN tt USING (tok) CROSS JOIN tot),
             |pd AS (SELECT id, count(*) AS n_tokens,
             |    sum(lp_pos) AS s_pos, sum(lp_neg) AS s_neg
             |  FROM lp GROUP BY id),
             |sc AS (SELECT tr.id, tr.label AS given_label,
             |    round(ln(CAST(d_pos AS DOUBLE) / d_neg)
             |      + coalesce(s_pos - s_neg, 0.0), 4) AS log_odds
             |  FROM trainr tr LEFT JOIN pd ON tr.id = pd.id CROSS JOIN pri),
             |outp AS (SELECT id, given_label,
             |    CASE WHEN log_odds > 0 THEN 'good' ELSE 'junk' END
             |      AS prediction,
             |    log_odds,
             |    (id < 10000 AND id % 17 = 3)
             |      OR (id >= 10000 AND (id - 10000) % 17 = 5) AS flipped
             |  FROM sc)
             |SELECT * FROM outp WHERE prediction <> given_label
             |ORDER BY id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q148: robust outlier flags (median/MAD, Hampel k=3) per event type,
    // with planted extremes (event_id %101: value*50+100) that must all
    // surface. Exact percentile at this calibration scale; the 100-TB
    // swap is percentile_approx with the identical plan shape. Two
    // |groups|-row aggregates broadcast back; the corpus is scanned, not
    // sorted.
    QueryDef("q148_mad_outliers",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("event_type"),
          col("event_id"),
          when(col("event_id") % 101 === 0, col("value") * 50 + 100)
            .otherwise(col("value")).as("value"))
        graft.operators.Outliers.madOutliers(
            e, "event_type", "event_id", "value", k = 3.0)
          .orderBy(col("event_type"), col("event_id"))
      },
      Some("""WITH e AS (SELECT event_type, event_id,
             |    CASE WHEN event_id % 101 = 0 THEN value * 50 + 100
             |      ELSE value END AS v
             |  FROM events),
             |med AS (SELECT event_type, quantile_cont(v, 0.5) AS m
             |  FROM e GROUP BY 1),
             |dev AS (SELECT e.event_type, event_id, v, m, abs(v - m) AS ad
             |  FROM e JOIN med USING (event_type)),
             |mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS md
             |  FROM dev GROUP BY 1),
             |sc AS (SELECT d.event_type, event_id, v, m, md,
             |    round(ad / nullif(1.4826 * md, 0.0), 4) AS score
             |  FROM dev d JOIN mad USING (event_type))
             |SELECT event_type, event_id, v AS value,
             |  round(m, 6) AS group_median, round(md, 6) AS group_mad,
             |  score
             |FROM sc WHERE score > 3.0
             |ORDER BY event_type, event_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q149: PSI drift monitor — even events are the baseline slice, odd
    // events the current slice with a planted mass shift (+8 on every
    // third event), bucketed into 10 equal-width bins FIXED from the
    // baseline range (moving edges would hide the drift), shares
    // Laplace-smoothed, per-bin contributions and the per-type PSI total
    // against the 0.1/0.25 watch/alarm reading. One 1-row range
    // aggregate + one |bins|-keyed aggregate per slice; all PSI
    // arithmetic runs on the |types|x|bins| frame.
    QueryDef("q149_psi_drift",
      (s, dir) => {
        val e = t(s, dir, "events")
        val baseline = e.filter(col("event_id") % 2 === 0)
          .select(col("event_type"), col("value"))
        val current = e.filter(col("event_id") % 2 === 1)
          .select(col("event_type"),
            (col("value") + when(col("event_id") % 3 === 0, 8.0)
              .otherwise(0.0)).as("value"))
        graft.operators.Drift.psi(baseline, current, "event_type",
            "value", bins = 10)
          .orderBy(col("event_type"), col("bin"))
      },
      Some("""WITH b AS (SELECT event_type, value AS v FROM events
             |  WHERE event_id % 2 = 0),
             |c AS (SELECT event_type,
             |    value + CASE WHEN event_id % 3 = 0 THEN 8.0 ELSE 0.0 END
             |      AS v
             |  FROM events WHERE event_id % 2 = 1),
             |r AS (SELECT event_type, min(v) AS lo, max(v) AS hi
             |  FROM b GROUP BY 1),
             |bb AS (SELECT b.event_type, CASE WHEN hi = lo THEN 0
             |    ELSE least(greatest(
             |      CAST(floor((v - lo) / (hi - lo) * 10) AS BIGINT), 0), 9)
             |    END AS bin
             |  FROM b JOIN r USING (event_type)),
             |bn AS (SELECT event_type, bin, count(*) AS n_base
             |  FROM bb GROUP BY 1, 2),
             |cc AS (SELECT c.event_type, CASE WHEN hi = lo THEN 0
             |    ELSE least(greatest(
             |      CAST(floor((v - lo) / (hi - lo) * 10) AS BIGINT), 0), 9)
             |    END AS bin
             |  FROM c JOIN r USING (event_type)),
             |cn AS (SELECT event_type, bin, count(*) AS n_cur
             |  FROM cc GROUP BY 1, 2),
             |grid AS (SELECT event_type, unnest(range(10)) AS bin FROM r),
             |j AS (SELECT g.event_type, g.bin,
             |    coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
             |  FROM grid g LEFT JOIN bn USING (event_type, bin)
             |  LEFT JOIN cn USING (event_type, bin)),
             |sm AS (SELECT event_type, bin, n_base, n_cur,
             |    (n_base + 0.5) /
             |      (sum(n_base) OVER (PARTITION BY event_type) + 5.0)
             |      AS p_base,
             |    (n_cur + 0.5) /
             |      (sum(n_cur) OVER (PARTITION BY event_type) + 5.0)
             |      AS p_cur
             |  FROM j),
             |ct AS (SELECT *, round((p_cur - p_base) * ln(p_cur / p_base),
             |    6) AS contrib FROM sm)
             |SELECT event_type, bin, n_base, n_cur,
             |  round(p_base, 6) AS p_base, round(p_cur, 6) AS p_cur,
             |  contrib,
             |  round(sum(contrib) OVER (PARTITION BY event_type), 6) AS psi
             |FROM ct ORDER BY event_type, bin""".stripMargin)),

    // ---------------------------------------------------------------------
    // q150: k-anonymity / l-diversity audit (Sweeney 2002;
    // Machanavajjhala 2007) over customer quasi-identifiers (nation,
    // segment, 2000-unit balance bucket) with a binary sensitive
    // attribute (in-debt flag): every combo below k=5 members or without
    // both sensitive values is a re-identification / disclosure risk the
    // release pipeline must generalize or suppress. One hash aggregate
    // keyed on the quasi tuple computing size and distinct-sensitive
    // together.
    QueryDef("q150_k_anonymity",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_nationkey"),
          col("c_mktsegment"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_bucket"),
          when(col("c_acctbal") < 0, "debt").otherwise("ok").as("fin"))
        graft.operators.Privacy.kAnonymityAudit(c,
            Seq("c_nationkey", "c_mktsegment", "bal_bucket"), "fin",
            k = 5, l = 2)
          .orderBy(col("c_nationkey"), col("c_mktsegment"),
            col("bal_bucket"))
      },
      Some("""WITH c AS (SELECT c_nationkey, c_mktsegment,
             |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_bucket,
             |    CASE WHEN c_acctbal < 0 THEN 'debt' ELSE 'ok' END AS fin
             |  FROM customer)
             |SELECT c_nationkey, c_mktsegment, bal_bucket,
             |  count(*) AS group_size,
             |  count(DISTINCT fin) AS l_distinct,
             |  count(*) >= 5 AS k_anonymous,
             |  count(DISTINCT fin) >= 2 AS l_diverse
             |FROM c GROUP BY 1, 2, 3
             |ORDER BY 1, 2, 3""".stripMargin)),

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
    // q152: Cohen's kappa inter-annotator agreement per source — two
    // heuristic "annotators" (a char-length rule and a token-count rule,
    // correlated but imperfect) plus a planted systematic flip on
    // annotator B for doc_id %13==2; kappa must come out well below the
    // raw agreement po (chance correction), per source. One contingency
    // aggregate keyed (source, a, b); everything after is arithmetic on
    // that metadata-sized frame.
    QueryDef("q152_annotator_kappa",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
          col("n_chars"), Text.tokenCount(col("text")).as("n_tok"))
        val annotated = d.select(col("source"),
          when(col("n_chars") >= 150, "keep").otherwise("drop").as("ann_a"),
          when(col("doc_id") % 13 === 2,
            when(col("n_tok") >= 30, "drop").otherwise("keep"))
            .otherwise(when(col("n_tok") >= 30, "keep").otherwise("drop"))
            .as("ann_b"))
        graft.operators.Agreement.cohenKappa(
            annotated, "source", "ann_a", "ann_b")
          .orderBy(col("source"))
      },
      Some("""WITH d AS (SELECT doc_id, source, n_chars,
             |    len(list_filter(string_split_regex(lower(trim(text)),
             |      '\s+'), t -> t <> '')) AS n_tok
             |  FROM documents),
             |ann AS (SELECT source,
             |    CASE WHEN n_chars >= 150 THEN 'keep' ELSE 'drop' END
             |      AS ann_a,
             |    CASE WHEN doc_id % 13 = 2 THEN
             |      CASE WHEN n_tok >= 30 THEN 'drop' ELSE 'keep' END
             |    ELSE
             |      CASE WHEN n_tok >= 30 THEN 'keep' ELSE 'drop' END
             |    END AS ann_b
             |  FROM d),
             |ct AS (SELECT source, ann_a AS a, ann_b AS b, count(*) AS c
             |  FROM ann GROUP BY 1, 2, 3),
             |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
             |    sum(CASE WHEN a = b THEN c ELSE 0 END) AS agree
             |  FROM ct GROUP BY 1),
             |ma AS (SELECT source, a AS cat, sum(c) AS ca
             |  FROM ct GROUP BY 1, 2),
             |mb AS (SELECT source, b AS cat, sum(c) AS cb
             |  FROM ct GROUP BY 1, 2),
             |ch AS (SELECT source, sum(ca * cb) AS sprod
             |  FROM ma JOIN mb USING (source, cat) GROUP BY 1),
             |po AS (SELECT t.source, n,
             |    round(CAST(agree AS DOUBLE) / n, 6) AS po,
             |    round(CAST(sprod AS DOUBLE) / (n * n), 6) AS pe
             |  FROM tot t JOIN ch USING (source))
             |SELECT source, n, po, pe,
             |  round((po - pe) / nullif(1.0 - pe, 0.0), 6) AS kappa
             |FROM po ORDER BY source""".stripMargin)),

    // ---------------------------------------------------------------------
    // q153: weak-supervision label model (Snorkel majority-vote +
    // accuracy-weighted re-vote) — four LFs over documents: a char-length
    // rule and a token-count rule (accurate, abstaining in a middle
    // band), a near-random doc_id-hash LF (weight must land near 0), and
    // an ADVERSARIAL inverted-length LF whose estimated accuracy falls
    // below 1/2 — its weight goes negative, so the weighted re-vote
    // INVERTS its votes back into signal. Votes shuffle twice on doc,
    // once on LF (|LFs|-row weights frame, broadcast back).
    QueryDef("q153_label_model",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
          Text.tokenCount(col("text")).as("n_tok"))
        def lf(name: String, vote: Column) =
          d.select(col("doc_id").as("id"), lit(name).as("lf"),
            vote.cast("int").as("vote"))
        val votes = lf("lf_chars",
            when(col("n_chars") >= 180, 1).when(col("n_chars") < 120, -1)
              .otherwise(0))
          .unionByName(lf("lf_tok",
            when(col("n_tok") >= 28, 1).when(col("n_tok") < 18, -1)
              .otherwise(0)))
          .unionByName(lf("lf_noise",
            when(col("doc_id") % 5 < 3, 1).otherwise(-1)))
          .unionByName(lf("lf_adv",
            when(col("n_chars") >= 150, -1).otherwise(1)))
        graft.operators.LabelModel.weightedVote(votes, "id", "lf", "vote")
          .orderBy(col("id"))
      },
      Some("""WITH d AS (SELECT doc_id, n_chars,
             |    len(list_filter(string_split_regex(lower(trim(text)),
             |      '\s+'), t -> t <> '')) AS n_tok
             |  FROM documents),
             |votes AS (
             |  SELECT doc_id AS id, 'lf_chars' AS lf,
             |    CASE WHEN n_chars >= 180 THEN 1
             |      WHEN n_chars < 120 THEN -1 ELSE 0 END AS vote FROM d
             |  UNION ALL
             |  SELECT doc_id, 'lf_tok',
             |    CASE WHEN n_tok >= 28 THEN 1
             |      WHEN n_tok < 18 THEN -1 ELSE 0 END FROM d
             |  UNION ALL
             |  SELECT doc_id, 'lf_noise',
             |    CASE WHEN doc_id % 5 < 3 THEN 1 ELSE -1 END FROM d
             |  UNION ALL
             |  SELECT doc_id, 'lf_adv',
             |    CASE WHEN n_chars >= 150 THEN -1 ELSE 1 END FROM d),
             |mv AS (SELECT id, CAST(sign(sum(vote)) AS INT) AS mv
             |  FROM votes GROUP BY 1),
             |acc AS (SELECT lf, count(*) AS n_votes,
             |    sum(CASE WHEN vote = mv THEN 1 ELSE 0 END) AS n_agree
             |  FROM votes JOIN mv USING (id)
             |  WHERE vote <> 0 AND mv <> 0 GROUP BY 1),
             |wts AS (SELECT lf,
             |    round(least(greatest(CAST(n_agree AS DOUBLE) / n_votes,
             |      0.01), 0.99), 6) AS a
             |  FROM acc),
             |wts2 AS (SELECT lf, round(ln(a / (1.0 - a)), 6) AS weight
             |  FROM wts)
             |SELECT id,
             |  CAST(sum(CASE WHEN vote <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_votes,
             |  CAST(sign(sum(vote)) AS INT) AS mv,
             |  round(sum(vote * coalesce(weight, 0.0)), 4) AS w_score,
             |  CAST(sign(round(sum(vote * coalesce(weight, 0.0)), 4))
             |    AS INT) AS label
             |FROM votes LEFT JOIN wts2 USING (lf)
             |GROUP BY id ORDER BY id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q154: Benford first-significant-digit audit of order totals per
    // order priority, with a PLANTED fabricated slice: priority '3-MEDIUM'
    // totals are overwritten by a uniform-ish synthetic value (4000 +
    // (key%5000)), exactly the invented-numbers pattern the audit exists
    // to catch — its chi2 must dwarf the organic priorities'. Digit by
    // arithmetic (floor(v/10^floor(log10 v))), one (group, digit)-keyed
    // aggregate, chi2 over the 9-row-per-group frame.
    QueryDef("q154_benford_audit",
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_orderpriority"),
          when(col("o_orderpriority") === "3-MEDIUM",
            lit(4000.0) + (col("o_orderkey") % 5000).cast("double"))
            .otherwise(col("o_totalprice")).as("amount"))
        graft.operators.Benford.firstDigitAudit(
            o, "o_orderpriority", "amount")
          .orderBy(col("o_orderpriority"), col("digit"))
      },
      Some("""WITH o AS (SELECT o_orderpriority,
             |    CASE WHEN o_orderpriority = '3-MEDIUM'
             |      THEN 4000.0 + CAST(o_orderkey % 5000 AS DOUBLE)
             |      ELSE o_totalprice END AS v
             |  FROM orders),
             |cnt AS (SELECT o_orderpriority,
             |    CAST(floor(v / power(10, floor(log10(v)))) AS BIGINT)
             |      AS digit,
             |    count(*) AS n_d
             |  FROM o WHERE v > 0 GROUP BY 1, 2),
             |grid AS (SELECT DISTINCT o_orderpriority, d.digit
             |  FROM cnt CROSS JOIN (SELECT unnest(range(1, 10)) AS digit)
             |    AS d),
             |full_t AS (SELECT g.o_orderpriority, g.digit,
             |    coalesce(n_d, 0) AS n_d
             |  FROM grid g LEFT JOIN cnt USING (o_orderpriority, digit)),
             |st AS (SELECT o_orderpriority, digit, n_d,
             |    sum(n_d) OVER (PARTITION BY o_orderpriority) AS n,
             |    log10(1.0 + 1.0 / digit) AS exp_p_raw
             |  FROM full_t),
             |ct AS (SELECT o_orderpriority, digit, n_d,
             |    round(n_d / n, 6) AS obs_p,
             |    round(exp_p_raw, 6) AS exp_p,
             |    round((n_d - n * exp_p_raw) * (n_d - n * exp_p_raw)
             |      / (n * exp_p_raw), 4) AS contrib
             |  FROM st)
             |SELECT o_orderpriority, digit, n_d, obs_p, exp_p, contrib,
             |  round(sum(contrib) OVER (PARTITION BY o_orderpriority), 4)
             |    AS chi2
             |FROM ct ORDER BY o_orderpriority, digit""".stripMargin)),

    // ---------------------------------------------------------------------
    // q155: Bradley-Terry preference ranking (Hunter 2004 MM, 3
    // iterations) over pairwise doc-quality judgments between sources.
    // Comparisons: docs at id-distance 1 and 7 (the source axis is a
    // doc_id % 20 ring, so step-7 edges make the tournament well
    // connected, gcd(7,20)=1); winner = higher boosted length, with
    // planted boosts on src3 (+500) and src7 (+250) the fitted
    // strengths must recover as ranks 1 and 2. The corpus reduces to
    // (winner, loser) counts in one shuffle; all MM iterations run on
    // the |sources|^2 pair frame. The twin unrolls the same 3
    // iterations, so failing to iterate exactly moves the hash.
    QueryDef("q155_preference_rank",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"),
          col("source"),
          (col("n_chars") + when(col("source") === "src3", 500)
            .when(col("source") === "src7", 250).otherwise(0))
            .as("score"))
        def pairsAt(step: Int) = {
          val a = d.select(col("doc_id").as("id"),
            col("source").as("s1"), col("score").as("sc1"))
          val b = d.select((col("doc_id") - step).as("id"),
            col("source").as("s2"), col("score").as("sc2"))
          a.join(b, Seq("id"))
            .filter(col("s1") =!= col("s2") && col("sc1") =!= col("sc2"))
            .select(when(col("sc1") > col("sc2"), col("s1"))
                .otherwise(col("s2")).as("winner"),
              when(col("sc1") > col("sc2"), col("s2"))
                .otherwise(col("s1")).as("loser"))
        }
        graft.operators.Preference.bradleyTerry(
            pairsAt(1).unionByName(pairsAt(7)), "winner", "loser",
            iters = 3)
          .orderBy(col("rnk"), col("player"))
      },
      Some("""WITH d AS (SELECT doc_id, source,
             |    n_chars + CASE WHEN source = 'src3' THEN 500
             |      WHEN source = 'src7' THEN 250 ELSE 0 END AS score
             |  FROM documents),
             |comp AS (
             |  SELECT CASE WHEN a.score > b.score THEN a.source
             |      ELSE b.source END AS winner,
             |    CASE WHEN a.score > b.score THEN b.source
             |      ELSE a.source END AS loser
             |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
             |  WHERE a.source <> b.source AND a.score <> b.score
             |  UNION ALL
             |  SELECT CASE WHEN a.score > b.score THEN a.source
             |      ELSE b.source END,
             |    CASE WHEN a.score > b.score THEN b.source
             |      ELSE a.source END
             |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 7
             |  WHERE a.source <> b.source AND a.score <> b.score),
             |dd AS (SELECT winner AS p, loser AS q, count(*) AS w
             |  FROM comp GROUP BY 1, 2),
             |sym AS (SELECT p, q, sum(w) AS w FROM (
             |    SELECT p, q, w FROM dd
             |    UNION ALL SELECT q, p, 0 FROM dd) GROUP BY 1, 2),
             |nn AS (SELECT p, q, sum(w) AS n FROM (
             |    SELECT p, q, w FROM sym
             |    UNION ALL SELECT q, p, w FROM sym) GROUP BY 1, 2),
             |ps AS (SELECT sym.p, sym.q, CAST(sym.w AS DOUBLE) AS w,
             |    CAST(nn.n AS DOUBLE) AS n
             |  FROM sym JOIN nn ON sym.p = nn.p AND sym.q = nn.q),
             |wp AS (SELECT p, sum(w) AS wins, sum(n) AS games
             |  FROM ps GROUP BY 1),
             |r0 AS (SELECT p, 1.0 AS pi FROM wp),
             |i1 AS (SELECT ps.p,
             |    max(wp.wins) / sum(ps.n / (ra.pi + rb.pi)) AS pi
             |  FROM ps JOIN r0 ra ON ra.p = ps.p
             |    JOIN r0 rb ON rb.p = ps.q
             |    JOIN wp ON wp.p = ps.p GROUP BY ps.p),
             |i2 AS (SELECT ps.p,
             |    max(wp.wins) / sum(ps.n / (ra.pi + rb.pi)) AS pi
             |  FROM ps JOIN i1 ra ON ra.p = ps.p
             |    JOIN i1 rb ON rb.p = ps.q
             |    JOIN wp ON wp.p = ps.p GROUP BY ps.p),
             |i3 AS (SELECT ps.p,
             |    max(wp.wins) / sum(ps.n / (ra.pi + rb.pi)) AS pi
             |  FROM ps JOIN i2 ra ON ra.p = ps.p
             |    JOIN i2 rb ON rb.p = ps.q
             |    JOIN wp ON wp.p = ps.p GROUP BY ps.p),
             |fin AS (SELECT p, pi / sum(pi) OVER () AS share FROM i3)
             |SELECT f.p AS player, CAST(wp.games AS BIGINT) AS games,
             |  CAST(wp.wins AS BIGINT) AS wins,
             |  round(f.share, 6) AS strength,
             |  dense_rank() OVER (ORDER BY round(f.share, 6) DESC) AS rnk
             |FROM fin f JOIN wp ON wp.p = f.p
             |ORDER BY rnk, player""".stripMargin)),

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
    // q157: two-sample Kolmogorov-Smirnov drift test per event type —
    // the exact, binning-free arbiter next to q149's PSI: even/odd
    // event-id halves of the same feed, with a +6.0 location shift
    // planted on the 'view' current slice. Only 'view' may reject at
    // the 5% Smirnov critical value; the untouched types measure the
    // sampling-noise floor of D. ECDFs ride one type-partitioned
    // prefix window over DISTINCT values (ties pre-collapsed).
    QueryDef("q157_ks_drift",
      (s, dir) => {
        val e = t(s, dir, "events")
        val base = e.filter(col("event_id") % 2 === 0)
          .select(col("event_type"), col("value"))
        val cur = e.filter(col("event_id") % 2 === 1)
          .select(col("event_type"),
            (col("value") + when(col("event_type") === "view", 6.0)
              .otherwise(0.0)).as("value"))
        graft.operators.Drift.ksTest(base, cur, "event_type", "value")
          .orderBy(col("event_type"))
      },
      Some("""WITH base AS (SELECT event_type, value AS v FROM events
             |  WHERE event_id % 2 = 0),
             |cur AS (SELECT event_type,
             |    value + CASE WHEN event_type = 'view' THEN 6.0
             |      ELSE 0.0 END AS v
             |  FROM events WHERE event_id % 2 = 1),
             |u AS (SELECT event_type, v, 1 AS b, 0 AS c FROM base
             |  UNION ALL SELECT event_type, v, 0, 1 FROM cur),
             |pv AS (SELECT event_type, v, sum(b) AS nb, sum(c) AS nc
             |  FROM u GROUP BY 1, 2),
             |cum AS (SELECT event_type,
             |    sum(nb) OVER (PARTITION BY event_type) AS n_base,
             |    sum(nc) OVER (PARTITION BY event_type) AS n_cur,
             |    sum(nb) OVER w AS cb, sum(nc) OVER w AS cc
             |  FROM pv WINDOW w AS (PARTITION BY event_type ORDER BY v
             |    ROWS UNBOUNDED PRECEDING)),
             |d AS (SELECT event_type,
             |    any_value(n_base) AS n_base, any_value(n_cur) AS n_cur,
             |    max(abs(CAST(cb AS DOUBLE) / n_base
             |      - CAST(cc AS DOUBLE) / n_cur)) AS dd
             |  FROM cum GROUP BY 1)
             |SELECT event_type, CAST(n_base AS BIGINT) AS n_base,
             |  CAST(n_cur AS BIGINT) AS n_cur,
             |  round(dd, 6) AS d_stat,
             |  round(sqrt(CAST(n_base AS DOUBLE) * n_cur
             |    / (n_base + n_cur)) * dd, 4) AS ks_stat,
             |  sqrt(CAST(n_base AS DOUBLE) * n_cur
             |    / (n_base + n_cur)) * dd > 1.358 AS reject_05
             |FROM d ORDER BY event_type""".stripMargin)),

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
    // q159: winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003,
    // MOSS) + shared-fingerprint near-dup pairs. Planted copies with a
    // shifted prefix (every 97th doc, re-id'd +1e6) exercise the
    // paper's guarantee: any shared substring >= w+k-1 = 8 chars
    // yields an identical selected fingerprint in both docs, so every
    // planted pair MUST surface despite the offset — the property
    // fixed-stride sampling lacks. Selection is ONE sliding-window
    // rightmost-argmin (min over struct(hash, -pos), w-row frame) —
    // no w-fold blowup; the pair join is df-capped (<= 64 docs per
    // fingerprint) so no hot gram goes quadratic. md5 gram hash for
    // engine parity (prod swaps xxhash64; logic is hash-agnostic).
    QueryDef("q159_winnow_pairs",
      (s, dir) => {
        val d0 = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val planted = d0.filter(col("doc_id") % 97 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(lit("COPIED WITH A SHIFTED PREFIX >> "), col("text"))
              .as("text"))
        val fps = graft.operators.Winnow.fingerprints(
          d0.unionByName(planted), "doc_id", "text", k = 5, w = 4)
        graft.operators.Winnow.sharedFingerprintPairs(
            fps, "doc_id", minShared = 8, dfCap = 64)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH d AS (SELECT doc_id, text FROM documents
             |    UNION ALL
             |    SELECT doc_id + 1000000,
             |      'COPIED WITH A SHIFTED PREFIX >> ' || text
             |    FROM documents WHERE doc_id % 97 = 0),
             |dd AS (SELECT doc_id, text AS tx FROM d
             |  WHERE length(text) >= 5),
             |g AS (SELECT doc_id, CAST(p AS BIGINT) AS pos,
             |    md5(substring(tx, CAST(p AS INTEGER), 5)) AS h
             |  FROM dd, unnest(range(1, length(tx) - 3)) AS u(p)),
             |r AS (SELECT doc_id, pos, h,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY pos)
             |      AS rn,
             |    min(struct_pack(h := h, np := -pos)) OVER
             |      (PARTITION BY doc_id ORDER BY pos
             |       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel
             |  FROM g),
             |fps AS (SELECT DISTINCT doc_id, sel.h AS fp_hash FROM r
             |  WHERE rn >= 4),
             |keep AS (SELECT fp_hash FROM fps GROUP BY 1
             |  HAVING count(*) <= 64),
             |fc AS (SELECT f.doc_id, f.fp_hash
             |  FROM fps f JOIN keep USING (fp_hash))
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  count(*) AS n_shared
             |FROM fc a JOIN fc b
             |  ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
             |GROUP BY 1, 2 HAVING count(*) >= 8
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---------------------------------------------------------------------
    // q160: template-collapse dedup — mask digit runs to '#', collapse
    // whitespace, hash the template. The planted slice (every 50th
    // doc re-id'd +2e6 as a synthetic receipt whose numbers derive
    // from its id) is EXACT-dedup-invisible — every raw text is
    // distinct — yet collapses to ONE template cluster here, the
    // machine-generated-filler signature that survives q18. Zero
    // joins: one row-local projection + one template-keyed aggregate.
    QueryDef("q160_template_collapse",
      (s, dir) => {
        val d0 = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text"))
        val synth = d0.filter(col("doc_id") % 50 === 1)
          .select((col("doc_id") + 2000000).as("doc_id"),
            lit("gen").as("source"),
            concat(lit("Receipt #"), col("doc_id"), lit(" amount "),
              col("doc_id") % 997, lit(" cents on day "),
              col("doc_id") % 28).as("text"))
        graft.operators.Dedup.templateCollapse(
            d0.unionByName(synth), "doc_id", "text", "source",
            minDocs = 2)
          .orderBy(col("n_docs").desc, col("template_hash"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 2000000, 'gen',
             |    'Receipt #' || doc_id || ' amount '
             |      || (doc_id % 997) || ' cents on day '
             |      || (doc_id % 28)
             |  FROM documents WHERE doc_id % 50 = 1),
             |m AS (SELECT doc_id, source,
             |    regexp_replace(regexp_replace(text, '[0-9]+', '#', 'g'),
             |      '\s+', ' ', 'g') AS tmpl
             |  FROM d),
             |c AS (SELECT md5(tmpl) AS template_hash,
             |    count(*) AS n_docs,
             |    count(DISTINCT source) AS n_sources,
             |    min(doc_id) AS exemplar_id,
             |    min(substring(tmpl, 1, 40)) AS template_head
             |  FROM m GROUP BY 1)
             |SELECT * FROM c WHERE n_docs >= 2
             |ORDER BY n_docs DESC, template_hash""".stripMargin)),

    // ---------------------------------------------------------------------
    // q161: vocabulary-saturation audit — Good-Turing frequency-of-
    // frequencies (P0 = N1/N unseen-mass, smoothed r* counts) + Zipf
    // log-log slope over the top-100 words. The keep-crawling-or-
    // saturated signal: one token explode + word-keyed aggregate is
    // the only corpus-sized shuffle; fof is |distinct counts| rows;
    // the Zipf fit reads top-100 via TakeOrdered and regresses 1-row.
    QueryDef("q161_vocab_saturation",
      (s, dir) => graft.operators.Vocab.saturation(
          t(s, dir, "documents"), "text", maxR = 10, zipfTopN = 100)
        .orderBy(col("r")),
      Some("""WITH tok AS (SELECT unnest(list_filter(string_split_regex(
             |    lower(trim(text)), '\s+'), x -> x <> '')) AS word
             |  FROM documents),
             |wc AS (SELECT word, count(*) AS n FROM tok GROUP BY 1),
             |fof AS (SELECT n AS r, count(*) AS n_r FROM wc GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tokens,
             |    count(*) AS vocab,
             |    CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n1
             |  FROM wc),
             |top AS (SELECT n, row_number() OVER (ORDER BY n DESC, word)
             |      AS rank
             |  FROM wc ORDER BY n DESC, word LIMIT 100),
             |zipf AS (SELECT round(regr_slope(ln(n), ln(rank)), 6)
             |    AS zipf_slope FROM top),
             |grid AS (SELECT unnest(range(1, 11)) AS r)
             |SELECT g.r, coalesce(f.n_r, 0) AS n_r,
             |  CASE WHEN coalesce(f.n_r, 0) > 0 AND f1.n_r IS NOT NULL
             |    THEN round((g.r + 1) * CAST(f1.n_r AS DOUBLE) / f.n_r, 6)
             |  END AS r_star,
             |  round(CAST(n1 AS DOUBLE) / n_tokens, 6) AS p0_unseen,
             |  vocab, n_tokens, zipf_slope
             |FROM grid g LEFT JOIN fof f ON f.r = g.r
             |  LEFT JOIN fof f1 ON f1.r = g.r + 1
             |CROSS JOIN tot CROSS JOIN zipf
             |ORDER BY g.r""".stripMargin)),

    // ---------------------------------------------------------------------
    // q162: MMR diversity re-ranking (Carbonell & Goldstein 1998) over
    // ANN candidates — top-12 cosine candidates per query, then 5
    // greedy picks of argmax 0.7·rel − 0.3·max-sim-to-selected. The
    // candidate and pairwise-sim frames stay distributed (bounded
    // |queries|·N²); the inherently sequential per-query greedy runs
    // EXECUTOR-LOCAL per qid via cogroup (round-9 rewrite — nothing
    // query-spanning reaches the driver). The twin unrolls all 5 steps,
    // so a wrong tie-break or a skipped redundancy penalty moves the
    // hash: the top-rel candidate's paraphrase-mates MUST drop.
    QueryDef("q162_mmr_rerank",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), Vec.asDouble(col("embedding")).as("vec"))
          .withColumn("nrm", Vec.norm(col("vec")))
        val q = e.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("qid"), col("vec").as("qvec"),
            col("nrm").as("qnrm"))
        val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("cid"),
            round(Vec.cosineFromParts(Vec.dot(col("qvec"), col("vec")),
              col("qnrm"), col("nrm")), 6).as("rel"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("rel").desc, col("cid").asc)
        val cands = scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 12).drop("rk")
        val withVec = e.select(col("vec_id"), col("vec"), col("nrm"))
        val ca = cands.select(col("qid"), col("cid").as("a"))
          .join(withVec.select(col("vec_id").as("a"),
            col("vec").as("va"), col("nrm").as("na")), Seq("a"))
        val cb = cands.select(col("qid"), col("cid").as("b"))
          .join(withVec.select(col("vec_id").as("b"),
            col("vec").as("vb"), col("nrm").as("nb")), Seq("b"))
        val pair = ca.join(cb, Seq("qid")).filter(col("a") < col("b"))
          .select(col("qid"), col("a"), col("b"),
            round(Vec.cosineFromParts(Vec.dot(col("va"), col("vb")),
              col("na"), col("nb")), 6).as("sim"))
        graft.operators.Rerank.mmr(cands, "qid", "cid", "rel",
            pair, "sim", lambda = 0.7, k = 5)
          .orderBy(col("query_id"), col("sel_rank"))
      },
      Some("""WITH e AS (SELECT vec_id,
             |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |q AS (SELECT vec_id AS qid, v AS qv FROM e
             |  WHERE vec_id % 100 = 0),
             |sc AS (SELECT qid, e.vec_id AS cid,
             |    round(list_cosine_similarity(qv, e.v), 6) AS rel
             |  FROM e, q WHERE e.vec_id <> qid),
             |cand AS (SELECT qid, cid, rel FROM (
             |    SELECT *, row_number() OVER (PARTITION BY qid
             |      ORDER BY rel DESC, cid) AS rk FROM sc)
             |  WHERE rk <= 12),
             |pw AS (SELECT a.qid, a.cid AS ca, b.cid AS cb,
             |    round(list_cosine_similarity(ea.v, eb.v), 6) AS sim
             |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid < b.cid
             |  JOIN e ea ON ea.vec_id = a.cid
             |  JOIN e eb ON eb.vec_id = b.cid),
             |pw2 AS (SELECT qid, ca AS x, cb AS y, sim FROM pw
             |  UNION ALL SELECT qid, cb, ca, sim FROM pw),
             |s1 AS (SELECT qid, cid, rel, score FROM (
             |    SELECT qid, cid, rel, round(0.7 * rel, 7) AS score,
             |      row_number() OVER (PARTITION BY qid
             |        ORDER BY round(0.7 * rel, 7) DESC, cid) AS rk
             |    FROM cand) WHERE rk = 1),
             |c2 AS (SELECT c.qid, c.cid, c.rel, max(w.sim) AS ms
             |  FROM cand c
             |  LEFT JOIN s1 ex ON ex.qid = c.qid AND ex.cid = c.cid
             |  JOIN pw2 w ON w.qid = c.qid AND w.x = c.cid
             |  JOIN s1 s ON s.qid = w.qid AND s.cid = w.y
             |  WHERE ex.cid IS NULL GROUP BY 1, 2, 3),
             |s2 AS (SELECT qid, cid, rel, score FROM (
             |    SELECT qid, cid, rel,
             |      round(0.7 * rel - 0.3 * ms, 7) AS score,
             |      row_number() OVER (PARTITION BY qid
             |        ORDER BY round(0.7 * rel - 0.3 * ms, 7) DESC, cid)
             |        AS rk
             |    FROM c2) WHERE rk = 1),
             |sel2 AS (SELECT qid, cid FROM s1
             |  UNION ALL SELECT qid, cid FROM s2),
             |c3 AS (SELECT c.qid, c.cid, c.rel, max(w.sim) AS ms
             |  FROM cand c
             |  LEFT JOIN sel2 ex ON ex.qid = c.qid AND ex.cid = c.cid
             |  JOIN pw2 w ON w.qid = c.qid AND w.x = c.cid
             |  JOIN sel2 s ON s.qid = w.qid AND s.cid = w.y
             |  WHERE ex.cid IS NULL GROUP BY 1, 2, 3),
             |s3 AS (SELECT qid, cid, rel, score FROM (
             |    SELECT qid, cid, rel,
             |      round(0.7 * rel - 0.3 * ms, 7) AS score,
             |      row_number() OVER (PARTITION BY qid
             |        ORDER BY round(0.7 * rel - 0.3 * ms, 7) DESC, cid)
             |        AS rk
             |    FROM c3) WHERE rk = 1),
             |sel3 AS (SELECT qid, cid FROM sel2
             |  UNION ALL SELECT qid, cid FROM s3),
             |c4 AS (SELECT c.qid, c.cid, c.rel, max(w.sim) AS ms
             |  FROM cand c
             |  LEFT JOIN sel3 ex ON ex.qid = c.qid AND ex.cid = c.cid
             |  JOIN pw2 w ON w.qid = c.qid AND w.x = c.cid
             |  JOIN sel3 s ON s.qid = w.qid AND s.cid = w.y
             |  WHERE ex.cid IS NULL GROUP BY 1, 2, 3),
             |s4 AS (SELECT qid, cid, rel, score FROM (
             |    SELECT qid, cid, rel,
             |      round(0.7 * rel - 0.3 * ms, 7) AS score,
             |      row_number() OVER (PARTITION BY qid
             |        ORDER BY round(0.7 * rel - 0.3 * ms, 7) DESC, cid)
             |        AS rk
             |    FROM c4) WHERE rk = 1),
             |sel4 AS (SELECT qid, cid FROM sel3
             |  UNION ALL SELECT qid, cid FROM s4),
             |c5 AS (SELECT c.qid, c.cid, c.rel, max(w.sim) AS ms
             |  FROM cand c
             |  LEFT JOIN sel4 ex ON ex.qid = c.qid AND ex.cid = c.cid
             |  JOIN pw2 w ON w.qid = c.qid AND w.x = c.cid
             |  JOIN sel4 s ON s.qid = w.qid AND s.cid = w.y
             |  WHERE ex.cid IS NULL GROUP BY 1, 2, 3),
             |s5 AS (SELECT qid, cid, rel, score FROM (
             |    SELECT qid, cid, rel,
             |      round(0.7 * rel - 0.3 * ms, 7) AS score,
             |      row_number() OVER (PARTITION BY qid
             |        ORDER BY round(0.7 * rel - 0.3 * ms, 7) DESC, cid)
             |        AS rk
             |    FROM c5) WHERE rk = 1)
             |SELECT qid AS query_id, 1 AS sel_rank, cid AS cand_id,
             |  rel, score AS mmr_score FROM s1
             |UNION ALL SELECT qid, 2, cid, rel, score FROM s2
             |UNION ALL SELECT qid, 3, cid, rel, score FROM s3
             |UNION ALL SELECT qid, 4, cid, rel, score FROM s4
             |UNION ALL SELECT qid, 5, cid, rel, score FROM s5
             |ORDER BY query_id, sel_rank""".stripMargin)),

    // ---------------------------------------------------------------------
    // q163: split-conformal calibration audit (Papadopoulos 2002; Vovk)
    // — a 6-decimal-frozen OLS fit on the calibration quarter, absolute
    // residuals as nonconformity, per-returnflag q-hat at alpha = 0.1,
    // and empirical test coverage. The planted covariate shift (test
    // prices of the 'R' group scaled 1.35x) MUST collapse that group's
    // coverage below the guarantee band while A/N hold near 0.9 — the
    // model-agnostic drift alarm. The fit is rounded to 6 decimals
    // BEFORE residuals so both engines subtract identical (a, b):
    // conformal absorbs model error by construction, so freezing the
    // fit costs nothing and removes FP-summation hash risk.
    QueryDef("q163_conformal",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_returnflag").as("grp"),
          col("l_quantity").cast("double").as("x"),
          col("l_extendedprice").cast("double").as("y"))
        val cal = li.filter(col("l_orderkey") % 4 === 1)
        val tst = li.filter(col("l_orderkey") % 4 === 2)
          .withColumn("y", when(col("grp") === "R", col("y") * 1.35)
            .otherwise(col("y")))
        val fit = cal.agg(
          round(regr_slope(col("y"), col("x")), 6).as("b"),
          round(regr_intercept(col("y"), col("x")), 6).as("a"))
        def scores(df: org.apache.spark.sql.DataFrame) =
          df.crossJoin(broadcast(fit)).select(col("grp"),
            round(abs(col("y") - (col("a") + col("b") * col("x"))), 6)
              .as("s"))
        graft.operators.Conformal.splitConformal(
            scores(cal), scores(tst), "grp", "s",
            alpha = 0.1, slack = 0.05)
          .orderBy(col("grp"))
      },
      Some("""WITH li AS (SELECT l_orderkey, l_returnflag AS grp,
             |    CAST(l_quantity AS DOUBLE) AS x,
             |    CAST(l_extendedprice AS DOUBLE) AS y
             |  FROM lineitem),
             |cal AS (SELECT * FROM li WHERE l_orderkey % 4 = 1),
             |tst AS (SELECT grp, x,
             |    CASE WHEN grp = 'R' THEN y * 1.35 ELSE y END AS y
             |  FROM li WHERE l_orderkey % 4 = 2),
             |fit AS (SELECT round(regr_slope(y, x), 6) AS b,
             |    round(regr_intercept(y, x), 6) AS a FROM cal),
             |cs AS (SELECT grp, round(abs(y - (a + b * x)), 6) AS s
             |  FROM cal CROSS JOIN fit),
             |ts AS (SELECT grp, round(abs(y - (a + b * x)), 6) AS s
             |  FROM tst CROSS JOIN fit),
             |qh AS (SELECT grp, s AS qhat, n_cal FROM (
             |    SELECT grp, s,
             |      count(*) OVER (PARTITION BY grp) AS n_cal,
             |      row_number() OVER (PARTITION BY grp ORDER BY s)
             |        AS rn
             |    FROM cs)
             |  WHERE rn = least(CAST(ceil((n_cal + 1) * 0.9) AS BIGINT),
             |    n_cal)),
             |cov AS (SELECT t.grp, any_value(n_cal) AS n_cal,
             |    count(*) AS n_test, any_value(qhat) AS qhat,
             |    round(CAST(sum(CASE WHEN t.s <= qhat THEN 1 ELSE 0 END)
             |      AS DOUBLE) / count(*), 6) AS coverage
             |  FROM ts t JOIN qh ON qh.grp = t.grp GROUP BY t.grp)
             |SELECT grp, n_cal, n_test, qhat, coverage,
             |  coverage >= 0.85 AS covered
             |FROM cov ORDER BY grp""".stripMargin)),

    // ---------------------------------------------------------------------
    // q164: reference-based overlap metrics — clipped-precision BLEU-2
    // (Papineni 2002) + ROUGE-1/2 recall (Lin 2004) per (candidate,
    // reference) pair. Candidates: exact copies every 10th doc (BLEU
    // must be exactly 1) and 2/3-token truncations elsewhere (p1 = 1,
    // recall ≈ 2/3, brevity penalty < 1 — the metric split that tells
    // truncation from paraphrase). len cut uses integer ceil
    // ((2n+2) div 3), never a float at an integer boundary.
    QueryDef("q164_text_overlap_eval",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"),
          col("text"), Text.tokens(col("text")).as("tk"))
        val cut = greatest(
          expr("(2 * size(tk) + 2) div 3").cast("int"), lit(1))
        val cand = when(col("doc_id") % 10 === 0, col("text"))
          .otherwise(array_join(slice(col("tk"), lit(1), cut), " "))
        graft.operators.TextEval.bleuRouge(
            d.select(col("doc_id"), cand.as("cand"),
              col("text").as("ref")), "doc_id", "cand", "ref")
          .orderBy(col("id"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)),
             |      '\s+'), x -> x <> '') AS rt
             |  FROM documents),
             |p AS (SELECT doc_id,
             |    CASE WHEN doc_id % 10 = 0 THEN rt
             |      ELSE rt[1:CAST(greatest((2 * len(rt) + 2) // 3, 1)
             |        AS BIGINT)] END AS ct,
             |    rt FROM d),
             |cg1 AS (SELECT doc_id, g, count(*) AS nc FROM
             |  (SELECT doc_id, unnest(ct) AS g FROM p) GROUP BY 1, 2),
             |rg1 AS (SELECT doc_id, g, count(*) AS nr FROM
             |  (SELECT doc_id, unnest(rt) AS g FROM p) GROUP BY 1, 2),
             |cl1 AS (SELECT doc_id, sum(least(nc, nr)) AS clip1
             |  FROM cg1 JOIN rg1 USING (doc_id, g) GROUP BY 1),
             |bg AS (SELECT doc_id,
             |    list_transform(range(1, len(ct)), i ->
             |      ct[CAST(i AS INT)] || ' ' || ct[CAST(i + 1 AS INT)])
             |      AS cg2,
             |    list_transform(range(1, len(rt)), i ->
             |      rt[CAST(i AS INT)] || ' ' || rt[CAST(i + 1 AS INT)])
             |      AS rg2
             |  FROM p),
             |cg2 AS (SELECT doc_id, g, count(*) AS nc FROM
             |  (SELECT doc_id, unnest(cg2) AS g FROM bg) GROUP BY 1, 2),
             |rg2 AS (SELECT doc_id, g, count(*) AS nr FROM
             |  (SELECT doc_id, unnest(rg2) AS g FROM bg) GROUP BY 1, 2),
             |cl2 AS (SELECT doc_id, sum(least(nc, nr)) AS clip2
             |  FROM cg2 JOIN rg2 USING (doc_id, g) GROUP BY 1),
             |fin AS (SELECT p.doc_id AS id,
             |    CAST(len(ct) AS BIGINT) AS len_c,
             |    CAST(len(rt) AS BIGINT) AS len_r,
             |    CASE WHEN len(ct) > 0 THEN
             |      CAST(coalesce(clip1, 0) AS DOUBLE) / len(ct)
             |      ELSE 0.0 END AS p1raw,
             |    CASE WHEN len(ct) > 1 THEN
             |      CAST(coalesce(clip2, 0) AS DOUBLE) / (len(ct) - 1)
             |      ELSE 0.0 END AS p2raw,
             |    CASE WHEN len(rt) > 0 THEN
             |      CAST(coalesce(clip1, 0) AS DOUBLE) / len(rt)
             |      ELSE 0.0 END AS r1raw,
             |    CASE WHEN len(rt) > 1 THEN
             |      CAST(coalesce(clip2, 0) AS DOUBLE) / (len(rt) - 1)
             |      ELSE 0.0 END AS r2raw,
             |    CASE WHEN len(ct) >= len(rt) OR len(ct) = 0 THEN 1.0
             |      ELSE exp(1.0 - CAST(len(rt) AS DOUBLE) / len(ct))
             |      END AS bpraw
             |  FROM p LEFT JOIN cl1 ON cl1.doc_id = p.doc_id
             |  LEFT JOIN cl2 ON cl2.doc_id = p.doc_id)
             |SELECT id, len_c, len_r,
             |  round(p1raw, 6) AS p1, round(p2raw, 6) AS p2,
             |  round(r1raw, 6) AS r1, round(r2raw, 6) AS r2,
             |  round(bpraw, 6) AS bp,
             |  round(CASE WHEN p1raw > 0 AND p2raw > 0
             |    THEN bpraw * exp((ln(p1raw) + ln(p2raw)) / 2)
             |    ELSE 0.0 END, 6) AS bleu2
             |FROM fin ORDER BY id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q165: TextTiling topic segmentation (Hearst 1997, block variant)
    // — adjacent 10-token-block cosine valleys with per-doc
    // mu + 0.5*sigma depth cutoff. Planted two-topic docs (every 25th
    // doc concatenated with the text of doc+7, re-id'd +3e6) carry a
    // real topic seam the depth score must flag; organic docs measure
    // the false-boundary floor. All doc-keyed: token explode, block
    // counts, one shifted self-join for gap dots, |blocks|-row windows.
    QueryDef("q165_texttiling",
      (s, dir) => {
        val base = t(s, dir, "documents").select(col("doc_id"),
          col("text"))
        val planted = base.filter(col("doc_id") % 25 === 0).as("a")
          .join(base.select(col("doc_id").as("bid"),
            col("text").as("btext")).as("b"),
            col("bid") === col("doc_id") + 7)
          .select((col("doc_id") + 3000000).as("doc_id"),
            concat(col("text"), lit(" "), col("btext")).as("text"))
        graft.operators.Segment.textTiling(
            base.unionByName(planted), "doc_id", "text",
            blockTokens = 10)
          .orderBy(col("doc_id"), col("g"))
      },
      Some("""WITH base AS (SELECT doc_id, text FROM documents),
             |aug AS (SELECT doc_id, text FROM base
             |  UNION ALL
             |  SELECT a.doc_id + 3000000, a.text || ' ' || b.text
             |  FROM base a JOIN base b ON b.doc_id = a.doc_id + 7
             |  WHERE a.doc_id % 25 = 0),
             |tl AS (SELECT doc_id, list_filter(string_split_regex(
             |    lower(trim(text)), '\s+'), x -> x <> '') AS toks
             |  FROM aug),
             |tk AS (SELECT doc_id, CAST((i - 1) // 10 AS BIGINT) AS blk,
             |    toks[CAST(i AS INT)] AS tok
             |  FROM tl, unnest(range(1, len(toks) + 1)) AS u(i)),
             |cnt AS (SELECT doc_id, blk, tok, count(*) AS n
             |  FROM tk GROUP BY 1, 2, 3),
             |nrm AS (SELECT doc_id, blk, sum(n * n) AS nrm2
             |  FROM cnt GROUP BY 1, 2),
             |dots AS (SELECT a.doc_id, a.blk AS g, sum(a.n * b.n) AS dot
             |  FROM cnt a JOIN cnt b ON b.doc_id = a.doc_id
             |    AND b.blk = a.blk + 1 AND b.tok = a.tok
             |  GROUP BY 1, 2),
             |gaps AS (SELECT na.doc_id, na.blk AS g,
             |    round(coalesce(dot, 0) / sqrt(na.nrm2 * nb.nrm2), 6)
             |      AS cos
             |  FROM nrm na JOIN nrm nb ON nb.doc_id = na.doc_id
             |    AND nb.blk = na.blk + 1
             |  LEFT JOIN dots d ON d.doc_id = na.doc_id
             |    AND d.g = na.blk),
             |dep AS (SELECT doc_id, g, cos,
             |    round(coalesce(lag(cos) OVER w - cos, 0.0)
             |      + coalesce(lead(cos) OVER w - cos, 0.0), 6) + 0.0
             |      AS depth
             |  FROM gaps WINDOW w AS (PARTITION BY doc_id ORDER BY g))
             |SELECT doc_id, g, cos, depth,
             |  depth > round(avg(depth) OVER d
             |    + 0.5 * stddev_pop(depth) OVER d, 6) AS is_boundary
             |FROM dep WINDOW d AS (PARTITION BY doc_id)
             |ORDER BY doc_id, g""".stripMargin)),

    // ---------------------------------------------------------------------
    // q166: Johnson-Lindenstrauss ±1 projection (Achlioptas 2003) 64→16
    // dims with a cosine-distortion audit over adjacent-id pairs. The
    // sign matrix derives from md5 of the index pair — seedless and
    // engine-portable (the q110/q126 md5-split stance), so the twin
    // reproduces the projection bit-for-bit from SQL. Projection is a
    // pure per-row expression over a literal 16×64 matrix; the audit
    // pair join is id-shifted (linear), summary is a 1-row broadcast.
    QueryDef("q166_jl_distortion",
      (s, dir) => {
        val e = t(s, dir, "embeddings").select(col("vec_id"),
          Vec.asDouble(col("embedding")).as("vec"))
        graft.operators.Project.jlDistortion(e, "vec_id", "vec",
            dOut = 16, dIn = 64)
          .orderBy(col("id_a"))
      },
      Some("""WITH e AS (SELECT vec_id,
             |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |sgn AS (SELECT k, j,
             |    CASE WHEN substring(md5(k || '_' || j), 1, 1)
             |      BETWEEN '0' AND '7' THEN 1 ELSE -1 END AS s
             |  FROM (SELECT unnest(range(0, 16)) AS k),
             |       (SELECT unnest(range(0, 64)) AS j)),
             |el AS (SELECT vec_id, j, v[CAST(j + 1 AS INT)] AS x
             |  FROM e, (SELECT unnest(range(0, 64)) AS j)),
             |pv AS (SELECT vec_id, k, sum(x * s) AS p
             |  FROM el JOIN sgn USING (j) GROUP BY 1, 2),
             |pp AS (SELECT a.vec_id AS id_a, sum(a.p * b.p) AS dd,
             |    sum(a.p * a.p) AS n2a, sum(b.p * b.p) AS n2b
             |  FROM pv a JOIN pv b ON b.vec_id = a.vec_id + 1
             |    AND b.k = a.k
             |  GROUP BY 1),
             |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |    round(list_cosine_similarity(a.v, b.v), 6) AS cos_orig
             |  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1),
             |j AS (SELECT p.id_a, p.id_b, p.cos_orig,
             |    round(pp.dd / sqrt(pp.n2a * pp.n2b), 6) AS cos_proj
             |  FROM pairs p JOIN pp ON pp.id_a = p.id_a),
             |g AS (SELECT id_a, id_b, cos_orig, cos_proj,
             |    round(abs(cos_orig - cos_proj), 6) AS abs_gap FROM j),
             |sm AS (SELECT round(avg(abs_gap), 6) AS mean_gap,
             |    round(max(abs_gap), 6) AS max_gap FROM g)
             |SELECT id_a, id_b, cos_orig, cos_proj, abs_gap,
             |  mean_gap, max_gap
             |FROM g CROSS JOIN sm ORDER BY id_a""".stripMargin)),

    // ---------------------------------------------------------------------
    // q167: cross-source quantile normalization (Bolstad 2003 applied
    // to quality scores) — a planted +40 token-count inflation on
    // src9's scorer must disappear after rank-mapping onto the pooled
    // distribution (equal ranks → equal normalized values across
    // sources). Target index in INTEGER arithmetic (multiply-then-div,
    // no float at an integer boundary); pooled ladder over DISTINCT
    // score values, prefix-summed distributed and looked up through a
    // bucketed equi-join (round-9 rewrite; nothing corpus-derived is
    // broadcast or windowed globally).
    QueryDef("q167_quantile_norm",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"),
          col("source"),
          (Text.tokenCount(col("text"))
            + when(col("source") === "src9", 40).otherwise(0))
            .as("sc"))
        graft.operators.Normalize.quantileNormalize(
            d, "source", "sc", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some("""WITH s AS (SELECT doc_id, source,
             |    CAST(len(list_filter(string_split_regex(
             |      lower(trim(text)), '\s+'), x -> x <> ''))
             |      + CASE WHEN source = 'src9' THEN 40 ELSE 0 END
             |      AS BIGINT) AS score
             |  FROM documents),
             |rk AS (SELECT doc_id, source, score,
             |    rank() OVER (PARTITION BY source ORDER BY score) AS r,
             |    count(*) OVER (PARTITION BY source) AS n_h FROM s),
             |np AS (SELECT count(*) AS n_pool FROM s),
             |dv AS (SELECT score AS pv, count(*) AS c FROM s
             |  GROUP BY 1),
             |cm AS (SELECT pv,
             |    sum(c) OVER (ORDER BY pv ROWS UNBOUNDED PRECEDING)
             |      AS cum_hi,
             |    sum(c) OVER (ORDER BY pv ROWS UNBOUNDED PRECEDING) - c
             |      AS cum_lo
             |  FROM dv),
             |ix AS (SELECT doc_id, source, score,
             |    CASE WHEN n_h = 1 THEN (n_pool + 1) // 2
             |      ELSE ((r - 1) * (n_pool - 1)) // (n_h - 1) + 1 END
             |      AS idx
             |  FROM rk CROSS JOIN np)
             |SELECT doc_id, source, score, cm.pv AS norm_score
             |FROM ix JOIN cm ON ix.idx > cm.cum_lo
             |  AND ix.idx <= cm.cum_hi
             |ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q168: Neyman-optimal stratified sampling allocation (Neyman 1934)
    // vs proportional, 200-row eval budget over sources — src5 carries
    // a planted high-variance metric (doc_id-derived additive noise),
    // so its Neyman allocation must far exceed its proportional one
    // while homogeneous sources shrink. Both allocations apportion by
    // largest remainder over integer micro-weights (the q113 stance) —
    // sums hit 200 exactly, bit-identical across engines.
    QueryDef("q168_neyman_alloc",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("source"),
          (col("n_chars") + when(col("source") === "src5",
            col("doc_id") % 1000).otherwise(0)).as("metric"))
        graft.operators.Mix.neymanAllocation(d, "source", col("metric"),
            sampleBudget = 200L)
          .orderBy(col("source"))
      },
      Some("""WITH d AS (SELECT source,
             |    n_chars + CASE WHEN source = 'src5'
             |      THEN doc_id % 1000 ELSE 0 END AS metric
             |  FROM documents),
             |st AS (SELECT source, count(*) AS n_rows,
             |    round(coalesce(stddev_pop(metric), 0.0), 6) AS sd
             |  FROM d GROUP BY 1),
             |m AS (SELECT source, n_rows, sd,
             |    CAST(round(sd * 1e6, 0) AS BIGINT) * n_rows AS m
             |  FROM st),
             |tot AS (SELECT sum(m) AS mm, sum(n_rows) AS n_total
             |  FROM m),
             |n0 AS (SELECT source, n_rows, sd, m, mm, n_total,
             |    m * 200 // mm AS fl, (m * 200) % mm AS rem
             |  FROM m CROSS JOIN tot),
             |nd AS (SELECT 200 - sum(fl) AS def FROM n0),
             |n1 AS (SELECT source, n_rows, sd, m, mm, n_total,
             |    CAST(fl + CASE WHEN row_number() OVER
             |        (ORDER BY rem DESC, source ASC) <= def
             |      THEN 1 ELSE 0 END
             |      - CASE WHEN row_number() OVER
             |        (ORDER BY rem ASC, source DESC) <= -def
             |      THEN 1 ELSE 0 END AS BIGINT) AS neyman_n
             |  FROM n0 CROSS JOIN nd),
             |p0 AS (SELECT source, n_rows, sd, m, mm, neyman_n,
             |    n_rows * 200 // n_total AS fl,
             |    (n_rows * 200) % n_total AS rem
             |  FROM n1),
             |pd AS (SELECT 200 - sum(fl) AS def FROM p0)
             |SELECT source, n_rows, sd,
             |  round(CAST(m AS DOUBLE) / mm, 6) AS neyman_share,
             |  neyman_n,
             |  CAST(fl + CASE WHEN row_number() OVER
             |      (ORDER BY rem DESC, source ASC) <= def
             |    THEN 1 ELSE 0 END
             |    - CASE WHEN row_number() OVER
             |      (ORDER BY rem ASC, source DESC) <= -def
             |    THEN 1 ELSE 0 END AS BIGINT) AS prop_n
             |FROM p0 CROSS JOIN pd ORDER BY source""".stripMargin)),

    // ---------------------------------------------------------------------
    // q169: Poisson-bootstrap 95% CI for per-source mean token count
    // (Chamandy 2012 — the coordination-free resampling for massive
    // data: independent Poisson(1) weights per (row, replicate) stand
    // in for with-replacement draws). B=200 replicates; the draw is
    // the inverse CDF of an md5 uniform (seedless, engine-portable);
    // replicate means stay INTEGER (num, den) pairs rounded by exact
    // integer HALF_UP, and quantile indices are integer ceil — zero
    // floats at decimal/integer boundaries anywhere in the statistic.
    QueryDef("q169_bootstrap_ci",
      (s, dir) => graft.operators.Bootstrap.poissonMeanCi(
          t(s, dir, "documents").select(col("source"), col("doc_id"),
            col("text")),
          "source", "doc_id", Text.tokenCount(col("text")), b = 200)
        .orderBy(col("source")),
      Some("""WITH basez AS (SELECT source AS g, doc_id AS id,
             |    CAST(len(list_filter(string_split_regex(
             |      lower(trim(text)), '\s+'), x -> x <> '')) AS BIGINT)
             |      AS x
             |  FROM documents),
             |reps AS (SELECT g, id, x, b,
             |    ('0x' || substr(md5(CAST(id AS VARCHAR) || '_'
             |      || CAST(b AS VARCHAR)), 1, 15))::BIGINT % 1000000
             |      AS u
             |  FROM basez, (SELECT unnest(range(0, 200)) AS b)),
             |wt AS (SELECT g, b, x,
             |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
             |      WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
             |      WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
             |      ELSE 6 END AS w
             |  FROM reps),
             |pr AS (SELECT g, b, sum(w * x) AS num, sum(w) AS den
             |  FROM wt GROUP BY 1, 2 HAVING sum(w) > 0),
             |rk AS (SELECT g, b, num, den,
             |    row_number() OVER (PARTITION BY g
             |      ORDER BY CAST(num AS DOUBLE) / den, b) AS rn,
             |    count(*) OVER (PARTITION BY g) AS nb
             |  FROM pr),
             |ci AS (SELECT g,
             |    max(CASE WHEN rn = (25 * nb + 999) // 1000
             |      THEN CAST((num * 2000000 + den) // (den * 2)
             |        AS DOUBLE) / 1e6 END) AS ci_lo,
             |    max(CASE WHEN rn = (975 * nb + 999) // 1000
             |      THEN CAST((num * 2000000 + den) // (den * 2)
             |        AS DOUBLE) / 1e6 END) AS ci_hi
             |  FROM rk GROUP BY 1),
             |ov AS (SELECT g, count(*) AS n_rows, sum(x) AS sx
             |  FROM basez GROUP BY 1)
             |SELECT o.g AS source, CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST((sx * 2000000 + n_rows) // (n_rows * 2) AS DOUBLE)
             |    / 1e6 AS mean,
             |  ci_lo, ci_hi, round(ci_hi - ci_lo, 6) AS ci_width
             |FROM ov o JOIN ci USING (g)
             |ORDER BY source""".stripMargin)),

    // ---------------------------------------------------------------------
    // q170: per-source data cards (Datasheets-for-Datasets reduced to
    // the computable core) — one wide row per source: volume, token
    // length distribution (exact p50/p90 at calibration scale), exact-
    // dup rate (planted copies of every 20th doc make it non-zero),
    // short-doc fraction, dominant language + share. The single frame
    // a mixing planner consumes. One scan → source-keyed aggregate +
    // a (source, lang) top-1 window.
    QueryDef("q170_data_cards",
      (s, dir) => {
        val d0 = t(s, dir, "documents")
        val planted = d0.filter(col("doc_id") % 20 === 3)
          .withColumn("doc_id", col("doc_id") + 4000000)
        graft.operators.DataCard.sourceCards(
            d0.unionByName(planted), "source", "doc_id", "text",
            "lang", shortChars = 150)
          .orderBy(col("source"))
      },
      Some("""WITH d AS (SELECT * FROM documents
             |  UNION ALL SELECT doc_id + 4000000, text, lang, source,
             |    n_chars
             |  FROM documents WHERE doc_id % 20 = 3),
             |base AS (SELECT source, doc_id, lang,
             |    CAST(length(text) AS BIGINT) AS nc,
             |    CAST(len(list_filter(string_split_regex(
             |      lower(trim(text)), '\s+'), x -> x <> '')) AS BIGINT)
             |      AS nt,
             |    md5(text) AS m
             |  FROM d),
             |core AS (SELECT source, count(*) AS n_docs,
             |    sum(nc) AS total_chars,
             |    round(avg(nt), 6) AS mean_tok,
             |    quantile_cont(nt, 0.5) AS p50_tok,
             |    quantile_cont(nt, 0.9) AS p90_tok,
             |    count(DISTINCT m) AS n_distinct_texts,
             |    sum(CASE WHEN nc < 150 THEN 1 ELSE 0 END) AS n_short
             |  FROM base GROUP BY 1),
             |lt AS (SELECT source, lang, count(*) AS ln2 FROM base
             |  GROUP BY 1, 2),
             |top AS (SELECT source, lang AS top_lang, ln2 FROM (
             |    SELECT *, row_number() OVER (PARTITION BY source
             |      ORDER BY ln2 DESC, lang ASC) AS rn FROM lt)
             |  WHERE rn = 1)
             |SELECT c.source, n_docs,
             |  CAST(total_chars AS BIGINT) AS total_chars, mean_tok,
             |  p50_tok, p90_tok, n_distinct_texts,
             |  round(1.0 - CAST(n_distinct_texts AS DOUBLE) / n_docs, 6)
             |    AS dup_rate,
             |  round(CAST(n_short AS DOUBLE) / n_docs, 6) AS pct_short,
             |  top_lang,
             |  round(CAST(ln2 AS DOUBLE) / n_docs, 6) AS top_lang_share
             |FROM core c JOIN top USING (source)
             |ORDER BY source""".stripMargin)),

    // ---------------------------------------------------------------------
    // q171: embedding-space outlier audit — distance of every vector to
    // its LABEL centroid, flagged by the per-label median/MAD rule
    // (q148's robust kernel on a derived geometric feature). Catches
    // the mis-embedded/corrupt/mislabeled vectors a value-level audit
    // can't see; the planted constant-vector corruption (every 83rd id)
    // MUST surface. One centroid aggregate (|labels|×dim, broadcast),
    // one scoring scan, two |labels|-row percentile aggregates.
    QueryDef("q171_embedding_outliers",
      (s, dir) => {
        val e0 = t(s, dir, "embeddings").select(col("vec_id"),
          col("label"), Vec.asDouble(col("embedding")).as("v"))
        val e = e0.select(col("vec_id"), col("label"),
          when(col("vec_id") % 83 === 0,
            expr("transform(v, x -> 0.25d)")).otherwise(col("v"))
            .as("v"))
        val cent = e.groupBy(col("label"))
          .agg(Vec.sumAgg(col("v")).as("sv"), count(lit(1)).as("n"))
          .select(col("label"), expr("transform(sv, x -> x / n)")
            .as("c"))
        val dist = e.join(broadcast(cent), Seq("label"))
          .select(col("label"), col("vec_id"),
            round(sqrt(Vec.l2sq(col("v"), col("c"))), 6).as("dist"))
        graft.operators.Outliers.madOutliers(
            dist, "label", "vec_id", "dist", k = 3.0)
          .orderBy(col("label"), col("vec_id"))
      },
      Some("""WITH e0 AS (SELECT vec_id, label,
             |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |e AS (SELECT vec_id, label,
             |    CASE WHEN vec_id % 83 = 0
             |      THEN list_transform(v, x -> 0.25) ELSE v END AS v
             |  FROM e0),
             |el AS (SELECT vec_id, label, j, v[CAST(j AS INT)] AS x
             |  FROM e, (SELECT unnest(range(1, 65)) AS j)),
             |ct AS (SELECT label, j, sum(x) / count(*) AS c
             |  FROM el GROUP BY 1, 2),
             |d AS (SELECT el.vec_id, el.label,
             |    round(sqrt(sum((el.x - ct.c) * (el.x - ct.c))), 6)
             |      AS dist
             |  FROM el JOIN ct ON ct.label = el.label AND ct.j = el.j
             |  GROUP BY el.vec_id, el.label),
             |med AS (SELECT label, quantile_cont(dist, 0.5) AS m
             |  FROM d GROUP BY 1),
             |ad AS (SELECT d.label, vec_id, dist, abs(dist - m) AS adev,
             |    m FROM d JOIN med USING (label)),
             |mad AS (SELECT label, quantile_cont(adev, 0.5) AS md
             |  FROM ad GROUP BY 1)
             |SELECT a.label, vec_id, dist,
             |  round(m, 6) AS group_median, round(md, 6) AS group_mad,
             |  round(adev / nullif(1.4826 * md, 0.0), 4) AS score
             |FROM ad a JOIN mad USING (label)
             |WHERE round(adev / nullif(1.4826 * md, 0.0), 4) > 3.0
             |ORDER BY label, vec_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q172: CUPED variance-reduced A/B readout (Deng/Xu/Kohavi 2013) —
    // md5-hash arm assignment (seedless, the q110 split stance), pre
    // vs post purchase value per user (calendar halves), a planted
    // +5/purchase treatment uplift, and the pre-period covariate
    // adjustment Y' = Y − θ(X − x̄). The uplift must survive in
    // mean_adj (CUPED is mean-preserving) while var_adj < var_post.
    // θ and x̄ are frozen at 6 decimals before adjusting (the q163
    // frozen-fit stance) so both engines subtract identical constants.
    QueryDef("q172_cuped_ab",
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("user_id"), col("ts"),
            col("value"), col("event_type"))
          .withColumn("arm",
            when(pmod(Text.md5Long(col("user_id").cast("string")),
              lit(2L)) === 0, "ctrl").otherwise("treat"))
        val users = ev.groupBy(col("user_id")).agg(
          first(col("arm")).as("arm"),
          coalesce(sum(when(col("event_type") === "purchase"
            && dayofmonth(col("ts")) <= 15, col("value"))), lit(0.0))
            .as("x"),
          coalesce(sum(when(col("event_type") === "purchase"
            && dayofmonth(col("ts")) > 15,
            col("value") + when(col("arm") === "treat", 5.0)
              .otherwise(0.0))), lit(0.0)).as("y"))
        graft.operators.Experiment.cuped(users, "arm", "x", "y")
          .orderBy(col("arm"))
      },
      Some("""WITH ev AS (SELECT user_id, ts, value, event_type,
             |    CASE WHEN ('0x' || substr(md5(CAST(user_id AS
             |      VARCHAR)), 1, 15))::BIGINT % 2 = 0
             |      THEN 'ctrl' ELSE 'treat' END AS arm
             |  FROM events),
             |pu AS (SELECT user_id, any_value(arm) AS arm,
             |    coalesce(sum(CASE WHEN event_type = 'purchase'
             |      AND day(ts) <= 15 THEN value END), 0.0) AS x,
             |    coalesce(sum(CASE WHEN event_type = 'purchase'
             |      AND day(ts) > 15 THEN value
             |        + CASE WHEN arm = 'treat' THEN 5.0 ELSE 0.0 END
             |      END), 0.0) AS y
             |  FROM ev GROUP BY 1),
             |fit AS (SELECT round(covar_pop(x, y)
             |      / nullif(var_pop(x), 0.0), 6) AS theta,
             |    round(avg(x), 6) AS xbar FROM pu),
             |adj AS (SELECT arm, x, y, y - theta * (x - xbar) AS yadj,
             |    theta FROM pu CROSS JOIN fit),
             |pool AS (SELECT round(1.0 - var_pop(yadj)
             |    / nullif(var_pop(y), 0.0), 6) AS var_reduction
             |  FROM adj)
             |SELECT arm, count(*) AS n_users,
             |  round(avg(x), 6) AS mean_pre,
             |  round(avg(y), 6) AS mean_post,
             |  round(avg(yadj), 6) AS mean_adj,
             |  round(var_pop(y), 6) AS var_post,
             |  round(var_pop(yadj), 6) AS var_adj,
             |  any_value(theta) AS theta, var_reduction
             |FROM adj CROSS JOIN pool
             |GROUP BY arm, var_reduction
             |ORDER BY arm""".stripMargin)),

    // ---------------------------------------------------------------------
    // q173: preference-transitivity audit — majority-direction edges
    // from the q155-style tournament (id-distance 1/7/8 so triads
    // exist on the source ring) plus a PLANTED 3-cycle among synthetic
    // players zA/zB/zC; every fully-connected triad is classified
    // transitive or cyclic (all in-triad out-degrees exactly 1). BT
    // (q155) fits intransitive judges silently — this measures the
    // violations. Corpus reduces to |players|² majority edges in one
    // shuffle; the triad join is arithmetic on that metadata frame.
    QueryDef("q173_preference_cycles",
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents").select(col("doc_id"),
          col("source"),
          (col("n_chars") + when(col("source") === "src3", 500)
            .when(col("source") === "src7", 250).otherwise(0))
            .as("score"))
        def pairsAt(step: Int) = {
          val a = d.select(col("doc_id").as("id"),
            col("source").as("s1"), col("score").as("sc1"))
          val b = d.select((col("doc_id") - step).as("id"),
            col("source").as("s2"), col("score").as("sc2"))
          a.join(b, Seq("id"))
            .filter(col("s1") =!= col("s2") && col("sc1") =!= col("sc2"))
            .select(when(col("sc1") > col("sc2"), col("s1"))
                .otherwise(col("s2")).as("winner"),
              when(col("sc1") > col("sc2"), col("s2"))
                .otherwise(col("s1")).as("loser"))
        }
        val planted = (Seq.fill(3)(("zA", "zB"))
          ++ Seq.fill(3)(("zB", "zC")) ++ Seq.fill(3)(("zC", "zA")))
          .toDF("winner", "loser")
        graft.operators.Preference.cycleAudit(
            pairsAt(1).unionByName(pairsAt(7)).unionByName(pairsAt(8))
              .unionByName(planted), "winner", "loser")
          .orderBy(col("x"), col("y"), col("z"))
      },
      Some("""WITH d AS (SELECT doc_id, source,
             |    n_chars + CASE WHEN source = 'src3' THEN 500
             |      WHEN source = 'src7' THEN 250 ELSE 0 END AS score
             |  FROM documents),
             |comp AS (
             |  SELECT CASE WHEN a.score > b.score THEN a.source
             |      ELSE b.source END AS winner,
             |    CASE WHEN a.score > b.score THEN b.source
             |      ELSE a.source END AS loser
             |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
             |  WHERE a.source <> b.source AND a.score <> b.score
             |  UNION ALL
             |  SELECT CASE WHEN a.score > b.score THEN a.source
             |      ELSE b.source END,
             |    CASE WHEN a.score > b.score THEN b.source
             |      ELSE a.source END
             |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 7
             |  WHERE a.source <> b.source AND a.score <> b.score
             |  UNION ALL
             |  SELECT CASE WHEN a.score > b.score THEN a.source
             |      ELSE b.source END,
             |    CASE WHEN a.score > b.score THEN b.source
             |      ELSE a.source END
             |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 8
             |  WHERE a.source <> b.source AND a.score <> b.score
             |  UNION ALL
             |  SELECT * FROM (VALUES ('zA','zB'),('zA','zB'),
             |    ('zA','zB'),('zB','zC'),('zB','zC'),('zB','zC'),
             |    ('zC','zA'),('zC','zA'),('zC','zA'))
             |    AS t(winner, loser)),
             |dd AS (SELECT winner AS w, loser AS l, count(*) AS n
             |  FROM comp GROUP BY 1, 2),
             |canon AS (SELECT least(w, l) AS a, greatest(w, l) AS b,
             |    sum(CASE WHEN w < l THEN n ELSE 0 END) AS wab,
             |    sum(CASE WHEN w > l THEN n ELSE 0 END) AS wba
             |  FROM dd GROUP BY 1, 2),
             |e AS (SELECT a, b, wab > wba AS fwd FROM canon
             |  WHERE wab <> wba)
             |SELECT e1.x, e1.y, e2.z,
             |  e1.xy AS x_beats_y, e2.yz AS y_beats_z,
             |  e3.xz AS x_beats_z,
             |  (CAST(e1.xy AS INT) + CAST(e3.xz AS INT) = 1)
             |    AND ((1 - CAST(e1.xy AS INT)) + CAST(e2.yz AS INT)
             |      = 1)
             |    AND ((1 - CAST(e2.yz AS INT))
             |      + (1 - CAST(e3.xz AS INT)) = 1) AS cyclic
             |FROM (SELECT a AS x, b AS y, fwd AS xy FROM e) e1
             |JOIN (SELECT a AS y2, b AS z, fwd AS yz FROM e) e2
             |  ON e2.y2 = e1.y
             |JOIN (SELECT a AS x3, b AS z3, fwd AS xz FROM e) e3
             |  ON e3.x3 = e1.x AND e3.z3 = e2.z
             |ORDER BY x, y, z""".stripMargin)),

    // ---------------------------------------------------------------------
    // q174: leave-one-source-out data valuation (the closed-form core
    // of Data-Shapley/datamodels on a linear probe) — refit WITHOUT
    // each source by subtracting its sufficient statistics, score on a
    // held-out split, and price the source by the MSE it saves.
    // src13's x is corrupted with doc_id noise, so dropping it must
    // IMPROVE the held-out fit (delta_mse < 0, helps = false) while
    // healthy sources help. All sums are exact longs; fits freeze at 6
    // decimals; the leave-out refit is subtraction, not a retrain.
    QueryDef("q174_loso_valuation",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"),
          col("source"),
          (Text.tokenCount(col("text"))
            + when(col("source") === "src13", col("doc_id") % 200)
              .otherwise(0)).cast("long").as("x"),
          col("n_chars").cast("long").as("y"))
        val evalSplit = d.filter(col("doc_id") % 7 === 0)
        val train = d.filter(col("doc_id") % 7 =!= 0)
        graft.operators.Valuation.leaveOneGroupOut(
            train, evalSplit, "source", "x", "y")
          .orderBy(col("source"))
      },
      Some("""WITH d AS (SELECT doc_id, source,
             |    CAST(len(list_filter(string_split_regex(
             |        lower(trim(text)), '\s+'), t -> t <> ''))
             |      + CASE WHEN source = 'src13' THEN doc_id % 200
             |        ELSE 0 END AS BIGINT) AS x,
             |    CAST(n_chars AS BIGINT) AS y
             |  FROM documents),
             |tr AS (SELECT * FROM d WHERE doc_id % 7 <> 0),
             |evs AS (SELECT CAST(count(*) AS BIGINT) AS en,
             |    sum(x) AS esx, sum(y) AS esy, sum(x * y) AS esxy,
             |    sum(x * x) AS esxx, sum(y * y) AS esyy
             |  FROM d WHERE doc_id % 7 = 0),
             |pg AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
             |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             |    sum(x * x) AS sxx
             |  FROM tr GROUP BY 1),
             |tot AS (SELECT sum(n) AS tn, sum(sx) AS tsx,
             |    sum(sy) AS tsy, sum(sxy) AS tsxy, sum(sxx) AS tsxx
             |  FROM pg),
             |base AS (SELECT * FROM pg CROSS JOIN tot CROSS JOIN evs),
             |f AS (SELECT *,
             |    round((CAST(tn AS DOUBLE) * tsxy
             |        - CAST(tsx AS DOUBLE) * tsy)
             |      / (CAST(tn AS DOUBLE) * tsxx
             |        - CAST(tsx AS DOUBLE) * tsx), 6) AS bf,
             |    round((CAST(tn - n AS DOUBLE) * (tsxy - sxy)
             |        - CAST(tsx - sx AS DOUBLE) * (tsy - sy))
             |      / (CAST(tn - n AS DOUBLE) * (tsxx - sxx)
             |        - CAST(tsx - sx AS DOUBLE) * (tsx - sx)), 6)
             |      AS slope_wo
             |  FROM base),
             |g AS (SELECT *,
             |    round((tsy - bf * tsx) / tn, 6) AS af,
             |    round(((tsy - sy) - slope_wo * (tsx - sx))
             |      / (tn - n), 6) AS icept_wo
             |  FROM f),
             |h AS (SELECT *,
             |    round((esyy - 2.0 * af * esy - 2.0 * bf * esxy
             |      + 2.0 * af * bf * esx + af * af * en
             |      + bf * bf * esxx) / en, 6) AS mse_full,
             |    round((esyy - 2.0 * icept_wo * esy
             |      - 2.0 * slope_wo * esxy
             |      + 2.0 * icept_wo * slope_wo * esx
             |      + icept_wo * icept_wo * en
             |      + slope_wo * slope_wo * esxx) / en, 6) AS mse_wo
             |  FROM g)
             |SELECT source, n AS n_train, slope_wo, icept_wo,
             |  mse_full, mse_wo,
             |  round(mse_wo - mse_full, 6) AS delta_mse,
             |  round(mse_wo - mse_full, 6) >= 0 AS helps
             |FROM h ORDER BY source""".stripMargin)),

    // ---------------------------------------------------------------------
    // q175: class-balanced weights by effective number of samples (Cui
    // et al. 2019) over the language distribution — between uniform
    // and inverse-frequency: tiny classes get boosted but by their
    // EFFECTIVE count (1−β^n)/(1−β), not their raw inverse, so a
    // 10-doc language doesn't get a 100× noise amplifier. One
    // |classes|-row aggregate + arithmetic.
    QueryDef("q175_class_balance",
      (s, dir) => graft.operators.Mix.classBalancedWeights(
          t(s, dir, "documents"), "lang", beta = 0.999)
        .orderBy(col("lang")),
      Some("""WITH c AS (SELECT lang, count(*) AS n FROM documents
             |  GROUP BY 1),
             |e AS (SELECT lang, n,
             |    -- (1.0 - 0.999) on purpose: the engine-computed
             |    -- subtraction is the same double Spark's lit(1.0 -
             |    -- beta) carries; the literal 0.001 is NOT
             |    (1.0 - pow(0.999, n)) / (1.0 - 0.999) AS en
             |  FROM c),
             |z AS (SELECT sum(1.0 / en) AS z, count(*) AS k FROM e)
             |SELECT lang, n, round(en, 4) AS eff_n,
             |  round((1.0 / en) * k / z, 6) AS weight
             |FROM e CROSS JOIN z ORDER BY lang""".stripMargin)),

    // ---------------------------------------------------------------------
    // q176: selection gain/lift table — decile view of a quality
    // scorer against a (noisily score-correlated, md5-derived) gold
    // label: top deciles must show lift > 1 and concentrated gain,
    // bottom deciles < 1. The budget-bound complement to q123's
    // threshold-free calibration. ntile over a TOTAL order is
    // engine-identical; all rates are integer ratios.
    QueryDef("q176_selection_gain",
      (s, dir) => {
        val scored = t(s, dir, "documents").select(col("doc_id"),
          col("n_chars").as("score"),
          ((col("n_chars") + pmod(Text.md5Long(
            col("doc_id").cast("string")), lit(100L))) > 350)
            .cast("int").as("label"))
        graft.operators.Lift.gainTable(scored, "doc_id", "score",
            "label", buckets = 10)
          .orderBy(col("bucket"))
      },
      Some("""WITH sc AS (SELECT doc_id, n_chars AS score,
             |    CASE WHEN n_chars + (('0x' || substr(md5(CAST(doc_id
             |      AS VARCHAR)), 1, 15))::BIGINT % 100) > 350
             |      THEN 1 ELSE 0 END AS pos
             |  FROM documents),
             |b AS (SELECT doc_id, pos,
             |    ntile(10) OVER (ORDER BY score DESC, doc_id) AS bucket
             |  FROM sc),
             |per AS (SELECT bucket, count(*) AS n_rows,
             |    CAST(sum(pos) AS BIGINT) AS n_pos
             |  FROM b GROUP BY 1),
             |tot AS (SELECT sum(n_rows) AS tn, sum(n_pos) AS tp
             |  FROM per),
             |cum AS (SELECT bucket, n_rows, n_pos, tn, tp,
             |    CAST(sum(n_pos) OVER (ORDER BY bucket
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
             |  FROM per CROSS JOIN tot)
             |SELECT bucket, n_rows, n_pos,
             |  round(CAST(n_pos AS DOUBLE) / n_rows, 6) AS pos_rate,
             |  cum_pos,
             |  round(CAST(cum_pos AS DOUBLE) / tp, 6) AS gain,
             |  round((CAST(n_pos AS DOUBLE) / n_rows)
             |    / (CAST(tp AS DOUBLE) / tn), 6) AS lift
             |FROM cum ORDER BY bucket""".stripMargin)),

    // ---------------------------------------------------------------------
    // q177: salted skew-join EXECUTION — the rewrite q139 plans, run:
    // the q139-planted hot key (5% of lineitem collapses onto part 1)
    // joins the part dim through Skew.saltedJoin (fact salt in [0,8),
    // dim replicated 8x, join on (key, salt)). The ORACLE IS THE
    // UNSALTED JOIN: identical group totals pin the rewrite's semantic
    // equivalence — the salt may only route rows, never change them.
    QueryDef("q177_salted_join",
      (s, dir) => {
        val fact = t(s, dir, "lineitem").select(
          when(col("l_orderkey") % 20 === 0, lit(1L))
            .otherwise(col("l_partkey")).cast("long").as("part"),
          col("l_extendedprice"), col("l_discount"),
          col("l_orderkey"), col("l_linenumber"))
        val dim = t(s, dir, "part").select(
          col("p_partkey").cast("long").as("part"), col("p_brand"))
        graft.operators.Skew.saltedJoin(fact, dim, "part",
            xxhash64(col("l_orderkey"), col("l_linenumber")), 8)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice")
              * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("p_brand"))
      },
      Some("""WITH f AS (SELECT CASE WHEN l_orderkey % 20 = 0 THEN 1
             |    ELSE l_partkey END AS part,
             |    l_extendedprice, l_discount
             |  FROM lineitem)
             |SELECT p_brand, count(*) AS n_items,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2)
             |    AS revenue
             |FROM f JOIN part ON p_partkey = part
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---------------------------------------------------------------------
    // q178: per-document keyword extraction — top-3 smoothed-TF-IDF
    // terms per doc (the q71 corpus statistic turned into the per-doc
    // feature RAG metadata and faceted search need). One token explode
    // feeds both the tf table and the df table; ranking partitions by
    // doc (per-doc vocab-sized windows, never global) on the ROUNDED
    // score with term tie-break.
    QueryDef("q178_keywords",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val tf = d.select(col("doc_id"),
            explode(Text.tokens(col("text"))).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = d.agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(dfreq, Seq("term")).crossJoin(broadcast(n))
          .withColumn("tfidf", round(col("tf")
            * (log((col("n_docs") + 1).cast("double") / (col("df") + 1))
              + 1), 6))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term").asc)
        scored.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("rnk"), col("term"), col("tfidf"))
          .orderBy(col("doc_id"), col("rnk"))
      },
      Some("""WITH tk AS (SELECT doc_id,
             |    unnest(list_filter(string_split_regex(
             |      lower(trim(text)), '\s+'), x -> x <> '')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk
             |  GROUP BY 1, 2),
             |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |nn AS (SELECT count(*) AS n_docs FROM documents),
             |sc AS (SELECT doc_id, term,
             |    round(tf * (ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1))
             |      + 1), 6) AS tfidf
             |  FROM tf JOIN dfq USING (term) CROSS JOIN nn),
             |r AS (SELECT doc_id, term, tfidf, row_number() OVER (
             |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
             |  FROM sc)
             |SELECT doc_id, rnk, term, tfidf FROM r WHERE rnk <= 3
             |ORDER BY doc_id, rnk""".stripMargin)),

    // ---------------------------------------------------------------------
    // q179: language-ID confusion matrix — the marker-vote predictor
    // (q15's lang_pred) audited against the corpus's gold lang column:
    // per (gold, predicted) cell counts and within-gold shares. The
    // eval loop every heuristic classifier in the stack should get;
    // 'und' rows show where the marker lists lack coverage. Reuses the
    // q15 oracle restatement for the predictor, so the twin and the
    // engine share one definition of the classifier.
    QueryDef("q179_langid_confusion",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val prof = graft.operators.TextProfile.profile(d, "doc_id",
          "text").select(col("doc_id"), col("lang_pred"))
        prof.join(d.select(col("doc_id"), col("lang").as("gold")),
            Seq("doc_id"))
          .groupBy(col("gold"), col("lang_pred"))
          .agg(count(lit(1)).as("n"))
          .withColumn("share", round(col("n") / sum(col("n"))
            .over(Window.partitionBy(col("gold"))), 6))
          .withColumn("correct", col("gold") === col("lang_pred"))
          .orderBy(col("gold"), col("lang_pred"))
      },
      Some(s"""WITH prof AS (
              |${docStatsOracle.stripSuffix(" ORDER BY doc_id")}),
              |j AS (SELECT d.lang AS gold, p.lang_pred
              |  FROM prof p JOIN documents d ON d.doc_id = p.doc_id),
              |c AS (SELECT gold, lang_pred, count(*) AS n FROM j
              |  GROUP BY 1, 2)
              |SELECT gold, lang_pred, n,
              |  round(CAST(n AS DOUBLE) / sum(n) OVER
              |    (PARTITION BY gold), 6) AS share,
              |  gold = lang_pred AS correct
              |FROM c ORDER BY gold, lang_pred""".stripMargin)),

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
    // q181: feature-correlation / redundancy audit — pairwise Pearson
    // over the lineitem numerics plus a DERIVED charge column
    // (price·(1+tax)): the derived pair must flag redundant (|r| >
    // 0.8, drop one before modeling) while the organic pairs sit near
    // zero in this corpus. One aggregate row computes all pairs in a
    // single scan; the matrix unpivots via explode.
    QueryDef("q181_feature_corr",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_quantity").cast("double").as("qty"),
          col("l_extendedprice").as("price"),
          col("l_discount").as("disc"),
          (col("l_extendedprice") * (lit(1.0) + col("l_tax")))
            .as("charge"))
        val pairs = Seq(("charge", "disc"), ("charge", "price"),
          ("charge", "qty"), ("disc", "price"), ("disc", "qty"),
          ("price", "qty"))
        val agg = li.agg(
          corr(col(pairs.head._1), col(pairs.head._2))
            .as(s"${pairs.head._1}__${pairs.head._2}"),
          pairs.tail.map { case (a, b) =>
            corr(col(a), col(b)).as(s"${a}__$b") }: _*)
        agg.select(explode(array(pairs.map { case (a, b) =>
            struct(lit(a).as("feat_a"), lit(b).as("feat_b"),
              round(col(s"${a}__$b"), 6).as("r")) }: _*)).as("e"))
          .select(col("e.feat_a").as("feat_a"),
            col("e.feat_b").as("feat_b"), col("e.r").as("r"))
          .withColumn("abs_r", abs(col("r")))
          .withColumn("redundant", abs(col("r")) > 0.8)
          .orderBy(col("feat_a"), col("feat_b"))
      },
      Some("""WITH li AS (SELECT CAST(l_quantity AS DOUBLE) AS qty,
             |    l_extendedprice AS price, l_discount AS disc,
             |    l_extendedprice * (1.0 + l_tax) AS charge
             |  FROM lineitem),
             |c AS (SELECT corr(charge, disc) AS c1,
             |    corr(charge, price) AS c2, corr(charge, qty) AS c3,
             |    corr(disc, price) AS c4, corr(disc, qty) AS c5,
             |    corr(price, qty) AS c6
             |  FROM li),
             |u AS (
             |  SELECT 'charge' AS feat_a, 'disc' AS feat_b,
             |    round(c1, 6) AS r FROM c
             |  UNION ALL SELECT 'charge', 'price', round(c2, 6) FROM c
             |  UNION ALL SELECT 'charge', 'qty', round(c3, 6) FROM c
             |  UNION ALL SELECT 'disc', 'price', round(c4, 6) FROM c
             |  UNION ALL SELECT 'disc', 'qty', round(c5, 6) FROM c
             |  UNION ALL SELECT 'price', 'qty', round(c6, 6) FROM c)
             |SELECT feat_a, feat_b, r, abs(r) AS abs_r,
             |  abs(r) > 0.8 AS redundant
             |FROM u ORDER BY feat_a, feat_b""".stripMargin)),

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
             |ORDER BY from_s, to_s""".stripMargin)),

    // ---------------------------------------------------------------------
    // q183: weight-of-evidence / information-value feature audit
    // (Siddiqi's credit-scoring standard) — order total quintiles
    // against an md5-noised value-correlated label: the WoE ladder
    // must be monotone and IV must land in the strong-predictor band,
    // all without training a model. Laplace-smoothed shares (the
    // Drift.psi convention); ntile over a total order.
    QueryDef("q183_woe_iv",
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_orderkey"),
          col("o_totalprice"),
          ((col("o_totalprice") + pmod(Text.md5Long(
            col("o_orderkey").cast("string")), lit(100000L)))
            > 300000).cast("int").as("label"))
        graft.operators.Lift.woeIv(o, "o_orderkey", "o_totalprice",
            "label", bins = 5)
          .orderBy(col("bin"))
      },
      Some("""WITH o AS (SELECT o_orderkey, o_totalprice,
             |    CASE WHEN o_totalprice + (('0x' || substr(md5(
             |      CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
             |      % 100000) > 300000 THEN 1 ELSE 0 END AS pos
             |  FROM orders),
             |b AS (SELECT o_orderkey, pos, ntile(5) OVER (
             |    ORDER BY o_totalprice, o_orderkey) AS bin FROM o),
             |per AS (SELECT bin, count(*) AS n_rows,
             |    CAST(sum(pos) AS BIGINT) AS n_pos,
             |    count(*) - CAST(sum(pos) AS BIGINT) AS n_neg
             |  FROM b GROUP BY 1),
             |tot AS (SELECT sum(n_pos) AS tp, sum(n_neg) AS tneg
             |  FROM per),
             |sh AS (SELECT bin, n_rows, n_pos,
             |    round((n_pos + 0.5) / (tp + 2.5), 6) AS pos_share,
             |    round((n_neg + 0.5) / (tneg + 2.5), 6) AS neg_share
             |  FROM per CROSS JOIN tot),
             |wv AS (SELECT *,
             |    round(ln(pos_share / neg_share), 6) AS woe
             |  FROM sh),
             |iv AS (SELECT *,
             |    round((pos_share - neg_share) * woe, 6) AS iv_contrib
             |  FROM wv)
             |SELECT bin, n_rows, n_pos, pos_share, neg_share, woe,
             |  iv_contrib,
             |  round(sum(iv_contrib) OVER (), 6) AS iv
             |FROM iv ORDER BY bin""".stripMargin)),

    // ---------------------------------------------------------------------
    // q184: per-source lexical divergence — Jensen-Shannon between each
    // source's unigram distribution and the REST of the corpus (the
    // data-mixing similarity measure; rest-of-corpus so a big source
    // isn't compared against itself). src17 carries planted off-topic
    // vocabulary and must take jsd_rank 1. Laplace smoothing over the
    // global vocab gives shared support; the evaluation frame is
    // |sources|x|vocab|-bounded, never corpus-row-bounded.
    QueryDef("q184_source_divergence",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("source"),
          when(col("source") === "src17", concat(col("text"),
            lit(" quantum flux capacitor tachyon quantum flux")))
            .otherwise(col("text")).as("text"))
        graft.operators.Divergence.sourceJsd(d, "source", "text")
          .orderBy(col("source"))
      },
      Some("""WITH d AS (SELECT source,
             |    CASE WHEN source = 'src17' THEN text ||
             |      ' quantum flux capacitor tachyon quantum flux'
             |      ELSE text END AS text
             |  FROM documents),
             |tok AS (SELECT source AS src,
             |    unnest(list_filter(string_split_regex(
             |      lower(trim(text)), '\s+'), x -> x <> '')) AS w
             |  FROM d),
             |sc AS (SELECT src, w, count(*) AS n_sw FROM tok
             |  GROUP BY 1, 2),
             |gc AS (SELECT w, count(*) AS n_w FROM tok GROUP BY 1),
             |vn AS (SELECT count(*) AS v,
             |    CAST(sum(n_w) AS BIGINT) AS t_all FROM gc),
             |stt AS (SELECT src, CAST(sum(n_sw) AS BIGINT) AS t_s,
             |    count(*) AS n_types FROM sc GROUP BY 1),
             |grid AS (SELECT s2.src, s2.t_s, vn.v, vn.t_all, gc.w,
             |    gc.n_w, coalesce(sc.n_sw, 0) AS n_sw
             |  FROM stt s2 CROSS JOIN vn CROSS JOIN gc
             |  LEFT JOIN sc ON sc.src = s2.src AND sc.w = gc.w),
             |pq AS (SELECT src,
             |    (n_sw + 0.5) / (t_s + v * 0.5) AS p,
             |    ((n_w - n_sw) + 0.5) / ((t_all - t_s) + v * 0.5) AS q
             |  FROM grid),
             |ct AS (SELECT src,
             |    0.5 * p * ln(p / ((p + q) / 2))
             |      + 0.5 * q * ln(q / ((p + q) / 2)) AS c
             |  FROM pq),
             |j AS (SELECT src, round(sum(c), 6) AS jsd FROM ct
             |  GROUP BY 1)
             |SELECT s2.src AS source, t_s AS n_tokens,
             |  CAST(n_types AS BIGINT) AS n_types, jsd,
             |  dense_rank() OVER (ORDER BY jsd DESC) AS jsd_rank
             |FROM stt s2 JOIN j USING (src)
             |ORDER BY source""".stripMargin)),

    // ---------------------------------------------------------------------
    // q185: arrival burstiness (Fano factor) per event type over a
    // DENSE hourly grid (empty buckets included — deriving buckets
    // from observed events silently understates variance). Planted
    // flash crowd: early-days click events tripled, so 'click' must
    // flag bursty (fano >> 1) while organic types sit near Poisson 1.
    // Fully integer-deterministic from exact long aggregates.
    QueryDef("q185_burstiness",
      (s, dir) => {
        val e = t(s, dir, "events")
        val burst = e.filter(col("event_type") === "click"
          && dayofmonth(col("ts")) <= 3)
          .select(col("event_type"), col("ts"))
        val aug = e.select(col("event_type"), col("ts"))
          .unionByName(burst).unionByName(burst)
        graft.operators.Sessionize.burstiness(aug, "event_type", "ts",
            bucketSeconds = 3600L, threshold = 1.5)
          .orderBy(col("event_type"))
      },
      Some("""WITH burst AS (SELECT event_type, ts FROM events
             |  WHERE event_type = 'click' AND day(ts) <= 3),
             |aug AS (SELECT event_type, ts FROM events
             |  UNION ALL SELECT * FROM burst
             |  UNION ALL SELECT * FROM burst),
             |mn AS (SELECT min(epoch_us(ts)) AS t0,
             |    max(epoch_us(ts)) AS t1 FROM aug),
             |c AS (SELECT event_type AS g,
             |    (epoch_us(ts) - t0) // 3600000000 AS h, count(*) AS c
             |  FROM aug CROSS JOIN mn GROUP BY 1, 2),
             |hrs AS (SELECT unnest(range(0,
             |    (t1 - t0) // 3600000000 + 1)) AS h FROM mn),
             |gs AS (SELECT DISTINCT event_type AS g FROM aug),
             |grid AS (SELECT g, h FROM gs CROSS JOIN hrs),
             |f AS (SELECT grid.g, coalesce(c.c, 0) AS c FROM grid
             |  LEFT JOIN c ON c.g = grid.g AND c.h = grid.h),
             |st AS (SELECT g, CAST(count(*) AS BIGINT) AS n_buckets,
             |    CAST(sum(c) AS BIGINT) AS n_events,
             |    CAST(sum(c * c) AS BIGINT) AS s2
             |  FROM f GROUP BY 1)
             |SELECT g AS event_type, n_buckets, n_events,
             |  round(CAST(n_events AS DOUBLE) / n_buckets, 6)
             |    AS mean_per_bucket,
             |  round((CAST(n_buckets AS DOUBLE) * s2
             |    - CAST(n_events AS DOUBLE) * n_events)
             |    / (CAST(n_buckets AS DOUBLE) * n_events), 6) AS fano,
             |  (CAST(n_buckets AS DOUBLE) * s2
             |    - CAST(n_events AS DOUBLE) * n_events)
             |    / (CAST(n_buckets AS DOUBLE) * n_events) > 1.5
             |    AS bursty
             |FROM st ORDER BY event_type""".stripMargin)),

    // ---------------------------------------------------------------------
    // q186: cross-source exact-duplicate matrix — the dedup-PLANNING
    // statistic: for each source pair, how many distinct texts they
    // share and each side's share (a near-1.0 share = mirror; drop or
    // pair-dedup before any corpus-wide sweep). Planted: every 7th doc
    // copied into the next ring source, so (srcK, srcK+1) pairs carry
    // the plant while non-adjacent pairs show only organic repeats.
    // Digest-keyed self-join (md5 map-side, the q90/q140 stance);
    // per-digest fan-out ≤ |sources|².
    QueryDef("q186_cross_source_dups",
      (s, dir) => {
        val d0 = t(s, dir, "documents").select(col("doc_id"),
          col("source"), col("text"))
        val planted = d0.filter(col("doc_id") % 7 === 0)
          .withColumn("source", concat(lit("src"),
            ((col("doc_id") + 1) % 20).cast("string")))
        graft.operators.Dedup.crossSourceDupMatrix(
            d0.unionByName(planted), "source", "text")
          .orderBy(col("source_a"), col("source_b"))
      },
      Some("""WITH d AS (SELECT source, text FROM documents
             |  UNION ALL
             |  SELECT 'src' || CAST((doc_id + 1) % 20 AS VARCHAR), text
             |  FROM documents WHERE doc_id % 7 = 0),
             |ds AS (SELECT DISTINCT md5(text) AS dg, source AS s
             |  FROM d),
             |ps AS (SELECT s, count(*) AS n FROM ds GROUP BY 1),
             |m AS (SELECT a.s AS source_a, b.s AS source_b,
             |    count(*) AS n_shared_texts
             |  FROM ds a JOIN ds b ON a.dg = b.dg AND a.s < b.s
             |  GROUP BY 1, 2)
             |SELECT source_a, source_b, n_shared_texts,
             |  pa.n AS n_a, pb.n AS n_b,
             |  round(CAST(n_shared_texts AS DOUBLE) / pa.n, 6)
             |    AS share_a,
             |  round(CAST(n_shared_texts AS DOUBLE) / pb.n, 6)
             |    AS share_b
             |FROM m JOIN ps pa ON pa.s = source_a
             |  JOIN ps pb ON pb.s = source_b
             |ORDER BY source_a, source_b""".stripMargin)),

    // ---------------------------------------------------------------------
    // q187: dedup threshold-sweep audit — price the near-dup threshold
    // BEFORE the corpus-wide run: per candidate Jaccard threshold, how
    // many docs carry at least one near-dup and the corpus fraction.
    // One q19-cost pair pass feeds every row (candidates are
    // threshold-independent); planted copies (j ≥ 0.8) make the 0.8/0.9
    // rows step while 0.5/0.6 pick up organic template overlap. Raw
    // IEEE doubles compare against the same literals in both engines
    // (the q19 boundary-parity stance).
    QueryDef("q187_dedup_threshold_sweep",
      (s, dir) => {
        val all = plantedNearDups(s, dir, 7)
        graft.operators.Dedup.dedupThresholdSweep(all, "doc_id", "text",
            shingleSize = 3,
            thresholds = Seq(0.5, 0.6, 0.7, 0.8, 0.9))
          .orderBy(col("threshold"))
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 10000, regexp_replace(text, '^\S+\s+', '')
             |  FROM documents WHERE doc_id % 7 = 0),
             |tok AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM all_docs),
             |sh AS (SELECT doc_id,
             |    CASE WHEN len(toks) >= 3
             |         THEN list_distinct(list_transform(range(len(toks) - 2),
             |                i -> array_to_string(toks[i + 1:i + 3], ' ')))
             |         ELSE [array_to_string(toks, ' ')] END AS shingles
             |  FROM tok),
             |posts AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
             |sizes AS (SELECT doc_id, count(*) AS n FROM posts GROUP BY doc_id),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
             |  FROM posts a JOIN posts b
             |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |jac AS (SELECT id_a, id_b,
             |    CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS j
             |  FROM inter
             |  JOIN sizes sa ON sa.doc_id = id_a
             |  JOIN sizes sb ON sb.doc_id = id_b
             |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)
             |    >= 0.5),
             |pd AS (SELECT id, max(j) AS mj FROM (
             |    SELECT id_a AS id, j FROM jac
             |    UNION ALL SELECT id_b, j FROM jac) GROUP BY 1),
             |nt AS (SELECT count(*) AS n_docs FROM all_docs),
             |th AS (SELECT unnest(CAST([0.5, 0.6, 0.7, 0.8, 0.9]
             |    AS DOUBLE[])) AS threshold)
             |SELECT th.threshold,
             |  CAST(coalesce(sum(CASE WHEN pd.mj >= th.threshold
             |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_flagged,
             |  max(nt.n_docs) AS n_docs,
             |  round(CAST(coalesce(sum(CASE WHEN pd.mj >= th.threshold
             |    THEN 1 ELSE 0 END), 0) AS DOUBLE) / max(nt.n_docs), 6)
             |    AS pct_flagged
             |FROM th CROSS JOIN nt LEFT JOIN pd ON true
             |GROUP BY th.threshold
             |ORDER BY th.threshold""".stripMargin)),

    // ---------------------------------------------------------------------
    // q188: skew-cap telemetry for the dedup path — the counters the
    // silent maxDocFreq / maxSourcesPerText caps must surface at 100 TB
    // (a boilerplate explosion shrinks recall with no signal otherwise).
    // A planted corpus-wide boilerplate (every %5 doc's text replaced by
    // one constant string) makes both caps fire deterministically: its
    // shingles' doc-freq (~n/5) blows shingle_cap=20, and the text lands
    // in every source, blowing text_cap=3. One tall (metric, value)
    // frame: the shingle lane's postings/doc-freq rollup plus the
    // cross-source lane's text/pair-suppression rollup.
    QueryDef("q188_dedup_drop_stats",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val planted = d.select(col("doc_id"), col("source"),
          when(col("doc_id") % 5 === 0,
            lit("subscribe to our newsletter for updates and exclusive "
              + "offers available today"))
            .otherwise(col("text")).as("text"))
        Dedup.shingleDropStats(planted, "doc_id", "text",
            shingleSize = 3, maxDocFreq = 20L)
          .unionByName(Dedup.crossSourceDropStats(planted, "source",
            "text", maxSourcesPerText = 3))
          .orderBy(col("metric"))
      },
      Some("""WITH pl AS (SELECT doc_id, source,
             |    CASE WHEN doc_id % 5 = 0 THEN
             |      'subscribe to our newsletter for updates and exclusive offers available today'
             |    ELSE text END AS text
             |  FROM documents),
             |tok AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM pl),
             |sh AS (SELECT doc_id,
             |    CASE WHEN len(toks) >= 3
             |         THEN list_distinct(list_transform(range(len(toks) - 2),
             |                i -> array_to_string(toks[i + 1:i + 3], ' ')))
             |         ELSE [array_to_string(toks, ' ')] END AS shingles
             |  FROM tok),
             |posts AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
             |fr AS (SELECT shingle, count(*) AS df FROM posts GROUP BY 1),
             |shs AS (SELECT
             |    count(*) AS shingles_total,
             |    CAST(sum(CASE WHEN df > 20 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS shingles_dropped,
             |    CAST(sum(df) AS BIGINT) AS postings_total,
             |    CAST(sum(CASE WHEN df > 20 THEN df ELSE 0 END) AS BIGINT)
             |      AS postings_dropped,
             |    max(df) AS doc_freq_max
             |  FROM fr),
             |nsrc AS (SELECT text, count(*) AS ns
             |  FROM (SELECT DISTINCT text, source FROM pl) GROUP BY 1),
             |css AS (SELECT
             |    count(*) AS texts_total,
             |    CAST(sum(CASE WHEN ns > 3 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS texts_dropped,
             |    CAST(sum(CASE WHEN ns > 3 THEN (ns * (ns - 1)) // 2
             |      ELSE 0 END) AS BIGINT) AS pairs_suppressed,
             |    max(ns) AS sources_per_text_max
             |  FROM nsrc)
             |SELECT metric, value FROM (
             |  SELECT 'shingle_cap' AS metric, CAST(20 AS BIGINT) AS value
             |  UNION ALL SELECT 'shingles_total', shingles_total FROM shs
             |  UNION ALL SELECT 'shingles_dropped', shingles_dropped FROM shs
             |  UNION ALL SELECT 'postings_total', postings_total FROM shs
             |  UNION ALL SELECT 'postings_dropped', postings_dropped FROM shs
             |  UNION ALL SELECT 'doc_freq_max', doc_freq_max FROM shs
             |  UNION ALL SELECT 'text_cap', CAST(3 AS BIGINT) FROM css
             |  UNION ALL SELECT 'texts_total', texts_total FROM css
             |  UNION ALL SELECT 'texts_dropped', texts_dropped FROM css
             |  UNION ALL SELECT 'pairs_suppressed', pairs_suppressed FROM css
             |  UNION ALL SELECT 'sources_per_text_max', sources_per_text_max
             |    FROM css)
             |ORDER BY metric""".stripMargin)),

    // ---------------------------------------------------------------------
    // q189: q184's divergence with the WEB-SCALE vocabulary cap on — the
    // top-V heavy-hitter cut (V=24 of the corpus's ~35 words, so the cut
    // fires at every SF) with per-source dropped_tokens/dropped_types
    // telemetry in the q188 style: a cap that drops data must say so.
    // The capped JSD renormalizes totals, type counts and smoothing
    // support to the kept words (a proper distribution over the capped
    // support, not a truncated sum); ties at the cut break to the
    // lexicographically smaller word — a total order, so both engines
    // keep the identical 24 words.
    QueryDef("q189_source_divergence_capped",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("source"),
          when(col("source") === "src17", concat(col("text"),
            lit(" quantum flux capacitor tachyon quantum flux")))
            .otherwise(col("text")).as("text"))
        graft.operators.Divergence.sourceJsd(d, "source", "text",
            maxVocab = Some(24))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (SELECT source,
             |    CASE WHEN source = 'src17' THEN text ||
             |      ' quantum flux capacitor tachyon quantum flux'
             |      ELSE text END AS text
             |  FROM documents),
             |tok AS (SELECT source AS src,
             |    unnest(list_filter(string_split_regex(
             |      lower(trim(text)), '\s+'), x -> x <> '')) AS w
             |  FROM d),
             |sc0 AS (SELECT src, w, count(*) AS n_sw FROM tok
             |  GROUP BY 1, 2),
             |keep AS (SELECT w, n_w FROM (
             |    SELECT w, count(*) AS n_w FROM tok GROUP BY 1)
             |  ORDER BY n_w DESC, w LIMIT 24),
             |sc AS (SELECT sc0.src, sc0.w, sc0.n_sw
             |  FROM sc0 JOIN keep USING (w)),
             |vn AS (SELECT count(*) AS v,
             |    CAST(sum(n_w) AS BIGINT) AS t_all FROM keep),
             |stt AS (SELECT src, CAST(sum(n_sw) AS BIGINT) AS t_s,
             |    count(*) AS n_types FROM sc GROUP BY 1),
             |raw AS (SELECT src, CAST(sum(n_sw) AS BIGINT) AS raw_tokens,
             |    count(*) AS raw_types FROM sc0 GROUP BY 1),
             |grid AS (SELECT s2.src, s2.t_s, vn.v, vn.t_all, keep.w,
             |    keep.n_w, coalesce(sc.n_sw, 0) AS n_sw
             |  FROM stt s2 CROSS JOIN vn CROSS JOIN keep
             |  LEFT JOIN sc ON sc.src = s2.src AND sc.w = keep.w),
             |pq AS (SELECT src,
             |    (n_sw + 0.5) / (t_s + v * 0.5) AS p,
             |    ((n_w - n_sw) + 0.5) / ((t_all - t_s) + v * 0.5) AS q
             |  FROM grid),
             |ct AS (SELECT src,
             |    0.5 * p * ln(p / ((p + q) / 2))
             |      + 0.5 * q * ln(q / ((p + q) / 2)) AS c
             |  FROM pq),
             |j AS (SELECT src, round(sum(c), 6) AS jsd FROM ct
             |  GROUP BY 1)
             |SELECT s2.src AS source, t_s AS n_tokens,
             |  CAST(n_types AS BIGINT) AS n_types, jsd,
             |  raw_tokens - t_s AS dropped_tokens,
             |  CAST(raw_types - n_types AS BIGINT) AS dropped_types,
             |  dense_rank() OVER (ORDER BY jsd DESC) AS jsd_rank
             |FROM stt s2 JOIN j USING (src) JOIN raw USING (src)
             |ORDER BY source""".stripMargin)),

    // ---------------------------------------------------------------------
    // q190: BPE training on the PRODUCTION-SPEED batched path — 4 merges
    // learned at mergeBatch=4 (one driver round collects the top-4 pairs
    // and applies the greedy non-interacting prefix; deferred candidates
    // re-count next round). Batching may legally REORDER merges relative
    // to sequential training (on this corpus the shared-symbol deferral
    // moves one pair to a later round at sf0.001/sf0.1), so the graded
    // surface is the order-independent one the trade actually preserves:
    // the merge TABLE sorted by (weight desc, pair) — set AND recorded
    // weights must equal textbook sequential training's, which the twin
    // restates as q99's unrolled rounds — plus the top-25 vocabulary
    // AFTER all merges apply (order-sensitive through application, so a
    // corpus where deferral stopped commuting would move this hash). A
    // batched set/weight divergence OR an application-order effect fails
    // the gate at any SF.
    QueryDef("q190_bpe_train_batched",
      (s, dir) => {
        import s.implicits._
        val r = graft.operators.BpeTrain.train(
          t(s, dir, "documents"), "text", numMerges = 4, mergeBatch = 4)
        val sortedMerges = r.merges
          .sortBy(mg => (-mg.weight, mg.left, mg.right)).zipWithIndex
          .map { case (mg, i) =>
            (i + 1L, "merge", mg.left, mg.right, mg.weight) }
        val m = sortedMerges.toDF("ord", "kind", "sym_a", "sym_b", "freq")
        val vw = Window.orderBy(col("freq").desc, col("sym").asc)
        val v = r.vocab.withColumn("rk", row_number().over(vw))
          .filter(col("rk") <= 25)
          .select((col("rk") + 100).as("ord"), lit("vocab").as("kind"),
            col("sym").as("sym_a"), lit("").as("sym_b"), col("freq"))
        m.unionByName(v).orderBy(col("ord"))
      },
      Some("""WITH w AS (
             |  SELECT word, count(*) AS cnt FROM (
             |    SELECT unnest(list_filter(
             |      string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '')) AS word
             |    FROM documents)
             |  GROUP BY word),
             |s0 AS (
             |  SELECT regexp_replace(word, '(.)', ' \1 ', 'g') AS s, cnt
             |  FROM w),
             |p1 AS (
             |  SELECT u, v, CAST(sum(cnt) AS BIGINT) AS wt FROM (
             |    SELECT unnest(toks[1:len(toks)-1]) AS u,
             |           unnest(toks[2:len(toks)]) AS v, cnt
             |    FROM (SELECT string_split(trim(s), '  ') AS toks, cnt
             |          FROM s0)
             |    WHERE len(toks) >= 2)
             |  GROUP BY u, v),
             |m1 AS (SELECT u, v, wt FROM p1 ORDER BY wt DESC, u, v LIMIT 1),
             |s1 AS (
             |  SELECT replace(s, ' ' || u || '  ' || v || ' ',
             |    ' ' || u || v || ' ') AS s, cnt
             |  FROM s0 CROSS JOIN m1),
             |p2 AS (
             |  SELECT u, v, CAST(sum(cnt) AS BIGINT) AS wt FROM (
             |    SELECT unnest(toks[1:len(toks)-1]) AS u,
             |           unnest(toks[2:len(toks)]) AS v, cnt
             |    FROM (SELECT string_split(trim(s), '  ') AS toks, cnt
             |          FROM s1)
             |    WHERE len(toks) >= 2)
             |  GROUP BY u, v),
             |m2 AS (SELECT u, v, wt FROM p2 ORDER BY wt DESC, u, v LIMIT 1),
             |s2 AS (
             |  SELECT replace(s, ' ' || u || '  ' || v || ' ',
             |    ' ' || u || v || ' ') AS s, cnt
             |  FROM s1 CROSS JOIN m2),
             |p3 AS (
             |  SELECT u, v, CAST(sum(cnt) AS BIGINT) AS wt FROM (
             |    SELECT unnest(toks[1:len(toks)-1]) AS u,
             |           unnest(toks[2:len(toks)]) AS v, cnt
             |    FROM (SELECT string_split(trim(s), '  ') AS toks, cnt
             |          FROM s2)
             |    WHERE len(toks) >= 2)
             |  GROUP BY u, v),
             |m3 AS (SELECT u, v, wt FROM p3 ORDER BY wt DESC, u, v LIMIT 1),
             |s3 AS (
             |  SELECT replace(s, ' ' || u || '  ' || v || ' ',
             |    ' ' || u || v || ' ') AS s, cnt
             |  FROM s2 CROSS JOIN m3),
             |p4 AS (
             |  SELECT u, v, CAST(sum(cnt) AS BIGINT) AS wt FROM (
             |    SELECT unnest(toks[1:len(toks)-1]) AS u,
             |           unnest(toks[2:len(toks)]) AS v, cnt
             |    FROM (SELECT string_split(trim(s), '  ') AS toks, cnt
             |          FROM s3)
             |    WHERE len(toks) >= 2)
             |  GROUP BY u, v),
             |m4 AS (SELECT u, v, wt FROM p4 ORDER BY wt DESC, u, v LIMIT 1),
             |s4 AS (
             |  SELECT replace(s, ' ' || u || '  ' || v || ' ',
             |    ' ' || u || v || ' ') AS s, cnt
             |  FROM s3 CROSS JOIN m4),
             |mall AS (
             |  SELECT * FROM m1 UNION ALL SELECT * FROM m2
             |  UNION ALL SELECT * FROM m3 UNION ALL SELECT * FROM m4),
             |ordm AS (
             |  SELECT row_number() OVER (ORDER BY wt DESC, u, v) AS ord,
             |    'merge' AS kind, u AS sym_a, v AS sym_b, wt AS freq
             |  FROM mall),
             |vocab AS (
             |  SELECT sym, CAST(sum(cnt) AS BIGINT) AS freq FROM (
             |    SELECT unnest(string_split(trim(s), '  ')) AS sym, cnt
             |    FROM s4)
             |  GROUP BY sym),
             |vtop AS (
             |  SELECT sym, freq,
             |    row_number() OVER (ORDER BY freq DESC, sym) AS rk
             |  FROM vocab QUALIFY rk <= 25)
             |SELECT * FROM (
             |  SELECT ord, kind, sym_a, sym_b, freq FROM ordm
             |  UNION ALL SELECT rk + 100, 'vocab', sym, '', freq FROM vtop)
             |ORDER BY ord""".stripMargin)),

    // ---------------------------------------------------------------------
    // q191: REAL image decode — per-doc PNGs generated on the executors
    // (JDK ImageIO encode, dimensions/channels arithmetic in doc_id), then
    // header-decoded back by Multimodal.decodeImageMeta (ImageIO readers,
    // header-only). The oracle computes the SAME dimensions arithmetically,
    // so the engine passes only by actually parsing the PNG headers it
    // wrote — a fake/fallback decode moves every hash. mapPartitions
    // encode/decode is the per-row projection shape: no shuffle until the
    // final sort.
    QueryDef("q191_image_decode",
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents").select(col("doc_id")).as[Long]
        val media = ids.mapPartitions(_.map { id =>
          val ch = (id % 3) match { case 0 => 1L; case 1 => 3L; case _ => 4L }
          graft.operators.Multimodal.MediaRow(id,
            graft.operators.Multimodal.encodePng(
              ((id % 31) + 1).toInt, ((id % 17) + 1).toInt, ch.toInt))
        })
        graft.operators.Multimodal.decodeMetaBatch(media)
          .select(col("id").as("doc_id"), col("meta.kind").as("kind"),
            col("meta.width").cast("long").as("width"),
            col("meta.height").cast("long").as("height"),
            col("meta.channels").cast("long").as("channels"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, 'image' AS kind,
             |  (doc_id % 31) + 1 AS width,
             |  (doc_id % 17) + 1 AS height,
             |  CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
             |    AS channels
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q192: REAL audio decode — per-doc 16-bit PCM WAVs generated on the
    // executors (javax.sound encode; frame count a multiple of 8 at 8 kHz
    // so the millisecond duration is exact), header-decoded back by
    // Multimodal.decodeAudioMeta. The oracle recomputes channels and
    // duration arithmetically; only a genuine WAV header parse matches.
    QueryDef("q192_audio_decode",
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents").select(col("doc_id")).as[Long]
        val media = ids.mapPartitions(_.map { id =>
          graft.operators.Multimodal.MediaRow(id,
            graft.operators.Multimodal.encodeWav(
              (((id % 50) + 1) * 8).toInt, ((id % 2) + 1).toInt))
        })
        graft.operators.Multimodal.decodeMetaBatch(media)
          .select(col("id").as("doc_id"), col("meta.kind").as("kind"),
            col("meta.channels").cast("long").as("channels"),
            col("meta.durationMs").as("duration_ms"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, 'audio' AS kind,
             |  (doc_id % 2) + 1 AS channels,
             |  (doc_id % 50) + 1 AS duration_ms
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q193: REAL image resize round-trip — per-doc PNGs at (doc_id-derived)
    // source dims, resized by Multimodal.resizeImage (full ImageIO decode ->
    // Graphics2D scale -> PNG re-encode) to doc_id-derived TARGET dims, then
    // header-decoded back. The oracle computes the target dims
    // arithmetically, so a pass-through (source dims), a failed decode
    // (honest None -> kind 'unknown'), or a broken re-encode all move every
    // hash. Per-row projection shape; the codec is the cost, the plan has
    // no shuffle until the final sort.
    QueryDef("q193_image_resize",
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents").select(col("doc_id")).as[Long]
        val resized = ids.mapPartitions(_.map { id =>
          val src = graft.operators.Multimodal.encodePng(
            ((id % 31) + 1).toInt, ((id % 17) + 1).toInt, 4)
          val out = graft.operators.Multimodal.resizeImage(src,
            ((id % 13) + 1).toInt, ((id % 11) + 1).toInt)
          graft.operators.Multimodal.MediaRow(id,
            out.getOrElse(Array.empty[Byte]))
        })
        graft.operators.Multimodal.decodeMetaBatch(resized)
          .select(col("id").as("doc_id"), col("meta.kind").as("kind"),
            col("meta.width").cast("long").as("width"),
            col("meta.height").cast("long").as("height"),
            col("meta.channels").cast("long").as("channels"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, 'image' AS kind,
             |  (doc_id % 13) + 1 AS width,
             |  (doc_id % 11) + 1 AS height,
             |  4 AS channels
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q194: incremental LSH dedup against a PERSISTED index — the q100
    // ingest path with the corpus side actually written once
    // (Dedup.writeLshIndex: bands bucketed by (band,bucket), postings
    // bucketed by id) and probed through the catalog tables
    // (readLshIndex/probeLshIndex): the probe join's index side scans
    // pre-partitioned with NO exchange (LshIndexSpec pins the plan), only
    // the batch shuffles. Same exact-Jaccard oracle as q100 — identical
    // output through a different storage path is the equivalence evidence.
    QueryDef("q194_lsh_index",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val batch = d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_lsh_idx_" +
          java.security.MessageDigest.getInstance("MD5").digest(
            dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        val name = "q194_idx_" + path.takeRight(12)
        Dedup.writeLshIndex(d, "doc_id", "text", path, name,
          shingleSize = 3, numHashes = 64, bands = 16)
        val idx = Dedup.readLshIndex(s, path, name)
        Dedup.probeLshIndex(idx, batch, "doc_id", "text", threshold = 0.7)
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(jaccardOracle.replace(
        "WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7",
        "WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7\n" +
          "  AND id_b >= 10000"))),

    // ---------------------------------------------------------------------
    // q195: UniMax language-budget allocation (Chung et al. 2023) — the
    // waterfilling mixture rule: budget = 80% of one corpus pass, epoch cap
    // 1, so tail languages train their full corpus once and the head
    // language is downsampled to the leftover share. The capped-prefix
    // closed form runs as two |langs|-row windows after ONE domain-keyed
    // aggregate; the oracle replays the identical exact-long waterfill.
    QueryDef("q195_unimax_mix",
      (s, dir) => {
        val d = t(s, dir, "documents")
        Mix.unimax(d, "lang",
            graft.functions.Text.tokenCount(col("text")).cast("long"),
            epochCap = 1L, budget = expr("n_total * 4 div 5"))
          .orderBy(col("lang"))
      },
      Some("""WITH tokc AS (
             |  SELECT lang, len(list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '')) AS n_tok
             |  FROM documents),
             |bylang AS (
             |  SELECT lang, CAST(sum(n_tok) AS BIGINT) AS t
             |  FROM tokc GROUP BY lang),
             |tot AS (
             |  SELECT CAST(sum(t) AS BIGINT) AS n_total,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM bylang),
             |ord AS (
             |  SELECT lang, t, t AS cap, n,
             |    (n_total * 4) // 5 AS b,
             |    CAST(row_number() OVER (ORDER BY t, lang) AS BIGINT) AS i,
             |    CAST(coalesce(sum(t) OVER (ORDER BY t, lang
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS pfx
             |  FROM bylang CROSS JOIN tot),
             |flg AS (
             |  SELECT *, cap * (n - i + 1) <= b - pfx AS capped FROM ord),
             |agg AS (
             |  SELECT
             |    CAST(sum(CASE WHEN capped THEN cap ELSE 0 END) AS BIGINT)
             |      AS cap_sum,
             |    CAST(sum(CASE WHEN capped THEN 0 ELSE 1 END) AS BIGINT)
             |      AS n_uncapped
             |  FROM flg),
             |fin AS (
             |  SELECT lang, t, capped,
             |    CASE WHEN capped THEN CAST(cap AS DOUBLE)
             |         ELSE CAST(b - cap_sum AS DOUBLE) / n_uncapped
             |    END AS alloc_raw
             |  FROM flg CROSS JOIN agg)
             |SELECT lang, t AS n_tokens,
             |  CAST(CASE WHEN capped THEN 1 ELSE 0 END AS BIGINT) AS capped,
             |  round(alloc_raw, 4) AS alloc_tokens,
             |  CASE WHEN t > 0 THEN round(alloc_raw / t, 6) END AS epochs
             |FROM fin ORDER BY lang""".stripMargin)),

    // ---------------------------------------------------------------------
    // q196: SoftDeDup weighting (He et al. 2024) — keep every document,
    // down-weight duplicates: weight = 1/|near-dup cluster| over the q44
    // connected-component closure (singletons stay 1.0). The oracle extends
    // the shared recursive-CC chain with a cluster-size window.
    QueryDef("q196_soft_dedup",
      (s, dir) => {
        val all = plantedNearDups(s, dir, 7)
        val pairs = Dedup.ngramJaccardPairs(all, "doc_id", "text",
          shingleSize = 3, threshold = 0.7)
        Dedup.softDedupWeights(
            all.select(col("doc_id").as("id")), pairs)
          .orderBy(col("id"))
      },
      Some(ccReachCtes7 +
        """,
          |cl AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
          |SELECT id, cluster,
          |  count(*) OVER (PARTITION BY cluster) AS cluster_size,
          |  round(CAST(1 AS DOUBLE)
          |    / count(*) OVER (PARTITION BY cluster), 6) AS weight
          |FROM cl ORDER BY id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q197: distributed logistic regression (2 Newton/IRLS steps, in-plan
    // Cramer solve) — the parametric quality scorer over engineered
    // features (here: token count / 100 and stopword ratio, label =
    // lang == 'en'). Both engines round the gradient/Hessian sums to 6
    // before the solve and beta to 9 after each step, and state the
    // cofactor arithmetic in the identical order, so the fitted
    // coefficients are bit-identical; graded on the per-doc scores AND the
    // coefficients (repeated per row).
    QueryDef("q197_logreg_quality",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val prof = graft.operators.TextProfile.profile(d, "doc_id", "text")
        val feats = prof.join(d.select(col("doc_id"), col("lang")), "doc_id")
        Classify.logisticTrainScore(feats, "doc_id",
            round(col("n_tokens") / 100.0, 6),
            // profile's ratio is unrounded; the operator contract wants
            // 6-dp features (the q15 grading does the same round)
            round(col("stopword_ratio"), 6),
            (col("lang") === "en").cast("int"), iters = 2)
          .orderBy(col("id"))
      },
      Some {
        val stop = Text.StopwordsEn.map(w => s"'$w'").mkString(",")
        val sums = """
          |  SELECT round(sum(y - mu), 6) AS g0,
          |    round(sum(f1 * (y - mu)), 6) AS g1,
          |    round(sum(f2 * (y - mu)), 6) AS g2,
          |    round(sum(mu * (1 - mu)), 6) AS h00,
          |    round(sum(mu * (1 - mu) * f1), 6) AS h01,
          |    round(sum(mu * (1 - mu) * f2), 6) AS h02,
          |    round(sum(mu * (1 - mu) * f1 * f1), 6) AS h11,
          |    round(sum(mu * (1 - mu) * f1 * f2), 6) AS h12,
          |    round(sum(mu * (1 - mu) * f2 * f2), 6) AS h22,
          |    any_value(b0) AS b0, any_value(b1) AS b1,
          |    any_value(b2) AS b2""".stripMargin
        val solve = """
          |  SELECT
          |    round(b0 + (g0*(h11*h22 - h12*h12) - h01*(g1*h22 - h12*g2)
          |      + h02*(g1*h12 - h11*g2))
          |      / (h00*(h11*h22 - h12*h12) - h01*(h01*h22 - h12*h02)
          |      + h02*(h01*h12 - h11*h02)), 9) AS b0,
          |    round(b1 + (h00*(g1*h22 - h12*g2) - g0*(h01*h22 - h12*h02)
          |      + h02*(h01*g2 - g1*h02))
          |      / (h00*(h11*h22 - h12*h12) - h01*(h01*h22 - h12*h02)
          |      + h02*(h01*h12 - h11*h02)), 9) AS b1,
          |    round(b2 + (h00*(h11*g2 - g1*h12) - h01*(h01*g2 - g1*h02)
          |      + g0*(h01*h12 - h11*h02))
          |      / (h00*(h11*h22 - h12*h12) - h01*(h01*h22 - h12*h02)
          |      + h02*(h01*h12 - h11*h02)), 9) AS b2""".stripMargin
        s"""WITH tok AS (
           |  SELECT doc_id, lang,
           |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
           |      t -> t <> '') AS toks
           |  FROM documents),
           |feat AS (
           |  SELECT doc_id,
           |    round(CAST(len(toks) AS DOUBLE) / 100.0, 6) AS f1,
           |    round(CASE WHEN len(toks) > 0
           |      THEN CAST(len(list_filter(toks, t -> t IN ($stop)))
           |        AS DOUBLE) / len(toks) ELSE 0.0 END, 6) AS f2,
           |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE) AS y
           |  FROM tok),
           |it1 AS (
           |  SELECT f.*, b.*,
           |    1.0 / (1.0 + exp(-(b0 + b1 * f1 + b2 * f2))) AS mu
           |  FROM feat f CROSS JOIN
           |    (SELECT CAST(0.001 AS DOUBLE) AS b0, 0.0 AS b1,
           |            0.0 AS b2) b),
           |s1 AS ($sums
           |  FROM it1),
           |bt1 AS ($solve
           |  FROM s1),
           |it2 AS (
           |  SELECT f.*, b.*,
           |    1.0 / (1.0 + exp(-(b0 + b1 * f1 + b2 * f2))) AS mu
           |  FROM feat f CROSS JOIN bt1 b),
           |s2 AS ($sums
           |  FROM it2),
           |bt2 AS ($solve
           |  FROM s2)
           |SELECT doc_id AS id,
           |  round(1.0 / (1.0 + exp(-(b0 + b1 * f1 + b2 * f2))), 6) AS p,
           |  CAST(CASE WHEN (b0 + b1 * f1 + b2 * f2) > 0 THEN 1 ELSE 0 END
           |    AS BIGINT) AS prediction,
           |  b0, b1, b2
           |FROM feat CROSS JOIN bt2 ORDER BY id""".stripMargin
      }),

    // ---------------------------------------------------------------------
    // q198: ROC curve + tie-aware AUC of the heuristic quality score as an
    // English-document detector — the threshold-selection audit run before
    // a quality score becomes a data filter. Mann-Whitney average-rank
    // formula; one row per distinct rounded score with the "keep >=
    // threshold" operating point; auc repeated per row (q-ece convention).
    QueryDef("q198_roc_auc",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val scored = graft.operators.TextProfile.profile(d, "doc_id", "text")
          .join(d.select(col("doc_id"), col("lang")), "doc_id")
          .select(col("quality"), (col("lang") === "en").cast("int").as("y"))
        Classify.rocAuc(scored, "quality", "y")
          .orderBy(col("threshold").desc)
      },
      Some(s"""WITH stats AS (${docStatsNoOrder.replace("\n", "\n  ")}),
              |lab AS (
              |  SELECT round(s.quality, 6) AS threshold,
              |    CAST(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
              |      AS y
              |  FROM stats s JOIN documents d USING (doc_id)),
              |g AS (
              |  SELECT threshold, count(*) AS n, sum(y) AS np
              |  FROM lab GROUP BY threshold),
              |r AS (
              |  SELECT threshold, CAST(n AS BIGINT) AS n,
              |    CAST(np AS BIGINT) AS np,
              |    CAST(coalesce(sum(n) OVER (ORDER BY threshold
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |      AS BIGINT) AS cless,
              |    CAST(sum(np) OVER (ORDER BY threshold DESC
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS BIGINT) AS cum_tp,
              |    CAST(sum(n - np) OVER (ORDER BY threshold DESC
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS BIGINT) AS cum_fp
              |  FROM g),
              |tot AS (
              |  SELECT CAST(sum(np) AS BIGINT) AS n_pos,
              |    CAST(sum(n - np) AS BIGINT) AS n_neg,
              |    sum(CAST(np AS DOUBLE)
              |      * (cless + CAST(n + 1 AS DOUBLE) / 2.0)) AS rank_sum
              |  FROM r)
              |SELECT threshold, n,
              |  round(CAST(cum_tp AS DOUBLE) / n_pos, 6) AS tpr,
              |  round(CAST(cum_fp AS DOUBLE) / n_neg, 6) AS fpr,
              |  round((rank_sum
              |    - CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2.0)
              |    / (CAST(n_pos AS DOUBLE) * n_neg), 6) AS auc
              |FROM r CROSS JOIN tot ORDER BY threshold DESC""".stripMargin)),

    // ---------------------------------------------------------------------
    // q199: token-label mutual information (IR-book §13.5.1 feature
    // selection) — top-25 tokens by MI between document-level presence and
    // lang == 'en'. Postings-shaped token aggregate + a 1-row totals
    // broadcast; the twin restates the identical 4-cell ln arithmetic.
    QueryDef("q199_token_mi",
      (s, dir) => {
        val d = t(s, dir, "documents")
        Classify.tokenMutualInformation(d, "doc_id", "text",
          (col("lang") === "en").cast("int"), k = 25)
      },
      Some("""WITH docs AS (
             |  SELECT doc_id,
             |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
             |      AS y,
             |    list_distinct(list_filter(
             |      string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '')) AS toks
             |  FROM documents),
             |tot AS (
             |  SELECT CAST(count(*) AS BIGINT) AS nn,
             |         CAST(sum(y) AS BIGINT) AS c1
             |  FROM docs),
             |posts AS (SELECT y, unnest(toks) AS token FROM docs),
             |byt AS (
             |  SELECT token, CAST(count(*) AS BIGINT) AS nt,
             |         CAST(sum(y) AS BIGINT) AS a
             |  FROM posts GROUP BY token),
             |mi AS (
             |  SELECT token, nt, a,
             |    round(
             |      (CASE WHEN a > 0 THEN CAST(a AS DOUBLE) / nn
             |        * ln(CAST(nn AS DOUBLE) * a
             |          / (CAST(nt AS DOUBLE) * c1)) ELSE 0.0 END)
             |      + (CASE WHEN nt - a > 0
             |        THEN CAST(nt - a AS DOUBLE) / nn
             |        * ln(CAST(nn AS DOUBLE) * (nt - a)
             |          / (CAST(nt AS DOUBLE) * (nn - c1))) ELSE 0.0 END)
             |      + (CASE WHEN c1 - a > 0
             |        THEN CAST(c1 - a AS DOUBLE) / nn
             |        * ln(CAST(nn AS DOUBLE) * (c1 - a)
             |          / (CAST(nn - nt AS DOUBLE) * c1)) ELSE 0.0 END)
             |      + (CASE WHEN (nn - c1) - (nt - a) > 0
             |        THEN CAST((nn - c1) - (nt - a) AS DOUBLE) / nn
             |        * ln(CAST(nn AS DOUBLE) * ((nn - c1) - (nt - a))
             |          / (CAST(nn - nt AS DOUBLE) * (nn - c1)))
             |        ELSE 0.0 END), 6) AS mi
             |  FROM byt CROSS JOIN tot)
             |SELECT token, nt AS n_docs, a AS n_pos, mi
             |FROM mi ORDER BY mi DESC, token LIMIT 25""".stripMargin)),

    // ---------------------------------------------------------------------
    // q200: the PRODUCTION IVF-PQ operating point, recall-graded — q95's
    // residual IVF-PQ at the parameters its scaladoc prescribes for large
    // corpora (nlist = 64, nprobe = 4 << nlist) with a CORPUS-SIZE-
    // INDEPENDENT query set (vec_id % 25 = 0 AND < 500: the same 20
    // queries at every SF). q95 pins nprobe = nlist so only quantization
    // is under contract; here IVF recall itself is the graded quantity:
    // both engines restate the full pipeline (coarse assign at 64 lists,
    // residual encode, 4-list probe, ADC top-10) AND the exact round-6
    // brute-force truth, and the output is per-query recall@10. The twin
    // recomputes everything from scratch in SQL, so a routing, encode, or
    // scoring divergence shows up as a recall mismatch. This operating
    // point is also the round-12 janino-fallback configuration:
    // PqCodegenSpec asserts the exact plan graded here compiles
    // whole-stage with zero interpreted fallbacks. Expected values: the
    // synthetic embeddings are near-isotropic (no cluster structure for
    // the coarse quantizer to exploit), so measured recall@10 sits at
    // 0.12-0.28 mean across SFs — well above the 4/64 random-routing
    // floor but far below clustered-data recall; the graded contract is
    // the recall COMPUTATION (routing + encode + ADC + truth), with the
    // quality/speed trade owned by (nlist, nprobe) per deployment.
    QueryDef("q200_ivfpq_prod_recall",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), Vec.asDouble(col("embedding")).as("vec"))
        val q = e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
          .select(col("vec_id").as("qid"), col("vec").as("qvec"))
        val model = Similarity.pqTrainResidual(e, "vec_id", "vec",
          m = 8, k = 16, nlist = 64)
        val approx = Similarity.pqTopK(e, "vec_id", "vec", q, "qid", "qvec",
            k = 10, model, nlist = 64, nprobe = 4)
          .select(col("query_id"), col("neighbor_id"))
        // exact truth: brute-force round-6 cosine top-10, q95's tie order
        val c = e.select(col("vec_id").as("neighbor_id"),
          col("vec").as("cvec"), Vec.norm(col("vec")).as("cnrm"))
        val qn = q.select(col("qid").as("query_id"), col("qvec"),
          Vec.norm(col("qvec")).as("qnrm"))
        val scored = c.join(broadcast(qn),
            col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            round(Vec.cosineFromParts(Vec.dot(col("qvec"), col("cvec")),
              col("qnrm"), col("cnrm")), 6).as("cosine"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        val exact = scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("neighbor_id"))
        val hits = exact.join(approx, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
        qn.select(col("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("hits"), lit(0L)).as("hits"),
            round(coalesce(col("hits"), lit(0L)) / 10.0, 4).as("recall"))
          .orderBy(col("query_id"))
      },
      Some(ivfpqRecallOracle)),

    // ---------------------------------------------------------------------
    // q201: the REAL default featurizer (featurize -> imageFeatures),
    // graded through its integer primitive imageHistogram: executor-
    // encoded ARGB PNGs (the q22/q23 fixture) are fully raster-decoded
    // and folded into per-channel 4-bucket value histograms; the twin
    // recomputes every bucket count arithmetically from encodePng's
    // pixel formula p(x,y) = (x*31+y*17)|FF<<24. Exact counts — no float
    // seam — while the normalized float vector divides these counts by
    // n_pixels (the spec pins that equivalence). Non-zero buckets only
    // (the oracle's GROUP BY shape). This retires the last fake code
    // path: fakeFeatures was deleted with this query's landing.
    QueryDef("q201_image_histogram",
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents").select(col("doc_id")).as[Long]
        val hist = ids.mapPartitions(_.map { id =>
          val blob = graft.operators.Multimodal.encodePng(
            ((id % 31) + 1).toInt, ((id % 17) + 1).toInt, 4)
          (id, graft.operators.Multimodal.imageHistogram(blob, 4)
            .getOrElse(Array.empty[Long]))
        }).toDF("doc_id", "hist")
        hist.select(col("doc_id"),
            posexplode(col("hist")).as(Seq("pos", "cnt")))
          .filter(col("cnt") > 0)
          .select(col("doc_id"), (col("pos") / 4).cast("int").as("channel"),
            pmod(col("pos"), lit(4)).cast("int").as("bucket"), col("cnt"))
          .orderBy(col("doc_id"), col("channel"), col("bucket"))
      },
      // channels A,R,G,B; bucket width 64. v = x*31+y*17 <= 1202:
      // A = 255 -> bucket 3; R = (v>>16)&255 = 0 -> bucket 0;
      // G = v//256 <= 4 -> bucket 0; B = v%256 spreads over all buckets.
      Some("""WITH dims AS (
             |  SELECT doc_id, (doc_id % 31) + 1 AS w, (doc_id % 17) + 1 AS h
             |  FROM documents),
             |px AS (
             |  SELECT doc_id, w, h,
             |    unnest(range(0, CAST(w * h AS BIGINT))) AS p
             |  FROM dims),
             |v AS (SELECT doc_id, (p % w) * 31 + (p // w) * 17 AS val
             |      FROM px),
             |comp AS (
             |  SELECT doc_id, 0 AS channel, 3 AS bucket FROM v
             |  UNION ALL SELECT doc_id, 1, 0 FROM v
             |  UNION ALL SELECT doc_id, 2, CAST((val // 256) // 64 AS INT)
             |    FROM v
             |  UNION ALL SELECT doc_id, 3, CAST((val % 256) // 64 AS INT)
             |    FROM v)
             |SELECT doc_id, channel, bucket,
             |  CAST(count(*) AS BIGINT) AS cnt
             |FROM comp GROUP BY doc_id, channel, bucket
             |ORDER BY doc_id, channel, bucket""".stripMargin)),

    // ---------------------------------------------------------------------
    // q202: the STREAMING ingest loop end-to-end under the oracle gate —
    // DocStream.ingestDedupStream (probe -> absorb -> probe) over the
    // persisted q194 index family. Two real Structured Streaming drains
    // against the same checkpoint: batch1 (drop-first-word variants,
    // +10000) is probed against the indexed corpus then ABSORBED; batch2
    // (drop-LAST-word variants, +20000) streams through a RESTARTED query
    // and must pair against the corpus AND batch1's absorbed docs. The
    // combined pair-sink equals the exact-Jaccard closure over
    // corpus ∪ batch1 ∪ batch2 restricted to pairs whose later member is
    // streamed (id_b >= 10000) — a routing, absorb-replay, checkpoint, or
    // rescore defect each moves the set. Pair values are exact-rescored
    // Jaccards, same contract as q194/q100.
    QueryDef("q202_ingest_stream",
      (s, dir) => {
        import graft.streaming.DocStream
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val batch1 = d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
        val batch2 = d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 20000).as("doc_id"),
            regexp_replace(col("text"), "\\s+\\S+$", "").as("text"))
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_q202_" +
          java.security.MessageDigest.getInstance("MD5").digest(
            dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        // deterministic re-runs: the stream's checkpoint, absorb markers,
        // pair sink and index all restart from scratch
        def rm(p: String): Unit = {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(s.sparkContext.hadoopConfiguration)
            .delete(hp, true)
        }
        rm(base)
        val (idxPath, docsDir, outDir, ckpt) = (s"$base/idx",
          s"$base/docs", s"$base/pairs", s"$base/ckpt")
        val name = "q202_idx_" + base.takeRight(12)
        Dedup.writeLshIndex(d, "doc_id", "text", idxPath, name,
          shingleSize = 3, numHashes = 64, bands = 16)
        val idx = Dedup.readLshIndex(s, idxPath, name)
        // drain 1: batch1 lands, is probed, then absorbed
        batch1.coalesce(1).write.mode("append").parquet(docsDir)
        DocStream.ingestDedupStream(s, docsDir, idx, outDir, ckpt,
          threshold = 0.7)
        // drain 2: a RESTART — the checkpoint resumes past batch1's files,
        // and batch2 probes corpus ∪ batch1 through the appended index
        batch2.coalesce(1).write.mode("append").parquet(docsDir)
        DocStream.ingestDedupStream(s, docsDir, idx, outDir, ckpt,
          threshold = 0.7)
        s.read.parquet(outDir)
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(jaccardOracle
        .replace(
          """|  SELECT doc_id + 10000, regexp_replace(text, '^\S+\s+', '')
             |  FROM documents WHERE doc_id % 7 = 0),""".stripMargin,
          """|  SELECT doc_id + 10000, regexp_replace(text, '^\S+\s+', '')
             |  FROM documents WHERE doc_id % 7 = 0
             |  UNION ALL
             |  SELECT doc_id + 20000, regexp_replace(text, '\s+\S+$', '')
             |  FROM documents WHERE doc_id % 7 = 0),""".stripMargin)
        .replace(
          "WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7",
          "WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7\n" +
            "  AND id_b >= 10000"))),

    // ---------------------------------------------------------------------
    // q203: the PERSISTED IVF-PQ ANN index — q200's exact pipeline with
    // the encoded lists actually written once (Similarity.writeAnnIndex:
    // (id, cent_id, codes, rnorm) bucketed by cent_id, model in
    // meta.json) and probed through the catalog table
    // (readAnnIndex/probeAnnIndex): the probe joins the lists
    // pre-partitioned on exactly its key with NO index-side exchange
    // (AnnIndexSpec pins the plan), only the query side shuffles — the
    // q194 storage argument applied to ANN. Identical recall output
    // through the persisted path is the equivalence evidence: the oracle
    // is q200's verbatim (model training, encode, routing, ADC and the
    // brute-forced truth all restated from scratch), so a meta.json
    // round-trip loss, a bucketed-layout slip, or a probe-side scoring
    // divergence each moves the hash.
    QueryDef("q203_ann_index",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), Vec.asDouble(col("embedding")).as("vec"))
        val q = e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
          .select(col("vec_id").as("qid"), col("vec").as("qvec"))
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_ann_idx_" +
          java.security.MessageDigest.getInstance("MD5").digest(
            dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        val name = "q203_idx_" + path.takeRight(12)
        Similarity.writeAnnIndex(e, "vec_id", "vec", path, name,
          m = 8, k = 16, nlist = 64, numBuckets = 16)
        val idx = Similarity.readAnnIndex(s, path, name)
        val approx = Similarity.probeAnnIndex(idx, q, "qid", "qvec",
            k = 10, nprobe = 4)
          .select(col("query_id"), col("neighbor_id"))
        val c = e.select(col("vec_id").as("neighbor_id"),
          col("vec").as("cvec"), Vec.norm(col("vec")).as("cnrm"))
        val qn = q.select(col("qid").as("query_id"), col("qvec"),
          Vec.norm(col("qvec")).as("qnrm"))
        val scored = c.join(broadcast(qn),
            col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            round(Vec.cosineFromParts(Vec.dot(col("qvec"), col("cvec")),
              col("qnrm"), col("cnrm")), 6).as("cosine"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        val exact = scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("neighbor_id"))
        val hits = exact.join(approx, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
        qn.select(col("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("hits"), lit(0L)).as("hits"),
            round(coalesce(col("hits"), lit(0L)) / 10.0, 4).as("recall"))
          .orderBy(col("query_id"))
      },
      // q200's oracle verbatim: the persisted path must land the same
      // per-query recall as the inline pipeline the twin restates
      Some(ivfpqRecallOracle)),

    // ---------------------------------------------------------------------
    // q204: distributed suffix array by prefix doubling (SuffixArray
    // scaladoc; Flick & Aluru SC'15 formulation). Every (doc, pos) suffix
    // gets its dense rank among all suffixes; log2(maxDocLen) sort-shuffle
    // rounds, each one equi-join + one range-partitioned dense-id pass —
    // round count scales with DOCUMENT length, not corpus size. The sampled
    // output still requires the full global ranking to be right. The twin
    // brute-forces the ranking by sorting materialized suffix strings
    // (space-joined token comparison == token-sequence comparison when no
    // token contains whitespace).
    QueryDef("q204_suffix_array",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        SuffixArray.suffixArray(docs, "doc_id", "text")
          .filter(pmod(col("doc_id") * 101 + col("pos"), lit(37)) === 0)
          .orderBy(col("doc_id"), col("pos"))
      },
      Some("""WITH tok AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM documents),
             |sfx AS (SELECT doc_id, i AS pos,
             |    array_to_string(toks[i + 1:], ' ') AS s, toks
             |  FROM tok, unnest(range(len(toks))) AS u(i)),
             |r AS (SELECT doc_id, pos, dense_rank() OVER (ORDER BY s) AS srank,
             |    array_to_string(toks[pos + 1:pos + 4], ' ') AS preview
             |  FROM sfx)
             |SELECT doc_id, pos, srank, preview FROM r
             |WHERE (doc_id * 101 + pos) % 37 = 0
             |ORDER BY doc_id, pos""".stripMargin)),

    // ---------------------------------------------------------------------
    // q205: longest repeated token span (the Lee et al. 2022 ExactSubstr
    // primitive) — binary search over the monotone "some L-window repeats"
    // predicate using exact-L keys from two overlapping rank levels; each
    // probe is one groupBy on derived keys. The twin finds max LCP over
    // adjacent sorted suffixes (the SA theorem) then regroups the
    // LRS-length windows.
    QueryDef("q205_longest_repeated_span",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        SuffixArray.longestRepeatedSpans(docs, "doc_id", "text")
          .orderBy(col("doc_id"), col("pos"))
      },
      Some("""WITH tok AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM documents),
             |sfx AS (SELECT doc_id, i AS pos, toks[i + 1:] AS stoks,
             |    array_to_string(toks[i + 1:], ' ') AS s, len(toks) - i AS rem
             |  FROM tok, unnest(range(len(toks))) AS u(i)),
             |srt AS (SELECT doc_id, pos, stoks, s,
             |    lead(stoks) OVER (ORDER BY s, doc_id, pos) AS ntoks
             |  FROM sfx),
             |lcp AS (SELECT CASE WHEN ntoks IS NULL THEN 0 ELSE
             |    coalesce(nullif(list_position(
             |        list_transform(range(least(len(stoks), len(ntoks))),
             |          x -> stoks[x + 1] = ntoks[x + 1]), false), 0) - 1,
             |      least(len(stoks), len(ntoks))) END AS l
             |  FROM srt),
             |m AS (SELECT max(l) AS lrs FROM lcp),
             |win AS (SELECT doc_id, pos,
             |    array_to_string(stoks[1:(SELECT lrs FROM m)], ' ') AS span
             |  FROM sfx WHERE rem >= (SELECT lrs FROM m)
             |    AND (SELECT lrs FROM m) > 0),
             |rep AS (SELECT span FROM win GROUP BY span HAVING count(*) >= 2)
             |SELECT w.doc_id, w.pos, w.span, (SELECT lrs FROM m) AS lrs
             |FROM win w JOIN rep USING (span)
             |ORDER BY w.doc_id, w.pos""".stripMargin)),

    // ---------------------------------------------------------------------
    // q206: EXACT all-pairs cosine similarity self-join with prefix
    // filtering (Bayardo et al. WWW'07) — the exact counterpart to the
    // MinHash/SimHash approximate family: candidate generation indexes only
    // each document's rarest-terms prefix (Cauchy–Schwarz tail bound), so
    // the common-term postings that square at corpus scale never enter the
    // join; integer-tf verification recovers the exact pair set. The twin
    // is the unpruned inverted-index brute force: Spark returning the same
    // set IS the no-false-negative claim of the pruning. Terms are word
    // 3-gram shingles (tf-weighted): this corpus' 31-word vocabulary makes
    // UNIGRAM vectors pairwise-dense (12.5M overlapping pairs at sf0.1 —
    // no index pruning can save an inherently quadratic candidate space),
    // while the shingle space is sparse, exactly the regime prefix
    // filtering is built for. Threshold 0.65 splits the corpus' bimodal
    // similarity (planted near-dups ≥ 0.8, everything else < 0.5).
    QueryDef("q206_allpairs_cosine",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        AllPairs.cosineJoin(docs, "doc_id", "text", threshold = 0.65,
            ngram = 3)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH tok AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM documents),
             |sh AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
             |    THEN list_transform(range(len(toks) - 2),
             |           i -> array_to_string(toks[i + 1:i + 3], ' '))
             |    ELSE [array_to_string(toks, ' ')] END) AS tk
             |  FROM tok),
             |post AS (SELECT doc_id, tk, count(*) AS tf FROM sh GROUP BY 1, 2),
             |nrm AS (SELECT doc_id, sum(tf * tf) AS n2 FROM post GROUP BY 1),
             |dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    sum(a.tf * b.tf) AS dot
             |  FROM post a JOIN post b ON a.tk = b.tk AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |cos AS (SELECT id_a, id_b,
             |    CAST(dot AS DOUBLE) /
             |      (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS c
             |  FROM dots
             |  JOIN nrm na ON na.doc_id = id_a
             |  JOIN nrm nb ON nb.doc_id = id_b)
             |SELECT id_a, id_b, round(c, 6) AS cosine FROM cos
             |WHERE c >= 0.65
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---------------------------------------------------------------------
    // q207: ExactSubstr dedup coverage (Lee et al. 2022) — per document,
    // the token mass inside some 16-token window occurring ≥ 2 times
    // corpus-wide. The engine side derives repeated windows from the
    // bounded-depth doubling ranks (log2 16 rounds, corpus-size-
    // independent) + one exact-L key groupBy; the twin brute-forces the
    // 16-gram window strings. Covered positions are the interval union of
    // repeated starts (explode ≤ 16 per start, distinct).
    QueryDef("q207_exact_substr",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        SuffixArray.exactSubstrCoverage(docs, "doc_id", "text", length = 16)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM documents),
             |win AS (SELECT doc_id, i AS pos,
             |    array_to_string(toks[i + 1:i + 16], ' ') AS w
             |  FROM tok, unnest(range(len(toks) - 15)) AS u(i)
             |  WHERE len(toks) >= 16),
             |rep AS (SELECT w FROM win GROUP BY w HAVING count(*) >= 2),
             |starts AS (SELECT doc_id, pos FROM win JOIN rep USING (w)),
             |cov AS (SELECT DISTINCT doc_id, pos + j AS cp
             |  FROM starts, unnest(range(16)) AS v(j)),
             |cnt AS (SELECT doc_id, count(*) AS covered_tokens
             |  FROM cov GROUP BY doc_id)
             |SELECT t.doc_id, len(t.toks) AS total_tokens,
             |  coalesce(c.covered_tokens, 0) AS covered_tokens,
             |  round(CAST(coalesce(c.covered_tokens, 0) AS DOUBLE) / len(t.toks), 6)
             |    AS covered_frac
             |FROM tok t LEFT JOIN cnt c USING (doc_id)
             |ORDER BY t.doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q208: self-supervised-prototypes data pruning (Sorscher et al. 2022,
    // "Beyond neural scaling laws"): cluster embeddings with the q77 Lloyd
    // trainer, score each example's prototypicality as its cosine to its
    // assigned centroid, and prune the EASIEST (most prototypical) 20% of
    // each cluster — the abundant-data regime of the paper. Per-cluster
    // frames only (the rank window partitions by cent_id); prune counts in
    // exact integer arithmetic (n*20/100 — the cross-engine floor trap).
    // The twin restates the whole chain: seeds, two Lloyd passes, the
    // per-cluster prototypicality ranking and the cut.
    QueryDef("q208_prototype_prune",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), Vec.asDouble(col("embedding")).as("vec"))
        val hist = graft.operators.Similarity.centroidHistory(
          e, "vec_id", "vec", nlist = 8, iters = 2)
        val scored = e.join(broadcast(hist(2)))
          .select(col("vec_id"), col("cent_id"),
            Vec.cosine(col("vec"), col("cent_vec")).as("sim"))
        val wBest = Window.partitionBy(col("vec_id"))
          .orderBy(col("sim").desc, col("cent_id").asc)
        val kept = scored.withColumn("rk", row_number().over(wBest))
          .filter(col("rk") === 1).drop("rk")
        // per-cluster prototypicality rank: most-similar first
        val wProto = Window.partitionBy(col("cent_id"))
          .orderBy(col("sim").desc, col("vec_id").asc)
        val ranked = kept.withColumn("prank", row_number().over(wProto))
        val sizes = ranked.groupBy(col("cent_id"))
          .agg(count(lit(1)).as("n_members"))
        ranked.join(sizes, Seq("cent_id"))
          // `div`, not `/`: Column./ is DOUBLE division; the prune count
          // must be exact integer floor in both engines
          .withColumn("pruned", col("prank") <= expr("n_members * 20 div 100"))
          .groupBy(col("cent_id"))
          .agg(max(col("n_members")).as("n_members"),
            sum(when(col("pruned"), 1L).otherwise(0L)).as("n_pruned"),
            sum(when(!col("pruned"), 1L).otherwise(0L)).as("n_kept"),
            round(max(when(!col("pruned"), col("sim"))), 6)
              .as("max_kept_sim"),
            round(avg(when(!col("pruned"), col("sim"))), 4)
              .as("kept_avg_sim"))
          .orderBy(col("cent_id"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |seeds AS (
             |  SELECT row_number() OVER (
             |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
             |      AS cent_id, v
             |  FROM (SELECT vec_id, v FROM e
             |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8)),
             |assign0 AS (
             |  SELECT vec_id, e.v AS v, cent_id, row_number() OVER (
             |      PARTITION BY vec_id
             |      ORDER BY list_cosine_similarity(e.v, s.v) DESC, cent_id)
             |      AS rk
             |  FROM e CROSS JOIN seeds s),
             |comp1 AS (
             |  SELECT cent_id, pos, round(avg(val), 6) AS m
             |  FROM (SELECT cent_id, unnest(v) AS val,
             |          generate_subscripts(v, 1) AS pos
             |        FROM assign0 WHERE rk = 1)
             |  GROUP BY cent_id, pos),
             |cents1 AS (
             |  SELECT cent_id, list(m ORDER BY pos) AS cv
             |  FROM comp1 GROUP BY cent_id),
             |assign1 AS (
             |  SELECT vec_id, e.v AS v, c.cent_id, row_number() OVER (
             |      PARTITION BY vec_id
             |      ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cent_id)
             |      AS rk
             |  FROM e CROSS JOIN cents1 c),
             |comp2 AS (
             |  SELECT cent_id, pos, round(avg(val), 6) AS m
             |  FROM (SELECT cent_id, unnest(v) AS val,
             |          generate_subscripts(v, 1) AS pos
             |        FROM assign1 WHERE rk = 1)
             |  GROUP BY cent_id, pos),
             |cents2 AS (
             |  SELECT cent_id, list(m ORDER BY pos) AS cv
             |  FROM comp2 GROUP BY cent_id),
             |fin AS (
             |  SELECT vec_id, c.cent_id,
             |    list_cosine_similarity(e.v, c.cv) AS sim,
             |    row_number() OVER (PARTITION BY vec_id
             |      ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cent_id)
             |      AS rk
             |  FROM e CROSS JOIN cents2 c),
             |kept AS (SELECT vec_id, cent_id, sim FROM fin WHERE rk = 1),
             |ranked AS (
             |  SELECT vec_id, cent_id, sim, row_number() OVER (
             |      PARTITION BY cent_id ORDER BY sim DESC, vec_id ASC)
             |      AS prank
             |  FROM kept),
             |sizes AS (
             |  SELECT cent_id, count(*) AS n_members FROM ranked
             |  GROUP BY cent_id),
             |flagged AS (
             |  SELECT r.*, s.n_members,
             |    (r.prank <= s.n_members * 20 // 100) AS pruned
             |  FROM ranked r JOIN sizes s USING (cent_id))
             |SELECT cent_id, max(n_members) AS n_members,
             |  CAST(sum(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_pruned,
             |  CAST(sum(CASE WHEN NOT pruned THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_kept,
             |  round(max(CASE WHEN NOT pruned THEN sim END), 6)
             |    AS max_kept_sim,
             |  round(avg(CASE WHEN NOT pruned THEN sim END), 4)
             |    AS kept_avg_sim
             |FROM flagged GROUP BY cent_id ORDER BY cent_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q209: length-bucketed batch packing stats (the group_by_length
    // batching every large-scale trainer uses to cut padding waste):
    // order documents by token count (desc, doc_id tiebreak), cut into
    // fixed batches of 32, report per-batch padding = n·max_len − Σlen.
    // The global order comes from RowIds.denseByOrder (range-partitioned
    // two-phase ids) — NEVER a bare Window.orderBy; everything after is
    // one batch-keyed aggregate.
    QueryDef("q209_length_batching",
      (s, dir) => {
        val lens = t(s, dir, "documents")
          .select(col("doc_id"), Text.tokenCount(col("text")).cast("long")
            .as("n_tokens"))
        val idx = graft.pipeline.RowIds.denseByOrder(lens, "idx",
          Seq(col("n_tokens").desc, col("doc_id").asc))
        idx.withColumn("batch_id", expr("(idx - 1) div 32"))
          .groupBy(col("batch_id"))
          .agg(count(lit(1)).as("n_docs"),
            max(col("n_tokens")).as("max_len"),
            sum(col("n_tokens")).as("sum_tokens"),
            (max(col("n_tokens")) * count(lit(1)) - sum(col("n_tokens")))
              .as("padding"))
          .orderBy(col("batch_id"))
      },
      Some("""WITH lens AS (
             |  SELECT doc_id,
             |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '')) AS n_tokens
             |  FROM documents),
             |idx AS (
             |  SELECT doc_id, n_tokens, row_number() OVER (
             |      ORDER BY n_tokens DESC, doc_id ASC) AS idx
             |  FROM lens)
             |SELECT (idx - 1) // 32 AS batch_id, count(*) AS n_docs,
             |  max(n_tokens) AS max_len,
             |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
             |  CAST(max(n_tokens) * count(*) - sum(n_tokens) AS BIGINT)
             |    AS padding
             |FROM idx GROUP BY 1 ORDER BY batch_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q210: benchmark decontamination via the PERSISTED 13-gram index
    // (GPT-3 appendix C; operators/Contam scaladoc for the 100-TB probe
    // shape): benchmark docs (doc_id % 50 == 0) are indexed pre-bucketed
    // on the gram digest; the remaining corpus probes it with NO
    // index-side exchange. Grams are md5Long digests the twin restates
    // exactly; every probed document gets a row (hit or not).
    QueryDef("q210_contam_index",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bench = docs.filter(col("doc_id") % 50 === 0)
        val probe = docs.filter(col("doc_id") % 50 =!= 0)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_ngram_idx_" +
          java.security.MessageDigest.getInstance("MD5").digest(
            dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        val name = "q210_idx_" + path.takeRight(12)
        graft.operators.Contam.writeNgramIndex(bench, "doc_id", "text",
          path, name, n = 13, numBuckets = 16)
        val idx = graft.operators.Contam.readNgramIndex(s, path, name)
        graft.operators.Contam.probeNgramIndex(idx, probe, "doc_id", "text")
          .withColumn("hit_frac",
            round(col("n_hits").cast("double") /
              col("n_grams").cast("double"), 6))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM documents),
             |grams AS (SELECT doc_id,
             |    ('0x' || substr(md5(g), 1, 15))::BIGINT AS gram
             |  FROM (SELECT doc_id, unnest(CASE WHEN len(toks) >= 13
             |      THEN list_transform(range(len(toks) - 12),
             |             i -> array_to_string(toks[i + 1:i + 13], ' '))
             |      ELSE [array_to_string(toks, ' ')] END) AS g
             |    FROM tok)
             |  GROUP BY doc_id, gram),
             |bench AS (SELECT doc_id AS src, gram FROM grams
             |  WHERE doc_id % 50 = 0),
             |probe AS (SELECT doc_id, gram FROM grams WHERE doc_id % 50 <> 0),
             |hits AS (SELECT p.doc_id,
             |    count(DISTINCT p.gram) AS n_hits,
             |    count(DISTINCT b.src) AS n_sources
             |  FROM probe p JOIN bench b USING (gram)
             |  GROUP BY p.doc_id),
             |tot AS (SELECT doc_id, count(*) AS n_grams FROM probe
             |  GROUP BY doc_id)
             |SELECT t.doc_id, t.n_grams,
             |  coalesce(h.n_hits, 0) AS n_hits,
             |  coalesce(h.n_sources, 0) AS n_sources,
             |  round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / t.n_grams, 6)
             |    AS hit_frac
             |FROM tot t LEFT JOIN hits h USING (doc_id)
             |ORDER BY t.doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q211: recall/precision eval of the APPROXIMATE near-dup path against
    // exact ground truth, both computed in-engine — the operating-point
    // curve an engineer reads before picking a SimHash radius. Candidates:
    // portable md5 SimHash-32 pairs at hamming ≤ 6 via the pigeonhole
    // bucket join (exhaustive within the radius — the oracle brute-forces
    // all pairs, so a candidate-generation miss FAILS the compare, not
    // just lowers a metric). Truth: exact 3-gram Jaccard ≥ 0.7 (the
    // q19/q44 planted corpus). Output: per radius 0..6, candidates, hits,
    // recall and precision. Cumulation runs on the ≤7-row hamming
    // histogram (crossJoin(broadcast) of bounded frames).
    QueryDef("q211_simhash_recall",
      (s, dir) => {
        val all = plantedNearDups(s, dir, 7)
        val approx = Dedup.simhashPairs(all, "doc_id", "text",
          maxHamming = 6, bits = 32, tokenHash = Text.md5Long)
        val exact = Dedup.ngramJaccardPairs(all, "doc_id", "text",
            shingleSize = 3, threshold = 0.7)
          .select(col("id_a"), col("id_b"), lit(1L).as("is_true"))
        val flagged = approx.join(exact, Seq("id_a", "id_b"), "left")
          .select(col("hamming"),
            coalesce(col("is_true"), lit(0L)).as("is_true"))
        // ≤ 7 rows by construction (hamming ∈ 0..6); the sentinel keeps
        // the cross join alive on a candidate-free corpus
        val byH = flagged.groupBy(col("hamming"))
          .agg(count(lit(1)).as("n_cand_h"), sum(col("is_true")).as("n_hit_h"))
          .unionByName(s.range(1).select(lit(-1).as("hamming"),
            lit(0L).as("n_cand_h"), lit(0L).as("n_hit_h")))
        val radii = s.range(7).select(col("id").as("radius"))
        val tot = exact.agg(count(lit(1)).as("n_true"))
        radii.crossJoin(broadcast(byH))
          .groupBy(col("radius"))
          .agg(
            sum(when(col("hamming") <= col("radius"), col("n_cand_h"))
              .otherwise(0L)).as("n_cand"),
            sum(when(col("hamming") <= col("radius"), col("n_hit_h"))
              .otherwise(0L)).as("n_hit"))
          .crossJoin(broadcast(tot))
          .select(col("radius"), col("n_cand"), col("n_hit"), col("n_true"),
            round(col("n_hit").cast("double") /
              col("n_true").cast("double"), 6).as("recall"),
            when(col("n_cand") === 0, lit(0.0))
              .otherwise(round(col("n_hit").cast("double") /
                col("n_cand").cast("double"), 6)).as("precision"))
          .orderBy(col("radius"))
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 10000, regexp_replace(text, '^\S+\s+', '')
             |  FROM documents WHERE doc_id % 7 = 0),
             |tok AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM all_docs),
             |h AS (SELECT doc_id,
             |    list_transform(toks,
             |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
             |  FROM tok),
             |sim AS (SELECT doc_id,
             |  CAST(CASE WHEN len(hs) = 0 THEN 0 ELSE
             |    list_sum(list_transform(range(32), b ->
             |      CASE WHEN list_sum(list_transform(hs, h ->
             |             CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
             |           THEN (CAST(1 AS BIGINT) << b) ELSE 0 END))
             |  END AS BIGINT) AS s
             |  FROM h),
             |ap AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    bit_count(xor(a.s, b.s)) AS hamming
             |  FROM sim a JOIN sim b ON a.doc_id < b.doc_id
             |  WHERE bit_count(xor(a.s, b.s)) <= 6),
             |sh AS (SELECT doc_id,
             |    CASE WHEN len(toks) >= 3
             |         THEN list_distinct(list_transform(range(len(toks) - 2),
             |                i -> array_to_string(toks[i + 1:i + 3], ' ')))
             |         ELSE [array_to_string(toks, ' ')] END AS shingles
             |  FROM tok),
             |posts AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
             |sizes AS (SELECT doc_id, count(*) AS n FROM posts GROUP BY doc_id),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
             |  FROM posts a JOIN posts b
             |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |truth AS (
             |  SELECT id_a, id_b FROM inter
             |  JOIN sizes sa ON sa.doc_id = id_a
             |  JOIN sizes sb ON sb.doc_id = id_b
             |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7),
             |flagged AS (SELECT ap.hamming,
             |    CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END AS is_true
             |  FROM ap LEFT JOIN truth t USING (id_a, id_b)),
             |byh AS (SELECT hamming, count(*) AS n_cand,
             |    CAST(sum(is_true) AS BIGINT) AS n_hit
             |  FROM flagged GROUP BY hamming),
             |radii AS (SELECT unnest(range(7)) AS radius),
             |cum AS (SELECT r.radius,
             |    CAST(coalesce(sum(b.n_cand), 0) AS BIGINT) AS n_cand,
             |    CAST(coalesce(sum(b.n_hit), 0) AS BIGINT) AS n_hit
             |  FROM radii r LEFT JOIN byh b ON b.hamming <= r.radius
             |  GROUP BY r.radius),
             |tot AS (SELECT count(*) AS n_true FROM truth)
             |SELECT radius, n_cand, n_hit, n_true,
             |  round(CAST(n_hit AS DOUBLE) / n_true, 6) AS recall,
             |  CASE WHEN n_cand = 0 THEN 0.0
             |       ELSE round(CAST(n_hit AS DOUBLE) / n_cand, 6)
             |       END AS precision
             |FROM cum CROSS JOIN tot
             |ORDER BY radius""".stripMargin)),

    // ---------------------------------------------------------------------
    // q212: ExactSubstr dedup OUTPUT (Lee et al. 2022) — q207 measures the
    // repeated-window mass; this EMITS the deduplicated corpus: every
    // 16-token window occurring ≥ 2 times keeps only its first occurrence
    // (min (doc, pos)), every other occurrence's interval is cut, cuts
    // merge per doc as a position union, and the surviving tokens are
    // re-joined in order. The twin restates the whole policy from
    // brute-forced window strings (keeper = row_number 1 over the window
    // partition), so a keeper-choice, interval-merge, or rebuild-order
    // divergence each moves the hash. Documents shorter than 16 tokens
    // pass through byte-identical; a fully-duplicated doc comes back cut.
    QueryDef("q212_exact_substr_cut",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        SuffixArray.exactSubstrCut(docs, "doc_id", "text", length = 16)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM documents),
             |win AS (SELECT doc_id, i AS pos,
             |    array_to_string(toks[i + 1:i + 16], ' ') AS w
             |  FROM tok, unnest(range(len(toks) - 15)) AS u(i)
             |  WHERE len(toks) >= 16),
             |ranked AS (SELECT doc_id, pos,
             |    row_number() OVER (PARTITION BY w ORDER BY doc_id, pos)
             |      AS rn,
             |    count(*) OVER (PARTITION BY w) AS n_occ
             |  FROM win),
             |cut AS (SELECT DISTINCT doc_id, pos + j AS cp
             |  FROM ranked, unnest(range(16)) AS v(j)
             |  WHERE n_occ >= 2 AND rn > 1),
             |tp AS (SELECT doc_id, i AS pos, toks[i + 1] AS tk
             |  FROM tok, unnest(range(len(toks))) AS u(i)),
             |kept AS (SELECT t.doc_id, t.pos, t.tk
             |  FROM tp t LEFT JOIN cut c
             |    ON c.doc_id = t.doc_id AND c.cp = t.pos
             |  WHERE c.doc_id IS NULL),
             |reb AS (SELECT doc_id,
             |    CAST(count(*) AS BIGINT) AS kept_tokens,
             |    string_agg(tk, ' ' ORDER BY pos) AS deduped_text
             |  FROM kept GROUP BY doc_id)
             |SELECT k.doc_id,
             |  CAST(len(k.toks) AS BIGINT) AS total_tokens,
             |  coalesce(r.kept_tokens, 0) AS kept_tokens,
             |  coalesce(r.deduped_text, '') AS deduped_text
             |FROM tok k LEFT JOIN reb r USING (doc_id)
             |ORDER BY k.doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q218: ExactSubstr cut on a DUPLICATE-DOCUMENT corpus — the r15
    // stationary-ladder fix graded under the driver's oracle, not just
    // specs. The corpus is deterministic from doc_id arithmetic so the
    // twin regenerates it exactly: doc i holds 12 + (i % 37) % 13 tokens,
    // token j = md5('<i % 37>_<j>') — every doc in a `% 37` group is
    // IDENTICAL and token vocabularies are disjoint across groups, so the
    // width-1 rank partition already equals the full-suffix partition and
    // the doubling ladder stops STATIONARY at width 4, far below L/2 = 8.
    // Pre-fix, that shallow stop was read as "nothing can repeat" and the
    // cut came back empty on exactly the duplicated documents an
    // ExactSubstr pass targets; the graded contract is the full policy:
    // groups with length >= 16 keep only their smallest doc_id whole
    // (min-(doc,pos) keeper) with every other member fully cut, and the
    // short groups (length 12-15: no 16-window) pass through
    // byte-identical. The twin is q212's brute-force window chain over
    // the regenerated corpus.
    QueryDef("q218_exact_substr_dup_docs",
      (s, dir) => {
        val g = col("doc_id") % 37
        val len = (lit(12) + pmod(g, lit(13))).cast("int")
        val toks = transform(sequence(lit(0), len - 1), j =>
          md5(concat(g.cast("string"), lit("_"), j.cast("string"))
            .cast("binary")))
        val corpus = t(s, dir, "documents")
          .select(col("doc_id"), array_join(toks, " ").as("text"))
        SuffixArray.exactSubstrCut(corpus, "doc_id", "text", length = 16)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (SELECT doc_id,
             |    list_transform(range(12 + (doc_id % 37) % 13),
             |      j -> md5(CAST(doc_id % 37 AS VARCHAR) || '_'
             |        || CAST(j AS VARCHAR))) AS toks
             |  FROM documents),
             |win AS (SELECT doc_id, i AS pos,
             |    array_to_string(toks[i + 1:i + 16], ' ') AS w
             |  FROM tok, unnest(range(len(toks) - 15)) AS u(i)
             |  WHERE len(toks) >= 16),
             |ranked AS (SELECT doc_id, pos,
             |    row_number() OVER (PARTITION BY w ORDER BY doc_id, pos)
             |      AS rn,
             |    count(*) OVER (PARTITION BY w) AS n_occ
             |  FROM win),
             |cut AS (SELECT DISTINCT doc_id, pos + j AS cp
             |  FROM ranked, unnest(range(16)) AS v(j)
             |  WHERE n_occ >= 2 AND rn > 1),
             |tp AS (SELECT doc_id, i AS pos, toks[i + 1] AS tk
             |  FROM tok, unnest(range(len(toks))) AS u(i)),
             |kept AS (SELECT t.doc_id, t.pos, t.tk
             |  FROM tp t LEFT JOIN cut c
             |    ON c.doc_id = t.doc_id AND c.cp = t.pos
             |  WHERE c.doc_id IS NULL),
             |reb AS (SELECT doc_id,
             |    CAST(count(*) AS BIGINT) AS kept_tokens,
             |    string_agg(tk, ' ' ORDER BY pos) AS deduped_text
             |  FROM kept GROUP BY doc_id)
             |SELECT k.doc_id,
             |  CAST(len(k.toks) AS BIGINT) AS total_tokens,
             |  coalesce(r.kept_tokens, 0) AS kept_tokens,
             |  coalesce(r.deduped_text, '') AS deduped_text
             |FROM tok k LEFT JOIN reb r USING (doc_id)
             |ORDER BY k.doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q213: decontamination as an ACTION (Contam.decontaminate) — q210
    // emits per-doc stats; this GRADES the composed filter: the corpus is
    // split on hit_frac > 0.05 against the persisted 13-gram index, the
    // KEPT half proves the anti-join carried the original text through
    // (md5 of the text column), and the DROPPED half carries the X6-style
    // provenance (hits, sources, hit_frac in integer micro-units — no
    // float-to-string seam). The twin restates the screen AND the split,
    // so a boundary slip, a lost kept row, or a wrong provenance value
    // each moves the hash.
    QueryDef("q213_decontaminate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bench = docs.filter(col("doc_id") % 50 === 0)
        val probe = docs.filter(col("doc_id") % 50 =!= 0)
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_decontam_idx_" +
          java.security.MessageDigest.getInstance("MD5").digest(
            dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        val name = "q213_idx_" + path.takeRight(12)
        graft.operators.Contam.writeNgramIndex(bench, "doc_id", "text",
          path, name, n = 13, numBuckets = 16)
        val idx = graft.operators.Contam.readNgramIndex(s, path, name)
        val (kept, dropped) = graft.operators.Contam.decontaminate(
          idx, probe, "doc_id", "text", maxHitFrac = 0.05)
        val k = kept.select(col("doc_id"), lit("kept").as("verdict"),
          md5(col("text")).as("detail"))
        val d = dropped.select(col("doc_id"), lit("dropped").as("verdict"),
          concat_ws(":", col("n_hits"), col("n_sources"),
            round(col("n_hits").cast("double") / col("n_grams") * 1e6)
              .cast("long")).as("detail"))
        k.unionByName(d).orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM documents),
             |grams AS (SELECT doc_id,
             |    ('0x' || substr(md5(g), 1, 15))::BIGINT AS gram
             |  FROM (SELECT doc_id, unnest(CASE WHEN len(toks) >= 13
             |      THEN list_transform(range(len(toks) - 12),
             |             i -> array_to_string(toks[i + 1:i + 13], ' '))
             |      ELSE [array_to_string(toks, ' ')] END) AS g
             |    FROM tok)
             |  GROUP BY doc_id, gram),
             |bench AS (SELECT doc_id AS src, gram FROM grams
             |  WHERE doc_id % 50 = 0),
             |probe AS (SELECT doc_id, gram FROM grams WHERE doc_id % 50 <> 0),
             |hits AS (SELECT p.doc_id,
             |    count(DISTINCT p.gram) AS n_hits,
             |    count(DISTINCT b.src) AS n_sources
             |  FROM probe p JOIN bench b USING (gram)
             |  GROUP BY p.doc_id),
             |tot AS (SELECT doc_id, count(*) AS n_grams FROM probe
             |  GROUP BY doc_id),
             |stats AS (SELECT t.doc_id, t.n_grams,
             |    coalesce(h.n_hits, 0) AS n_hits,
             |    coalesce(h.n_sources, 0) AS n_sources
             |  FROM tot t LEFT JOIN hits h USING (doc_id)),
             |dropped AS (SELECT * FROM stats
             |  WHERE CAST(n_hits AS DOUBLE) / n_grams > 0.05)
             |SELECT d.doc_id, 'kept' AS verdict, md5(d.text) AS detail
             |FROM documents d
             |WHERE d.doc_id % 50 <> 0
             |  AND d.doc_id NOT IN (SELECT doc_id FROM dropped)
             |UNION ALL
             |SELECT doc_id, 'dropped',
             |  CAST(n_hits AS VARCHAR) || ':' || CAST(n_sources AS VARCHAR)
             |    || ':' || CAST(CAST(round(CAST(n_hits AS DOUBLE) / n_grams
             |        * 1000000) AS BIGINT) AS VARCHAR)
             |FROM dropped
             |ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q214: the ANN STREAMING ingest loop end-to-end under the oracle gate
    // — VecStream.ingestAnnStream given the q202 treatment: two real
    // Structured Streaming drains against one checkpoint over the
    // persisted IVF-PQ index. batch1 (copies of the 20 q200 query vectors,
    // ids +100000) streams in, is probed for its top-10 neighbors against
    // the BASE index, then ABSORBED (encoded with the frozen persisted
    // model); batch2 (copies of 20 other vectors, ids +200000) streams
    // through a RESTARTED query and must rank against base ∪ batch1.
    // Graded output: per streamed query, recall@10 of the SINK rows
    // against the exact brute-force truth at that batch's visibility —
    // a routing, frozen-model encode, absorb-replay, checkpoint, or ADC
    // divergence each moves it. The twin restates the whole pipeline from
    // scratch (q200's deterministic sampled model), exploiting that a
    // copied vector encodes IDENTICALLY under the frozen model, so
    // batch1's reconstructions are the base reconstructions re-keyed.
    QueryDef("q214_ann_ingest_stream",
      (s, dir) => {
        import graft.streaming.VecStream
        val raw = t(s, dir, "embeddings")
        val e = raw.select(col("vec_id"),
          Vec.asDouble(col("embedding")).as("vec"))
        val b1raw = raw.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
        val b2raw = raw.filter(col("vec_id") % 25 === 5 && col("vec_id") < 500)
          .select((col("vec_id") + 200000).as("vec_id"), col("embedding"))
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_q214_" +
          java.security.MessageDigest.getInstance("MD5").digest(
            dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        def rm(p: String): Unit = {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(s.sparkContext.hadoopConfiguration)
            .delete(hp, true)
        }
        rm(base)
        val (idxPath, vecsDir, outDir, ckpt) = (s"$base/idx",
          s"$base/vecs", s"$base/nn", s"$base/ckpt")
        val name = "q214_idx_" + base.takeRight(12)
        Similarity.writeAnnIndex(e, "vec_id", "vec", idxPath, name,
          m = 8, k = 16, nlist = 64, numBuckets = 16)
        val idx = Similarity.readAnnIndex(s, idxPath, name)
        // drain 1: batch1 lands, is probed against base, then absorbed
        b1raw.coalesce(1).write.mode("append").parquet(vecsDir)
        VecStream.ingestAnnStream(s, vecsDir, idx, outDir, ckpt,
          k = 10, nprobe = 4)
        // drain 2: a RESTART — batch2 probes base ∪ batch1
        b2raw.coalesce(1).write.mode("append").parquet(vecsDir)
        VecStream.ingestAnnStream(s, vecsDir, idx, outDir, ckpt,
          k = 10, nprobe = 4)
        val approx = s.read.parquet(outDir)
          .select(col("query_id"), col("neighbor_id"))
        // exact truth at each batch's visibility (phase 0 = base corpus,
        // 1 = batch1): a query of phase p ranks corpus rows of phase < p
        val b1d = b1raw.select(col("vec_id"),
          Vec.asDouble(col("embedding")).as("vec"))
        val b2d = b2raw.select(col("vec_id"),
          Vec.asDouble(col("embedding")).as("vec"))
        val corpus = e.withColumn("cphase", lit(0))
          .unionByName(b1d.withColumn("cphase", lit(1)))
          .select(col("vec_id").as("neighbor_id"), col("vec").as("cvec"),
            Vec.norm(col("vec")).as("cnrm"), col("cphase"))
        val qn = b1d.withColumn("qphase", lit(1))
          .unionByName(b2d.withColumn("qphase", lit(2)))
          .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
            Vec.norm(col("vec")).as("qnrm"), col("qphase"))
        val scored = corpus.join(broadcast(qn),
            col("cphase") < col("qphase") &&
              col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            round(Vec.cosineFromParts(Vec.dot(col("qvec"), col("cvec")),
              col("qnrm"), col("cnrm")), 6).as("cosine"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        val exact = scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("neighbor_id"))
        val hits = exact.join(approx, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
        qn.select(col("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("hits"), lit(0L)).as("hits"),
            round(coalesce(col("hits"), lit(0L)) / 10.0, 4).as("recall"))
          .orderBy(col("query_id"))
      },
      // ivfpqRecallOracle's model/encode/probe restated with PHASED
      // visibility; batch reconstructions are the base ones re-keyed
      // (identical input + frozen model => identical codes)
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |cc AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx,
             |    v AS cv
             |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 64)),
             |asg AS (
             |  SELECT vec_id, v, cidx, cv FROM (
             |    SELECT e.vec_id, e.v, cc.cidx, cc.cv, row_number() OVER (
             |      PARTITION BY e.vec_id
             |      ORDER BY list_cosine_similarity(e.v, cc.cv) DESC, cc.cidx)
             |      AS rn
             |    FROM e CROSS JOIN cc) WHERE rn = 1),
             |res AS (
             |  SELECT vec_id, cidx, cv,
             |    list_transform(range(64), i -> v[i+1] - cv[i+1]) AS r
             |  FROM asg),
             |cbsrc AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, r
             |  FROM (SELECT vec_id, r FROM res
             |        ORDER BY vec_id LIMIT 16 OFFSET 64)),
             |cb AS (
             |  SELECT ms.m, code, r[ms.m*8+1 : ms.m*8+8] AS cbv
             |  FROM cbsrc CROSS JOIN (SELECT unnest(range(0, 8)) AS m) ms),
             |keys AS (
             |  SELECT d.vec_id, cb.m, cb.code, cb.cbv,
             |    round(list_inner_product(cb.cbv, cb.cbv)
             |      - 2 * list_inner_product(d.r[cb.m*8+1 : cb.m*8+8], cb.cbv),
             |      6) AS key
             |  FROM res d CROSS JOIN cb),
             |pick AS (
             |  SELECT vec_id, m, code, cbv FROM (
             |    SELECT vec_id, m, code, cbv, row_number() OVER (
             |      PARTITION BY vec_id, m ORDER BY key, code) AS rn
             |    FROM keys)
             |  WHERE rn = 1),
             |recon AS (
             |  SELECT p.vec_id, r.cidx,
             |    list_transform(range(64), i -> r.cv[i+1] + p.rh[i+1])
             |      AS xhat
             |  FROM (SELECT vec_id, flatten(list(cbv ORDER BY m)) AS rh
             |        FROM pick GROUP BY vec_id) p
             |  JOIN res r USING (vec_id)),
             |rc2 AS (
             |  SELECT vec_id, cidx, xhat, 0 AS cphase FROM recon
             |  UNION ALL
             |  SELECT vec_id + 100000, cidx, xhat, 1 FROM recon
             |  WHERE vec_id % 25 = 0 AND vec_id < 500),
             |qs AS (
             |  SELECT vec_id + 100000 AS query_id, v AS qv, 1 AS qphase
             |  FROM e WHERE vec_id % 25 = 0 AND vec_id < 500
             |  UNION ALL
             |  SELECT vec_id + 200000, v, 2
             |  FROM e WHERE vec_id % 25 = 5 AND vec_id < 500),
             |probes AS (
             |  SELECT query_id, cidx, qphase FROM (
             |    SELECT q.query_id, cc.cidx, q.qphase, row_number() OVER (
             |      PARTITION BY q.query_id
             |      ORDER BY list_cosine_similarity(q.qv, cc.cv) DESC, cc.cidx)
             |      AS rn
             |    FROM qs q CROSS JOIN cc) WHERE rn <= 4),
             |approx AS (
             |  SELECT query_id, neighbor_id FROM (
             |    SELECT query_id, neighbor_id, row_number() OVER (
             |        PARTITION BY query_id
             |        ORDER BY pq_cosine DESC, neighbor_id) AS rank
             |    FROM (
             |      SELECT p.query_id, rc.vec_id AS neighbor_id,
             |        round(list_cosine_similarity(q.qv, rc.xhat), 6)
             |          AS pq_cosine
             |      FROM probes p JOIN qs q USING (query_id)
             |      JOIN rc2 rc
             |        ON rc.cidx = p.cidx AND rc.cphase < p.qphase
             |        AND rc.vec_id <> p.query_id))
             |  WHERE rank <= 10),
             |ex2 AS (
             |  SELECT vec_id, v, 0 AS cphase FROM e
             |  UNION ALL
             |  SELECT vec_id + 100000, v, 1 FROM e
             |  WHERE vec_id % 25 = 0 AND vec_id < 500),
             |exact AS (
             |  SELECT query_id, neighbor_id FROM (
             |    SELECT query_id, neighbor_id, row_number() OVER (
             |        PARTITION BY query_id
             |        ORDER BY cosine DESC, neighbor_id) AS rank
             |    FROM (
             |      SELECT q.query_id, e2.vec_id AS neighbor_id,
             |        round(list_cosine_similarity(q.qv, e2.v), 6) AS cosine
             |      FROM qs q JOIN ex2 e2
             |        ON e2.cphase < q.qphase AND e2.vec_id <> q.query_id))
             |  WHERE rank <= 10),
             |hits AS (
             |  SELECT a.query_id, CAST(count(*) AS BIGINT) AS hits
             |  FROM exact x JOIN approx a
             |    ON a.query_id = x.query_id
             |    AND a.neighbor_id = x.neighbor_id
             |  GROUP BY a.query_id)
             |SELECT q.query_id, coalesce(h.hits, 0) AS hits,
             |  round(coalesce(h.hits, 0) / 10.0, 4) AS recall
             |FROM qs q LEFT JOIN hits h USING (query_id)
             |ORDER BY q.query_id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q215: TORN-APPEND repair under the oracle gate — the r14 manifest
    // protocol graded end-to-end the way q202 grades the absorb markers.
    // A COMPLETED batch append (batch1's bands and postings fully
    // written) is turned into a simulated crash-before-commit by
    // restoring both pre-append manifests; the next readLshIndex must
    // repair the leftovers, so batch2's probe answers against the
    // ORIGINAL corpus only. The twin restates the exact-Jaccard closure
    // over corpus ∪ batch2 — any surviving batch1 band/posting row
    // would surface extra pairs or corrupted rescore counts and move
    // the hash.
    QueryDef("q215_torn_append_repair",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val batch1 = d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
        val batch2 = d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 20000).as("doc_id"),
            regexp_replace(col("text"), "\\s+\\S+$", "").as("text"))
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_q215_" +
          java.security.MessageDigest.getInstance("MD5").digest(
            dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val idxPath = s"$base/idx"
        val name = "q215_idx_" + base.takeRight(12)
        Dedup.writeLshIndex(d, "doc_id", "text", idxPath, name,
          shingleSize = 3, numHashes = 64, bands = 16)
        val idx = Dedup.readLshIndex(s, idxPath, name)
        val mBands = graft.operators.IndexGen.manifestSnapshot(s,
          idx.bandsDir)
        val mPosts = graft.operators.IndexGen.manifestSnapshot(s,
          idx.postsDir)
        // a COMPLETED append, then the crash-before-commit simulation
        Dedup.appendToLshIndex(idx, batch1, "doc_id", "text")
        graft.operators.IndexGen.restoreManifest(s, idx.bandsDir, mBands)
        graft.operators.IndexGen.restoreManifest(s, idx.postsDir, mPosts)
        // open-time repair: batch2 must pair against the corpus ONLY
        val repaired = Dedup.readLshIndex(s, idxPath, name)
        Dedup.probeLshIndex(repaired, batch2, "doc_id", "text",
            threshold = 0.7)
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(jaccardOracle
        .replace(
          """|  SELECT doc_id + 10000, regexp_replace(text, '^\S+\s+', '')
             |  FROM documents WHERE doc_id % 7 = 0),""".stripMargin,
          """|  SELECT doc_id + 20000, regexp_replace(text, '\s+\S+$', '')
             |  FROM documents WHERE doc_id % 7 = 0),""".stripMargin)
        .replace(
          "WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7",
          "WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7\n" +
            "  AND id_b >= 20000"))),

    // ---------------------------------------------------------------------
    // q219: REPLAYED-ABSORB exactly-once under the oracle gate — the r16
    // batch-tag protocol graded end-to-end the way q215 grades torn-append
    // repair. The streaming absorb writes its `_absorbed_<id>` marker
    // AFTER the append, so a crash in between replays a batch whose
    // manifests already COMMITTED; without the tag the replay lands the
    // whole batch a second time, and duplicated postings double one side
    // of every jaccard rescore count — wrong pair scores, not just index
    // bloat. Here batch1 is absorbed with its tag, the marker is never
    // written (the simulated crash), and the replay re-enters absorbOnce:
    // it must recognize the committed tag and append nothing, so batch2's
    // probe sees batch1 EXACTLY once. The twin restates the exact-Jaccard
    // closure over corpus ∪ batch1 ∪ batch2 (pairs with a batch2 member):
    // any double-landed batch1 row moves jaccard denominators and the
    // hash.
    QueryDef("q219_replayed_absorb",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val batch1 = d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
        val batch2 = d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 20000).as("doc_id"),
            regexp_replace(col("text"), "\\s+\\S+$", "").as("text"))
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_q219_" +
          java.security.MessageDigest.getInstance("MD5").digest(
            dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val idxPath = s"$base/idx"
        val name = "q219_idx_" + base.takeRight(12)
        Dedup.writeLshIndex(d, "doc_id", "text", idxPath, name,
          shingleSize = 3, numHashes = 64, bands = 16)
        val idx = Dedup.readLshIndex(s, idxPath, name)
        // a COMMITTED tagged absorb whose marker never landed (the crash)…
        Dedup.appendToLshIndex(idx, batch1, "doc_id", "text",
          batchTag = Some("absorb_0"))
        // …then the streaming replay re-absorbs the same micro-batch
        val reopened = Dedup.readLshIndex(s, idxPath, name)
        graft.streaming.DocStream.absorbOnce(reopened, batch1, 0L)
        Dedup.probeLshIndex(reopened, batch2, "doc_id", "text",
            threshold = 0.7)
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(jaccardOracle
        .replace(
          """|  SELECT doc_id + 10000, regexp_replace(text, '^\S+\s+', '')
             |  FROM documents WHERE doc_id % 7 = 0),""".stripMargin,
          """|  SELECT doc_id + 10000, regexp_replace(text, '^\S+\s+', '')
             |  FROM documents WHERE doc_id % 7 = 0
             |  UNION ALL
             |  SELECT doc_id + 20000, regexp_replace(text, '\s+\S+$', '')
             |  FROM documents WHERE doc_id % 7 = 0),""".stripMargin)
        .replace(
          "WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7",
          "WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7\n" +
            "  AND id_b >= 20000"))),

    // ---------------------------------------------------------------------
    // q216: interpolated Kneser–Ney bigram LM scoring — the smoothing
    // family CCNet's KenLM actually uses, next to q98's add-alpha: held-out
    // mass backs off to the CONTINUATION distribution (distinct-context
    // counts), with a +1/(N1+(·,·)+V+1) OOV floor keeping open-vocabulary
    // scores finite. Trained on HALF the corpus (doc_id % 2 = 0) and
    // scored on all of it plus q98's planted md5 gibberish, so the graded
    // stream exercises every branch: seen bigrams (discounted ML), unseen
    // bigrams under seen contexts (interpolated continuation), and fully
    // OOV text (pure regularized Pcont — the gibberish lands there and
    // the -6.5 threshold flags exactly it). The twin retrains the
    // identical model in SQL with matching expression shapes.
    QueryDef("q216_kneser_ney",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val junk = d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat_ws(" ", (0 until 8).map(i =>
              md5((col("doc_id") + lit(i)).cast("string").cast("binary")))
              : _*).as("text"))
        val train = d.filter(col("doc_id") % 2 === 0)
        graft.operators.LmScore.knScore(d.unionByName(junk),
            "doc_id", "text", discount = 0.75, threshold = -6.5,
            train = Some(train))
          .orderBy(col("id"))
      },
      Some("""WITH pl AS (
             |  SELECT doc_id + 10000 AS id,
             |    concat_ws(' ', md5(CAST(doc_id + 0 AS VARCHAR)),
             |      md5(CAST(doc_id + 1 AS VARCHAR)),
             |      md5(CAST(doc_id + 2 AS VARCHAR)),
             |      md5(CAST(doc_id + 3 AS VARCHAR)),
             |      md5(CAST(doc_id + 4 AS VARCHAR)),
             |      md5(CAST(doc_id + 5 AS VARCHAR)),
             |      md5(CAST(doc_id + 6 AS VARCHAR)),
             |      md5(CAST(doc_id + 7 AS VARCHAR))) AS text
             |  FROM documents WHERE doc_id % 10 = 0),
             |corpus AS (
             |  SELECT doc_id AS id, text FROM documents
             |  UNION ALL SELECT id, text FROM pl),
             |d AS (
             |  SELECT id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS toks
             |  FROM corpus),
             |tr AS (SELECT toks FROM d WHERE id % 2 = 0 AND id < 10000),
             |tbg AS (
             |  SELECT unnest(toks[1:len(toks)-1]) AS u,
             |         unnest(toks[2:len(toks)]) AS v
             |  FROM tr WHERE len(toks) >= 2),
             |bgc AS (SELECT u, v, count(*) AS c_uv FROM tbg GROUP BY u, v),
             |ctx AS (SELECT u, sum(c_uv) AS c_u, count(*) AS n1f
             |  FROM bgc GROUP BY u),
             |cont AS (SELECT v, count(*) AS n1b FROM bgc GROUP BY v),
             |tot AS (SELECT
             |    (SELECT count(*) FROM bgc) AS n_bg,
             |    (SELECT count(DISTINCT u2)
             |     FROM (SELECT unnest(toks) AS u2 FROM tr)) AS vsz),
             |sbg AS (
             |  SELECT id, unnest(toks[1:len(toks)-1]) AS u,
             |         unnest(toks[2:len(toks)]) AS v
             |  FROM d WHERE len(toks) >= 2),
             |lp AS (
             |  SELECT id,
             |    ln(CASE WHEN c_u IS NOT NULL THEN
             |         greatest(coalesce(c_uv, 0) - 0.75, 0) / c_u
             |         + 0.75 * n1f / c_u
             |           * ((coalesce(n1b, 0) + 1.0) / (n_bg + vsz + 1.0))
             |       ELSE (coalesce(n1b, 0) + 1.0) / (n_bg + vsz + 1.0)
             |       END) AS lp
             |  FROM sbg LEFT JOIN bgc USING (u, v) LEFT JOIN ctx USING (u)
             |  LEFT JOIN cont USING (v) CROSS JOIN tot),
             |sc AS (
             |  SELECT id, count(*) AS n_bigrams, round(avg(lp), 4) AS kn_score
             |  FROM lp GROUP BY id)
             |SELECT d.id, coalesce(n_bigrams, 0) AS n_bigrams, kn_score,
             |  coalesce(kn_score < -6.5, false) AS low_quality
             |FROM d LEFT JOIN sc USING (id)
             |ORDER BY d.id""".stripMargin)),

    // ---------------------------------------------------------------------
    // q217: the RAISED production operating point over the persisted
    // IVF-PQ index — the r14 verdict's recall question answered and
    // graded. q200/q203/q214 pin the recall COMPUTATION at the ADC
    // operating point (nprobe = 4, mean recall@10 ≈ 0.2–0.35 on this
    // near-isotropic corpus); this query grades the point a production
    // admission check would actually run: ADC CANDIDATE generation at
    // candK = 500 over nprobe = 48 of 64 lists with k = 64 codebooks,
    // then EXACT re-ranking against the original vectors
    // (Similarity.probeAnnIndexRerank — IVFADC+R, Jégou et al. 2011
    // §III-D). Measured on the AnnCurve sweep (PLANS.md round 15):
    // mean recall@10 = 0.925 at the 2000-vector corpus vs 0.285 for raw
    // ADC at the same nprobe — quantization error leaves the operating
    // point entirely; the residual loss is IVF routing alone. The twin
    // restates the WHOLE pipeline from scratch: coarse assign, residual
    // encode with the 64-entry codebooks, 48-list routing, ADC top-500
    // candidate cut (round-6 + id tie, the restatable order), exact
    // re-rank, and the brute-forced truth — so a candidate-cut, fetch,
    // or re-score divergence each moves the per-query recall hash.
    QueryDef("q217_ann_rerank_recall",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), Vec.asDouble(col("embedding")).as("vec"))
        val q = e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
          .select(col("vec_id").as("qid"), col("vec").as("qvec"))
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_rerank_idx_" +
            java.security.MessageDigest.getInstance("MD5").digest(
              dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        val name = "q217_idx_" + path.takeRight(12)
        Similarity.writeAnnIndex(e, "vec_id", "vec", path, name,
          m = 8, k = 64, nlist = 64, numBuckets = 16)
        val idx = Similarity.readAnnIndex(s, path, name)
        val approx = Similarity.probeAnnIndexRerank(idx, q, "qid", "qvec",
            k = 10, vectors = e, vecIdCol = "vec_id", vecCol = "vec",
            nprobe = 48, candK = 500)
          .select(col("query_id"), col("neighbor_id"))
        val c = e.select(col("vec_id").as("neighbor_id"),
          col("vec").as("cvec"), Vec.norm(col("vec")).as("cnrm"))
        val qn = q.select(col("qid").as("query_id"), col("qvec"),
          Vec.norm(col("qvec")).as("qnrm"))
        val scored = c.join(broadcast(qn),
            col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            round(Vec.cosineFromParts(Vec.dot(col("qvec"), col("cvec")),
              col("qnrm"), col("cnrm")), 6).as("cosine"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        val exact = scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("neighbor_id"))
        val hits = exact.join(approx, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
        qn.select(col("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("hits"), lit(0L)).as("hits"),
            round(coalesce(col("hits"), lit(0L)) / 10.0, 4).as("recall"))
          .orderBy(col("query_id"))
      },
      // ivfpqRecallOracle's pipeline with the raised parameters (64-entry
      // codebooks, 48-list probes, ADC top-500 cut) plus the exact
      // re-rank stage — the rerank reads ORIGINAL vectors, so xhat only
      // decides candidate membership, never the final order
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |cc AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx,
             |    v AS cv
             |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 64)),
             |asg AS (
             |  SELECT vec_id, v, cidx, cv FROM (
             |    SELECT e.vec_id, e.v, cc.cidx, cc.cv, row_number() OVER (
             |      PARTITION BY e.vec_id
             |      ORDER BY list_cosine_similarity(e.v, cc.cv) DESC, cc.cidx)
             |      AS rn
             |    FROM e CROSS JOIN cc) WHERE rn = 1),
             |res AS (
             |  SELECT vec_id, cidx, cv,
             |    list_transform(range(64), i -> v[i+1] - cv[i+1]) AS r
             |  FROM asg),
             |cbsrc AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, r
             |  FROM (SELECT vec_id, r FROM res
             |        ORDER BY vec_id LIMIT 64 OFFSET 64)),
             |cb AS (
             |  SELECT ms.m, code, r[ms.m*8+1 : ms.m*8+8] AS cbv
             |  FROM cbsrc CROSS JOIN (SELECT unnest(range(0, 8)) AS m) ms),
             |keys AS (
             |  SELECT d.vec_id, cb.m, cb.code, cb.cbv,
             |    round(list_inner_product(cb.cbv, cb.cbv)
             |      - 2 * list_inner_product(d.r[cb.m*8+1 : cb.m*8+8], cb.cbv),
             |      6) AS key
             |  FROM res d CROSS JOIN cb),
             |pick AS (
             |  SELECT vec_id, m, code, cbv FROM (
             |    SELECT vec_id, m, code, cbv, row_number() OVER (
             |      PARTITION BY vec_id, m ORDER BY key, code) AS rn
             |    FROM keys)
             |  WHERE rn = 1),
             |recon AS (
             |  SELECT p.vec_id, r.cidx,
             |    list_transform(range(64), i -> r.cv[i+1] + p.rh[i+1])
             |      AS xhat
             |  FROM (SELECT vec_id, flatten(list(cbv ORDER BY m)) AS rh
             |        FROM pick GROUP BY vec_id) p
             |  JOIN res r USING (vec_id)),
             |qs AS (SELECT vec_id AS query_id, v AS qv FROM e
             |       WHERE vec_id % 25 = 0 AND vec_id < 500),
             |probes AS (
             |  SELECT query_id, cidx FROM (
             |    SELECT q.query_id, cc.cidx, row_number() OVER (
             |      PARTITION BY q.query_id
             |      ORDER BY list_cosine_similarity(q.qv, cc.cv) DESC, cc.cidx)
             |      AS rn
             |    FROM qs q CROSS JOIN cc) WHERE rn <= 48),
             |cands AS (
             |  SELECT query_id, neighbor_id FROM (
             |    SELECT query_id, neighbor_id, row_number() OVER (
             |        PARTITION BY query_id
             |        ORDER BY pq_cosine DESC, neighbor_id) AS rank
             |    FROM (
             |      SELECT p.query_id, rc.vec_id AS neighbor_id,
             |        round(list_cosine_similarity(q.qv, rc.xhat), 6)
             |          AS pq_cosine
             |      FROM probes p JOIN qs q USING (query_id)
             |      JOIN recon rc
             |        ON rc.cidx = p.cidx AND rc.vec_id <> p.query_id))
             |  WHERE rank <= 500),
             |approx AS (
             |  SELECT query_id, neighbor_id FROM (
             |    SELECT query_id, neighbor_id, row_number() OVER (
             |        PARTITION BY query_id
             |        ORDER BY cosine DESC, neighbor_id) AS rank
             |    FROM (
             |      SELECT cd.query_id, cd.neighbor_id,
             |        round(list_cosine_similarity(q.qv, e2.v), 6) AS cosine
             |      FROM cands cd JOIN qs q USING (query_id)
             |      JOIN e e2 ON e2.vec_id = cd.neighbor_id))
             |  WHERE rank <= 10),
             |exact AS (
             |  SELECT query_id, neighbor_id FROM (
             |    SELECT query_id, neighbor_id, row_number() OVER (
             |        PARTITION BY query_id
             |        ORDER BY cosine DESC, neighbor_id) AS rank
             |    FROM (
             |      SELECT q.query_id, e2.vec_id AS neighbor_id,
             |        round(list_cosine_similarity(q.qv, e2.v), 6) AS cosine
             |      FROM qs q JOIN e e2 ON e2.vec_id <> q.query_id))
             |  WHERE rank <= 10),
             |hits AS (
             |  SELECT a.query_id, CAST(count(*) AS BIGINT) AS hits
             |  FROM exact x JOIN approx a
             |    ON a.query_id = x.query_id
             |    AND a.neighbor_id = x.neighbor_id
             |  GROUP BY a.query_id)
             |SELECT q.query_id, coalesce(h.hits, 0) AS hits,
             |  round(coalesce(h.hits, 0) / 10.0, 4) AS recall
             |FROM qs q LEFT JOIN hits h USING (query_id)
             |ORDER BY q.query_id""".stripMargin))
  )

  /** Oracle CTE chain shared by q44/q196 — the planted-near-dup (modulo 7)
    * corpus, its 3-gram-Jaccard >= 0.7 pair set, and the recursive
    * connected-component closure, ending at reach(id, r). */
  private lazy val ccReachCtes7: String =
    """WITH RECURSIVE
      |all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000, regexp_replace(text, '^\S+\s+', '')
      |  FROM documents WHERE doc_id % 7 = 0),
      |tok AS (SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> t <> '') AS toks
      |  FROM all_docs),
      |sh AS (SELECT doc_id,
      |    CASE WHEN len(toks) >= 3
      |         THEN list_distinct(list_transform(range(len(toks) - 2),
      |                i -> array_to_string(toks[i + 1:i + 3], ' ')))
      |         ELSE [array_to_string(toks, ' ')] END AS shingles
      |  FROM tok),
      |posts AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
      |sizes AS (SELECT doc_id, count(*) AS n FROM posts GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      |  FROM posts a JOIN posts b
      |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM all_docs
      |  UNION
      |  SELECT reach.id, edges.dst FROM reach
      |  JOIN edges ON edges.src = reach.r)""".stripMargin

  /** Oracle CTE chain shared by q101/q130 - the 3-round BPE merge
    * learning unrolled in SQL, ending at wmap(word, n_sym) and
    * tok(id, word). */
  private lazy val bpeWmapCtes: String =
    """WITH w AS (
             |  SELECT word, count(*) AS cnt FROM (
             |    SELECT unnest(list_filter(
             |      string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '')) AS word
             |    FROM documents)
             |  GROUP BY word),
             |s0 AS (
             |  SELECT word, regexp_replace(word, '(.)', ' \1 ', 'g') AS s,
             |    cnt
             |  FROM w),
             |p1 AS (
             |  SELECT u, v, sum(cnt) AS wt FROM (
             |    SELECT unnest(toks[1:len(toks)-1]) AS u,
             |           unnest(toks[2:len(toks)]) AS v, cnt
             |    FROM (SELECT string_split(trim(s), '  ') AS toks, cnt
             |          FROM s0)
             |    WHERE len(toks) >= 2)
             |  GROUP BY u, v),
             |m1 AS (SELECT u, v FROM p1 ORDER BY wt DESC, u, v LIMIT 1),
             |s1 AS (
             |  SELECT word, replace(s, ' ' || u || '  ' || v || ' ',
             |    ' ' || u || v || ' ') AS s, cnt
             |  FROM s0 CROSS JOIN m1),
             |p2 AS (
             |  SELECT u, v, sum(cnt) AS wt FROM (
             |    SELECT unnest(toks[1:len(toks)-1]) AS u,
             |           unnest(toks[2:len(toks)]) AS v, cnt
             |    FROM (SELECT string_split(trim(s), '  ') AS toks, cnt
             |          FROM s1)
             |    WHERE len(toks) >= 2)
             |  GROUP BY u, v),
             |m2 AS (SELECT u, v FROM p2 ORDER BY wt DESC, u, v LIMIT 1),
             |s2 AS (
             |  SELECT word, replace(s, ' ' || u || '  ' || v || ' ',
             |    ' ' || u || v || ' ') AS s, cnt
             |  FROM s1 CROSS JOIN m2),
             |p3 AS (
             |  SELECT u, v, sum(cnt) AS wt FROM (
             |    SELECT unnest(toks[1:len(toks)-1]) AS u,
             |           unnest(toks[2:len(toks)]) AS v, cnt
             |    FROM (SELECT string_split(trim(s), '  ') AS toks, cnt
             |          FROM s2)
             |    WHERE len(toks) >= 2)
             |  GROUP BY u, v),
             |m3 AS (SELECT u, v FROM p3 ORDER BY wt DESC, u, v LIMIT 1),
             |s3 AS (
             |  SELECT word, replace(s, ' ' || u || '  ' || v || ' ',
             |    ' ' || u || v || ' ') AS s, cnt
             |  FROM s2 CROSS JOIN m3),
             |wmap AS (
             |  SELECT word, len(string_split(trim(s), '  ')) AS n_sym
             |  FROM s3),
             |tok AS (
             |  SELECT doc_id AS id, unnest(list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'),
             |    t -> t <> '')) AS word
             |  FROM documents)""".stripMargin

  /** SQL restatement of [[graft.operators.ZOrder.interleave2]]: the
    * 2*bits-term Morton shift sum (q129's twin). */
  private def mortonSql(a: String, b: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})")
      .mkString("\n             |    + ")

  /** Shared NB plant + scoring of q112/q123 (the Spark half of
    * [[nbScoreCtes]]): train = non-held-out docs labeled good + md5 token
    * soup labeled junk + a stray 'dubious' slice that the label guard
    * must drop; score = the held-out quarter in both classes (soup ids
    * offset +10000 — which doubles as the calibration truth). */
  private def nbPlantScored(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    def soup(ids: DataFrame): DataFrame = ids.select(
      (col("doc_id") + 10000).as("id"),
      concat_ws(" ", (0 until 8).map(i =>
        md5((col("doc_id") + lit(i)).cast("string").cast("binary")))
        : _*).as("text"))
    val train = d.filter(col("doc_id") % 4 =!= 0)
      .select(col("doc_id").as("id"), col("text"), lit("good").as("label"))
      .unionByName(soup(d.filter(col("doc_id") % 4 =!= 0))
        .withColumn("label", lit("junk")))
      .unionByName(d.filter(col("doc_id") % 8 === 1)
        .select((col("doc_id") + 20000).as("id"), col("text"),
          lit("dubious").as("label")))
    val score = d.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id").as("id"), col("text"))
      .unionByName(soup(d.filter(col("doc_id") % 4 === 0)))
    Classify.nbTrainScore(train, score, "id", "text", "label",
      "good", "junk", alpha = 1.0)
  }

  /** Oracle CTE chain shared by q112/q123 — the NB plant, training, and
    * scoring restated in SQL, ending at `sc(id, n_tokens, log_odds)`. */
  private lazy val nbScoreCtes: String =
    """WITH base AS (SELECT doc_id, text FROM documents),
      |soup AS (
      |  SELECT doc_id, concat_ws(' ',
      |    md5(CAST(doc_id + 0 AS VARCHAR)),
      |    md5(CAST(doc_id + 1 AS VARCHAR)),
      |    md5(CAST(doc_id + 2 AS VARCHAR)),
      |    md5(CAST(doc_id + 3 AS VARCHAR)),
      |    md5(CAST(doc_id + 4 AS VARCHAR)),
      |    md5(CAST(doc_id + 5 AS VARCHAR)),
      |    md5(CAST(doc_id + 6 AS VARCHAR)),
      |    md5(CAST(doc_id + 7 AS VARCHAR))) AS text
      |  FROM base),
      |train AS (
      |  SELECT text, TRUE AS is_pos FROM base WHERE doc_id % 4 <> 0
      |  UNION ALL
      |  SELECT text, FALSE FROM soup WHERE doc_id % 4 <> 0),
      |score AS (
      |  SELECT doc_id AS id, text FROM base WHERE doc_id % 4 = 0
      |  UNION ALL
      |  SELECT doc_id + 10000, text FROM soup WHERE doc_id % 4 = 0),
      |ttok AS (
      |  SELECT is_pos, unnest(list_filter(
      |    string_split_regex(lower(trim(text)), '\s+'),
      |    t -> t <> '')) AS tok
      |  FROM train),
      |tt AS (SELECT tok,
      |    sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS c_pos,
      |    sum(CASE WHEN NOT is_pos THEN 1 ELSE 0 END) AS c_neg
      |  FROM ttok GROUP BY tok),
      |tot AS (SELECT sum(c_pos) AS t_pos, sum(c_neg) AS t_neg,
      |    count(*) AS vsz FROM tt),
      |pri AS (SELECT
      |    sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS d_pos,
      |    sum(CASE WHEN NOT is_pos THEN 1 ELSE 0 END) AS d_neg
      |  FROM train),
      |stok AS (
      |  SELECT id, unnest(list_filter(
      |    string_split_regex(lower(trim(text)), '\s+'),
      |    t -> t <> '')) AS tok
      |  FROM score),
      |lp AS (SELECT id,
      |    ln((coalesce(c_pos, 0) + 1.0)
      |      / (t_pos + 1.0 * vsz)) AS lp_pos,
      |    ln((coalesce(c_neg, 0) + 1.0)
      |      / (t_neg + 1.0 * vsz)) AS lp_neg
      |  FROM stok LEFT JOIN tt USING (tok) CROSS JOIN tot),
      |pd AS (SELECT id, count(*) AS n_tokens,
      |    sum(lp_pos) AS s_pos, sum(lp_neg) AS s_neg
      |  FROM lp GROUP BY id),
      |sc AS (SELECT s.id,
      |    CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
      |    round(ln(CAST(d_pos AS DOUBLE) / d_neg)
      |      + coalesce(s_pos - s_neg, 0.0), 4) AS log_odds
      |  FROM score s LEFT JOIN pd ON s.id = pd.id CROSS JOIN pri)""".stripMargin

  /** The fixed keyword-query set shared by q88 (BM25) and q91 (RRF
    * fusion) — one definition so the two rankings grade the same
    * retrieval input. All terms exist in the synthetic vocabulary at
    * every shipped SF. */
  private def retrievalQueries(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((1L, "vector"), (1L, "join"),
      (2L, "customer"), (2L, "batch"), (2L, "window"),
      (3L, "slow"), (3L, "scan")).toDF("query_id", "term")
  }

  /** Documents with planted near-duplicates: every `modulo`-th doc is
    * re-added (id + 10000) with its first token dropped — deterministic,
    * engine-portable (the synthetic corpus itself has no near-dups). */
  private def plantedNearDups(s: SparkSession, dir: String, modulo: Int): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val pert = d.filter(col("doc_id") % modulo === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
    d.unionByName(pert)
  }

  /** Embeddings (as doubles) with planted near-duplicates: every 5th vector
    * re-added (id + 100000) shifted by +0.02 per component — cosine vs the
    * original ≈ 0.999, far above any unrelated pair (max 0.52). */
  private def plantedVecs(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), Vec.asDouble(col("embedding")).as("vec"))
    val pert = e.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("vec"), x => x + lit(0.02)).as("vec"))
    e.unionByName(pert)
  }

  /** Shared grading tail of q34/q35 (the Spark half of [[annPlantedOracle]]):
    * per planted query, the exact twin cosine plus the folded flag saying
    * the ANN index surfaced the twin in its top-k. Factored out so the
    * planted offset (+100000) and grading columns cannot drift between the
    * two queries. */
  private def gradePlantedTwins(ann: DataFrame, q: DataFrame,
      e: DataFrame): DataFrame = {
    val hits = ann
      .filter(col("neighbor_id") === col("query_id") + 100000)
      .select(col("query_id"), lit(true).as("hit"))
    val twins = q
      .join(e.filter(col("vec_id") >= 100000)
        .select((col("vec_id") - 100000).as("qid"), col("vec").as("tvec")),
        "qid")
      .select(col("qid").as("query_id"),
        (col("qid") + 100000).as("twin_id"),
        round(Vec.cosine(col("qvec"), col("tvec")), 6).as("twin_cosine"))
    twins.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("twin_id"), col("twin_cosine"),
        coalesce(col("hit"), lit(false)).as("twin_in_top10"))
      .orderBy(col("query_id"))
  }

  /** Oracle twin of q34 AND q35 — exact brute-force top-1 per planted query
    * over the planted corpus: the winner must be the +100000 twin at the
    * exact pair cosine (graded values), and TRUE asserts the ANN index found
    * it in its top-10 (the tolerance flag — FALSE on the Spark side fails
    * the hash). */
  private lazy val annPlantedOracle: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |allv AS (
      |  SELECT * FROM e
      |  UNION ALL
      |  SELECT vec_id + 100000, list_transform(v, x -> x + 0.02)
      |  FROM e WHERE vec_id % 5 = 0),
      |q AS (
      |  SELECT vec_id AS query_id, v AS qv FROM allv
      |  WHERE vec_id % 5 = 0 AND vec_id < 100000),
      |scored AS (
      |  SELECT query_id, p.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(qv, p.v), 6) AS cosine
      |  FROM q, allv p WHERE p.vec_id <> query_id),
      |top1 AS (
      |  SELECT query_id, neighbor_id, cosine, row_number() OVER (
      |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
      |  FROM scored)
      |SELECT query_id, neighbor_id AS twin_id, cosine AS twin_cosine,
      |  TRUE AS twin_in_top10
      |FROM top1 WHERE rn = 1 ORDER BY query_id""".stripMargin

  /** Oracle twin of q28 AND q29 — exact cosine near-dup closure over the
    * planted corpus (q29's LSH+rescoring equals it at 100% recall). */
  private lazy val embedNearDupOracle: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |allv AS (
      |  SELECT * FROM e
      |  UNION ALL
      |  SELECT vec_id + 100000, list_transform(v, x -> x + 0.02)
      |  FROM e WHERE vec_id % 5 = 0)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_cosine_similarity(a.v, b.v), 6) AS cosine
      |FROM allv a JOIN allv b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.v, b.v) >= 0.98
      |ORDER BY id_a, id_b""".stripMargin

  /** Oracle twin of q19 — word-3-gram Jaccard restated over DuckDB list
    * functions + an inverted-index join. */
  /** Shared oracle of q200 (inline IVF-PQ at the production operating
    * point) and q203 (the same pipeline through the persisted AnnIndex):
    * the full residual IVF-PQ at nlist = 64 / nprobe = 4 restated from
    * scratch — coarse assignment, residual encode, 4-list probe, ADC
    * top-10 — plus the exact round-6 brute-force truth, emitting
    * per-query recall@10 over the fixed 20-query set. */
  private lazy val ivfpqRecallOracle: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |cc AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx,
      |    v AS cv
      |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 64)),
      |asg AS (
      |  SELECT vec_id, v, cidx, cv FROM (
      |    SELECT e.vec_id, e.v, cc.cidx, cc.cv, row_number() OVER (
      |      PARTITION BY e.vec_id
      |      ORDER BY list_cosine_similarity(e.v, cc.cv) DESC, cc.cidx)
      |      AS rn
      |    FROM e CROSS JOIN cc) WHERE rn = 1),
      |res AS (
      |  SELECT vec_id, cidx, cv,
      |    list_transform(range(64), i -> v[i+1] - cv[i+1]) AS r
      |  FROM asg),
      |cbsrc AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, r
      |  FROM (SELECT vec_id, r FROM res
      |        ORDER BY vec_id LIMIT 16 OFFSET 64)),
      |cb AS (
      |  SELECT ms.m, code, r[ms.m*8+1 : ms.m*8+8] AS cbv
      |  FROM cbsrc CROSS JOIN (SELECT unnest(range(0, 8)) AS m) ms),
      |keys AS (
      |  SELECT d.vec_id, cb.m, cb.code, cb.cbv,
      |    round(list_inner_product(cb.cbv, cb.cbv)
      |      - 2 * list_inner_product(d.r[cb.m*8+1 : cb.m*8+8], cb.cbv),
      |      6) AS key
      |  FROM res d CROSS JOIN cb),
      |pick AS (
      |  SELECT vec_id, m, code, cbv FROM (
      |    SELECT vec_id, m, code, cbv, row_number() OVER (
      |      PARTITION BY vec_id, m ORDER BY key, code) AS rn
      |    FROM keys)
      |  WHERE rn = 1),
      |recon AS (
      |  SELECT p.vec_id, r.cidx,
      |    list_transform(range(64), i -> r.cv[i+1] + p.rh[i+1])
      |      AS xhat
      |  FROM (SELECT vec_id, flatten(list(cbv ORDER BY m)) AS rh
      |        FROM pick GROUP BY vec_id) p
      |  JOIN res r USING (vec_id)),
      |qs AS (SELECT vec_id AS query_id, v AS qv FROM e
      |       WHERE vec_id % 25 = 0 AND vec_id < 500),
      |probes AS (
      |  SELECT query_id, cidx FROM (
      |    SELECT q.query_id, cc.cidx, row_number() OVER (
      |      PARTITION BY q.query_id
      |      ORDER BY list_cosine_similarity(q.qv, cc.cv) DESC, cc.cidx)
      |      AS rn
      |    FROM qs q CROSS JOIN cc) WHERE rn <= 4),
      |approx AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id, row_number() OVER (
      |        PARTITION BY query_id
      |        ORDER BY pq_cosine DESC, neighbor_id) AS rank
      |    FROM (
      |      SELECT p.query_id, rc.vec_id AS neighbor_id,
      |        round(list_cosine_similarity(q.qv, rc.xhat), 6)
      |          AS pq_cosine
      |      FROM probes p JOIN qs q USING (query_id)
      |      JOIN recon rc
      |        ON rc.cidx = p.cidx AND rc.vec_id <> p.query_id))
      |  WHERE rank <= 10),
      |exact AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id, row_number() OVER (
      |        PARTITION BY query_id
      |        ORDER BY cosine DESC, neighbor_id) AS rank
      |    FROM (
      |      SELECT q.query_id, e2.vec_id AS neighbor_id,
      |        round(list_cosine_similarity(q.qv, e2.v), 6) AS cosine
      |      FROM qs q JOIN e e2 ON e2.vec_id <> q.query_id))
      |  WHERE rank <= 10),
      |hits AS (
      |  SELECT a.query_id, CAST(count(*) AS BIGINT) AS hits
      |  FROM exact x JOIN approx a
      |    ON a.query_id = x.query_id
      |    AND a.neighbor_id = x.neighbor_id
      |  GROUP BY a.query_id)
      |SELECT q.query_id, coalesce(h.hits, 0) AS hits,
      |  round(coalesce(h.hits, 0) / 10.0, 4) AS recall
      |FROM qs q LEFT JOIN hits h USING (query_id)
      |ORDER BY q.query_id""".stripMargin

  private lazy val jaccardOracle: String =
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000, regexp_replace(text, '^\S+\s+', '')
      |  FROM documents WHERE doc_id % 7 = 0),
      |tok AS (SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> t <> '') AS toks
      |  FROM all_docs),
      |sh AS (SELECT doc_id,
      |    CASE WHEN len(toks) >= 3
      |         THEN list_distinct(list_transform(range(len(toks) - 2),
      |                i -> array_to_string(toks[i + 1:i + 3], ' ')))
      |         ELSE [array_to_string(toks, ' ')] END AS shingles
      |  FROM tok),
      |posts AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
      |sizes AS (SELECT doc_id, count(*) AS n FROM posts GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      |  FROM posts a JOIN posts b
      |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7
      |ORDER BY id_a, id_b""".stripMargin

  /** q15's oracle without its final ORDER BY, for embedding as a subquery
    * (q46). */
  private lazy val docStatsNoOrder: String =
    docStatsOracle.stripSuffix(" ORDER BY doc_id")

  /** Oracle twin of q15 — the language-ID / quality formulas restated over
    * DuckDB list functions, parameterized by the source relation. Token
    * model: lower(trim(text)) split on \s+. */
  private lazy val docStatsOracle: String = docStatsSql("documents")

  private def docStatsSql(src: String): String = {
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
       |  FROM $src),
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
       |        THEN CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text)
       |        ELSE 0.0 END) < 0.2 THEN 1.0 ELSE 0.5 END
       |  ) / 4.0, 4) AS quality
       |FROM scored ORDER BY doc_id""".stripMargin
  }
}
