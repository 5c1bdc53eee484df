package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: native expressions reachable from SQL on a session
  * configured with the extensions hook. Extensions apply at session
  * construction, so this builds a fresh SparkSession (sharing the JVM's
  * SparkContext) and restores the shared one afterwards. */
class ExtensionsSpec extends AnyFunSuite {

  test("py_title and vec_dot callable from SQL via extensions") {
    val shared = SparkTestSession.spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = spark.sql(
        "SELECT py_title(\"o'brien x2y\") AS t, " +
          "vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
          "vec_dot_i8(array(0.5d, 2.0d), " +
          "array(CAST(3 AS TINYINT), CAST(-4 AS TINYINT))) AS d8").head()
      assert(r.getString(0) == "O'Brien X2Y")
      assert(r.getDouble(1) == 11.0)
      assert(r.getDouble(2) == 0.5 * 3 + 2.0 * -4)
      // binary-ANN kernel: popcount(3^1) + popcount(0^4) = 1 + 1
      assert(spark.sql("SELECT hamming_dist(array(3L), array(1L, 4L))")
        .head().getLong(0) == 2L)
      // NFC: decomposed e+U+0301 composes to U+00E9
      assert(spark.sql("SELECT nfc_normalize('Café')")
        .head().getString(0) == "Café")
      // composed text-analysis functions lowered through the bridge
      val t = spark.sql(
        "SELECT redact_pii('mail a@b.io or 555-867-5309') AS red, " +
          "email_count('a@b.io c@d.io') AS ne, " +
          "phone_count('555-867-5309') AS np, " +
          "lang_id('the cat and the dog are in the house') AS lang, " +
          "hamming64(7, 1) AS h, " +
          "bpe_count('hello world') AS bpe").head()
      assert(t.getString(0) == "mail <EMAIL> or <PHONE>")
      assert(t.getInt(1) == 2 && t.getInt(2) == 1)
      assert(t.getString(3) == "en")
      assert(t.getInt(4) == 2)
      assert(t.getLong(5) > 0)
      // quality/fingerprint/simhash: deterministic and equal to Column form
      val q = spark.sql(
        "SELECT quality_score('some reasonable english sentence here') AS q, " +
          "doc_fingerprint('a b c') AS fp, simhash64('a b c') AS sh").head()
      assert(q.getDouble(0) >= 0.0 && q.getDouble(0) <= 1.0)
      import org.apache.spark.sql.functions.lit
      val col = spark.range(1).select(
        graft.functions.Text.fingerprint(lit("a b c")),
        graft.functions.Text.simhash(lit("a b c"))).head()
      assert(q.getLong(1) == col.getLong(0) && q.getLong(2) == col.getLong(1))
      // aggregate registration: the analyzer must wrap the bare
      // AggregateFunction; exercised through GROUP BY (per-group buffers)
      spark.range(100).selectExpr("id % 2 AS grp",
        "CASE WHEN id % 3 = 0 THEN 'fizz' " +
          "ELSE concat('x', id) END AS w").createOrReplaceTempView("mg_words")
      val rows = spark.sql(
        "SELECT grp, misra_gries(w, 4) AS c FROM mg_words GROUP BY grp")
        .collect()
      assert(rows.length == 2)
      for (r <- rows) {
        val hh = r.getSeq[String](1)
        assert(hh.contains("fizz") && hh.size <= 4 && hh == hh.sorted)
      }
      val vs = spark.sql(
        "SELECT vec_sum(v) FROM VALUES (array(1.0d, 2.0d)), " +
          "(array(3.0d, 4.0d)) AS t(v)").head().getSeq[Double](0)
      assert(vs == Seq(4.0, 6.0))
      // pq_argmin: codebook [[1,0],[0,1]], consts = ||cb||^2 = [1,1];
      // sub (0.9, 0.1) -> keys [1-1.8, 1-0.2] -> code 0; ties -> code 0
      val pq = spark.sql(
        "SELECT pq_argmin(array(0.9d, 0.1d), " +
          "array(array(1.0d, 0.0d), array(0.0d, 1.0d)), " +
          "array(1.0d, 1.0d)) AS c, " +
          "pq_argmin(array(0.5d, 0.5d), " +
          "array(array(1.0d, 0.0d), array(0.0d, 1.0d)), " +
          "array(1.0d, 1.0d)) AS tie").head()
      assert(pq.getByte(0) == 0.toByte && pq.getByte(1) == 0.toByte)
      // bloom: build words over 0..99 in SQL, every key must test positive
      // and a disjoint probe range must be mostly negative
      spark.range(100).createOrReplaceTempView("bl_keys")
      spark.sql("SELECT bloom_agg(id, 4096, 5) AS w FROM bl_keys")
        .createOrReplaceTempView("bl_words")
      val fneg = spark.sql(
        "SELECT count(*) FROM bl_keys CROSS JOIN bl_words " +
          "WHERE NOT bloom_contains(w, id, 4096, 5)").head().getLong(0)
      assert(fneg == 0L, s"$fneg SQL-path false negatives")
      // cms: estimates of a skewed stream never undercount
      spark.range(300).selectExpr("concat('k', id % 7) AS w")
        .createOrReplaceTempView("cms_words")
      spark.sql("SELECT cms_agg(w, 512, 4) AS m FROM cms_words")
        .createOrReplaceTempView("cms_sketch")
      val under = spark.sql(
        "SELECT count(*) FROM (SELECT w, count(*) AS c FROM cms_words " +
          "GROUP BY w) CROSS JOIN cms_sketch " +
          "WHERE cms_estimate(m, w, 512, 4) < c").head().getLong(0)
      assert(under == 0L, s"$under SQL-path undercounts")
      // kmv: SQL-path sketch == Column-API sketch
      spark.range(1, 501)
        .selectExpr("conv(substring(md5(cast(id AS STRING)), 1, 15), " +
          "16, 10) AS hs")
        .selectExpr("cast(hs AS bigint) AS h")
        .createOrReplaceTempView("kmv_in")
      val viaSql = spark.sql("SELECT kmv_agg(h, 16) FROM kmv_in")
        .head().getSeq[Long](0)
      val viaCol = spark.table("kmv_in")
        .agg(graft.expressions.Kmv.column(
          org.apache.spark.sql.functions.col("h"), 16))
        .head().getSeq[Long](0)
      assert(viaSql == viaCol && viaSql.length == 16)
      // topk: SQL-path best-first array equals the window top-3
      spark.range(100)
        .selectExpr("concat('g', id % 2) AS g",
          "CAST(id % 11 AS DOUBLE) AS s", "id")
        .createOrReplaceTempView("tk_in")
      val tk = spark.sql(
        "SELECT g, e.id FROM (SELECT g, topk_agg(s, id, 3) AS t " +
          "FROM tk_in GROUP BY g) LATERAL VIEW explode(t) AS e " +
          "ORDER BY g, e.score DESC, e.id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val wtk = spark.sql(
        "SELECT g, id FROM (SELECT g, id, row_number() OVER (" +
          "PARTITION BY g ORDER BY s DESC, id) AS rn FROM tk_in) " +
          "WHERE rn <= 3 ORDER BY g, rn")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(tk == wtk)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
