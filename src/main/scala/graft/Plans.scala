package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for selected registry queries
  * so broadcast choices, pushed filters, read schemas, and whole-stage
  * codegen spans can be reviewed (and regressions spotted) without a
  * debugger. Usage: runMain graft.Plans [queryName ...] */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // same timezone as the graded Verify/Bench sessions — timezone-aware
      // expression folding (timestamp casts in pushed filters, date_format)
      // must audit the plan the driver actually runs
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q2_revenue_filter", "q3_top_orders",
        "q9_part_text", "q21_ann_topk", "q28_embed_neardup")
    try
      for (n <- names) {
        println(s"\n========== $n ==========")
        SparkEntry.queries.get(n) match {
          case Some(q) => q(spark, sfDir).explain("formatted")
          case None => println(
            s"unknown query '$n' — valid names:\n  " +
              SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
        }
      }
    finally spark.stop()
  }
}
