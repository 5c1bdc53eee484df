package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every registry query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Each query is materialized through a noop-format write — unlike count(),
  * that computes every output column (count() would let Catalyst prune the
  * computed columns of pure-projection queries and understate the work).
  * One warm-up pass (untimed) absorbs JIT + codegen compilation so the
  * timings reflect steady-state execution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      finally {
        // helper caches (postings, signatures) built during one run would
        // otherwise satisfy the NEXT run's identical plan fragments via the
        // cache manager — the warm-up is for JIT/codegen, not data; each
        // timed run must pay its own materialization cost. Also bounds
        // executor storage across 62 queries x 3 passes. localCheckpoint'd
        // frames (Budget/RowIds/CC) bypass the CacheManager and need their
        // own unpersist.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s $sec%8.2f s")
      sec
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(runOnce) // warm-up: JIT, codegen cache, file listing
    // min of two timed runs: GC/JIT noise is one-sided, the minimum is the
    // stable steady-state estimate
    val results = names.map { n =>
      val a = runOnce(n); val b = runOnce(n)
      n -> (if (a < 0 || b < 0) math.max(a, b) else math.min(a, b))
    }

    // 3-decimal timings: the driver captures only the TAIL of stdout, and
    // full-precision doubles push the 62-query line past that window — the
    // truncated head then fails its JSON parse (BENCH_r02/r03 parsed:null).
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
