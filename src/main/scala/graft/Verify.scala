package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // mirror Bench's join-strategy posture so the oracle-verified plans
      // are the benched plans (see Bench.scala)
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    def deleteRecursively(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
      f.delete()
    }
    // SPARK_GRAFT_ONLY=q77_kmeans_clusters,... restricts the dump for local
    // iteration (same contract as Bench); the driver never sets it and runs
    // the full registry. The oracle map below is filtered identically so
    // check_oracle.py (with GRAFT_ALLOW_SUBSET=1) sees a consistent subset.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    queries.foreach { case (name, fn) =>
      val target = new java.io.File(s"$outDir/$name")
      // a failed query must not leave a PRIOR run's output behind — the
      // driver would grade the stale (possibly passing) result as current
      deleteRecursively(target)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(target.getPath)
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name
        deleteRecursively(target)
      }
      finally {
        // bound storage across the registry run: operator helper caches and
        // localCheckpoint'd frames are per-query scratch, not shared state
        graft.pipeline.Pins.flush()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Registry manifest for the gate: every attempted query plus the ones
    // that threw. check_oracle.py fails the gate on any `failed` entry and
    // on any registry name with no dump — so a query with no SQL twin
    // (rows-only check driver-side) still cannot ship unexecuted.
    val manifest = s"""{"queries": [${queries.keys.toSeq.sorted
        .map(q).mkString(", ")}], "failed": [${failed.sorted
        .map(q).mkString(", ")}]}"""
    Files.writeString(Paths.get(s"$outDir/registry.json"), manifest)
    spark.stop()
  }
}
