package graft.api

import org.apache.spark.sql.SparkSession

import graft.pipeline.ContactsApp

/** Runnable REST control surface (the backend_api.py equivalent):
  *
  *   ApiMain <masterTsv> <sourcesDir> <outDir> [port]
  *
  * Exposes the pipeline stages over HTTP on ONE shared SparkSession:
  *   GET  /stages, POST /run {"stage":"pipeline"}, GET /output-files,
  *   GET  /output/<name>
  */
object ApiMain {
  def main(args: Array[String]): Unit = {
    val Array(masterPath, sourcesDir, outDir) = args.take(3)
    val port = args.lift(3).map(_.toInt).getOrElse(8097)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    def artifacts = ContactsApp.Artifacts(
      s"$outDir/cleaned_contacts.tsv",
      s"$outDir/fill_missing_log.json",
      s"$outDir/validation_errors.json")

    // helper caches built inside operators (postings, signatures, exploded
    // lines) are scoped to one run; without this they would accumulate in
    // executor storage for the lifetime of the served session. clearCache
    // only covers CacheManager entries — localCheckpoint'd frames (Fill's
    // per-source checkpoints, Budget/RowIds pinned partitionings, the CC
    // label frame) live as persistent RDDs and need their own unpersist.
    // CONSTRAINT: this cleanup is correct only because runs are fully
    // serialized (single-thread run executor) and each stage materializes
    // its results before returning — a localCheckpoint'd frame has
    // truncated lineage, so accessing it AFTER unpersist throws
    // ("checkpoint block not found") rather than recomputing. Keep the
    // cleanup at run end on the serialized executor; do not widen the pool
    // or return lazily-consumed frames from stages without revisiting it.
    def cleanedUp(f: () => String): () => String =
      () => try f() finally {
        graft.pipeline.Pins.flush() // drain the scoped-pin registry too
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }

    val stages: Map[String, () => String] = Map(
      "pipeline" -> cleanedUp(() => {
        val r = ContactsApp.run(spark, masterPath, sourcesDir, Some(artifacts))
        r.stages.map(s => f"${s.name}: ${s.seconds}%.2fs ${s.rows} rows")
          .mkString("; ") + s"; passed=${r.passed}"
      }),
      "validate" -> cleanedUp(() => {
        val master = ContactsApp.withResolvedKeys(ContactsApp.withRowIds(
          graft.pipeline.Tsv.readAllString(spark, masterPath)))
        val errs = graft.pipeline.Validate.errors(master)
        s"${errs.count()} validation errors"
      }))

    // on timeout, cancel the distributed work too — interrupting the REST
    // worker thread alone would leave the submitted Spark job running. Each
    // run's jobs are scoped to its run-id job group (set on the worker
    // thread), so the timeout cancels exactly that run: a run that timed out
    // while still queued has an empty group and the cancel is a no-op,
    // never touching a later run's jobs.
    val srv = new RestServer(port, outDir, stages,
      onRunStart = id => spark.sparkContext.setJobGroup(id,
        s"REST run $id", interruptOnCancel = true),
      onRunTimeout = id => spark.sparkContext.cancelJobGroup(id))
    srv.start()
    println(s"[api] listening on :${srv.boundPort} " +
      s"(stages: ${stages.keys.mkString(", ")})")
    Thread.currentThread().join() // serve until killed
  }
}

/** Shape-parity harness main (tools/rest_parity.py): a [[RestServer]]
  * with canned stages and NO SparkSession, so the lane compares pure
  * HTTP/JSON contracts — status codes, key sets, the
  * stdout/stderr/returncode run answer — against the reference's
  * backend_api.py executed in-process by the Python harness (Flask test
  * client). Usage: runMain graft.api.RestParityMain <outDir> [port] */
object RestParityMain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val port = args.lift(1).map(_.toInt).getOrElse(0)
    val srv = new RestServer(port, outDir, Map(
      "ok_stage" -> (() => "stage completed fine"),
      "fail_stage" -> (() => sys.error("stage failed"))))
    srv.start()
    println(s"[restparity] listening on :${srv.boundPort}")
    Thread.currentThread().join() // serve until killed by the harness
  }
}
