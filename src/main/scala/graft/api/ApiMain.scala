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

    val stages: Map[String, () => String] = Map(
      "pipeline" -> (() => {
        val r = ContactsApp.run(spark, masterPath, sourcesDir, Some(artifacts))
        r.stages.map(s => f"${s.name}: ${s.seconds}%.2fs ${s.rows} rows")
          .mkString("; ") + s"; passed=${r.passed}"
      }),
      "validate" -> (() => {
        val master = ContactsApp.withResolvedKeys(ContactsApp.withRowIds(
          graft.pipeline.Tsv.readAllString(spark, masterPath)))
        val errs = graft.pipeline.Validate.errors(master)
        s"${errs.count()} validation errors"
      }))

    // on timeout, cancel the distributed work too — interrupting the REST
    // worker thread alone would leave the submitted Spark job running
    val srv = new RestServer(port, outDir, stages,
      onRunTimeout = () => spark.sparkContext.cancelAllJobs())
    srv.start()
    println(s"[api] listening on :${srv.boundPort} " +
      s"(stages: ${stages.keys.mkString(", ")})")
    Thread.currentThread().join() // serve until killed
  }
}
