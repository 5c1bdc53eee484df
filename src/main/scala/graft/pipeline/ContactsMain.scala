package graft.pipeline

import org.apache.spark.sql.SparkSession

/** CLI for the full contacts pipeline (the `python cleaning/run.py`
  * equivalent): ContactsMain <masterTsv> <sourcesDir> <outDir>
  *
  * Writes cleaned_contacts.tsv, fill_missing_log.json and
  * validation_errors.json into outDir, prints per-stage timings and the
  * validation exit policy, exits non-zero on critical errors
  * (SURVEY.md §3.1, validate_fields.py:144-162). */
object ContactsMain {
  def main(args: Array[String]): Unit = {
    val Array(masterPath, sourcesDir, outDir) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val r = ContactsApp.run(spark, masterPath, sourcesDir,
      Some(ContactsApp.Artifacts(
        s"$outDir/cleaned_contacts.tsv",
        s"$outDir/fill_missing_log.json",
        s"$outDir/validation_errors.json")))

    r.stages.foreach(s =>
      println(f"[stage] ${s.name}%-10s ${s.seconds}%8.2f s  ${s.rows}%8d rows"))
    println(s"[result] cleaned=${r.cleaned.count()} rows, " +
      s"fills=${r.changeLog.count()}, errors=${r.validationErrors.count()}, " +
      s"passed=${r.passed}")
    spark.stop()
    if (!r.passed) sys.exit(1)
  }
}
