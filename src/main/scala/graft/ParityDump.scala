package graft

import org.apache.spark.sql.SparkSession

/** Parity-lane dump (tools/parity.py): run the engine's clean and
  * golden-record stages over ONE master TSV and export both stages as
  * single-file TSVs, so the Python harness can diff them field-by-field
  * against the output of the reference's own `clean_contacts.py` executed
  * on the same fixture — the executable pin of DIVERGENCES.md (every
  * mismatch must fall into a documented divergence class; anything else
  * fails the lane).
  *
  * Usage: runMain graft.ParityDump <masterTsv> <outPrefix>
  * Writes <outPrefix>.clean.tsv (post-Clean, pre-dedup, original row set)
  * and <outPrefix>.golden.tsv (post golden-record merge). */
object ParityDump {
  def main(args: Array[String]): Unit = {
    val Array(inTsv, outPrefix) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val master = pipeline.ContactsApp.withRowIds(
      pipeline.Tsv.read(spark, inTsv))
    val cleaned = pipeline.Clean(master)
    pipeline.Tsv.write(cleaned.drop("row_id"), s"$outPrefix.clean.tsv",
      singleFile = true)
    val golden = pipeline.GoldenRecord.dedupe(cleaned, rowIdCol = "row_id",
      lastUpdatedCol = pipeline.Roles.exact(cleaned, "LAST_UPDATED"))
    pipeline.Tsv.write(golden.drop("row_id"), s"$outPrefix.golden.tsv",
      singleFile = true)
    pipeline.Pins.flush()
    spark.stop()
  }
}
