package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TSV sources / sinks with the reference's reader semantics
  * (SURVEY.md §2.1 S1-S7).
  *
  * - typed read = pandas dtype inference (reference clean_contacts.py:260)
  * - allString read = `dtype=str` + `fillna('')` (fill_missing_contacts.py:150)
  * - chunked reads (fill_missing_contacts_large.py:47-66) are free: Spark file
  *   scans are partitioned and pipelined by construction; the 10k-row chunk
  *   knob becomes `spark.sql.files.maxPartitionBytes`.
  * - the single-file TSV sink contract (clean_contacts.py:273) is honored via
  *   coalesce(1) behind a flag — the documented scalability exception
  *   (SURVEY.md §4): every other stage stays fully parallel.
  */
object Tsv {

  /** Typed TSV scan (S1): header + schema inference. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t").option("header", true)
      .option("inferSchema", true)
      // CSV fidelity against reference fixtures (SURVEY.md §7.4.7):
      // embedded-quote fields like """EXO""" use doubled quotes, and
      // quoted fields span lines (pandas honors both) -> multiLine. Cost:
      // per-FILE parallelism instead of per-split — fine for many-file
      // ingest dirs, documented for the single-giant-file case.
      .option("quote", "\"").option("escape", "\"")
      .option("multiLine", true)
      .csv(path)

  /** All-string TSV scan (S2): every cell StringType, nulls -> "". */
  def readAllString(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read
      .option("sep", "\t").option("header", true)
      .option("inferSchema", false)
      .option("quote", "\"").option("escape", "\"")
      .option("multiLine", true)
      .csv(path)
    df.na.fill("")
  }

  /** Enumerate `*.tsv` in a directory in deterministic sorted order (S4).
    * The reference iterates `os.listdir` order — platform-dependent; sorted
    * order is the explicit-determinism fix (SURVEY.md §4). Per-file schemas
    * differ, so this cannot be one glob read. */
  def listTsv(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.toLowerCase.endsWith(".tsv"))
      .map(_.getAbsolutePath).sorted.toSeq
  }

  /** Latest-file-by-mtime picker (S5; reference clean_contacts.py:239-245 —
    * dead code there, kept as a capability). Ties broken by name for
    * determinism. */
  def latestTsv(dir: String): Option[String] = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.toLowerCase.endsWith(".tsv"))
    if (files.isEmpty) None
    else Some(files.maxBy(f => (f.lastModified(), f.getName)).getAbsolutePath)
  }

  /** TSV sink (S6). `singleFile=true` honors the reference's one-file
    * contract (coalesce(1) + driver rename); false writes a normal
    * distributed directory of part files — the 100-TB default. */
  def write(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    val target = if (singleFile) path + ".dir" else path
    out.write.mode("overwrite")
      .option("sep", "\t").option("header", true)
      .option("quote", "\"").option("escape", "\"") // doubled-quote escaping, matching the readers
      .option("emptyValue", "").option("nullValue", "")
      // Spark's CSV WRITER trims cell whitespace by default (the write-side
      // defaults of ignore*WhiteSpace are true, unlike the read side) —
      // pandas to_csv preserves it, and so must this sink (caught by the
      // tools/parity.py field diff: raw export cells like "Director "
      // lost their trailing space)
      .option("ignoreLeadingWhiteSpace", false)
      .option("ignoreTrailingWhiteSpace", false)
      // reference timestamp shape, e.g. 2010-12-13 14:54:49.000
      // (output/MergedDatabase.tsv:2), not ISO-8601
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSS")
      .csv(target)
    if (singleFile) {
      val dir = new java.io.File(target)
      // the rename step is java.io — LOCAL filesystem only (the artifact
      // contract is a small export; distributed outputs use
      // singleFile=false). Fail with a clear message, not an NPE, on
      // hdfs://-style paths.
      val listed = Option(dir.listFiles()).getOrElse(sys.error(
        s"singleFile=true requires a local filesystem path; " +
          s"cannot list $target (non-local or unreadable)"))
      val part = listed.find(_.getName.startsWith("part-"))
        .getOrElse(sys.error(s"no part file written under $target"))
      val dest = new java.io.File(path)
      if (dest.exists() && !dest.delete())
        sys.error(s"cannot overwrite $path (existing non-empty directory?)")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
