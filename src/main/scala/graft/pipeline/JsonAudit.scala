package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** JSON audit sink (SURVEY.md §2.1 S8): the reference writes its change log
  * and validation errors as ONE pretty-printed JSON array
  * (fill_missing_contacts.py:239-240, validate_fields.py:136-137).
  *
  * Two modes:
  *  - [[writeArray]]: the artifact-parity path — collect to the driver and
  *    write a single pretty JSON array file. Audit datasets are tiny
  *    relative to the data (per-fill / per-error rows), but this is still
  *    the documented scalability exception; cap with `maxRows`.
  *  - [[writeDistributed]]: `.write.json` — newline-delimited JSON part
  *    files, the 100-TB default.
  */
object JsonAudit {

  /** Single pretty-printed JSON array (reference artifact shape).
    * Values are rendered as JSON strings/numbers/nulls per field type —
    * null fields are EMITTED (`"x": null`), matching the reference's
    * json.dump, not dropped the way `df.toJSON` does by default. */
  def writeArray(df: DataFrame, path: String, maxRows: Int = 1000000): Unit = {
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val rows = df
      .select(to_json(struct(df.columns.map(c => col(s"`$c`")).toSeq: _*),
        Map("ignoreNullFields" -> "false")))
      .take(maxRows + 1).map(_.getString(0))
    require(rows.length <= maxRows,
      s"audit dataset exceeds $maxRows rows; use writeDistributed")
    // toJSON yields compact per-row objects; indent them into a pretty array
    val body =
      if (rows.isEmpty) "[]"
      else rows.map(r => "  " + r).mkString("[\n", ",\n", "\n]")
    Files.write(Paths.get(path), body.getBytes(StandardCharsets.UTF_8))
  }

  /** Distributed newline-delimited JSON (the scale path). */
  def writeDistributed(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)
}
