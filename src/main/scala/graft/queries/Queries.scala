package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The driver-graded query registry: every SURVEY.md §2 operator family is
  * exercised by at least one query over the TESTDATA corpus, each with an
  * equivalent DuckDB oracle SQL twin (hash-compared at sf0.01).
  *
  * Conventions that make the hash compare work (see the driver contract):
  *  - every computed column is aliased identically in Spark and SQL;
  *  - aggregated doubles are rounded (summation order differs across engines
  *    in the last bits — rounding removes it); per-row double arithmetic is
  *    left exact (identical IEEE ops on identical inputs);
  *  - timestamps are emitted as formatted strings;
  *  - every ranking has a total order (explicit unique tiebreak column).
  */
object Queries {

  case class QueryDef(name: String,
      spark: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** The full registry: concatenation of the per-family shards (split in
    * round 16 — the 11.6k-line single file was a merge-conflict and
    * compile-time magnet). Name set and per-query semantics are
    * unchanged; RegistrySpec pins name uniqueness and count. */
  val all: Seq[QueryDef] = QueriesRelational.defs ++
    QueriesContacts.defs ++
    QueriesDedup.defs ++
    QueriesAnn.defs ++
    QueriesText.defs ++
    QueriesStream.defs ++
    QueriesMultimodal.defs
}
