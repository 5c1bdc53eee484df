package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
  * SIGIR 1998) — greedy diversity-aware selection over a retrieved
  * candidate set: pick argmax of λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s),
  * k times. The curation uses: diverse few-shot example selection,
  * RAG context packing (near-duplicate passages waste the context
  * window), and eval-set construction — relevance alone returns k
  * paraphrases of the same document; MMR trades relevance against
  * redundancy explicitly.
  *
  * Scale posture: candidate generation (ANN top-N per query) and the
  * candidate–candidate similarity matrix (N² per query) stay
  * distributed and bounded by |queries|·N²; the greedy loop itself is
  * inherently sequential PER QUERY with O(k·N) state, so it runs
  * driver-side on the collected candidate/similarity frames — the
  * Lloyd/PQ/Bradley–Terry driver-side-model stance. For a production
  * fan-out over millions of queries the same greedy runs as a
  * per-query grouped map; the relational prep is identical. */
object Rerank {

  /** Greedy MMR over precomputed per-query candidates and pairwise
    * sims. `candidates`: (qidCol, cidCol, relCol) — rel pre-rounded by
    * the caller for engine parity; `sims`: (qidCol, "a", "b", simCol)
    * with one row per unordered candidate pair (either orientation).
    * Output: (qid, sel_rank 1..k, cid, rel, mmr_score), ties broken by
    * lower cid. The score rounds to SEVEN decimals deliberately: on
    * 6-decimal inputs λ·rel − (1−λ)·sim is an exact 7-decimal value,
    * so a 6-decimal round would sit exactly on half-boundaries where
    * engines' rounding of the nearest double legitimately disagrees
    * (observed at sf0.01); at 7 both engines recover the exact decimal
    * and no boundary exists. */
  def mmr(candidates: DataFrame, qidCol: String, cidCol: String,
      relCol: String, sims: DataFrame, simCol: String,
      lambda: Double = 0.7, k: Int = 5): DataFrame = {
    val spark = candidates.sparkSession
    def r7(x: Double): Double =
      BigDecimal(x).setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble

    val cand = candidates
      .select(col(qidCol).cast("long"), col(cidCol).cast("long"),
        col(relCol).cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val simMap = sims
      .select(col(qidCol).cast("long"), col("a").cast("long"),
        col("b").cast("long"), col(simCol).cast("double"))
      .collect().flatMap { r =>
        val (q, a, b, s) = (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))
        Seq((q, a, b) -> s, (q, b, a) -> s)
      }.toMap

    val out = cand.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (q, rows) =>
        val rel = rows.map(r => r._2 -> r._3).toMap
        var remaining = rows.map(_._2).sorted.toVector
        var selected = Vector.empty[Long]
        val picks = Seq.newBuilder[(Long, Int, Long, Double, Double)]
        for (step <- 1 to math.min(k, remaining.size)) {
          val scored = remaining.map { c =>
            val maxSim =
              if (selected.isEmpty) 0.0
              else selected.map(s0 =>
                simMap.getOrElse((q, c, s0), 0.0)).max
            c -> r7(lambda * rel(c) - (1 - lambda) * maxSim)
          }
          val (bestC, bestS) = scored.maxBy { case (c, s0) => (s0, -c) }
          picks += ((q, step, bestC, rel(bestC), bestS))
          selected :+= bestC
          remaining = remaining.filterNot(_ == bestC)
        }
        picks.result()
    }
    val schema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("sel_rank", IntegerType, nullable = false),
      StructField("cand_id", LongType, nullable = false),
      StructField("rel", DoubleType, nullable = false),
      StructField("mmr_score", DoubleType, nullable = false)))
    spark.createDataFrame(
      out.map(t => Row(t._1, t._2, t._3, t._4, t._5)).asJava, schema)
  }
}
