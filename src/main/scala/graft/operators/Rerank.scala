package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * distributed and bounded by |queries|·N²; the greedy loop is
  * inherently sequential PER QUERY but queries are independent, so it
  * runs EXECUTOR-LOCAL as a per-query co-group (candidates and sims
  * shuffled once on qid, each group's O(k·N) greedy in one task's
  * memory). Nothing query-spanning ever reaches the driver — a
  * million-query fan-out is a million independent groups. */
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
    import spark.implicits._

    val cand = candidates
      .select(col(qidCol).cast("long"), col(cidCol).cast("long"),
        col(relCol).cast("double"))
      .as[(Long, Long, Double)]
    val sim = sims
      .select(col(qidCol).cast("long"), col("a").cast("long"),
        col("b").cast("long"), col(simCol).cast("double"))
      .as[(Long, Long, Long, Double)]

    // one shuffle per side on qid; each group's greedy is executor-local
    cand.groupByKey(_._1).cogroup(sim.groupByKey(_._1)) {
      (q, cs, ss) =>
        def r7(x: Double): Double = BigDecimal(x)
          .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
        val rows = cs.toVector
        val rel = rows.map(r => r._2 -> r._3).toMap
        val simMap = ss.flatMap { case (_, a, b, s0) =>
          Seq((a, b) -> s0, (b, a) -> s0)
        }.toMap
        var remaining = rows.map(_._2).sorted
        var selected = Vector.empty[Long]
        val picks = Vector.newBuilder[(Long, Int, Long, Double, Double)]
        for (step <- 1 to math.min(k, remaining.size)) {
          val scored = remaining.map { c =>
            val maxSim =
              if (selected.isEmpty) 0.0
              else selected.map(s1 =>
                simMap.getOrElse((c, s1), 0.0)).max
            c -> r7(lambda * rel(c) - (1 - lambda) * maxSim)
          }
          val (bestC, bestS) = scored.maxBy { case (c, s1) => (s1, -c) }
          picks += ((q, step, bestC, rel(bestC), bestS))
          selected :+= bestC
          remaining = remaining.filterNot(_ == bestC)
        }
        picks.result().iterator
    }.toDF("query_id", "sel_rank", "cand_id", "rel", "mmr_score")
  }
}
