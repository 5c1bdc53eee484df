package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vec

/** Streaming distribution-drift monitoring — the serving lane of
  * [[graft.operators.Drift]]: freeze a PSI baseline in batch, then
  * score an unbounded event stream per event-time window with ONE
  * streaming aggregation.
  *
  * Design constraint: PSI needs every bin's count per (window, key),
  * but chaining a per-(key, window, bin) count into a second
  * aggregation is a multi-level streaming agg (restricted, more
  * state). Instead each row projects to a ONE-HOT bin vector and the
  * per-(window, key) bin histogram is a single [[Vec.sumAgg]] native
  * aggregate (the same mergeable-kernel stance as the streaming
  * CMS/Bloom lane); the PSI then folds over the aggregated vector and
  * the baseline LITERALS as a pure row expression. Baseline edges and
  * counts are model-sized (|keys|·bins) and fold into when-chains —
  * no join, no broadcast, no second agg anywhere in the stream.
  *
  * Smoothing matches Drift.psi exactly ((n + 0.5) / (N + bins/2)), so
  * a stream window over the same rows reproduces the batch PSI to the
  * rounded digit — spec'd stream == batch. */
object DriftStream {

  /** Frozen per-key baseline: [lo, hi) value range and bin counts. */
  case class PsiBaseline(lo: Map[String, Double], hi: Map[String, Double],
      counts: Map[String, Array[Long]], bins: Int)

  /** Compute the baseline batch-side — two distributed aggregates
    * (the corpus is never collected), then collect the |keys| range
    * rows and the |keys|·bins count rows (model-sized, the
    * ClassifyStream serving stance). */
  def psiBaseline(df: DataFrame, keyCol: String, valueCol: String,
      bins: Int = 10): PsiBaseline = {
    val range = df.groupBy(col(keyCol)).agg(
      min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1),
        r.getDouble(2)))).toMap
    val lo = range.map { case (k, v) => k -> v._1 }
    val hi = range.map { case (k, v) => k -> v._2 }
    val loC = whenChain(lo.map { case (k, v) => k -> lit(v) },
      col(keyCol))
    val hiC = whenChain(hi.map { case (k, v) => k -> lit(v) },
      col(keyCol))
    val cnt = df
      .select(col(keyCol), binExpr(col(valueCol), loC, hiC, bins)
        .as("__bin"))
      .groupBy(col(keyCol), col("__bin")).agg(count(lit(1)).as("n"))
      .collect()
    val counts = cnt.groupBy(_.getString(0)).map { case (k, rows) =>
      val arr = Array.fill(bins)(0L)
      rows.foreach(r => arr(r.getLong(1).toInt) = r.getLong(2))
      k -> arr
    }
    PsiBaseline(lo, hi, counts, bins)
  }

  private def binExpr(value: Column, loC: Column, hiC: Column,
      bins: Int): Column =
    when(hiC === loC, lit(0L)).otherwise(least(greatest(
      floor((value - loC) / (hiC - loC) * bins).cast("long"),
      lit(0L)), lit(bins - 1L)))

  private def whenChain(m: Map[String, Column], key: Column): Column =
    m.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (k, c)) => when(key === k, c).otherwise(acc)
    }

  /** Score a (possibly streaming) frame per event-time window. Output
    * per (window, key): n_cur, psi (rounded 6), alarm (psi > 0.25, the
    * conventional cut). Keys absent from the baseline are dropped. */
  def psiOverWindows(stream: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, base: PsiBaseline,
      windowDur: String = "1 hour"): DataFrame = {
    val bins = base.bins
    val keys = base.counts.keys.toSeq.sorted
    val loC = whenChain(base.lo.map { case (k, v) => k -> lit(v) },
      col(keyCol))
    val hiC = whenChain(base.hi.map { case (k, v) => k -> lit(v) },
      col(keyCol))
    val binC = binExpr(col(valueCol), loC, hiC, bins)
    val oneHot = transform(sequence(lit(0), lit(bins - 1)),
      i => when(i === binC.cast("int"), 1.0).otherwise(0.0))
    val agg = stream
      .filter(col(keyCol).isin(keys: _*))
      .select(col(keyCol), col(tsCol).as("__ts"), oneHot.as("__oh"))
      .groupBy(window(col("__ts"), windowDur), col(keyCol))
      .agg(Vec.sumAgg(col("__oh")).as("__cur"),
        count(lit(1)).as("n_cur"))
    // per-key baseline count vector as a literal array column
    val baseVec = keys.foldLeft(lit(null).cast("array<double>")) {
      (acc, k) => when(col(keyCol) === k,
        array(base.counts(k).map(c => lit(c.toDouble)): _*))
        .otherwise(acc)
    }
    val nBase = keys.foldLeft(lit(null).cast("double")) { (acc, k) =>
      when(col(keyCol) === k, lit(base.counts(k).sum.toDouble))
        .otherwise(acc)
    }
    val psi = aggregate(
      zip_with(col("__cur"), baseVec, (c, b) => {
        val pc = (c + lit(0.5)) / (col("n_cur") + lit(bins * 0.5))
        val pb = (b + lit(0.5)) / (nBase + lit(bins * 0.5))
        (pc - pb) * log(pc / pb)
      }),
      lit(0.0), (acc, x) => acc + x)
    agg.select(col("window"), col(keyCol), col("n_cur"),
        round(psi, 6).as("psi"))
      .withColumn("alarm", col("psi") > 0.25)
  }
}
