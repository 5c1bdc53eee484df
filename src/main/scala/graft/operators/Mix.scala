package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-based corpus mixing — the multilingual sampling-rate rule of
  * mT5 / XLM-R (Conneau et al. 2020 §3.1; Raffel et al. 2020 §3.4.3 use the
  * same exponent form): a domain with natural share p_i of the corpus is
  * sampled with probability q_i proportional to p_i^alpha, alpha in (0, 1].
  * alpha = 1 reproduces natural sampling; alpha -> 0 approaches uniform;
  * the papers' alpha = 0.3 boosts low-resource domains without flattening
  * the head. Complements [[Budget]]'s hard per-domain token caps (q60):
  * temperature mixing sets the RATES, budget selection enforces the caps.
  *
  * Scale posture (100 TB): one corpus scan -> hash aggregate keyed on the
  * domain (shuffle = |domains| rows, map-side combined); everything after
  * the aggregate is arithmetic over the domain-sized frame (|domains| is
  * metadata-sized — tens to thousands). The normalizer sum(p^alpha) is a
  * single-row aggregate broadcast back as a literal column. The one window
  * (remainder ranking for the budget correction) partitions nothing but
  * runs over the |domains|-row frame, not the corpus — deliberate and safe.
  */
object Mix {

  /** Per-domain temperature-sampling weights over `df` grouped by
    * `domainCol`, sized by `weight` (e.g. a token count — pass `lit(1L)`
    * for doc-count shares). Returns one row per domain:
    * (domain, n_weight, nat_share, temp_share, budget_rows) where
    * nat_share = p_i, temp_share = q_i ~ p_i^alpha (both rounded to 6),
    * and budget_rows apportions `budget` across domains by the
    * largest-remainder method over the ROUNDED q_i (integer micro-shares:
    * budget_rows_i = floor(q6_i * budget / 1e6) plus one of the
    * deficit corrections below), so sum(budget_rows) == budget exactly —
    * independent rounding would drift by up to |domains|/2 rows, and the
    * integer arithmetic keeps the apportionment bit-identical across
    * engines (no floor-of-a-float at an integer boundary).
    * Tie-breaks are total: (remainder desc, domain asc) for the +1s,
    * (remainder asc, domain desc) for the (rare, micro-rounding-induced)
    * -1s.
    *
    * Guard: a negative or null per-domain weight sum would silently poison
    * the normalizer into NaN; it raises instead. */
  def temperatureWeights(df: DataFrame, domainCol: String, weight: Column,
      alpha: Double = 0.3, budget: Long = 1000000L): DataFrame = {
    val byDom = df.groupBy(col(domainCol))
      .agg(sum(weight).as("n_weight"))
      .withColumn("n_weight",
        when(col("n_weight").isNull || col("n_weight") < 0,
          raise_error(concat(
            lit("Mix.temperatureWeights: negative or null weight sum for "
              + "domain "), col(domainCol).cast("string"))))
          .otherwise(col("n_weight")))
    val tot = byDom.agg(sum(col("n_weight")).as("n_total"))
    val shares = byDom.crossJoin(broadcast(tot))
      .select(col(domainCol), col("n_weight"),
        (col("n_weight").cast("double") / col("n_total")).as("p"))
      .withColumn("p_a", pow(col("p"), lit(alpha)))
    val norm = shares.agg(sum(col("p_a")).as("z"))
    // integer micro-shares: q rounded to 6 decimals, as a long in [0, 1e6]
    val micro = shares.crossJoin(broadcast(norm))
      .select(col(domainCol), col("n_weight"),
        round(col("p"), 6).as("nat_share"),
        round(col("p_a") / col("z") * 1e6, 0).cast("long").as("q6"))
      .withColumn("fl", expr(s"q6 * ${budget}L div 1000000L"))
      .withColumn("rem", (col("q6") * lit(budget)) % lit(1000000L))
    val deficit = micro.agg(
      (lit(budget) - sum(col("fl"))).as("deficit"))
    val up = Window.orderBy(col("rem").desc, col(domainCol).asc)
    val down = Window.orderBy(col("rem").asc, col(domainCol).desc)
    micro.crossJoin(broadcast(deficit))
      .withColumn("rk_up", row_number().over(up))
      .withColumn("rk_down", row_number().over(down))
      .select(col(domainCol), col("n_weight"), col("nat_share"),
        round(col("q6").cast("double") / 1e6, 6).as("temp_share"),
        (col("fl")
          + when(col("rk_up") <= col("deficit"), 1L).otherwise(0L)
          - when(col("rk_down") <= -col("deficit"), 1L).otherwise(0L))
          .as("budget_rows"))
  }

  /** Class-balanced re-weighting by effective number of samples (Cui
    * et al., CVPR 2019): the marginal value of the n-th sample of a
    * class decays, so weight classes by 1/E_n with E_n = (1−β^n)/(1−β)
    * instead of the over-aggressive 1/n. The curation use: loss
    * weights (or sampling multipliers) for imbalanced label/language
    * distributions where inverse-frequency overweights tiny classes
    * into noise amplifiers. β→0 recovers uniform, β→1 recovers
    * inverse-frequency; the paper's β = (N−1)/N defaults near 0.999.
    * One |classes|-row aggregate + arithmetic; weights normalized to
    * sum to |classes| (the paper's convention). */
  def classBalancedWeights(df: DataFrame, classCol: String,
      beta: Double = 0.999): DataFrame = {
    val byCls = df.groupBy(col(classCol)).agg(count(lit(1)).as("n"))
      .withColumn("en", (lit(1.0) - pow(lit(beta), col("n")))
        / lit(1.0 - beta))
      .withColumn("w_raw", lit(1.0) / col("en"))
    val norm = byCls.agg(sum(col("w_raw")).as("z"),
      count(lit(1)).as("k"))
    byCls.crossJoin(broadcast(norm))
      .select(col(classCol), col("n"), round(col("en"), 4).as("eff_n"),
        round(col("w_raw") * col("k") / col("z"), 6).as("weight"))
  }

  /** Neyman-optimal stratified-sample allocation (Neyman 1934): split a
    * sampling budget across strata as n_h ∝ N_h·σ_h — the allocation
    * that minimizes the variance of the stratified estimate. The audit
    * use: eval/QA sampling where a uniform or proportional draw wastes
    * budget on homogeneous strata (every doc alike — a handful suffices)
    * and starves the heterogeneous ones. Output compares both: the
    * proportional allocation (n_h ∝ N_h) rides the same machinery.
    *
    * Both allocations apportion by largest remainder over INTEGER
    * micro-weights (Neyman: round(σ6·1e6)·N_h; proportional: N_h), the
    * [[temperatureWeights]] stance — sums hit the budget exactly and no
    * floor-of-a-float sits on an integer boundary. Raises on an
    * all-zero-variance corpus (the Neyman weights would be 0/0).
    * Allocations are NOT capped at the stratum size — a tiny volatile
    * stratum can be allocated more than it has; the caller decides
    * whether to cap and redistribute (standard survey practice varies).
    *
    * Scale: one stratum-keyed aggregate over the corpus; everything
    * after is arithmetic and |strata|-row windows. */
  def neymanAllocation(df: DataFrame, stratumCol: String, metric: Column,
      sampleBudget: Long = 1000L): DataFrame = {
    val byStr = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_rows"),
        round(coalesce(stddev_pop(metric), lit(0.0)), 6).as("sd"))
      .withColumn("m",
        round(col("sd") * 1e6, 0).cast("long") * col("n_rows"))
    val tot = byStr.agg(sum(col("m")).as("mm"),
      sum(col("n_rows")).as("n_total"))
      .withColumn("mm", when(col("mm") <= 0,
          raise_error(lit("Mix.neymanAllocation: zero variance in every "
            + "stratum — Neyman weights undefined")))
        .otherwise(col("mm")))

    def apportion(d: DataFrame, wCol: String, totCol: String,
        outCol: String): DataFrame = {
      val withFl = d
        .withColumn("__fl",
          expr(s"$wCol * ${sampleBudget}L div $totCol"))
        .withColumn("__rem",
          (col(wCol) * lit(sampleBudget)) % col(totCol))
      val deficit = withFl.agg(
        (lit(sampleBudget) - sum(col("__fl"))).as("__def"))
      val up = Window.orderBy(col("__rem").desc, col(stratumCol).asc)
      val down = Window.orderBy(col("__rem").asc, col(stratumCol).desc)
      withFl.crossJoin(broadcast(deficit))
        .withColumn("__ru", row_number().over(up))
        .withColumn("__rd", row_number().over(down))
        .withColumn(outCol, col("__fl")
          + when(col("__ru") <= col("__def"), 1L).otherwise(0L)
          - when(col("__rd") <= -col("__def"), 1L).otherwise(0L))
        .drop("__fl", "__rem", "__def", "__ru", "__rd")
    }

    val base = byStr.crossJoin(broadcast(tot))
    val ney = apportion(base, "m", "mm", "neyman_n")
    val prop = apportion(ney, "n_rows", "n_total", "prop_n")
    prop.select(col(stratumCol), col("n_rows"), col("sd"),
      round(col("m").cast("double") / col("mm"), 6).as("neyman_share"),
      col("neyman_n"), col("prop_n"))
  }

  /** The sampler that consumes [[temperatureWeights]]' output: draw each
    * domain's `budget_rows` rows by deterministic hash order — the
    * engine-portable uniform (md5 of the id, the q106 Gumbel stance), so
    * the same corpus yields the same sample on any engine or
    * partitioning. One |domains|-row broadcast join plus ONE
    * [[Budget.groupedRunning]] prefix count (the per-domain rank): a
    * domain-PARTITIONED rank window would put each domain's whole corpus
    * slice in one task — and because the cut `budget_rows` is a per-domain
    * COLUMN, the rank-limit pushdown (WindowGroupLimit) that makes literal
    * top-k windows scale-safe cannot apply, so the two-phase prefix is the
    * only shape that survives few huge domains at 100 TB. Ids are unique,
    * so the running count IS row_number. Returns the kept rows of `df`
    * (all columns). */
  def temperatureSample(df: DataFrame, domainCol: String, weight: Column,
      idCol: String, alpha: Double = 0.3,
      budget: Long = 1000000L): DataFrame = {
    val budgets = temperatureWeights(df, domainCol, weight, alpha, budget)
      .select(col(domainCol), col("budget_rows"))
    Budget.groupedRunning(
        df.join(broadcast(budgets), domainCol), domainCol,
        Seq(md5(col(idCol).cast("string").cast("binary")).asc,
          col(idCol).asc),
        Seq(Budget.RunSum(lit(1L), "__rk")))
      .filter(col("__rk") <= col("budget_rows"))
      .drop("__rk", "budget_rows")
  }

  /** UniMax budget allocation (Chung et al., ICLR 2023 — "UniMax: Fairer
    * and More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): split a total token budget B across languages by
    * WATERFILLING under a per-language epoch cap c — visit languages in
    * ascending corpus size T_i; each receives
    * min(c·T_i, remaining / languagesLeft). Head languages are downsampled
    * to an equal share; tail languages are never repeated past c epochs —
    * the paper's fix for temperature sampling's twin failure modes
    * (α too high starves the tail, α too low loops tiny corpora dozens of
    * epochs into memorization).
    *
    * Closed form used here instead of the sequential loop: c·T_i is
    * ascending in i, and once a language is uncapped the per-language
    * uniform share is invariant under removing it from the pool — so the
    * capped languages form a PREFIX of the ascending order. Language i is
    * capped iff c·T_i · (n − i + 1) ≤ B − prefix_{i−1}(c·T) (its cap fits
    * under the uniform share at its step, all in exact long arithmetic),
    * and every uncapped language receives the same
    * U = (B − Σ_capped c·T_j) / n_uncapped. That makes the whole
    * allocation two |domains|-row windows over the post-aggregate frame —
    * no driver loop, no iteration.
    *
    * `budget` is a Column resolved against the per-domain totals frame, so
    * it may be an absolute literal (`lit(10_000_000_000L)`) or derived
    * from the corpus itself via the provided `n_total` / `n_domains`
    * columns (e.g. `expr("n_total * 4 div 5")` = 80% of one corpus pass).
    * Returns one row per domain: (domain, n_tokens, capped 0/1,
    * alloc_tokens, epochs = alloc / T_i).
    *
    * Scale posture (100 TB): one corpus scan -> domain-keyed partial
    * aggregate (|domains| rows through the exchange); the ordering windows
    * run over the |domains|-row frame only (the [[temperatureWeights]]
    * stance). Long arithmetic bound: c·T_i·n must fit in int64 — at
    * c ≤ 100 epochs, 10^3 domains and 10^13 tokens/domain the product is
    * 10^18 < 2^63; beyond that pre-scale `weight`. */
  def unimax(df: DataFrame, domainCol: String, weight: Column,
      epochCap: Long, budget: Column): DataFrame = {
    require(epochCap > 0, "Mix.unimax: epochCap must be positive")
    val byDom = df.groupBy(col(domainCol))
      .agg(sum(weight).as("n_weight"))
      .withColumn("n_weight",
        when(col("n_weight").isNull || col("n_weight") < 0,
          raise_error(concat(
            lit("Mix.unimax: negative or null weight sum for domain "),
            col(domainCol).cast("string"))))
          .otherwise(col("n_weight")))
    val tot = byDom.agg(sum(col("n_weight")).as("n_total"),
      count(lit(1)).cast("long").as("n_domains"))
    val w = Window.orderBy(col("cap").asc, col(domainCol).asc)
    val flagged = byDom.crossJoin(broadcast(tot))
      .withColumn("cap", col("n_weight") * lit(epochCap))
      .withColumn("b",
        when(budget.cast("long").isNull || budget.cast("long") <= 0,
          raise_error(lit("Mix.unimax: budget must be positive")))
          .otherwise(budget.cast("long")))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("pfx", coalesce(
        sum(col("cap")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("capped",
        col("cap") * (col("n_domains") - col("i") + 1L)
          <= col("b") - col("pfx"))
    val caps = flagged.agg(
      sum(when(col("capped"), col("cap")).otherwise(0L)).as("cap_sum"),
      sum(when(col("capped"), 0L).otherwise(1L)).as("n_uncapped"))
    flagged.crossJoin(broadcast(caps))
      .withColumn("alloc_raw",
        when(col("capped"), col("cap").cast("double"))
          .otherwise((col("b") - col("cap_sum")).cast("double")
            / col("n_uncapped")))
      .select(col(domainCol), col("n_weight").as("n_tokens"),
        when(col("capped"), 1L).otherwise(0L).as("capped"),
        round(col("alloc_raw"), 4).as("alloc_tokens"),
        when(col("n_weight") > 0,
          round(col("alloc_raw") / col("n_weight"), 6)).as("epochs"))
  }
}
