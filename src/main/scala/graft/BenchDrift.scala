package graft

/** Drift-normalized bench regression detection.
  *
  * Round-over-round totals on this host move one-sidedly by ~5-10%
  * (GC/scheduler drift documented since r8), which swamps real per-query
  * signal: a genuine 1.3x regression on one query is invisible inside a
  * +8 s whole-registry wobble. The fix is the classic canary design: a
  * small set of FROZEN queries — plans that never change round to round —
  * estimates the host factor as the MEDIAN of their current/prior
  * ratios, and every other query's ratio is normalized by that factor
  * before the regression bar applies. A uniform host slowdown moves the
  * canaries and the workload identically (normalized ratios ~1, no
  * flags); a single-query regression moves only itself (its normalized
  * ratio stays ~raw and trips the bar). The median keeps one disturbed
  * canary from poisoning the estimate.
  *
  * Bars: normalized ratio > `ratioBar` (1.3 — the bar VERDICT rounds have
  * used) AND a drift-adjusted absolute excess > `absBar` seconds (0.2 —
  * sub-200ms wobble on tiny queries is noise at any ratio).
  *
  * The drift compare runs on per-query MEDIANS, not the bench's headline
  * minima: a min-of-3 is the right steady-state timing estimate but a
  * terrible comparison baseline for high-variance queries — one lucky
  * fast pass in the PRIOR round makes every honest later round read as a
  * regression (observed: q107 min 0.478 in a [0.91, 1.02, 0.48] spread,
  * false-flagging an identical-code re-run at 1.68× normalized). The
  * median of the same 3 samples is stable against a single outlier in
  * either direction while a genuine 2× regression still moves it
  * decisively.
  *
  * [[Bench]] wires this against the PRIOR round's committed
  * BENCH_RUNS.json (read before this run overwrites it) and records the
  * factor + flags in the new file; restricted (`SPARK_GRAFT_ONLY`) or
  * cross-SF priors simply yield no factor and no flags. */
object BenchDrift {

  /** Frozen canary queries: simple scan/agg/join plans untouched since
    * the early rounds — q1 (lineitem pricing agg), q9 (part text
    * projection), q10 (date-bucketed agg). Never change these queries'
    * plans; they are the measurement instrument. */
  val Canaries = Seq("q1_pricing_summary", "q9_part_text",
    "q10_orders_by_month")

  case class Flag(name: String, priorSec: Double, currentSec: Double,
      normRatio: Double)

  case class Report(factor: Option[Double], flags: Seq[Flag]) {
    /** JSON fragment for BENCH_RUNS.json (comma-prefixed fields).
      * `advisory = true` tags every flag object with `"advisory":true` so
      * a downstream consumer keying on a non-empty `flagged` array cannot
      * misread cross-host advisories as regressions without joining the
      * top-level `cross_host` field (ADVICE r12). */
    def jsonFields(advisory: Boolean = false): String = {
      def r3(v: Double) =
        "%.3f".formatLocal(java.util.Locale.ROOT, v)
      val f = factor.map(r3).getOrElse("null")
      val adv = if (advisory) ""","advisory":true""" else ""
      val fl = flags.map(x =>
        s"""{"q":"${x.name}","prior_med":${r3(x.priorSec)},""" +
          s""""med":${r3(x.currentSec)},"norm_ratio":${r3(x.normRatio)}$adv}""")
        .mkString("[", ",", "]")
      s""","canaries":${Canaries.map("\"" + _ + "\"").mkString("[", ",", "]")},"host_factor":$f,"flagged":$fl"""
    }
  }

  /** Flag every query whose drift-normalized ratio exceeds the bars.
    * `prior`/`current` are per-query minima in seconds; canaries are
    * excluded from flagging (they define the factor). No factor — fewer
    * than one canary present on both sides — means no flags: an
    * unnormalized compare would re-introduce exactly the false positives
    * this module removes. */
  def analyze(prior: Map[String, Double], current: Map[String, Double],
      canaries: Seq[String] = Canaries, ratioBar: Double = 1.3,
      absBar: Double = 0.2): Report = {
    val ratios = canaries.flatMap { c =>
      for (p <- prior.get(c); u <- current.get(c) if p > 0 && u > 0)
        yield u / p
    }.sorted
    // a single canary ratio IS the factor — one disturbed canary could
    // mass-flag or mask the whole registry (the median-absorbs-one-outlier
    // property needs at least 2 ratios to hold at all); no factor, no flags
    if (ratios.size < 2) return Report(None, Nil)
    val factor =
      if (ratios.size % 2 == 1) ratios(ratios.size / 2)
      else (ratios(ratios.size / 2 - 1) + ratios(ratios.size / 2)) / 2
    val flags = current.toSeq.sortBy(_._1).flatMap { case (n, cur) =>
      if (canaries.contains(n) || cur <= 0) None
      else prior.get(n).filter(_ > 0).flatMap { p =>
        val norm = (cur / p) / factor
        if (norm > ratioBar && cur - p * factor > absBar)
          Some(Flag(n, p, cur, math.rint(norm * 1000) / 1000))
        else None
      }
    }
    Report(Some(factor), flags)
  }

  /** Final flag set after a confirmation pass. Re-analyzes with the
    * confirm-updated medians, then RESTRICTS the flags twice:
    *
    *  1. to queries that were provisionally flagged — i.e. that actually
    *     received their own confirmation samples. Without this, the
    *     confirm-window canary factor shift can newly trip a query that
    *     was never re-measured and ship it as a "CONFIRMED" flag with
    *     zero confirmation samples (the r11 q100 artifact: factor
    *     0.835→0.830 moved its normalized ratio 1.296→1.303).
    *  2. to queries whose confirm-WINDOW median itself still trips the
    *     bar (when `confirmOnly` medians are supplied). The combined
    *     5-sample median is 3-vs-2 dominated by the main sweep: a query
    *     whose later-window re-measurement lands back at prior level is
    *     absolved by construction of the design ("keep a flag only if
    *     the re-measurement still trips") — r12 measured exactly this:
    *     q55 main sweep [2.27, 2.39, 2.55] s vs confirm [1.68, 1.72] s
    *     against prior median 1.83 s; the slow main window outvoted the
    *     clean re-measurement and shipped a noise flag. */
  def confirm(prior: Map[String, Double], confirmedMed: Map[String, Double],
      provisional: Report, canaries: Seq[String] = Canaries,
      ratioBar: Double = 1.3, absBar: Double = 0.2,
      confirmOnly: Map[String, Double] = Map.empty): Report = {
    val re = analyze(prior, confirmedMed, canaries, ratioBar, absBar)
    val allowed = provisional.flags.map(_.name).toSet
    // the confirm-window medians are normalized by a CONFIRM-WINDOW canary
    // factor when `confirmOnly` carries re-measured canaries (Bench's
    // names2 always includes them): the combined factor is 3-vs-2
    // dominated by the main sweep, so in the heteroscedastic scenario this
    // pass exists for — host speed shifting between windows — a clean
    // confirm median could still trip, or a slow one be absolved, against
    // the stale factor (ADVICE r12). Fewer than 2 confirm canary ratios
    // falls back to the combined factor (legacy mode).
    val confirmRatios = canaries.flatMap { c =>
      for (p <- prior.get(c); u <- confirmOnly.get(c) if p > 0 && u > 0)
        yield u / p
    }.sorted
    val factor =
      if (confirmRatios.size < 2) re.factor.getOrElse(1.0)
      else if (confirmRatios.size % 2 == 1)
        confirmRatios(confirmRatios.size / 2)
      else (confirmRatios(confirmRatios.size / 2 - 1) +
        confirmRatios(confirmRatios.size / 2)) / 2
    def confirmWindowTrips(name: String): Boolean =
      confirmOnly.get(name) match {
        case None => true // no confirm-only stats supplied — legacy mode
        case Some(cm) => prior.get(name) match {
          case Some(p) if p > 0 =>
            (cm / p) / factor > ratioBar && cm - p * factor > absBar
          case _ => true
        }
      }
    re.copy(flags = re.flags.filter(f =>
      allowed(f.name) && confirmWindowTrips(f.name)))
  }

  /** Median of the successful samples (the drift-compare statistic —
    * see the scaladoc above for why not the minimum). */
  def median(samples: Seq[Double]): Option[Double] = {
    val ok = samples.filter(_ >= 0).sorted
    if (ok.isEmpty) None
    else if (ok.size % 2 == 1) Some(ok(ok.size / 2))
    else Some((ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2)
  }

  /** Stable host fingerprint: CPU model string + machine identity
    * (/etc/machine-id, falling back to hostname) + arch, SHA-1-shortened.
    * The canary factor corrects a UNIFORM speed change of the same
    * machine between runs; across different machines the correction is
    * class-biased — JIT/GC/allocation-heavy plans slow differently from
    * the scan/agg-shaped canaries (measured r12: a 1.196-factor host
    * change left 9 allocation-heavy queries at 1.30 to 1.55x normalized
    * on IDENTICAL code, all 9 surviving confirmation because the bias is
    * stable on the new host). [[Bench]] records the fingerprint and
    * downgrades flags to ADVISORY when the prior run's fingerprint
    * differs — a cross-host compare can seed the new host's baseline but
    * must not be read as a regression verdict.
    *
    * ADVICE r12: `availableProcessors()` is deliberately NOT hashed — it
    * varies with container CPU quota / taskset / ActiveProcessorCount on
    * the SAME machine (spurious downgrades), while the machine-id
    * component now separates two boxes that share a CPU model (spurious
    * same-host labeling). Caveat that remains: a re-imaged container on
    * the same box changes machine-id and costs one advisory round. */
  def hostFingerprint(): String = {
    val model =
      try {
        val src = scala.io.Source.fromFile("/proc/cpuinfo")
        try src.getLines().find(_.startsWith("model name"))
          .map(_.split(":").drop(1).mkString(":").trim).getOrElse("unknown")
        finally src.close()
      } catch { case _: Exception => "unknown" }
    val machine =
      try {
        val src = scala.io.Source.fromFile("/etc/machine-id")
        try src.mkString.trim finally src.close()
      } catch { case _: Exception =>
        try java.net.InetAddress.getLocalHost.getHostName
        catch { case _: Exception => "unknown" }
      }
    val raw = model + "|" + machine + "|" + sys.props.getOrElse("os.arch", "")
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(raw.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
  }

  /** The "host" field of a prior BENCH_RUNS.json body (absent in files
    * written before fingerprinting existed — treated as unknown, which
    * compares as cross-host-unknown = NOT provably same host, but we keep
    * pre-fingerprint priors authoritative to avoid flapping: only a
    * RECORDED different fingerprint downgrades). */
  def priorHost(body: String): Option[String] =
    "\"host\":\"([0-9a-f]+)\"".r.findFirstMatchIn(body).map(_.group(1))

  /** Per-fingerprint baseline medians parsed back from a BENCH_RUNS.json
    * body: the flat `"baseline_<fp>":{"sf":"...","q..":med,...}` objects
    * [[Bench]] writes so that RETURNING to a known host compares against
    * that host's own most-recent medians with full regression labeling —
    * without this, a real regression landing in the same round as a host
    * change gets only advisory flags and the new host's first sweep
    * becomes an unchecked baseline (VERDICT r12 item 3). Returns empty
    * when no baseline for `host` exists or its "sf" differs. */
  def priorBaseline(body: String, host: String,
      sfDir: String): Map[String, Double] = {
    val frag = ("\"baseline_" + host + "\":\\{([^}]*)\\}").r
      .findFirstMatchIn(body).map(_.group(1)).getOrElse(return Map.empty)
    if (!frag.contains("\"sf\":\"" + sfDir + "\"")) return Map.empty
    "\"(q[0-9]+_[A-Za-z0-9_]+)\":([0-9.eE+-]+)".r.findAllMatchIn(frag)
      .flatMap(m => scala.util.Try(m.group(2).toDouble).toOption
        .map(m.group(1) -> _))
      .toMap
  }

  /** All baseline fragments of a prior body EXCEPT `exceptHost`'s, as
    * ready-to-embed `"baseline_<fp>":{...}` strings — carried forward so
    * a round on host B preserves host A's baseline for A's next visit. */
  def carryBaselines(body: String, exceptHost: String): Seq[String] =
    "\"baseline_([0-9a-f]+)\":\\{[^}]*\\}".r.findAllMatchIn(body)
      .filter(_.group(1) != exceptHost)
      .map(_.matched).toSeq

  /** The current host's baseline fragment for the file being written. */
  def baselineFragment(host: String, sfDir: String,
      medians: Map[String, Double]): String = {
    def r3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val ms = medians.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString(",")
    s""""baseline_$host":{"sf":"$sfDir"${if (ms.isEmpty) "" else "," + ms}}"""
  }

  /** Per-query MEDIANS from a BENCH_RUNS.json body written by [[Bench]]
    * (`"name":[s1,s2,...]` sample arrays; hand-parsed — no JSON library
    * on the engine classpath). A query appearing in both "confirm_runs"
    * and "runs" resolves to the LATER match (the main "runs" sweep —
    * Bench writes confirm_runs first). Returns empty when the body's
    * "sf" is not `sfDir` (cross-SF timings are not comparable) or
    * nothing parses. */
  def priorMedians(body: String, sfDir: String): Map[String, Double] = {
    if (!body.contains("\"sf\":\"" + sfDir + "\"")) return Map.empty
    val re = "\"(q[0-9]+_[A-Za-z0-9_]+)\":\\[([^\\]]*)\\]".r
    re.findAllMatchIn(body).flatMap { m =>
      val ss = m.group(2).split(",").toSeq
        .flatMap(s => scala.util.Try(s.trim.toDouble).toOption)
      median(ss).map(m.group(1) -> _)
    }.toMap
  }
}
