package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift-normalized bench regression detection (BenchDrift): the canary
  * host factor must absorb uniform host drift while a single-query
  * regression still trips the flag — the exact acceptance pair VERDICT
  * r10 item 2 specifies. */
class BenchDriftSpec extends AnyFunSuite {
  private val canaries = BenchDrift.Canaries
  // a registry-shaped prior: canaries + a spread of workload queries
  private val prior: Map[String, Double] = Map(
    "q1_pricing_summary" -> 0.220, "q9_part_text" -> 0.140,
    "q10_orders_by_month" -> 0.210,
    "q44_dup_clusters" -> 2.500, "q47_dedup_keep_best" -> 3.000,
    "q103_pagerank" -> 2.400, "q121_temperature_sample" -> 0.800,
    "q150_small" -> 0.050)

  test("uniform +10% host drift: factor ~1.1, zero flags") {
    val current = prior.map { case (k, v) => k -> v * 1.1 }
    val r = BenchDrift.analyze(prior, current)
    assert(r.factor.exists(f => math.abs(f - 1.1) < 1e-9))
    assert(r.flags.isEmpty,
      s"uniform drift must not flag anything: ${r.flags}")
  }

  test("a deliberate 2x slowdown of one query trips the flag through drift") {
    val current = prior.map { case (k, v) =>
      k -> (if (k == "q103_pagerank") v * 2.0 else v * 1.1)
    }
    val r = BenchDrift.analyze(prior, current)
    assert(r.flags.map(_.name) == Seq("q103_pagerank"), s"${r.flags}")
    val f = r.flags.head
    assert(math.abs(f.normRatio - 2.0 / 1.1) < 1e-2)
  }

  test("sub-absolute-bar wobble never flags, whatever the ratio") {
    // q150_small doubles (0.05 -> 0.10s): ratio 1.82 normalized, but the
    // drift-adjusted excess is ~0.045s — noise, not a regression
    val current = prior.map { case (k, v) =>
      k -> (if (k == "q150_small") v * 2.0 else v * 1.1)
    }
    assert(BenchDrift.analyze(prior, current).flags.isEmpty)
  }

  test("a disturbed canary is absorbed by the median and never flagged") {
    val current = prior.map { case (k, v) =>
      k -> (if (k == "q9_part_text") v * 3.0 else v * 1.1)
    }
    val r = BenchDrift.analyze(prior, current)
    assert(r.factor.exists(f => math.abs(f - 1.1) < 1e-9),
      s"median must ignore the one disturbed canary: ${r.factor}")
    assert(r.flags.isEmpty, "canaries are the instrument, never flagged")
  }

  test("no usable prior -> no factor, no flags (never an unnormalized compare)") {
    val r = BenchDrift.analyze(Map.empty, prior)
    assert(r.factor.isEmpty && r.flags.isEmpty)
    // canaries missing from the prior (e.g. a restricted run's file)
    val r2 = BenchDrift.analyze(prior -- canaries,
      prior.map { case (k, v) => k -> v * 2 })
    assert(r2.factor.isEmpty && r2.flags.isEmpty)
  }

  test("priorMedians parses a Bench-written body; cross-SF priors rejected") {
    val body = """{"nruns":3,"sf":"/root/testdata/sf0.1","policy":"p",""" +
      """"runs":{"q1_pricing_summary":[0.242,0.207,0.218],""" +
      """"q44_dup_clusters":[2.638,-1.000,2.541]}}"""
    val m = BenchDrift.priorMedians(body, "/root/testdata/sf0.1")
    assert(m("q1_pricing_summary") == 0.218) // odd count -> middle sample
    // -1 failure sentinel excluded -> even count -> midpoint
    assert(math.abs(m("q44_dup_clusters") - 2.5895) < 1e-9)
    assert(BenchDrift.priorMedians(body, "/root/testdata/sf0.01").isEmpty)
    assert(BenchDrift.priorMedians("", "/root/testdata/sf0.1").isEmpty)
  }

  test("median compare absorbs a lucky prior minimum (the q107 false positive)") {
    // OBSERVED between two identical-code sweeps: prior samples
    // [0.91, 1.024, 0.478] (one lucky fast pass -> min 0.478), current
    // [0.911, 0.816, 0.795]. A min-based compare flags 1.68x normalized;
    // the median compare (0.91 -> 0.816) correctly reads ~0.9x.
    def med(ss: Seq[Double]) = BenchDrift.median(ss).get
    val prior2 = prior + ("q107_kcenter_coreset"
      -> med(Seq(0.91, 1.024, 0.478)))
    val current = prior2.map { case (k, v) =>
      k -> (if (k == "q107_kcenter_coreset") med(Seq(0.911, 0.816, 0.795))
            else v)
    }
    assert(BenchDrift.analyze(prior2, current).flags.isEmpty,
      "an identical-code re-run must not flag")
  }

  test("a single canary ratio never becomes the host factor") {
    // with only one canary present on both sides, one disturbed canary IS
    // the factor and can mass-flag (factor low) or mask (factor high) the
    // whole registry — analyze must refuse to normalize
    val prior1 = (prior -- canaries) + ("q1_pricing_summary" -> 0.220)
    val current = prior1.map { case (k, v) =>
      k -> (if (k == "q1_pricing_summary") v * 0.5 else v) // disturbed
    }
    val r = BenchDrift.analyze(prior1, current)
    assert(r.factor.isEmpty && r.flags.isEmpty,
      s"one canary must not yield a factor: $r")
  }

  test("confirmation never ships a flag for a query that was not re-measured") {
    // the r11 leak, reconstructed: q103 provisionally flags and is
    // re-measured; the confirm-window canaries run slightly faster,
    // shifting the factor down, which pushes q44 (normalized ~1.29
    // provisionally — under the bar) across 1.3x. q44 received zero
    // confirmation samples, so it must NOT ship.
    val current = prior.map { case (k, v) => k ->
      (if (k == "q103_pagerank") v * 2.0
       else if (k == "q44_dup_clusters") v * 1.29 else v)
    }
    val provisional = BenchDrift.analyze(prior, current)
    assert(provisional.flags.map(_.name) == Seq("q103_pagerank"))
    // confirm window: canaries come back 2% faster -> factor 0.98; q103's
    // confirmed median still doubles; q44 was not re-run so its median is
    // unchanged — but its normalized ratio is now 1.29/0.98 = 1.316 > bar
    val confirmMed = current.map { case (k, v) =>
      k -> (if (canaries.contains(k)) v * 0.98 else v)
    }
    val leakyReanalysis = BenchDrift.analyze(prior, confirmMed)
    assert(leakyReanalysis.flags.map(_.name)
      .contains("q44_dup_clusters"),
      "test setup must reproduce the leak shape in a raw re-analysis")
    val confirmed = BenchDrift.confirm(prior, confirmMed, provisional)
    assert(confirmed.flags.map(_.name) == Seq("q103_pagerank"),
      s"only re-measured queries may ship as confirmed: ${confirmed.flags}")
  }

  test("confirmation drops a provisional flag the extra passes absolve") {
    val current = prior.map { case (k, v) =>
      k -> (if (k == "q103_pagerank") v * 2.0 else v) }
    val provisional = BenchDrift.analyze(prior, current)
    assert(provisional.flags.nonEmpty)
    // confirm passes bring q103's 5-sample median back under the bar
    val confirmMed = current + ("q103_pagerank" -> prior("q103_pagerank") * 1.1)
    val confirmed = BenchDrift.confirm(prior, confirmMed, provisional)
    assert(confirmed.flags.isEmpty, s"${confirmed.flags}")
  }

  test("report JSON fields are well-formed for both factor states") {
    val r = BenchDrift.analyze(prior,
      prior.map { case (k, v) =>
        k -> (if (k == "q103_pagerank") v * 2 else v * 1.1) })
    val j = r.jsonFields()
    assert(j.startsWith(""","canaries":["""))
    assert(j.contains(""""host_factor":1.100"""))
    assert(j.contains(""""q":"q103_pagerank"""") &&
      j.contains(""""prior_med":""") && j.contains(""""med":"""))
    assert(!j.contains("advisory"),
      "a same-host regression flag must not carry the advisory tag")
    // ADVICE r12: cross-host advisory flags are tagged IN the flag object,
    // so a consumer keying on a non-empty flagged array cannot misread
    // them without joining the top-level cross_host field
    val adv = r.jsonFields(advisory = true)
    assert(adv.contains(""""q":"q103_pagerank"""")
      && adv.contains(""""advisory":true"""))
    val empty = BenchDrift.analyze(Map.empty, prior).jsonFields()
    assert(empty.contains(""""host_factor":null"""))
    assert(empty.contains(""""flagged":[]"""))
  }

  test("per-fingerprint baseline: regression on host A fires after an " +
      "interleaved host-B round (VERDICT r12 item 3)") {
    // round N on host A: medians = `prior`; round N+1 runs on host B and
    // carries A's baseline forward in its BENCH_RUNS.json
    val hostA = "aaaa11112222"
    val sf = "/root/testdata/sf0.1"
    val baselineA = BenchDrift.baselineFragment(hostA, sf, prior)
    val bodyB = s"""{"nruns":3,"sf":"$sf","host":"bbbb33334444",""" +
      """"cross_host":true,"runs":{"q1_pricing_summary":[0.3,0.3,0.3]},""" +
      baselineA + "}"
    // round N+2 returns to host A with a REAL 2x regression in q103: the
    // prior file's host differs (B), but A's own baseline resolves and the
    // compare against it fires a full (non-advisory) flag
    val selfBaseline = BenchDrift.priorBaseline(bodyB, hostA, sf)
    assert(selfBaseline == prior, s"baseline round-trip: $selfBaseline")
    val current = prior.map { case (k, v) =>
      k -> (if (k == "q103_pagerank") v * 2.0 else v * 1.05) }
    val r = BenchDrift.analyze(selfBaseline, current)
    assert(r.flags.map(_.name) == Seq("q103_pagerank"),
      s"the host-A regression must fire against A's own baseline: $r")
    // cross-SF baselines never resolve (timings are not comparable)
    assert(BenchDrift.priorBaseline(bodyB, hostA, "/x/sf0.01").isEmpty)
    // and an unknown fingerprint yields no baseline
    assert(BenchDrift.priorBaseline(bodyB, "cccc55556666", sf).isEmpty)
  }

  test("carryBaselines preserves other hosts' baselines, replaces own") {
    val sf = "/root/testdata/sf0.1"
    val fragA = BenchDrift.baselineFragment("aaaa11112222", sf,
      Map("q1_pricing_summary" -> 0.22))
    val fragB = BenchDrift.baselineFragment("bbbb33334444", sf,
      Map("q1_pricing_summary" -> 0.31))
    val body = s"""{"host":"bbbb33334444",$fragA,$fragB}"""
    val carried = BenchDrift.carryBaselines(body, "bbbb33334444")
    assert(carried == Seq(fragA),
      s"must carry A's baseline and drop B's own (it gets rewritten): $carried")
  }

  test("confirm window normalizes by its OWN canary factor (ADVICE r12)") {
    // main sweep: canaries at prior level (combined factor ~1.0), q103 at
    // 1.45x -> provisional flag. The confirm window lands on a uniformly
    // 40% slower host moment: canaries AND q103 all x1.4 of their
    // steady-state. Against the stale combined factor q103's confirm
    // median still reads 1.45x (ships a noise flag); against the
    // confirm-window canary factor (1.4) it reads 1.04x (absolved).
    val p = Map("q1_pricing_summary" -> 1.0, "q9_part_text" -> 1.0,
      "q10_orders_by_month" -> 1.0, "q103_pagerank" -> 2.0)
    val mainMed = p + ("q103_pagerank" -> 2.9)
    val prov = BenchDrift.analyze(p, mainMed)
    assert(prov.flags.map(_.name) == Seq("q103_pagerank"))
    val confirmOnly = Map("q1_pricing_summary" -> 1.4,
      "q9_part_text" -> 1.4, "q10_orders_by_month" -> 1.4,
      "q103_pagerank" -> 2.9)
    val absolved = BenchDrift.confirm(p, mainMed, prov,
      confirmOnly = confirmOnly)
    assert(absolved.flags.isEmpty,
      s"a uniformly slow confirm window must absolve: ${absolved.flags}")
    // converse: canaries steady in the confirm window, q103 still slow ->
    // the flag ships
    val kept = BenchDrift.confirm(p, mainMed, prov,
      confirmOnly = confirmOnly.map { case (k, v) =>
        k -> (if (k == "q103_pagerank") v else 1.0) })
    assert(kept.flags.map(_.name) == Seq("q103_pagerank"))
  }

  test("a clean confirm-window median absolves a flag the combined " +
      "median would keep (the r12 q55 noise flag)") {
    // the measured r12 shape: canaries ran 7% FASTER (factor 0.93) while
    // q55's main-sweep window was slow — normalized 1.236/0.93 = 1.329
    val prior = Map("q1_pricing_summary" -> 1.0, "q9_part_text" -> 1.0,
      "q10_orders_by_month" -> 1.0, "q55_approx_quantiles" -> 1.834)
    val fastCanaries = Map("q1_pricing_summary" -> 0.93,
      "q9_part_text" -> 0.93, "q10_orders_by_month" -> 0.93)
    val mainMed = prior ++ fastCanaries ++
      Map("q55_approx_quantiles" -> 2.267)
    val prov = BenchDrift.analyze(prior, mainMed)
    assert(prov.flags.map(_.name) == Seq("q55_approx_quantiles"))
    // combined 5-sample median stays at the slow main level (3-vs-2)…
    val combined = mainMed
    // …but the confirm-window's own median is back at prior level
    val absolved = BenchDrift.confirm(prior, combined, prov,
      confirmOnly = Map("q55_approx_quantiles" -> 1.7))
    assert(absolved.flags.isEmpty,
      "a re-measurement at prior level must absolve the flag")
    // and a confirm window that STAYS slow ships the flag
    val kept = BenchDrift.confirm(prior, combined, prov,
      confirmOnly = Map("q55_approx_quantiles" -> 2.4))
    assert(kept.flags.map(_.name) == Seq("q55_approx_quantiles"))
    // legacy mode (no confirm-only medians) keeps the old behavior
    val legacy = BenchDrift.confirm(prior, combined, prov)
    assert(legacy.flags.map(_.name) == Seq("q55_approx_quantiles"))
  }

  test("host fingerprint is stable, hex-shaped, and parsed back from " +
      "the runs file") {
    val a = BenchDrift.hostFingerprint()
    assert(a == BenchDrift.hostFingerprint(), "deterministic per process")
    assert(a.matches("[0-9a-f]{12}"), s"hex-12, got $a")
    val body = s"""{"nruns":3,"sf":"/x","host":"$a","cross_host":false,""" +
      """"runs":{"q1_pricing_summary":[0.1]}}"""
    assert(BenchDrift.priorHost(body).contains(a))
    // pre-fingerprint files have no host field: same-host assumed (no
    // advisory downgrade on the first fingerprinted run)
    assert(BenchDrift.priorHost("""{"nruns":3,"runs":{}}""").isEmpty)
  }
}
