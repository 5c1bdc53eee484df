#!/usr/bin/env python3
"""Recurring scale-regression guard lane (VERDICT r12 item 6).

The round-12 ScaleProbe exponent table was a one-off measurement — a
future operator change can regress a query to super-linear unnoticed.
This lane re-measures a reduced probe at round close and ASSERTS each
time-vs-scale exponent against a per-query documented bound:

  * 3x replicate-and-perturb corpus (cheaper than r12's 10x; exponents
    are log-base-3, so noise is larger — bounds carry headroom and a
    noise floor exempts sub-300ms bases),
  * the top-8 most expensive registry queries + every registry query NEW
    this round + the two production operating-point probes.

Usage:
    python3 tools/scale_lane.py [baseSfDir] [outDir]

Prints a PLANS.md-ready markdown table; exits non-zero when any exponent
exceeds its bound (or a probe fails outright). Record the table in
PLANS.md and note the lane result in STATUS.md at round close, like the
oracle sweeps.

Bounds are the r12/r13 measured exponents plus headroom for 3x-replica
noise — NOT aspirations. A trip means "this query's scaling CLASS
changed"; re-measure at 10x replicas (the r12 command in PLANS.md)
before concluding anything, then either fix the regression or document
the new bound with the same rigor as the q95/q134 grading-pin notes.
"""
import json
import re
import subprocess
import sys

# query -> max allowed exponent at 3x replicas.
# Measured reference points (10x, r12/r13): q141 0.16, q47 0.30,
# q193 per-row codec ~linear, q196 0.56, q194 ~0.4 (q100 class),
# q44 0.27, q103 0.28, q159 0.83 (per-char hashing, ~linear),
# p95 -0.07, p134 0.32. New r13: q200 (fixed query set IVF-PQ,
# encode-dominated ~linear), q201 (per-row codec ~linear), q202
# (LSH ingest, q100 class + fixed streaming overhead).
BOUNDS = {
    "q141_er_pipeline": 0.7,
    "q47_dedup_keep_best": 0.8,
    "q193_image_resize": 1.2,
    "q196_soft_dedup": 1.0,
    "q194_lsh_index": 0.9,
    "q44_dup_clusters": 0.8,
    "q103_pagerank": 0.8,
    "q159_winnow_pairs": 1.2,
    "q200_ivfpq_prod_recall": 1.2,
    "q201_image_histogram": 1.2,
    "q202_ingest_stream": 1.0,
    "q203_ann_index": 1.2,
    # r13 suffix-array family: round count is log(maxDocLen) — constant
    # under replication — and each sort round is fixed-exchange-count.
    # Measured at 3x (r13 close): q204 0.44, q205 0.36, q207 0.27.
    "q204_suffix_array": 1.0,
    "q205_longest_repeated_span": 0.9,
    "q207_exact_substr": 0.8,
    # r13 exact all-pairs cosine: replicas share no shingles (ScaleProbe
    # decorrelates words per replica), so candidates grow linearly by
    # probe construction. Measured 0.73 at 3x (r13, one sample); r14
    # re-measured 0.80/0.84/0.98 across three probes after the both-side
    # prefix join landed — the prune cuts constants (-41% join input,
    # -9.6% candidates at sf0.1), not the replica-forced growth class,
    # and the single-sample spread is the 3x-noise band the module doc
    # warns about. Bound unchanged.
    "q206_allpairs_cosine": 1.2,
    # r15: the lost-prune detector the graded q206 cannot be (VERDICT r14
    # item 4). Slot-scoped Zipf corpus with SHARED head vocabulary across
    # replicas (ScaleProbe.zipfDocs): head tokens' posting lists grow with
    # the corpus, and the Bayardo prefix prune is a measured ~490x
    # constant cut on the candidate space (SuffixArraySpec zipf tests:
    # pruned 46.7k/429k vs unpruned 23.1M/206.7M at 4k/12k docs) — lose
    # the prune and the probe joins the head-df^2 space, pushing the
    # measured exponent toward ~2. Measured pruned: 0.59 at 3x.
    "p206_allpairs_zipf": 1.0,
    # r14 ExactSubstr cut: q207's ladder + one keeper-groupBy + the
    # per-doc rebuild. Measured 0.32 at 3x.
    "q212_exact_substr_cut": 0.8,
    # r14 decontamination action: q210's probe + an anti-join on a
    # contamination-sized drop set. Measured 0.37 at 3x.
    "q213_decontaminate": 0.8,
    # r14 ANN streaming ingest: fixed 40-query probe set + stream
    # startup dominated (the q202 class). Measured 0.02 at 3x.
    "q214_ann_ingest_stream": 1.0,
    # r14 torn-append repair: index write + append + repair + one probe
    # (the q194/q202 cost class). Measured 0.10 at 3x.
    "q215_torn_append_repair": 0.9,
    # r15 raised ANN operating point: index write (linear encode) + a
    # FIXED 20-query rerank probe (candidates broadcast, candK fixed) +
    # the brute truth. Measured -0.16 at 3x (write-dominated, warm-cache
    # noise band). Same class as q215.
    "q217_ann_rerank_recall": 0.9,
    # r15 stationary-ladder grading corpus (duplicate docs): q212's cost
    # class but the ladder CONVERGES at width 4 (3 rounds instead of 5)
    # and group sizes grow with the corpus. Measured 0.30 at 3x.
    "q218_exact_substr_dup_docs": 0.8,
    # r16 tagged replayed-absorb: q215's cost class (index write + two
    # appends + a probe) plus the replay no-op. Measured 0.11 at 3x.
    "q219_replayed_absorb": 0.9,
    # r16 scaled ANN operating point: the builder HARD-FAILS below mean
    # recall@10 = 0.9, so this row is BOTH a recall gate at 3x corpus
    # growth (n = 6000 -> nlist 128 / nprobe 96 / candK 1500) and a time
    # bound. Cost class: k=256 codebook train + the n x nlist encode
    # assignment (an n^1.5 term at the √n sizing rule — the documented
    # price of exact deterministic assignment; sampled k-means training
    # is the production counter-move past ~10M vectors) + a fixed
    # 20-query rerank probe + the brute truth. Measured 0.48 at 3x.
    "q220_ann_rerank_scaled": 1.0,
    # r16 reliable-checkpoint ladder (q212's corpus/cut through a real
    # checkpoint dir — the cluster posture): q212's class + per-level
    # checkpoint IO. Measured 0.31 at 3x.
    "p212_ckpt_ladder": 0.8,
    # r14 Kneser-Ney LM: three |bigrams|-keyed hash aggs + three hash
    # joins + a per-doc mean (the q98 cost class). Measured -0.03 at 3x
    # (count-table-bounded on this vocab).
    "q216_kneser_ney": 0.8,
    # measured 0.01 / 0.23 at 3x (both near the noise floor)
    "q208_prototype_prune": 0.6,
    "q209_length_batching": 0.7,
    # persisted-benchmark probe: index side is fixed-size, measured 0.09
    "q210_contam_index": 0.6,
    # simhash-vs-exact eval: both pair families bucket-bounded, measured 0.41
    "q211_simhash_recall": 0.9,
    "p95_ivfpq_prod": 0.5,
    "p134_linkage_scaled": 0.8,
}
# exponents from sub-300ms bases are log-amplified noise, not signal
NOISE_FLOOR_S = 0.3
REPLICAS = 3


def main(base_dir, out_dir):
    names = ",".join(sorted(BOUNDS))
    cmd = ["sbt", "-batch",
           f"runMain graft.ScaleProbe {base_dir} {REPLICAS} {out_dir} {names}"]
    print(f"[scale-lane] {' '.join(cmd)}", file=sys.stderr)
    proc = subprocess.run(cmd, capture_output=True, text=True)
    # the probe prints ONE JSON line on stdout; sbt prefixes "[info] "
    payload = None
    for line in proc.stdout.splitlines():
        m = re.search(r'(\{"replicas":.*\})\s*$', line)
        if m:
            payload = json.loads(m.group(1))
    if payload is None:
        print("[scale-lane] FAIL: no probe JSON found — sbt tail:",
              file=sys.stderr)
        print("\n".join(proc.stdout.splitlines()[-15:]), file=sys.stderr)
        return 1

    fails = 0
    rows = []
    for r in payload["rows"]:
        name, b, x, e = r["name"], r["base_s"], r[f"x{REPLICAS}_s"], r["exponent"]
        bound = BOUNDS[name]
        if b < 0 or x < 0 or e is None:
            verdict = "FAIL (probe errored)"
            fails += 1
        elif b < NOISE_FLOOR_S:
            verdict = f"noise floor (base < {NOISE_FLOOR_S}s), informational"
        elif e > bound:
            verdict = f"FAIL (> bound {bound})"
            fails += 1
        else:
            verdict = f"ok (bound {bound})"
        rows.append((name, b, x, e, verdict))

    missing = sorted(set(BOUNDS) - {r["name"] for r in payload["rows"]})
    for name in missing:
        rows.append((name, -1, -1, None, "FAIL (no measurement)"))
        fails += 1

    print(f"\n| query | sf-base s | x{REPLICAS} s | exponent | verdict |")
    print("|---|---|---|---|---|")
    for name, b, x, e, verdict in sorted(rows):
        es = "n/a" if e is None else f"{e:.2f}"
        print(f"| {name} | {b:.2f} | {x:.2f} | {es} | {verdict} |")
    print(f"\n[scale-lane] {'FAIL' if fails else 'green'} "
          f"({len(rows) - fails}/{len(rows)} within bounds)")
    return 1 if fails else 0


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_lane"
    sys.exit(main(base, out))
