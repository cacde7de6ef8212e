#!/usr/bin/env python3
"""Scaling-curve audit (VERDICT r10 ask #1, carried from r9 ask #2).

Reads three full-set Bench artifacts (sf0.001 / sf0.01 / sf0.1), fits
per-query scaling exponents, and prints a table + flags.

Exponent model: t(sf) ~ c + a * sf^e  with a fixed-overhead floor c.
We estimate e from the upper decade (sf0.01 -> sf0.1), where data cost
dominates the job-setup floor, as
    e = log10( t(0.1) / t(0.01) )
and report the lower-decade slope for context. Queries whose sf0.1
median is below MIN_SECONDS are overhead-dominated at every tested SF
and are unmeasurable (reported, never flagged).

Flag rule: e_hi > FLAG_E and t(0.1) >= MIN_SECONDS.
Known-quadratic calibration baselines are annotated, not excused.

Cross-round absolute guard (r15 verdict #1): a row inflated at BOTH
upper decades looks scale-clean to the exponent fit (the r15
graph_link_prediction escape: sf0.1 AND sf1 both ran in a dirty
window, so e_top stayed 1.11 while the sf1 median read 6x its r14
value). Pass `--prior <prev-round sf1 artifact>` and any query whose
current sf1 median exceeds PRIOR_RATIO x its prior-round value (and
is above MIN_SECONDS) is flagged CROSS-ROUND regardless of exponent.
"""
import json, math, sys

FLAG_E = 1.30
MIN_SECONDS = 1.0
PRIOR_RATIO = 2.0

# documented-contract superlinear members (VERDICT r10 + round-12 audit;
# round-13 sf1 decade exposed and classified the rest — every class has
# its production knob MEASURED flattening the curve at sf1, AbBench
# arms + BENCHNOTES r13):
KNOWN = {
    "ann_cosine_pairs": "labeled O(n^2) calibration baseline (sf1 MEASURED e=1.99 as designed)",
    "dedup_winnow_recall": "uncapped exact-truth side (calibration)",
    "sub_join_order_advisor": "actual-count joins (advisor harness)",
    # wedge workload is sum(deg^2) over the minShared=1 candidate graph;
    # production bound: hubs above maxHubDeg are EXCLUDED, so work =
    # sum_{deg<=cap} deg^2. Since r14 the DEFAULT cap is the
    # sf1-measured 256 (oracle mirrors it; bites at sf0.1 max deg 311),
    # so the query runs on the sf1 leg at ~22-34 s instead of the
    # 124G-row uncapped infeasibility r13 measured.
    "graph_link_prediction": "sum(deg^2) wedge at the capped default (256, r14)",
    # -- class A: minhash bucket-population growth (the synthetic
    # 30-word vocab densifies shared-shingle buckets linearly with the
    # corpus => bucket self-join mass ~n^2). The 1024 default cap sits
    # above sf1's ~140 max bucket; cap 64 MEASURED at sf1: verified
    # pairs 92.1 -> 12.8 s. Consumers inherit the candidate mass.
    # r14 zipf arm: e_top persists at 1.68 under the realistic-vocab
    # corpus => REAL mechanism (not a vocab artifact); the cap is the
    # production answer.
    "dedup_lsh_verified_pairs": "bucket self-join mass (REAL per the r14 zipf arm); cap MEASURED biting at sf1 (92->13s)",
    "dedup_cluster_census": "consumes the lsh pair family (class A)",
    "dedup_lsh_curve_advisor": "consumes the est-err pair sample (class A)",
    "dedup_semantic_sweep": "embedding-LSH pair sweep (classes A+B)",
    "dedup_edit_distance": "O(len^2) verify per winnow edge; edge mass grows with collision density (class A)",
    # r16: positional filter + packed-set verify completed the PPJoin;
    # e_top 1.52 -> 1.10 on the uniform fixture itself — should no
    # longer flag. Entry retained so any future re-flag carries history.
    "dedup_prefix_jaccard": "was class A fixture artifact; PPJoin completed r16 (e_top 1.10)",
    "dedup_containment_pairs": "blocked pair join inherits the class-A bucket mass (r14 zipf arm: 1.38 -> 1.16; mostly vocab-driven)",
    "dedup_minhash_keep_first": "consumes the lsh pair family (class A)",
    # -- class B: fixed hyperplane-LSH width (4 planes = 16 buckets) =>
    # same-bucket pair mass ~n^2/2^planes. A deployment grows planes
    # with log n; +4 planes MEASURED at sf1: labelPurity 77.6 -> 15.5 s.
    "embed_label_purity": "fixed LSH width; planes knob MEASURED at sf1 (78->16s)",
    # -- class C: FIXED in r14. The constant-CELL-SIZE stride policy
    # (C = n/50 centroids => n x C assignment = n^2/50) was replaced by
    # the trained fixed-k quantizer (k=40 spacing seeds + 2 exact-
    # decimal Lloyd iterations, build-once): assignment is O(n*k) and
    # every former class-C row refits at e_top <= 1.15 at DEFAULTS
    # (nprobe sweep 31.8 -> 1.8 s, pq 31.9 -> 4.8, recall 31.6 -> 1.1,
    # cell balance 13.2 -> 13.7 incl. its cold-start training charge).
    # Entries removed because the rows no longer flag.
    # -- class D: OUTPUT cardinality growth — the fixed 30-day window
    # with 10x event density makes the range join's ANSWER ~quadratic
    # (measured: 459k -> 46.4M matched pairs for 10x events, 101x);
    # runtime grew 69x, SUBLINEAR in its own output. A 100 TB corpus
    # extends the time RANGE, not the per-window density.
    "range_incident_stats": "output rows grow ~quadratically with event density (measured 101x)",
    "range_join_rule": "same query via the optimizer rule (class D)",
}

def medians(path):
    out = {}
    for line in open(path):
        o = json.loads(line)
        if o.get("metric") == "medians":
            out.update(o["queries"])
    return out


def loads_line(path):
    """Per-artifact load context: (loadavg_launch, loadavg_start).
    launch is sampled BEFORE the session/warm-up (co-tenant load of the
    window); start is after warm-up and includes self-load (r16 #3)."""
    launch, start = None, None
    try:
        for line in open(path):
            o = json.loads(line)
            if o.get("metric") == "total":
                launch, start = o.get("loadavg_launch"), o.get("loadavg_start")
    except OSError:
        pass
    return launch, start

def main(p001, p01, p1, psf1=None, prior_sf1=None):
    """Three mandatory artifacts (sf0.001/0.01/0.1) plus an optional
    fourth (sf1, round-13): queries present in the sf1 artifact get a
    third-decade exponent e_top = log10(t(1)/t(0.1)) and are flagged on
    it with the same rule; the sf1 leg may cover only the MEASURABLE
    subset (overhead-dominated queries have no meaningful exponent), so
    absence from it is not an error."""
    m001, m01, m1 = medians(p001), medians(p01), medians(p1)
    msf1 = medians(psf1) if psf1 else {}
    mprior = medians(prior_sf1) if prior_sf1 else {}
    for label, path in (("sf0.001", p001), ("sf0.01", p01),
                        ("sf0.1", p1), ("sf1", psf1)):
        if path:
            launch, start = loads_line(path)
            print("# %s: loadavg_launch=%s loadavg_start=%s" %
                  (label, launch, start))
    rows = []
    for q in sorted(m1):
        t0, t1, t2 = m001.get(q, -1), m01.get(q, -1), m1.get(q, -1)
        t3 = msf1.get(q)
        if min(t0, t1, t2) < 0:
            rows.append((q, t0, t1, t2, t3, None, None, None, "FAILED-RUN"))
            continue
        e_lo = math.log10(max(t1, 1e-3) / max(t0, 1e-3))
        e_hi = math.log10(max(t2, 1e-3) / max(t1, 1e-3))
        e_top = None
        if t3 is not None and t3 >= 0:
            e_top = math.log10(max(t3, 1e-3) / max(t2, 1e-3))
        note = ""
        if t3 is not None and t3 < 0:
            # a query that ran at the lower SFs but FAILED at sf1 must
            # surface as a failure, never fold into overhead-dominated
            # (r13 advice)
            note = "FLAG (FAILED-SF1)"
        elif t2 < MIN_SECONDS and (t3 is None or t3 < MIN_SECONDS):
            note = "overhead-dominated (t < %.1fs)" % MIN_SECONDS
        elif (e_top if e_top is not None else e_hi) > FLAG_E:
            note = "FLAG"
            if q in KNOWN:
                note = "FLAG (known: %s)" % KNOWN[q]
        # cross-round guard: exponent-blind, catches a row inflated at
        # both decades of the same dirty window
        pv = mprior.get(q)
        if (pv is not None and pv > 0 and t3 is not None
                and t3 >= MIN_SECONDS and t3 > PRIOR_RATIO * pv):
            xr = "FLAG (CROSS-ROUND: sf1 %.1fx prior %.2fs)" % (t3 / pv, pv)
            note = (note + "; " + xr) if note.startswith("FLAG") else xr
        rows.append((q, t0, t1, t2, t3, e_lo, e_hi, e_top, note))
    flags = [r for r in rows if r[8].startswith("FLAG")]
    print("query,t_sf0.001,t_sf0.01,t_sf0.1,t_sf1,e_low_decade,e_high_decade,e_top_decade,note")
    for r in rows:
        print("%s,%.3f,%.3f,%.3f,%s,%s,%s,%s,%s" % (
            r[0], r[1], r[2], r[3],
            "" if r[4] is None else "%.3f" % r[4],
            "" if r[5] is None else "%.2f" % r[5],
            "" if r[6] is None else "%.2f" % r[6],
            "" if r[7] is None else "%.2f" % r[7], r[8]))
    print("\n== %d queries, %d flagged ==" % (len(rows), len(flags)))
    for r in flags:
        print("  %-32s t=%.2f/%.2f/%.2f/%s  e=%s  %s" %
              (r[0], r[1], r[2], r[3],
               "-" if r[4] is None else "%.2f" % r[4],
               "%.2f" % (r[7] if r[7] is not None else r[6]), r[8]))

if __name__ == "__main__":
    argv = sys.argv[1:]
    prior = None
    if "--prior" in argv:
        i = argv.index("--prior")
        prior = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    main(*argv[:4], prior_sf1=prior)
