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
"""
import json, math, sys

FLAG_E = 1.30
MIN_SECONDS = 1.0

# documented-contract superlinear members (VERDICT r10 + round-12 audit):
KNOWN = {
    "ann_cosine_pairs": "labeled O(n^2) calibration baseline",
    "dedup_winnow_recall": "uncapped exact-truth side (calibration)",
    "sub_join_order_advisor": "actual-count joins (advisor harness)",
    # wedge workload is sum(deg^2) over the minShared=1 candidate graph;
    # production bound = sum(min(deg, maxHubDeg)^2) <= maxHubDeg * arcs,
    # i.e. linear in edges with the cap as the constant. The default cap
    # (4096) sits far above every test-SF degree (sf0.1 max deg = 311,
    # round-12 probe) so the tested decade exercises the UNCAPPED math —
    # the flag is the expected signature of that calibration choice, and
    # ScalingGuardSpec pins the plan shapes (equi-keyed wedge, memo scan,
    # TakeOrderedAndProject) that keep the capped form linear-in-edges.
    "graph_link_prediction": "sum(deg^2) wedge; capped at scale by maxHubDeg",
}

def medians(path):
    out = {}
    for line in open(path):
        o = json.loads(line)
        if o.get("metric") == "medians":
            out.update(o["queries"])
    return out

def main(p001, p01, p1):
    m001, m01, m1 = medians(p001), medians(p01), medians(p1)
    rows = []
    for q in sorted(m1):
        t0, t1, t2 = m001.get(q, -1), m01.get(q, -1), m1.get(q, -1)
        if min(t0, t1, t2) < 0:
            rows.append((q, t0, t1, t2, None, None, "FAILED-RUN"))
            continue
        e_lo = math.log10(max(t1, 1e-3) / max(t0, 1e-3))
        e_hi = math.log10(max(t2, 1e-3) / max(t1, 1e-3))
        note = ""
        if t2 < MIN_SECONDS:
            note = "overhead-dominated (t(0.1) < %.1fs)" % MIN_SECONDS
        elif e_hi > FLAG_E:
            note = "FLAG"
            if q in KNOWN:
                note = "FLAG (known: %s)" % KNOWN[q]
        rows.append((q, t0, t1, t2, e_lo, e_hi, note))
    flags = [r for r in rows if r[6].startswith("FLAG")]
    print("query,t_sf0.001,t_sf0.01,t_sf0.1,e_low_decade,e_high_decade,note")
    for r in rows:
        print("%s,%.3f,%.3f,%.3f,%s,%s,%s" % (
            r[0], r[1], r[2], r[3],
            "" if r[4] is None else "%.2f" % r[4],
            "" if r[5] is None else "%.2f" % r[5], r[6]))
    print("\n== %d queries, %d flagged ==" % (len(rows), len(flags)))
    for r in flags:
        print("  %-32s t=%.2f/%.2f/%.2f  e_hi=%.2f  %s" %
              (r[0], r[1], r[2], r[3], r[5], r[6]))

if __name__ == "__main__":
    main(*sys.argv[1:4])
