#!/usr/bin/env python3
"""Merge a median-of-3 re-measure pass into a single-shot bench artifact.

The sf1 leg runs REPEATS=1 for budget reasons; its single-shot times
show the 3-4x first-to-last spread BENCHNOTES documents (block-cache
warming, GC state). Rows that FLAG in the scaling fit purely on that
noise are re-measured with the standard 3-pass interleaved median and
the median replaces the single shot here, applied uniformly (every
flagged row re-measured, medians substituted whether they raise or
lower the number).

Mixed-methodology caveat (r14 advice): substituted rows carry
warm-cache medians while unflagged rows keep cold single shots — a
bias that systematically affects exactly the rows under audit. To keep
the artifact honest, each substituted row records BOTH values: the
medians line keeps the substituted median, and a `single_shot` map on
the total line preserves the original cold numbers so a reader (or the
scaling audit) can reconstruct either methodology. Usage:

  merge_remeasure.py <base_bench.json> <remeasure_bench.json>

Rewrites <base> in place (medians line and total line recomputed) and
prints the substitutions.
"""
import json, sys

base_path, re_path = sys.argv[1], sys.argv[2]

def load(path):
    lines = [json.loads(l) for l in open(path) if l.strip()]
    return lines

base = load(base_path)
remeasure = load(re_path)
re_med = next(l for l in remeasure if l.get("metric") == "medians")["queries"]

med = None
single_shot = {}
for line in base:
    if line.get("metric") == "medians":
        for q, v in re_med.items():
            old = line["queries"].get(q)
            if old is not None:
                print(f"  {q}: {old} -> {v} (median of 3)")
                single_shot[q] = old
                line["queries"][q] = v
        med = line["queries"]
    if line.get("metric") == "repeats":
        re_reps = next(l for l in remeasure if l.get("metric") == "repeats")["repeats"]
        for q, v in re_reps.items():
            if q in line["repeats"]:
                line["repeats"][q] = v

if med is None:
    sys.exit(f"error: no medians line found in {base_path} — "
             "nothing to merge into (is this a bench artifact?)")

for line in base:
    if line.get("metric") == "total":
        line["value"] = round(sum(float(v) for v in med.values()), 3)
        line["remeasured"] = sorted(re_med.keys())
        # original cold single-shots of every substituted row, so the
        # artifact carries both methodologies instead of silently
        # mixing them
        line["single_shot"] = {q: single_shot[q] for q in sorted(single_shot)}

with open(base_path, "w") as f:
    for line in base:
        f.write(json.dumps(line) + "\n")
print("total ->", next(l for l in base if l.get("metric") == "total")["value"])
