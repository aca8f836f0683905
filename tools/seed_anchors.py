#!/usr/bin/env python3
"""Seed bench_anchors.json (per-query best-ever min, sf0.1) from the
FULL git history of bench_queries.json — every committed bench run's
min (and its prev_min, which reaches one run further back than the
oldest committed file). One-shot tool for round 18's drift detector
(r17 VERDICT #1); after seeding, graft.Bench maintains the file itself
by min-merge (monotone non-increasing, so a loaded box can never
poison an anchor — its inflated mins lose the min() against history).

Usage: python3 tools/seed_anchors.py   (run from the repo root)
Writes bench_anchors.json: one {"q": ..., "best_min": ...} per line,
sorted by q.
"""
import json
import subprocess

def runs():
    shas = subprocess.check_output(
        ["git", "log", "--format=%H", "--", "bench_queries.json"],
        text=True).split()
    for sha in shas:
        try:
            blob = subprocess.check_output(
                ["git", "show", f"{sha}:bench_queries.json"],
                text=True, stderr=subprocess.DEVNULL)
        except subprocess.CalledProcessError:
            continue
        yield sha, blob

best = {}
n_runs = 0
for sha, blob in runs():
    n_runs += 1
    for line in blob.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        q = d.get("q")
        if not q:
            continue
        cands = []
        if isinstance(d.get("min"), (int, float)) and d["min"] > 0:
            cands.append(d["min"])
        reps = d.get("reps")
        if isinstance(reps, list) and reps:
            cands.append(min(reps))
        if isinstance(d.get("prev_min"), (int, float)) and d["prev_min"] > 0:
            cands.append(d["prev_min"])
        # pre-r16 files carried only median/prev
        if not cands and isinstance(d.get("median"), (int, float)):
            cands.append(d["median"])
        if cands:
            m = min(cands)
            if q not in best or m < best[q]:
                best[q] = m

lines = [json.dumps({"q": q, "best_min": best[q]}) for q in sorted(best)]
with open("bench_anchors.json", "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"seeded {len(best)} anchors from {n_runs} committed bench runs")
for q in ("q_pct_window", "q_merge_scd_wide", "q_topk_agg", "q_range_frame"):
    if q in best:
        print(f"  {q}: best_min={best[q]}")
