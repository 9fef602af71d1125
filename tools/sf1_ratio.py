#!/usr/bin/env python3
"""sf0.1 -> sf1 scaling-ratio table for the sf1 audit.

Reads the committed sf0.1 baseline (bench/BENCH_FULL.json) and an sf1 run
(default /tmp/bench_sf1/BENCH_FULL.json), prints a markdown table sorted by
ratio descending, and flags queries whose wall-clock grew by more than the
data did (ratio > 10 on a 10x fixture) beyond a noise floor.

Usage: python3 tools/sf1_ratio.py [sf1_json] [--floor 0.15]
"""
import json
import sys
from pathlib import Path

sf1_path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/tmp/bench_sf1/BENCH_FULL.json"
floor = 0.15
for a in sys.argv:
    if a.startswith("--floor="):
        floor = float(a.split("=", 1)[1])

base = json.loads(Path("bench/BENCH_FULL.json").read_text())["queries"]
run = json.loads(Path(sf1_path).read_text())
sf1 = run["queries"]
# fresh-JVM re-measures Bench forked automatically for >10x flags
# (SPARK_GRAFT_BASELINE auto-isolation) — the authoritative number for
# a flagged query; the full-run one is kept for the heap-adjacency diff
isolated = run.get("isolated", {})

rows = []
for q, t1 in sorted(sf1.items()):
    t0 = base.get(q)
    ratio = (t1 / t0) if t0 else None
    rows.append((q, t0, t1, ratio))

rows.sort(key=lambda r: -(r[3] or 0))
print(f"| query | sf0.1 s | sf1 s | ratio | note |")
print("|---|---|---|---|---|")
superlin = []
for q, t0, t1, ratio in rows:
    if ratio is None:
        print(f"| {q} | — | {t1:.3f} | no sf0.1 baseline | |")
        continue
    note = ""
    if ratio > 10 and t1 > floor:
        iso = isolated.get(q)
        if iso is not None and t0:
            iso_ratio = iso / t0
            if iso_ratio > 10:
                note = f"SUPER-LINEAR (isolated {iso:.3f}s = {iso_ratio:.2f}x)"
                superlin.append(q)
            else:
                note = (f"full-run artifact: isolated {iso:.3f}s = "
                        f"{iso_ratio:.2f}x (sub-linear)")
        else:
            note = "SUPER-LINEAR"
            superlin.append(q)
    elif ratio > 10:
        note = "sub-floor abs time"
    print(f"| {q} | {t0:.3f} | {t1:.3f} | {ratio:.2f}x | {note} |")

tot0 = sum(t0 for _, t0, _, r in rows if r is not None)
tot1 = sum(t1 for _, _, t1, _ in rows)
ratios = sorted(r for _, _, _, r in rows if r is not None)
q = lambda p: ratios[min(len(ratios) - 1, int(p * len(ratios)))]
print(f"\ntotals: sf0.1 {tot0:.1f}s -> sf1 {tot1:.1f}s "
      f"({tot1 / tot0:.2f}x on 10x data, {len(rows)} queries)")
print(f"ratio distribution: median {q(0.5):.2f}x, q75 {q(0.75):.2f}x, "
      f"q90 {q(0.9):.2f}x, max {ratios[-1]:.2f}x")
if superlin:
    print(f"super-linear (> 10x, abs > {floor}s): {', '.join(superlin)}")
else:
    print(f"no query exceeds 10x beyond the {floor}s noise floor")
