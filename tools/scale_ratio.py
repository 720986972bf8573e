#!/usr/bin/env python3
"""sf1.0/sf0.1 stress-replay ratio table (r13 verdict "Next" #1).

Reads two Bench JSONs (the per-query min-of-passes maps) and emits a
markdown table of per-query wall-clock ratios, bucketed for the SCALE.md
reading:

  - data grows 10x between the runs, so a scan-bound query should land
    near 10x, an answer-sized/model-bound one near 1x, and anything far
    above 10x needs either a documented bounded-model cap explanation or a
    fix;
  - sub-second rows drift up to ~2.5x under host load (the bench-noise
    policy), so ratios are only flagged when the sf1 time is also
    non-trivial (>2 s) — a 0.1 s -> 0.9 s "9x" is scheduling noise, not a
    scaling signal.

Usage: python3 tools/scale_ratio.py <bench_sf0.1.json> <bench_sf1.0.json>
       [flag_ratio=15] [flag_min_sec=2.0]
"""
import json
import sys

lo = json.load(open(sys.argv[1]))
hi = json.load(open(sys.argv[2]))
flag_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
flag_min = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0

qlo, qhi = lo["queries"], hi["queries"]
common = sorted(set(qlo) & set(qhi))
missing = sorted(set(qlo) ^ set(qhi))

rows = []
for q in common:
    a, b = qlo[q], qhi[q]
    rows.append((q, a, b, b / max(a, 1e-9)))

rows.sort(key=lambda r: -r[3])
print(f"| query | sf0.1 s | sf1.0 s | ratio |")
print(f"|---|---|---|---|")
for q, a, b, r in rows:
    flag = " **FLAG**" if (r > flag_ratio and b > flag_min) else ""
    print(f"| {q} | {a:.2f} | {b:.2f} | {r:.1f}x{flag} |")

tot_lo = sum(qlo[q] for q in common)
tot_hi = sum(qhi[q] for q in common)
print(f"\ntotals: sf0.1 {tot_lo:.1f} s, sf1.0 {tot_hi:.1f} s, "
      f"ratio {tot_hi / tot_lo:.2f}x over {len(common)} queries")
n_flag = sum(1 for q, a, b, r in rows if r > flag_ratio and b > flag_min)
buckets = {
    "<=2x (model/answer-bound)": sum(1 for *_, r in rows if r <= 2),
    "2-12x (~linear in data)": sum(1 for *_, r in rows if 2 < r <= 12),
    ">12x": sum(1 for *_, r in rows if r > 12),
}
for k, v in buckets.items():
    print(f"  {k}: {v}")
print(f"  flagged (> {flag_ratio}x and > {flag_min}s at sf1): {n_flag}")
if missing:
    print(f"  only in one run: {missing}")
