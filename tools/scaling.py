#!/usr/bin/env python3
"""Empirical scaling audit: merge two Bench JSON lines (small SF, big
SF) into a per-query ratio table. Rows grow 10x from sf0.01 to sf0.1
(documents 500 -> 5000, events/lineitem ~10x), so a time ratio well
above 10 flags super-linear behavior worth a plan audit; sub-second
queries are mostly fixed overhead and read below 1.

Usage: python3 tools/scaling.py <bench_small.json> <bench_big.json> <out.json>
"""
import json
import sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))


def merged(d):
    out = dict(d.get("queries", {}))
    out.update(d.get("others", {}))
    return out


qs, qb = merged(small), merged(big)
rows = {}
for k in sorted(set(qs) & set(qb)):
    if qs[k] <= 0 or qb[k] <= 0:
        continue  # errored queries are excluded, never ratioed
    rows[k] = {
        "small_sec": round(qs[k], 4),
        "big_sec": round(qb[k], 4),
        "ratio": round(qb[k] / qs[k], 2),
    }
worst = sorted(rows.items(), key=lambda kv: -kv[1]["ratio"])[:10]
out = {
    "small_sf": small.get("sf"),
    "big_sf": big.get("sf"),
    "rows_ratio": 10,
    "queries": rows,
    "worst": [
        {"query": k, **v} for k, v in worst
    ],
    "loadavg_start": {
        "small": small.get("loadavg_start"),
        "big": big.get("loadavg_start"),
    },
}
json.dump(out, open(sys.argv[3], "w"), indent=1)
print("worst ratios:")
for k, v in worst:
    print(f"  {v['ratio']:6.2f}x  {k}  ({v['small_sec']}s -> {v['big_sec']}s)")
