#!/usr/bin/env python3
"""Third-decade-ish scaling audit: merge FOUR Bench JSON lines
(sf0.01, sf0.1, 10x-sf0.1 synth, 30x-sf0.1 synth) into a per-query
ratio table. decade1 = t(sf0.1)/t(sf0.01), decade2 = t(sf1)/t(sf0.1)
(both 10x-row steps), step3 = t(sf3)/t(sf1) on a 3x-row step with
`step3_per_decade` = step3 ** (log10(10)/log10(3)) ~ step3^2.096 as
the decade-equivalent ratio. The point of the fourth point: a d2-flagged
query that is SETTLING reads step3_per_decade <= decade2; one that is
still COMPOUNDING reads step3_per_decade > decade2.

Usage: scaling4.py <b_001.json> <b_01.json> <b_1.json> <b_3.json> <out.json>
"""
import json
import math
import sys


def load(p):
    line = open(p).read().strip()
    line = line[line.index("{"):]
    d = json.loads(line)
    out = dict(d.get("queries", {}))
    out.update(d.get("others", {}))
    return out, d


qs, ds = load(sys.argv[1])
qm, dm = load(sys.argv[2])
qb, db = load(sys.argv[3])
qx, dx = load(sys.argv[4])
STEP3_ROWS = 3.0
DECADE_EXP = math.log(10) / math.log(STEP3_ROWS)
rows = {}
for k in sorted(set(qs) & set(qm) & set(qb) & set(qx)):
    if min(qs[k], qm[k], qb[k], qx[k]) <= 0:
        continue  # errored queries are excluded, never ratioed
    d1, d2 = qm[k] / qs[k], qb[k] / qm[k]
    s3 = qx[k] / qb[k]
    s3dec = s3 ** DECADE_EXP
    rows[k] = {
        "sf001_sec": round(qs[k], 4),
        "sf01_sec": round(qm[k], 4),
        "sf1_sec": round(qb[k], 4),
        "sf3_sec": round(qx[k], 4),
        "decade1": round(d1, 2),
        "decade2": round(d2, 2),
        "step3": round(s3, 2),
        "step3_per_decade": round(s3dec, 2),
        # still compounding = the decade-equivalent ratio KEPT GROWING
        # past the second decade's (the settling-vs-compounding
        # question the fourth point exists to answer), and is at least
        # super-linear-adjacent
        "still_compounding": s3dec > d2 * 1.1 and s3dec > 6.0,
        "settling": s3dec <= d2,
    }
out = {
    "points": [ds.get("sf"), dm.get("sf"), db.get("sf"), dx.get("sf")],
    "rows_ratio_per_step": [10, 10, 3],
    "loadavg_start": [ds.get("loadavg_start"), dm.get("loadavg_start"),
                      db.get("loadavg_start"), dx.get("loadavg_start")],
    "queries": rows,
    "still_compounding": [k for k, v in rows.items()
                          if v["still_compounding"]],
    "settling": [k for k, v in rows.items() if v["settling"]],
}
json.dump(out, open(sys.argv[5], "w"), indent=1)
print(json.dumps({k: {kk: v[kk] for kk in
                      ("decade2", "step3", "step3_per_decade",
                       "still_compounding", "settling")}
                  for k, v in rows.items()}, indent=1))
