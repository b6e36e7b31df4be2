#!/usr/bin/env python3
"""Second-decade scaling audit: merge THREE Bench JSON lines
(sf0.01, sf0.1, 10x-sf0.1 synth) into a per-query two-decade ratio
table. decade1 = t(sf0.1)/t(sf0.01), decade2 = t(sf1)/t(sf0.1); rows
grow 10x per decade, so a decade2 ratio approaching (or passing) 10
flags super-linear behavior, and decade2 >> decade1 flags COMPOUNDING
(a ratio that grows with scale) — the signature one decade of evidence
cannot distinguish from fixed-overhead amortization.

The sf1 corpus comes from graft.SynthScale (id-offset unions of
sf0.1 — see its scaladoc for why embeddings get decorrelating noise).

Usage: python3 tools/scaling3.py <b_small.json> <b_mid.json> <b_big.json> <out.json>
"""
import json
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
rows = {}
for k in sorted(set(qs) & set(qm) & set(qb)):
    if min(qs[k], qm[k], qb[k]) <= 0:
        continue  # errored queries are excluded, never ratioed
    d1, d2 = qm[k] / qs[k], qb[k] / qm[k]
    rows[k] = {
        "sf001_sec": round(qs[k], 4),
        "sf01_sec": round(qm[k], 4),
        "sf1_sec": round(qb[k], 4),
        "decade1": round(d1, 2),
        "decade2": round(d2, 2),
        # compounding = the second decade's ratio grew past the first's
        # AND is approaching the row ratio itself. A d2 of 3-5x on 10x
        # rows after a sub-1x-overhead first decade is amortization
        # ending (per-row work becoming visible), still strongly
        # sub-linear — the flag is for ratios that would EXCEED linear
        # if the trend continued one more decade.
        "compounding": d2 > max(d1, 1.0) * 1.25 and d2 > 0.6 * 10,
    }
out = {
    "points": [ds.get("sf"), dm.get("sf"), db.get("sf")],
    "rows_ratio_per_decade": 10,
    "loadavg_start": [ds.get("loadavg_start"), dm.get("loadavg_start"),
                      db.get("loadavg_start")],
    "queries": rows,
    "worst_decade2": sorted(
        ({"query": k, **v} for k, v in rows.items()),
        key=lambda r: -r["decade2"])[:10],
    "compounding": [k for k, v in rows.items() if v["compounding"]],
}
json.dump(out, open(sys.argv[4], "w"), indent=1)
print(f"{len(rows)} queries; compounding: {out['compounding']}")
for r in out["worst_decade2"][:6]:
    print(f"  {r['query']:24s} d1={r['decade1']:5.2f} d2={r['decade2']:5.2f}")
