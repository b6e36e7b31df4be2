#!/usr/bin/env python3
"""Canary-normalized round-over-round bench comparison (the r15
protocol, consumed for the first time in r16): every per-query value is
read as seconds / canary-mean (`queries_norm` / `others_norm` in the
Bench JSON), so a uniform environmental shift (thermal state, noisy
neighbor) divides OUT and only STRUCTURAL movers remain. A mover is a
normalized ratio beyond the threshold in either direction; each one
needs a named cause or a bisect (VERDICT r15, next-round item 2).

Usage: benchcmp.py <old.json> <new.json> [threshold=1.3]
Prints: median ratio (the environmental residue — should be ~1.0 by
construction), movers sorted by ratio, and a count summary.
"""
import json
import statistics
import sys


def load(p):
    line = open(p).read().strip()
    d = json.loads(line[line.index("{"):])
    out = dict(d.get("queries_norm", {}))
    out.update(d.get("others_norm", {}))
    return out, d


old, do = load(sys.argv[1])
new, dn = load(sys.argv[2])
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
shared = sorted(set(old) & set(new))
ratios = {}
for k in shared:
    if old[k] > 0 and new[k] > 0:
        ratios[k] = new[k] / old[k]
med = statistics.median(ratios.values())
print(f"shared queries: {len(ratios)}  median normalized ratio: {med:.3f}")
print(f"canary mean old={do['canary']['mean_total']:.3f}s "
      f"new={dn['canary']['mean_total']:.3f}s "
      f"(drift within new run: {dn['canary']['drift']:.3f})")
movers = {k: r for k, r in ratios.items()
          if r > thresh or r < 1.0 / thresh}
for k in sorted(movers, key=lambda k: -movers[k]):
    d = "SLOWER" if movers[k] > 1 else "faster"
    print(f"{k:32s} x{movers[k]:5.2f} {d}  "
          f"(norm {old[k]:8.3f} -> {new[k]:8.3f})")
only_new = sorted(set(new) - set(old))
if only_new:
    print("new queries (no prior):", ", ".join(only_new))
only_old = sorted(set(old) - set(new))
if only_old:
    print("dropped queries:", ", ".join(only_old))
print(f"{len(movers)} movers beyond x{thresh} "
      f"({sum(1 for r in movers.values() if r > 1)} slower, "
      f"{sum(1 for r in movers.values() if r < 1)} faster)")
