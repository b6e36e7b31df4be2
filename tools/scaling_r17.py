#!/usr/bin/env python3
"""Build SCALING_r17.json from two bench artifacts (32-core and 8-core).

Usage: python3 tools/scaling_r17.py BENCH_SUMMARY_c32.json BENCH_SUMMARY_c8.json [out.json]

For every query present in both artifacts (headline `queries` plus
`others`), emits seconds at each core count and the 8c/32c ratio; calls
out the "heavy ten" (VERDICT r16 item 5) explicitly. A >2 s query with
ratio ≈ 1 is flagged as a serial-bottleneck suspect; sub-second queries
are scheduler-overhead-bound at sf0.1 and not diagnostic (r16 verdict).
Ratios are also reported canary-normalized (seconds / canary mean of the
same run) so ambient drift between the two runs cancels to first order.
"""
import json, sys

HEAVY = [
    "q_graph_tri", "q_embed_margin_mine_ivf", "q_embed_margin_mine_pq",
    "q_embed_margin_mine_pq_ivf", "q_doc_recipe2", "q_doc_lmi_score",
    "q_embed_knn_components", "q_doc_containment_cross",
    "q_doc_ngram_pairs", "q_doc_quality_clf",
]

def load(p):
    with open(p) as f:
        d = json.load(f)
    qs = {}
    qs.update(d.get("queries", {}))
    qs.update(d.get("others", {}))
    can = d.get("canary", {}).get("mean_total") or d.get("canary_mean")
    return qs, float(can) if can else None, d.get("value")

def main():
    c32, can32, tot32 = load(sys.argv[1])
    c8, can8, tot8 = load(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else "SCALING_r17.json"
    rows = {}
    for q in sorted(set(c32) & set(c8)):
        a, b = c32[q], c8[q]
        if a is None or b is None or a < 0 or b < 0:
            continue
        row = {"c32_sec": a, "c8_sec": b,
               "ratio_8c_over_32c": round(b / a, 3) if a > 0 else None}
        if can32 and can8 and a > 0:
            row["ratio_norm"] = round((b / can8) / (a / can32), 3)
        rows[q] = row
    suspects = [q for q, r in rows.items()
                if r["c32_sec"] > 2.0 and (r["ratio_8c_over_32c"] or 9) < 1.15]
    heavy = {q: rows[q] for q in HEAVY if q in rows}
    doc = {
        "cpus_main": 32, "cpus_low": 8,
        "total_c32": tot32, "total_c8": tot8,
        "canary_mean_c32": can32, "canary_mean_c8": can8,
        "heavy_ten": heavy,
        "serial_suspects_gt2s_ratio_lt_1p15": suspects,
        "per_query": rows,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"wrote {out}: {len(rows)} queries, "
          f"{len(heavy)}/{len(HEAVY)} heavy, suspects={suspects}")
    for q, r in heavy.items():
        print(f"  {q}: 32c={r['c32_sec']:.2f}s 8c={r['c8_sec']:.2f}s "
              f"ratio={r['ratio_8c_over_32c']}")

if __name__ == "__main__":
    main()
