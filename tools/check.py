#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs oracleSql.

Mimics the driver's t2 gate: read each query's parquet result (written
by graft.Verify), run the oracle SQL in DuckDB over the same sf dir,
sort columns by name + rows by value, and compare.

Usage: python3 tools/check.py <outDir> <sfDir> [--repeat N] [--only a,b,c]
       python3 tools/check.py --boundary-audit <sfDir>

--repeat N  re-executes each ORACLE N times and fails on any variance
            between executions — the mechanical form of the hard-won
            "REPEAT-RUN any oracle whose result feeds through an argmax
            over computed doubles" lesson (the q_embed_mmr flake hit
            ~40% of single runs yet survived every full single-run
            sweep; the r12 margin flake hit only on round-artifact
            day). Use with --only to target the double-argmax families
            (knn/margin/outlier/mmr) without N-times-ing the world.
--only      comma-separated query names (or name prefixes ending in
            '*') to check; everything else is skipped.
--boundary-audit
            Measures, for every oracle family whose output exposes a
            quantized-cosine-DERIVED value or a raw-cosine θ-gate, how
            close the deciding floats sit to their decision boundary —
            the r13 postmortem's mechanism: the engine and oracle both
            round c·1e9, but c is an environment-dependent double, so
            a candidate within ~1e-4 grid units of a z+0.5 boundary
            flips on a different DuckDB build (judge-measured: the
            margin family's closest candidate sat 1.4e-4 grid units
            out; the fix removed the float from that contract
            entirely). Reports min distance per probe in GRID UNITS
            and the count within 1e-2; exits 1 if any min < 1e-3.
            The margin family needs no probe anymore — its contract is
            a pure integer function of the parquet bytes.
"""
import json, sys, glob, os
import duckdb

# one-pass parse: flag VALUES are consumed, never mistaken for the
# positional outdir/sfdir, and a trailing valueless flag is a usage
# error instead of an IndexError traceback
positional = []
repeat = 1
only = None
boundary_audit = False
argv = sys.argv[1:]
i = 0
while i < len(argv):
    a = argv[i]
    if a == "--boundary-audit":
        boundary_audit = True
        i += 1
        continue
    if a == "--repeat" or a == "--only":
        if i + 1 >= len(argv):
            sys.exit(f"usage: {a} needs a value (see module docstring)")
        v = argv[i + 1]
        i += 2
    elif a.startswith("--repeat=") or a.startswith("--only="):
        a, v = a.split("=", 1)
        i += 1
    elif a.startswith("--"):
        sys.exit(f"unknown flag {a} (see module docstring)")
    else:
        positional.append(a)
        i += 1
        continue
    if a == "--repeat":
        repeat = int(v)
    else:
        only = v.split(",")
if boundary_audit:
    if len(positional) != 1:
        sys.exit("usage: check.py --boundary-audit <sfDir>")
    sfdir = positional[0]
elif len(positional) != 2:
    sys.exit("usage: check.py <outDir> <sfDir> [--repeat N] [--only a,b,c]")
else:
    outdir, sfdir = positional

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

if boundary_audit:
    # Each probe yields the deciding float set for a family of oracles.
    # "grid" probes quantize c on round(c*g): the boundary is the
    # nearest half-integer of |c|*g, distance in grid units =
    # abs(fmod(|c|*g, 1) - 0.5). "gate" probes compare raw c >= theta:
    # distance reported on the SAME 1e-9 grid-unit scale so one
    # threshold reads across probes.
    pairwise = ("SELECT list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
                "CAST(b.embedding AS DOUBLE[])) AS c "
                "FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id")
    probes = [
        # every q9 rank window over pairwise cosines: q_embed_outlier's
        # kth_qcos, q_embed_knn*/hard_neg/purity windows, the triplets
        # negative pick, q_eval_rank's rank-derived integers
        ("pairwise_q9_grid", f"WITH p AS ({pairwise}) "
         "SELECT min(abs(fmod(abs(c) * 1e9, 1) - 0.5)) AS mind, "
         "sum(CASE WHEN abs(fmod(abs(c) * 1e9, 1) - 0.5) < 1e-2 "
         "THEN 1 ELSE 0 END) AS near FROM p"),
        # the mmr pick grid is 1e6 — audit the same cosines there
        ("pairwise_q6_grid_mmr", f"WITH p AS ({pairwise}) "
         "SELECT min(abs(fmod(abs(c) * 1e6, 1) - 0.5)) AS mind, "
         "sum(CASE WHEN abs(fmod(abs(c) * 1e6, 1) - 0.5) < 1e-2 "
         "THEN 1 ELSE 0 END) AS near FROM p"),
        # raw-cosine theta gates (distance scaled to 1e-9 grid units):
        # q_embed_pairs >= 0.5, q_embed_triplets pos >= 0.4,
        # q_embed_semdedup_* >= 0.42 (all-pairs superset of the
        # within-cluster sets — conservative)
        ("gate_pairs_0.5", f"WITH p AS ({pairwise}) "
         "SELECT min(abs(c - 0.5)) * 1e9 AS mind, "
         "sum(CASE WHEN abs(c - 0.5) * 1e9 < 1e-2 THEN 1 ELSE 0 END) "
         "AS near FROM p"),
        ("gate_triplets_0.4", f"WITH p AS ({pairwise}) "
         "SELECT min(abs(c - 0.4)) * 1e9 AS mind, "
         "sum(CASE WHEN abs(c - 0.4) * 1e9 < 1e-2 THEN 1 ELSE 0 END) "
         "AS near FROM p"),
        ("gate_semdedup_0.42", f"WITH p AS ({pairwise}) "
         "SELECT min(abs(c - 0.42)) * 1e9 AS mind, "
         "sum(CASE WHEN abs(c - 0.42) * 1e9 < 1e-2 THEN 1 ELSE 0 END) "
         "AS near FROM p"),
    ]
    worst = None
    bad = 0
    for pname, sql in probes:
        mind, near = con.sql(sql).fetchall()[0]
        flag = ""
        if mind is not None and mind < 1e-3:
            flag = "  <-- WITHIN 1e-3 OF A BOUNDARY: rebase this "\
                   "family on integer dots or regenerate the fixture"
            bad += 1
        print(f"{pname:24s} min_boundary_dist={mind:.6g} grid units, "
              f"n_within_1e-2={near}{flag}")
        if worst is None or (mind is not None and mind < worst):
            worst = mind
    print(f"\nboundary audit: worst={worst:.6g} grid units, "
          f"{bad} probes below 1e-3 "
          f"({'FAIL' if bad else 'OK'})")
    sys.exit(1 if bad else 0)

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted([os.path.basename(p) for p in glob.glob(f"{outdir}/*")
                if os.path.isdir(p)])
if only:
    def selected(n):
        return any(n == o or (o.endswith("*") and n.startswith(o[:-1]))
                   for o in only)
    names = [n for n in names if selected(n)]

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            elif isinstance(v, list):
                v = str(sorted(v) if False else v)
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in idx], out

ok = fail = 0
for name in names:
    res_path = f"{outdir}/{name}"
    try:
        spark_rel = con.sql(f"SELECT * FROM '{res_path}/*.parquet'")
        scols, srows = spark_rel.columns, spark_rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: cannot read spark result: {e}")
        fail += 1
        continue
    if name not in oracle:
        print(f"SKIP {name}: no oracle (rows={len(srows)})")
        continue
    try:
        orel = con.sql(oracle[name])
        ocols, orows = orel.columns, orel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    oc, orr = canon(orows, ocols)
    # oracle-variance gate: any rep that hashes apart from rep 0 means
    # the oracle itself is not replay-safe (double argmax over drifting
    # computed values) — a FAIL even if the spark compare would pass
    variance = None
    for rep in range(1, repeat):
        try:
            rrel = con.sql(oracle[name])
            rcols, rrows = rrel.columns, rrel.fetchall()
        except Exception as e:
            # an intermittently-ERRORING oracle is the same flake class
            # --repeat exists to catch: FAIL this query, keep sweeping
            variance = f"oracle ERROR at rep {rep + 1}/{repeat}: {e}"
            break
        rc, rr = canon(rrows, rcols)
        if (rc, rr) != (oc, orr):
            # set-diff evidence survives row-COUNT drift (zip would
            # truncate to the shorter list and show an empty diff)
            s0, s1 = set(orr), set(rr)
            variance = (f"oracle VARIANCE at rep {rep + 1}/{repeat}: "
                        f"rows {len(orr)} vs {len(rr)}; "
                        f"rep1-only {sorted(s0 - s1)[:3]}; "
                        f"rep{rep + 1}-only {sorted(s1 - s0)[:3]}")
            break
    sc, sr = canon(srows, scols)
    if variance:
        print(f"FAIL {name}: {variance}")
        fail += 1
    elif sc != oc:
        print(f"FAIL {name}: columns {sc} vs {oc}")
        fail += 1
    elif sr != orr:
        diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
        extra_s = [r for r in sr if r not in set(orr)][:3]
        extra_o = [r for r in orr if r not in set(sr)][:3]
        print(f"FAIL {name}: rows {len(sr)} vs {len(orr)}; first diffs {diff}; "
              f"spark-only {extra_s}; oracle-only {extra_o}")
        fail += 1
    else:
        rep_note = f" [x{repeat} stable]" if repeat > 1 else ""
        print(f"OK   {name} ({len(sr)} rows){rep_note}")
        ok += 1
print(f"\n{ok} ok, {fail} fail, {len(names)} results")
sys.exit(1 if fail else 0)
