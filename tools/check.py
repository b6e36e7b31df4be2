#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs oracleSql.

Mimics the driver's t2 gate: read each query's parquet result (written
by graft.Verify), run the oracle SQL in DuckDB over the same sf dir,
sort columns by name + rows by value, and compare.

Usage: python3 tools/check.py <outDir> <sfDir> [--repeat N] [--only a,b,c]

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
"""
import json, sys, glob, os
import duckdb

# one-pass parse: flag VALUES are consumed, never mistaken for the
# positional outdir/sfdir, and a trailing valueless flag is a usage
# error instead of an IndexError traceback
positional = []
repeat = 1
only = None
argv = sys.argv[1:]
i = 0
while i < len(argv):
    a = argv[i]
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
if len(positional) != 2:
    sys.exit("usage: check.py <outDir> <sfDir> [--repeat N] [--only a,b,c]")
outdir, sfdir = positional

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

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
