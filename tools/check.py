#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs oracleSql.

Mimics the driver's t2 gate: read each query's parquet result (written
by graft.Verify), run the oracle SQL in DuckDB over the same sf dir,
sort columns by name + rows by value, and compare.

Usage: python3 tools/check.py <outDir> <sfDir>
"""
import json, sys, glob, os
import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted([os.path.basename(p) for p in glob.glob(f"{outdir}/*")
                if os.path.isdir(p)])

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
    sc, sr = canon(srows, scols)
    oc, orr = canon(orows, ocols)
    if sc != oc:
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
        print(f"OK   {name} ({len(sr)} rows)")
        ok += 1
print(f"\n{ok} ok, {fail} fail, {len(names)} results")
sys.exit(1 if fail else 0)
