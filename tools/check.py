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
    # Two probe kinds.
    #
    # "gate" probes: an oracle compares a raw cosine against a literal
    # theta (q_embed_pairs >= 0.5, triplets pos >= 0.4, semdedup
    # >= 0.42). The decision flips when cross-binary drift (~1e-13 in
    # cosine = 1e-4 grid units) crosses theta; distance is reported in
    # 1e-9 grid units so one threshold reads across probes.
    #
    # "cut" probes: an oracle RANKS on round(c*1e9) and exposes the
    # selected set or rank-derived values (q_vector_knn's top-10 ids,
    # q_text_hybrid_rrf's semantic-leg ranks). A single drifted cell
    # changes the output only if it reorders an ADJACENT pair: a
    # quantized gap >= 2 between neighbors is un-flippable by sub-grid
    # drift regardless of boundary proximity; a gap <= 1 pair is
    # decided by the nearer value's distance to its z+0.5 rounding
    # boundary. The probe reports the min such decision margin over
    # the pairs that matter (all adjacent pairs when ranks are
    # exposed, the cut pair when only the set is).
    #
    # Families already on the INTEGER-DOT contract need no probe —
    # their outputs are pure integer functions of the parquet bytes
    # (margin family, q_embed_knn/purity/hard_neg/outlier/triplets-neg,
    # q_eval_*, q_embed_mmr). q_embed_knn_dist exposes only a COUNT
    # (rk <= 5 rows over fixed queries) — flip-immune by construction.
    # BM25/LM sums are integer numerators; their 1e-9 per-term
    # rounding shares ln()'s cross-libm risk but has round-tripped
    # green since r13 — revisit if a driver artifact ever reddens it.
    pairwise = ("SELECT list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
                "CAST(b.embedding AS DOUBLE[])) AS c "
                "FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id")
    qcos0 = ("SELECT e.vec_id AS id, "
             "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
             "CAST(q.q AS DOUBLE[])) AS c FROM embeddings e CROSS JOIN "
             "(SELECT embedding AS q FROM embeddings WHERE vec_id = 0) q "
             "ORDER BY CAST(round(c * 1e9) AS BIGINT) DESC, e.vec_id")
    # r15: the θ-gate families (pairs 0.5, triplets-pos 0.4, semdedup
    # 0.42/0.9, keep 0.5, keep_ivf 0.98) moved to the integer-dot
    # contract — the gate is `long_dot(uq_a, uq_b) >= round(θ·1e12)`,
    # a pure integer comparison no engine can flip. r16: the exemption
    # is VERIFIED against the registry source per family instead of
    # hardcoded — each family reads exact only if its integer
    # threshold literal still appears in SparkEntry's oracle SQL; a
    # family whose integer gate disappears falls back onto the float
    # probe below and gets measured.
    gate_probes = []
    gate_families = [("gate_pairs_0.5", 0.5),
                     ("gate_triplets_0.4", 0.4),
                     ("gate_semdedup_0.42", 0.42)]
    entry_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "..", "src/main/scala/graft/SparkEntry.scala")
    try:
        entry_src = open(entry_path).read()
    except OSError:
        entry_src = ""  # no registry source -> probe everything
    gate_exact = []
    for gname, theta in gate_families:
        int_thresh = str(round(theta * 1e12))
        if f">= {int_thresh}" in entry_src:
            gate_exact.append(
                (gname, float("inf"),
                 f"integer-dot gate: oracle compares >= {int_thresh} "
                 "(verified in SparkEntry)"))
        else:
            gate_probes.append((gname, theta))
    def half_dist(c):
        # distance of |c|*1e9 to its nearest z+0.5 rounding boundary
        import math
        x = abs(c) * 1e9
        return abs(x - math.floor(x) - 0.5)
    def cut_margin(cs, n_rank_exposed, n_cut):
        # cs: cosines in selection order. Adjacent pairs among the
        # first n_rank_exposed all matter (ranks exposed); beyond
        # that, only the cut pair (set exposure).
        import math
        # NB: Python round() is banker's rounding; the engines round
        # HALF_UP. They differ ONLY at exact half-grid values, where
        # half_dist(c) == 0 — such a pair already reads margin 0 and
        # fails the gate, so the audit verdict cannot be flipped by
        # the rounding-mode mismatch.
        qs = [int(round(c * 1e9)) for c in cs]
        worst = math.inf
        for i in range(len(cs) - 1):
            if i + 1 > n_cut and i >= n_rank_exposed:
                break
            gap = qs[i] - qs[i + 1]
            if gap >= 2:
                continue  # un-flippable by sub-grid drift
            d = min(half_dist(cs[i]), half_dist(cs[i + 1]))
            worst = min(worst, d)
        return worst
    results = list(gate_exact)
    for pname, theta in gate_probes:
        mind, near = con.sql(
            f"WITH p AS ({pairwise}) "
            f"SELECT min(abs(c - {theta})) * 1e9, "
            f"sum(CASE WHEN abs(c - {theta}) * 1e9 < 1e-2 THEN 1 ELSE 0 "
            f"END) FROM p").fetchall()[0]
        results.append((pname, mind, f"n_within_1e-2={near}"))
    # q_vector_knn: top-10 id set exposed, rank not -> cut pair only
    cs = [r[1] for r in con.sql(f"{qcos0} LIMIT 12").fetchall()]
    results.append(("cut_vector_knn_top10",
                    cut_margin(cs, n_rank_exposed=0, n_cut=10),
                    "set exposure at cut 10"))
    # q_text_hybrid_rrf semantic leg: ranks 1..20 feed the RRF sums
    cs = [r[1] for r in con.sql(f"{qcos0} LIMIT 22").fetchall()]
    results.append(("cut_hybrid_sem_ranks",
                    cut_margin(cs, n_rank_exposed=21, n_cut=20),
                    "rank exposure to 20"))
    worst = None
    bad = 0
    for pname, mind, note in results:
        flag = ""
        if mind is not None and mind < 1e-3:
            flag = ("  <-- WITHIN 1e-3 OF A BOUNDARY: rebase this "
                    "family on integer dots or regenerate the fixture")
            bad += 1
        shown = "inf" if mind == float("inf") else f"{mind:.6g}"
        print(f"{pname:24s} min_decision_margin={shown} grid units "
              f"({note}){flag}")
        if mind is not None and mind != float("inf") and \
                (worst is None or mind < worst):
            worst = mind
    # worst stays None when every probe reads inf/None (all families on
    # integer dots, or adjacent-gap >= 2 everywhere) — that is the BEST
    # outcome, not a formatting crash.
    worst_s = "inf" if worst is None else f"{worst:.6g}"
    print(f"\nboundary audit: worst={worst_s} grid units, "
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
