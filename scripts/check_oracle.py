#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir, runs the matching oracle_sql.json
entry in DuckDB over the sfDir parquet tables, sorts columns by name,
sorts rows, and compares cell-by-cell (exact for non-floats, rel-tol 1e-9
for floats — stricter than any sane driver check, so passing here should
mean passing there). Queries without oracle SQL get a rows>0 check.
"""
import json, math, sys, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
qdirs = sorted(d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d)))
fails = 0
# a query that errored writes no output dir — that's a FAIL, not a skip
for q in sorted(set(oracle) - set(qdirs)):
    print(f"FAIL {q}: query produced no output (errored in Verify)")
    fails += 1
for q in qdirs:
    files = glob.glob(os.path.join(out, q, "*.parquet"))
    if not files:
        print(f"FAIL {q}: no parquet output"); fails += 1; continue
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if q not in oracle:
        ok = len(got) > 0
        print(f"{'ok  ' if ok else 'FAIL'} {q}: rows-only check, {len(got)} rows")
        fails += 0 if ok else 1
        continue
    try:
        exp = con.execute(oracle[q]).fetchdf()
    except Exception as e:
        print(f"FAIL {q}: oracle SQL error: {e}"); fails += 1; continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {q}: columns {gcols} vs oracle {ecols}"); fails += 1; continue
    # Dtype-class check: the driver hashes TYPED values, so an engine
    # BIGINT vs oracle DOUBLE column hash-mismatches even when every
    # value is numerically equal (round-8 lesson: 6 red rows the old
    # value-only compare called green). Compare the dtype CLASS
    # (integer / float / bool / datetime) per column and fail on skew.
    # 'object' columns (strings, arrays, HUGEINT-with-null spillover)
    # are exempt — the cell compare below covers them.
    def kind_class(k):
        return {"i": "int", "u": "int", "f": "float", "b": "bool",
                "M": "datetime", "m": "timedelta"}.get(k, "other")
    skew = [(c, got[c].dtype, exp[c].dtype) for c in gcols
            if kind_class(got[c].dtype.kind) != kind_class(exp[c].dtype.kind)
            and "other" not in (kind_class(got[c].dtype.kind),
                                kind_class(exp[c].dtype.kind))]
    if skew:
        c, gk, ek = skew[0]
        print(f"FAIL {q}: dtype skew col {c}: engine {gk} vs oracle {ek}"
              f" (driver's typed hash will mismatch)")
        fails += 1; continue
    # Sort rows for comparison on every non-array column. Float columns
    # participate too: raw passthrough floats are bit-identical across
    # engines (needed when the non-float columns aren't a unique key,
    # e.g. q5's duplicate (orderkey, partkey) pairs), and computed float
    # aggregates only ever differ by ulps on rows whose non-float group
    # keys are already unique.
    def sortable(df):
        return [c for c in gcols
                if not df[c].map(lambda v: isinstance(v, (list, tuple)) or
                                 type(v).__name__ == "ndarray").any()]
    keys = sortable(got) or gcols
    try:
        g = got[gcols].sort_values(keys, kind="mergesort").reset_index(drop=True)
        e = exp[ecols].sort_values(keys, kind="mergesort").reset_index(drop=True)
    except TypeError:
        g = got[gcols].iloc[got[gcols].astype(str).apply(tuple, axis=1).argsort()].reset_index(drop=True)
        e = exp[ecols].iloc[exp[ecols].astype(str).apply(tuple, axis=1).argsort()].reset_index(drop=True)
    if len(g) != len(e):
        print(f"FAIL {q}: rowcount {len(g)} vs oracle {len(e)}"); fails += 1; continue
    bad = None
    for c in gcols:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b): continue
                if a == b: continue
                if abs(a-b) <= 1e-9 * max(1.0, abs(a), abs(b)):
                    bad = bad or ("ULP", c, i, a, b); continue
                bad = ("VAL", c, i, a, b); break
            else:
                if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray")>=0:
                    if list(a) == list(b): continue
                elif a == b or (a is None and b is None) or str(a) == str(b):
                    continue
                bad = ("VAL", c, i, a, b); break
        if bad and bad[0] == "VAL": break
    if bad and bad[0] == "VAL":
        print(f"FAIL {q}: col {bad[1]} row {bad[2]}: got {bad[3]!r} oracle {bad[4]!r}")
        fails += 1
    elif bad:
        print(f"warn {q}: float ulp drift col {bad[1]} ({bad[3]} vs {bad[4]}) — within tol")
        print(f"ok   {q}: {len(g)} rows (float-tol)")
    else:
        print(f"ok   {q}: {len(g)} rows exact")
print(f"\n{len(qdirs)-fails}/{len(qdirs)} pass")
sys.exit(1 if fails else 0)
