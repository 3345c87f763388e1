#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the corresponding Spark result parquet, sort
columns by name, and compare values exactly. Usage:
  python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

import numpy as np

def norm(v):
    if isinstance(v, (float, np.floating)):
        v = float(v)
        return "NaN" if math.isnan(v) else v
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(norm(x) for x in v)
    return v

fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}")
        fail += 1
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
    wcols, gcols = sorted(want.columns), sorted(got.columns)
    if wcols != gcols:
        print(f"FAIL {name}: columns {gcols} vs oracle {wcols}")
        fail += 1
        continue
    want, got = want[wcols], got[gcols]
    # The DRIVER's comparator sorts/hashes through pandas, which cannot
    # hash list cells — an array-typed output column nulls the row there
    # even though this tuple-izing replica would pass. Fail loudly so an
    # array column never silently reaches the driver gate again
    # (convention: emit joined strings, as g1_inverted_index does).
    arraycols = [c for c in gcols
                 if any(isinstance(v, (list, tuple, np.ndarray))
                        for v in got[c].head(5))
                 or any(isinstance(v, (list, tuple, np.ndarray))
                        for v in want[c].head(5))]
    if arraycols:
        print(f"FAIL {name}: array-typed column(s) {arraycols} — the driver "
              f"comparator cannot hash list cells; emit a joined string")
        fail += 1
        continue
    if len(want) != len(got):
        print(f"FAIL {name}: rows {len(got)} vs oracle {len(want)}")
        fail += 1
        continue
    wrows = [tuple(norm(v) for v in r) for r in want.itertuples(index=False)]
    grows = [tuple(norm(v) for v in r) for r in got.itertuples(index=False)]
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(grows, wrows)) if a != b]
    if bad:
        i, a, b = bad[0]
        print(f"FAIL {name}: {len(bad)}/{len(wrows)} rows differ; first at {i}:")
        print(f"   got:  {a}")
        print(f"   want: {b}")
        fail += 1
    else:
        print(f"ok   {name} ({len(wrows)} rows)")

# rows-only entries (no oracle): report row counts
import os
for d in sorted(os.listdir(outdir)):
    if d == "oracle_sql.json" or d in oracle:
        continue
    n = con.execute(f"SELECT count(*) FROM read_parquet('{outdir}/{d}/*.parquet')").fetchone()[0]
    print(f"rows-only {d}: {n} rows")

print(f"\n{fail} failures / {len(oracle)} oracles")
sys.exit(1 if fail else 0)
