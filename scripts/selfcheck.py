#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each parquet written by
graft.Verify, run the corresponding oracle SQL in DuckDB over the same
testdata parquet files and compare values (column-name-sorted, rounded)."""
import duckdb, json, sys, glob, os
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes = [], 0
for name, sql in sorted(oracle.items()):
    pq = f"{out_dir}/{name}"
    if not os.path.isdir(pq):
        fails.append((name, "no spark output")); continue
    try:
        ours = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')").df()
        theirs = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"duckdb error: {e}")); continue
    o = ours.reindex(sorted(ours.columns), axis=1)
    t = theirs.reindex(sorted(theirs.columns), axis=1)
    if list(o.columns) != list(t.columns):
        fails.append((name, f"cols {list(o.columns)} vs {list(t.columns)}")); continue
    o = o.sort_values(list(o.columns)).reset_index(drop=True)
    t = t.sort_values(list(t.columns)).reset_index(drop=True)
    if len(o) != len(t):
        fails.append((name, f"rows {len(o)} vs {len(t)}")); continue
    mismatch = None
    for c in o.columns:
        a, b = o[c], t[c]
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            import numpy as np
            if not np.allclose(a.astype(float), b.astype(float), rtol=1e-9, atol=1e-12, equal_nan=True):
                mismatch = f"col {c}: {a.tolist()[:5]} vs {b.tolist()[:5]}"; break
        elif not a.astype(str).equals(b.astype(str)):
            mismatch = f"col {c}: {a.tolist()[:5]} vs {b.tolist()[:5]}"; break
    if mismatch: fails.append((name, mismatch))
    else: passes += 1

print(f"PASS {passes}/{len(oracle)}")
for n, why in fails:
    print(f"FAIL {n}: {why}")
sys.exit(1 if fails else 0)
