#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each parquet written by
graft.Verify, run the corresponding oracle SQL in DuckDB over the same
testdata parquet files and compare values (column-name-sorted, rounded)."""
import duckdb, json, sys, glob, os
import numpy as np
import pandas as pd


def compare_frames(o, t):
    """Column-wise compare of two name-sorted, row-sorted frames.

    Integer columns (and anything else non-float on BOTH sides) compare
    EXACTLY — the driver hashes raw values, so a tolerance here is a
    false green (VERDICT r11 what's-wrong #2: the r10 compaction_execute
    hash failure slipped through np.allclose). Tolerance is reserved for
    genuinely float columns, where DuckDB/Spark double accumulation
    order can differ by ulps.
    """
    for c in o.columns:
        a, b = o[c], t[c]
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            # exact where one side is integer-typed: the value IS exact,
            # the float dtype is pandas NULL-promotion noise. Compare as
            # INTEGERS, not float-promoted values — above 2^53 the float
            # spacing exceeds 1 and a small integer slip would compare
            # equal after promotion (ADVICE r12 low #4): round-trip the
            # float side through int64, requiring it integral + in range.
            if a.dtype.kind in 'iu' or b.dtype.kind in 'iu':
                mism = None
                for x, y in zip(a.tolist(), b.tolist()):
                    xna, yna = pd.isna(x), pd.isna(y)
                    if xna or yna:
                        if xna != yna:
                            mism = True; break
                        continue
                    ok = True
                    for v in (x, y):
                        # finiteness first: int(inf) raises instead of
                        # reporting the mismatch (code-review r13)
                        if isinstance(v, float) and (
                                not np.isfinite(v) or
                                not (-2**63 <= v < 2**63) or
                                v != int(v)):
                            ok = False
                    if not ok or int(x) != int(y):
                        mism = True; break
                if mism:
                    return f"col {c} (int-exact): {a.tolist()[:5]} vs {b.tolist()[:5]}"
            elif not np.allclose(a.astype(float), b.astype(float),
                                 rtol=1e-9, atol=1e-12, equal_nan=True):
                return f"col {c}: {a.tolist()[:5]} vs {b.tolist()[:5]}"
        elif not a.astype(str).equals(b.astype(str)):
            return f"col {c}: {a.tolist()[:5]} vs {b.tolist()[:5]}"
    return None


def selftest():
    """Pin the r10 crack shut: a 1-off integer (≪ rtol·value at large
    magnitudes, so the OLD allclose passed it) must now FAIL when one
    side got float-promoted, and float columns keep their tolerance."""
    big = 10 ** 15
    o = pd.DataFrame({"s": np.array([big], dtype=np.int64)})
    t = pd.DataFrame({"s": np.array([float(big + 64)])})  # 1-ulp-ish slip
    assert np.allclose(o["s"].astype(float), t["s"], rtol=1e-9, atol=1e-12), \
        "old tolerance should have (wrongly) passed this"
    assert compare_frames(o, t) is not None, "int-exact must catch the slip"
    # ADVICE r12 low #4: above 2^53 a small integer slip vanishes under
    # float promotion (spacing > 1) — the integer round-trip must catch it
    o3 = pd.DataFrame({"s": np.array([2 ** 60 + 1], dtype=np.int64)})
    t3 = pd.DataFrame({"s": np.array([float(2 ** 60)])})
    assert (o3["s"].astype(float) == t3["s"]).all(), \
        "float promotion should have (wrongly) equated these"
    assert compare_frames(o3, t3) is not None, \
        "int-exact must catch a sub-spacing slip at 2^60"
    # ...while the true value at the same magnitude still passes
    t4 = pd.DataFrame({"s": np.array([float(2 ** 60)])})
    o4 = pd.DataFrame({"s": np.array([2 ** 60], dtype=np.int64)})
    assert compare_frames(o4, t4) is None, "exact int at 2^60 must pass"
    # a non-integral float against an int column is a mismatch, never a cast
    o5 = pd.DataFrame({"s": np.array([3], dtype=np.int64)})
    t5 = pd.DataFrame({"s": np.array([3.5])})
    assert compare_frames(o5, t5) is not None, "non-integral float must fail"
    o2 = pd.DataFrame({"s": [0.1 + 0.2]})
    t2 = pd.DataFrame({"s": [0.3]})
    assert compare_frames(o2, t2) is None, "float tolerance must survive"
    print("selftest OK")
    sys.exit(0)


if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
    selftest()

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
    mismatch = compare_frames(o, t)
    if mismatch: fails.append((name, mismatch))
    else: passes += 1

print(f"PASS {passes}/{len(oracle)}")
for n, why in fails:
    print(f"FAIL {n}: {why}")
sys.exit(1 if fails else 0)
