#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare Verify output
parquet against DuckDB running SparkEntry.oracleSql on the same tables.
Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# cap DuckDB: with the 32-thread / 80%-of-RAM defaults this sandbox
# intermittently fails tiny (1-4 KB) allocations with "Out of Memory
# Error" even with >100 GB free — a capped pool is reliable and the
# oracles are small enough that 8 threads cost nothing measurable
con.execute("SET threads=8")
con.execute("SET memory_limit='32GB'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    pq_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{pq_dir}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); print(f"FAIL {name}: no spark output"); continue
    try:
        mine = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        ref = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"error: {e}")); print(f"FAIL {name}: {e}"); continue
    mine = mine.reindex(sorted(mine.columns), axis=1)
    ref = ref.reindex(sorted(ref.columns), axis=1)
    if list(mine.columns) != list(ref.columns):
        fails.append((name, f"cols {list(mine.columns)} vs {list(ref.columns)}"))
        print(f"FAIL {name}: cols {list(mine.columns)} vs {list(ref.columns)}"); continue
    if len(mine) != len(ref):
        fails.append((name, f"rows {len(mine)} vs {len(ref)}"))
        print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}"); continue
    # dtype compare first: the driver's hash is type-sensitive (int64 1
    # vs float64 1.0 hash differently), so numpy == alone is too lax
    def canon_dtype(d):
        s = str(d)
        return "datetime64" if s.startswith("datetime64") else s
    dt_bad = [c for c in mine.columns
              if canon_dtype(mine[c].dtype) != canon_dtype(ref[c].dtype)]
    if dt_bad:
        detail = {c: (str(mine[c].dtype), str(ref[c].dtype)) for c in dt_bad}
        fails.append((name, f"dtype mismatch {detail}"))
        print(f"FAIL {name}: dtype mismatch {detail}"); continue
    # exact value compare, row order as produced
    diff_cols = []
    for c in mine.columns:
        a, b = mine[c], ref[c]
        try:
            same = (a.values == b.values) | (pd.isna(a.values) & pd.isna(b.values))
            ok = bool(same.all())
        except Exception:
            ok = a.astype(str).equals(b.astype(str))
        if not ok:
            diff_cols.append(c)
    if diff_cols:
        fails.append((name, f"value mismatch in {diff_cols}"))
        print(f"FAIL {name}: value mismatch in {diff_cols}")
        for c in diff_cols[:2]:
            neq = mine[c].values != ref[c].values
            idx = [i for i, x in enumerate(neq) if x][:3]
            for i in idx:
                print(f"   row {i}: mine={mine[c].iloc[i]!r} ref={ref[c].iloc[i]!r}")
    else:
        print(f"OK   {name} ({len(mine)} rows)")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
