#!/usr/bin/env python3
"""Self-serve performance baseline: DuckDB wall time per oracle SQL vs
Spark's per-query bench time, same data (sf dir), same machine.

The reference engine cannot be timed in this sandbox (no Go toolchain)
and BASELINE.md has never carried numbers, so this is the honest
same-data same-semantics engine comparison available: every
SparkEntry.oracleSql statement IS the query's semantics, and DuckDB is a
state-of-the-art single-node OLAP engine — a strong proxy baseline.

Usage: python3 tools/baseline_proxy.py <sfDir> <oracle_sql.json> <bench.json> [out.md]
Each query runs on a FRESH DuckDB connection (cold, no result reuse),
min of 2 runs to match the Spark bench's min-of-2 protocol.
"""
import sys, json, time, math
import duckdb

sf_dir, oracle_path, bench_path = sys.argv[1], sys.argv[2], sys.argv[3]
out_md = sys.argv[4] if len(sys.argv) > 4 else "BASELINE_PROXY.md"

oracle = json.load(open(oracle_path))
bench = json.load(open(bench_path))
spark_times = bench["queries"]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# capped pool by default: the 32-thread/80%-RAM defaults intermittently
# fail tiny allocations in this sandbox (see tools/check.py); override
# with GRAFT_DUCKDB_THREADS to quantify the cap's cost on heavy oracles
import os
DUCKDB_THREADS = int(os.environ.get("GRAFT_DUCKDB_THREADS", "8"))

def time_query(sql: str) -> float:
    best = math.inf
    for _ in range(2):
        con = duckdb.connect()  # fresh engine: no cached results/plans
        con.execute(f"SET threads={DUCKDB_THREADS}")
        con.execute("SET memory_limit='32GB'")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
        con.close()
    return best

rows = []
for name in sorted(oracle):
    if name not in spark_times:
        continue
    try:
        d = time_query(oracle[name])
        rows.append((name, d, spark_times[name]))
        print(f"{name:24s} duckdb={d:8.3f}s spark={spark_times[name]:8.3f}s")
    except Exception as e:
        print(f"{name:24s} DUCKDB ERROR: {e}")
        rows.append((name, None, spark_times[name]))

ok = [(n, d, s) for n, d, s in rows if d is not None]
td, ts = sum(d for _, d, _ in ok), sum(s for _, _, s in ok)
geo = math.exp(sum(math.log(s / d) for _, d, s in ok if d > 0) / len(ok))

with open(out_md, "w") as f:
    f.write(f"""# BASELINE_PROXY — DuckDB vs Spark, same oracle SQL, same data

The driver has never published BASELINE.md timings and the sandbox has no
Go toolchain to time the reference engine, so this is the self-serve
baseline VERDICT r3 #4 asked for: **every `SparkEntry.oracleSql`
statement timed in DuckDB** (state-of-the-art single-node OLAP, fresh
connection per query = cold engine, min of 2 runs) **against Spark's
per-query bench time** (same min-of-2 protocol, `{bench_path}`), both on
`{sf_dir}` on this machine.

Caveats, stated honestly:
- DuckDB runs the *oracle* formulation (e.g. recursive-CTE transitive
  closure where Spark runs large-star/small-star); semantics match,
  algorithms legitimately differ.
- Spark's times include JVM/driver coordination overhead that amortizes
  at cluster scale but dominates sub-second queries at sf0.1; DuckDB has
  no distributed-execution path to pay for. Ratios well under ~5× on
  sub-second queries are overhead, not algorithmic gaps.
- Non-SQL-expressible components (streaming twins, sketches) have no
  oracle and are absent.
- DuckDB runs at {DUCKDB_THREADS} threads (its 32-thread default
  intermittently fails tiny allocations in this sandbox) while Spark
  runs local[32] — DuckDB totals are therefore NOT comparable with
  proxy regens from rounds that ran it at 32 threads, and parallel-
  friendly heavy oracles read slower than the engine's best.

**Totals: DuckDB {td:.1f} s, Spark {ts:.1f} s over {len(ok)} queries
(ratio {ts/td:.2f}×; per-query geometric-mean ratio {geo:.2f}×).**

| query | DuckDB (s) | Spark (s) | spark/duckdb |
|---|---|---|---|
""")
    for n, d, s in sorted(rows, key=lambda r: -(r[2] / r[1]) if r[1] else 0):
        if d is None:
            f.write(f"| {n} | error | {s:.3f} | — |\n")
        else:
            f.write(f"| {n} | {d:.3f} | {s:.3f} | {s/d:.2f}× |\n")
print(f"\nwrote {out_md}: duckdb total {td:.1f}s, spark total {ts:.1f}s, "
      f"geomean ratio {geo:.2f}x")
