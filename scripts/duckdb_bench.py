#!/usr/bin/env python3
"""Measure the DuckDB side of the per-query bench ratio table.

Usage: python3 scripts/duckdb_bench.py <sfDir> <oracle_sql.json> <out.json>

Times every oracle SQL statement (the exact strings the correctness gate
runs) in an in-process DuckDB over the same sf parquet tables, REPEATS runs
each, and writes {"sf":..., "threads":..., "runs":..., "agg":"min",
"queries":{name: seconds}}.

The output is committed as bench/duckdb_baseline_sf0.1.json so that
graft.Bench (the Scala bench main) can emit spark_s/duckdb_s ratios without
a python dependency at bench time. Regenerate whenever oracle SQL changes:

  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v01"
  python3 scripts/duckdb_bench.py /root/testdata/sf0.1 /tmp/v01/oracle_sql.json \
      bench/duckdb_baseline_sf0.1.json
"""
import json, os, sys, time
import duckdb

REPEATS = 3
THREADS = 32

def main(sf_dir, oracle_path, out_path):
    con = duckdb.connect()
    con.execute(f"SET threads={THREADS}")
    con.execute("SET TimeZone='UTC'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_path))
    out = {}
    for name in sorted(oracle):
        best = None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            con.sql(oracle[name]).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 6)
        print(f"{name}: {best:.4f}s")
    total = sum(out.values())
    print(f"TOTAL ({len(out)} queries): {total:.2f}s")
    doc = {"sf": sf_dir, "threads": THREADS, "runs": REPEATS, "agg": "min",
           "total": round(total, 4), "queries": out}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
