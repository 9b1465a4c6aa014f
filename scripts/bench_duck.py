#!/usr/bin/env python3
"""Time every oracle SQL on DuckDB (default threads = all cores) over a
scale-factor directory — the stronger-than-reference single-node baseline
BASELINE.md compares BENCH numbers against. Dev tooling only.

Usage: python3 scripts/bench_duck.py <sfDir> <oracleSqlJson> [iters]
"""
import json, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def table_glob(sf_dir, t):
    """Driver lakes are flat files; ScaleUpData replica lakes are Spark
    directory-parquet — glob the part files in that case."""
    path = f"{sf_dir}/{t}.parquet"
    return f"{path}/*.parquet" if os.path.isdir(path) else path

def main(sf_dir, oracle_path, iters=2):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_glob(sf_dir, t)}'")
    oracle = json.load(open(oracle_path))
    times = {}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(int(iters)):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        print(f"{times[name]:8.3f}  {name}", flush=True)
    total = round(sum(times.values()), 3)
    print(json.dumps({"metric": "duckdb_total", "value": total,
                      "unit": "sec", "n_queries": len(times), "sf": sf_dir}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(sys.argv[3:] or []))
