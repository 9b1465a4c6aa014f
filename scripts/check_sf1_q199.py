#!/usr/bin/env python3
"""Engine-independent replay of q199 (grid-DBSCAN hotspots) at sf1.

The q199 DuckDB oracle's recursive-CTE connected components is
super-linear and was never attempted at sf1 (SCALE.md section 22).
This replay keeps DuckDB for the LINEAR part only (the event->cell
rollup, straight off the raw parquet) and replaces the recursion with
a Python union-find over the bounded dense-cell grid (<= 360*180
cells), then compares the per-region rollup row set against the
engine frame dumped by `Test/runMain graft.Sf1Probe`.

Usage: check_sf1_q199.py <sf_dir> <engine_q199_parquet_dir>
"""
import os
import sys
import duckdb

GRID_DENSE_MIN = 10

def parquet_glob(path: str) -> str:
    """Single-file parquet (driver testdata) or Spark output dir."""
    return f"{path}/*.parquet" if os.path.isdir(path) else path

def main() -> int:
    sf_dir, engine_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    cells = con.execute(
        f"""SELECT (event_id % 360) - 180 AS cx,
                   CAST(floor(value % 90.0) AS BIGINT) AS cy,
                   count(*) AS n
            FROM read_parquet('{parquet_glob(sf_dir + "/events.parquet")}')
            WHERE value IS NOT NULL
            GROUP BY 1, 2
            HAVING count(*) >= {GRID_DENSE_MIN}"""
    ).fetchall()
    by_xy = {(cx, cy): n for cx, cy, n in cells}

    # union-find over 8-neighborhood adjacency of dense cells
    parent = {k: k for k in by_xy}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for (cx, cy) in by_xy:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx or dy) and (cx + dx, cy + dy) in by_xy:
                    union((cx, cy), (cx + dx, cy + dy))

    regions = {}
    for (cx, cy), n in by_xy.items():
        r = find((cx, cy))
        st = regions.setdefault(r, [0, 0, 10**9, 10**9, -10**9, -10**9])
        st[0] += 1
        st[1] += n
        st[2] = min(st[2], cx)
        st[3] = min(st[3], cy)
        st[4] = max(st[4], cx)
        st[5] = max(st[5], cy)
    expected = sorted(tuple(v) for v in regions.values())

    engine = sorted(
        tuple(r) for r in con.execute(
            f"""SELECT n_cells, n_events, min_cx, min_cy, max_cx, max_cy
                FROM read_parquet('{parquet_glob(engine_dir)}')"""
        ).fetchall()
    )
    if engine == expected:
        print(f"PASS  q199 replay: {len(expected)} regions, "
              f"{len(by_xy)} dense cells — row sets identical")
        return 0
    print(f"FAIL  q199 replay: engine {len(engine)} rows vs "
          f"expected {len(expected)}")
    for row in (set(expected) - set(engine)):
        print("  missing:", row)
    for row in (set(engine) - set(expected)):
        print("  extra:  ", row)
    return 1


if __name__ == "__main__":
    sys.exit(main())
