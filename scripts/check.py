#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run DuckDB oracle SQL
over the same parquet tables and compare against Verify's parquet dumps.
Dev tooling only — the shipped Scala library has no Python dependency.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def table_glob(sf_dir, t):
    """Driver lakes are flat files; ScaleUpData replica lakes are Spark
    directory-parquet — glob the part files in that case."""
    path = f"{sf_dir}/{t}.parquet"
    return f"{path}/*.parquet" if os.path.isdir(path) else path

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return str(v)

def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [c for _, c in sorted(zip(cols, cols))], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # Optional spill cap (e.g. DUCK_TEMP_CAP=48GiB), mirroring
    # bench_duck.py: above sf0.1 some replays spill unboundedly — the
    # cap turns a disk-filling replay into a fast, recorded FAIL with
    # the DuckDB error in the output instead of a dead host.
    cap = os.environ.get("DUCK_TEMP_CAP")
    if cap:
        con.execute(f"SET max_temp_directory_size='{cap}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_glob(sf_dir, t)}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # CHECK_SKIP=q141_hits,...: replica-lake cross-checks above sf0.1
    # where a specific ORACLE replay is infeasible in DuckDB (q141
    # exhausts 79 GiB of spill at sf0.5, q199's recursive CTE takes
    # 2228 s there — SCALE.md §28). Skips are printed, never silent;
    # the driver's own sf0.01 gate always runs the full surface.
    skip = set(filter(None, os.environ.get("CHECK_SKIP", "").split(",")))
    ok = fail = skipped = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name}: oracle replay infeasible at this SF (CHECK_SKIP)")
            skipped += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            fail += 1
            continue
        _, g = rows_canon(got_cols, got_rows)
        _, e = rows_canon(exp_cols, exp_rows)
        if g == e:
            print(f"ok   {name}: {len(g)} rows")
            ok += 1
        else:
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"  first diff at row {i}:\n   got {a}\n   exp {b}")
                    break
            if len(g) != len(e):
                sg, se = set(g), set(e)
                only_g = list(sg - se)[:3]
                only_e = list(se - sg)[:3]
                print(f"  only in got: {only_g}\n  only in exp: {only_e}")
            fail += 1
    # the skip count rides the summary line (r14 ADVICE): a wrapper
    # parsing only this line or the exit code must see that the checked
    # surface was reduced, so a partial run can't pass as full coverage
    print(f"\n{ok} ok, {fail} fail, {skipped} skipped")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
