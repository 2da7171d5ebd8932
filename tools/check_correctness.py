#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate.

Reads the Verify output dir (one parquet dir per query + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf testdata, sorts columns by
name and rows by value, and compares cell-by-cell (exact for non-floats,
1e-9 relative for floats) — a strictly stronger local version of the
driver's hash compare.

Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetch_arrow_table()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            print(f"FAIL {name}: columns {gcols} != oracle {ecols}")
            n_fail += 1
            continue
        erows = sorted((tuple(norm(r[c]) for c in ecols)
                        for r in exp.to_pylist()), key=repr)
        grows = sorted((tuple(norm(r[c]) for c in gcols)
                        for r in got.to_pylist()), key=repr)
        if len(erows) != len(grows):
            print(f"FAIL {name}: {len(grows)} rows != oracle {len(erows)}")
            n_fail += 1
            continue
        bad = None
        for i, (e, g) in enumerate(zip(erows, grows)):
            for ev, gv in zip(e, g):
                if isinstance(ev, float) and isinstance(gv, float):
                    if not (math.isclose(ev, gv, rel_tol=1e-9, abs_tol=1e-9)
                            or (math.isnan(ev) and math.isnan(gv))):
                        bad = (i, ev, gv)
                        break
                elif ev != gv:
                    bad = (i, ev, gv)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: got {bad[2]!r} != oracle {bad[1]!r}")
            print(f"     got row: {grows[bad[0]]}")
            print(f"     exp row: {erows[bad[0]]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    # rows-only queries (no oracle): check the parquet exists and has rows
    import glob as g
    import os
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            files = g.glob(f"{p}/*.parquet")
            if not files:
                print(f"FAIL {d}: rows-only query produced no parquet")
                n_fail += 1
                continue
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
            status = "PASS" if n > 0 else "FAIL"
            print(f"{status} {d} (rows-only, {n} rows)")
            n_pass += n > 0
            n_fail += n == 0
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
