#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the parquet tables from
<sfDir> in DuckDB, runs each oracle, and compares against the parquet the
Verify main wrote. Columns sorted by name; rows sorted; floats compared
exactly first, then with 1e-9 relative tolerance (reported separately).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(lambda v: str(v)))
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except Exception:
            pass
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            import glob
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = pq.read_table(files[0]).to_pandas() if files else None
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        if got is None:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        w, g = canon(want), canon(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_bad += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_bad += 1
            continue
        mismatch = None
        for c in w.columns:
            wv, gv = w[c].tolist(), g[c].tolist()
            for i, (a, b) in enumerate(zip(wv, gv)):
                if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
                    same = (a is None or (isinstance(a, float) and math.isnan(a))) == \
                           (b is None or (isinstance(b, float) and math.isnan(b)))
                elif isinstance(a, float) != isinstance(b, float):
                    # driver hashes raw values: a DuckDB HUGEINT→float64 vs a
                    # Spark int64 hash-mismatches even when numerically equal
                    same = False
                    a, b = f"{a!r} ({type(a).__name__})", f"{b!r} ({type(b).__name__})"
                elif isinstance(a, float) or isinstance(b, float):
                    same = math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
                else:
                    same = str(a) == str(b)
                if not same:
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: col={c} row={i} oracle={a!r} spark={b!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(w)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
