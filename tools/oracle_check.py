#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (NOT part of the
library): run after `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For each query result parquet in <outDir>, runs the corresponding
oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in
<sfDir>), sorts columns by name and rows by value, and compares.

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import glob
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark directory-style table (e.g. the sf1 scale-up)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    results = sorted(d for d in os.listdir(out_dir)
                     if os.path.isdir(os.path.join(out_dir, d)))
    for name in results:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns differ\n  got {list(g.columns)}\n  exp {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        mismatched = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            try:
                same = (gv.astype(str) == ev.astype(str)).all()
            except Exception:
                same = False
            if not same:
                mismatched.append(c)
        if mismatched:
            print(f"FAIL {name}: value mismatch in {mismatched}")
            for c in mismatched[:3]:
                neq = g[c].astype(str) != e[c].astype(str)
                idx = neq[neq].index[:5]
                for i in idx:
                    print(f"    [{c}] row {i}: got={g[c][i]!r} exp={e[c][i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(results) - n_pass - n_fail} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
