#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table from sfDir as a DuckDB view, runs every
oracle_sql.json entry, and compares against the Spark-dumped parquet in
verifyOutDir/<name>/ — columns sorted by name, rows sorted by all
columns, exact value compare (mirrors the driver's hash compare).
"""
import json
import sys
import glob
import os

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        res_glob = os.path.join(out_dir, name, "*.parquet")
        files = glob.glob(res_glob)
        if not files:
            print(f"FAIL {name}: no spark output at {res_glob}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"select * from read_parquet('{res_glob}')").fetchdf()
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        cols = list(got.columns)
        got = got.sort_values(cols).reset_index(drop=True)
        want = want.sort_values(cols).reset_index(drop=True)
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        # exact compare, as a hash would see it
        gs = got.astype(str)
        ws = want.astype(str)
        if not gs.equals(ws):
            diff = (gs != ws).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(got)} rows differ; first:")
            idx = diff[diff].index[0]
            print("  spark:", dict(got.iloc[idx]))
            print("  duckdb:", dict(want.iloc[idx]))
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    # Queries WITHOUT an oracle (non-SQL-expressible by design) still
    # get a rows-only check here, so "no oracle" never means "never
    # looked at": approx_distinct returns one row per group (3 groups
    # at every SF), sim_recall_report one row per ANN arm (8).
    ROWS_ONLY = {"approx_distinct": 3, "sim_recall_report": 8}
    for name in sorted(os.listdir(out_dir)):
        if name in oracles or not os.path.isdir(os.path.join(out_dir, name)):
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no oracle and no spark output")
            n_fail += 1
            continue
        if name not in ROWS_ONLY:
            # a no-oracle query must be EXPLICITLY declared rows-only
            # (with its expected row count) — otherwise a future query
            # added without an oracle would get a bare rows>0 rubber
            # stamp while printing PASS
            print(f"FAIL {name}: no oracle and not declared in ROWS_ONLY")
            n_fail += 1
            continue
        rows = con.execute(
            f"select count(*) from read_parquet('{os.path.join(out_dir, name, '*.parquet')}')"
        ).fetchone()[0]
        want = ROWS_ONLY[name]
        if rows != want:
            print(f"FAIL {name}: rows-only check got {rows}, want {want}")
            n_fail += 1
        else:
            print(f"PASS {name} ({rows} rows, rows-only — no oracle by design)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
