#!/usr/bin/env python3
"""Density-scale oracle gate: run EVERY query's DuckDB oracle against a
derived large-SF corpus (e.g. /tmp/sf2hd, 25x) and compare with the
graft.Verify dump — converting the "plans are byte-identical at sf0.1"
argument into a gated fact at density.

Differences from the strict driver gate (check_oracle.py):
  - fixture-backed oracles (expected/sf*.parquet) are SKIPPED with a
    reason: the committed fixtures exist only for the driver-shipped
    SFs, by construction.
  - each oracle runs under a wall-clock budget (default 600 s); an
    oracle DuckDB cannot finish at this density is SKIPPED with the
    measured timeout — the engine-side result was still produced by
    Verify, only the independent check is infeasible.
  - float columns compare with 1e-9 relative tolerance (same
    convention as check_oracle_subset.py: Spark and DuckDB diverge by
    ~1 ulp on decimal-product precision rules at 10x+ sums; the strict
    sf<=0.1 gate remains exact).

Writes a JSON artifact (arg 3) with per-query status + reasons.

Usage: python3 tools/check_oracle_25x.py <sfDir> <verifyOutDir> <artifact.json> [timeoutSec]
"""
import glob
import json
import math
import os
import sys
import threading

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def compare(got, want):
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        return f"columns {list(got.columns)} != {list(want.columns)}"
    cols = list(got.columns)
    got = got.sort_values(by=cols).reset_index(drop=True)
    want = want.sort_values(by=cols).reset_index(drop=True)
    if len(got) != len(want):
        return f"rows {len(got)} != {len(want)}"
    for c in cols:
        a, b = got[c], want[c]
        if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
            for x, y in zip(a, b):
                xa = float(x) if x is not None else math.nan
                ya = float(y) if y is not None else math.nan
                if math.isnan(xa) and math.isnan(ya):
                    continue
                if abs(xa - ya) > 1e-9 * max(1.0, abs(xa), abs(ya)):
                    return f"float col {c}: {xa} != {ya}"
        else:
            if not a.astype(str).equals(b.astype(str)):
                d = (a.astype(str) != b.astype(str))
                i = d[d].index[0]
                return f"col {c} row {i}: {a[i]!r} != {b[i]!r}"
    return None


def main():
    sf_dir, out_dir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    budget = float(sys.argv[4]) if len(sys.argv) > 4 else 600.0
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    n = {"PASS": 0, "FAIL": 0, "SKIP": 0}

    names = sorted(set(oracles) | {
        os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*"))
        if os.path.isdir(p)})
    for name in names:
        res_glob = os.path.join(out_dir, name, "*.parquet")
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
        try:
            if not glob.glob(res_glob):
                results[name] = {"status": "FAIL", "reason": "no spark output"}
            elif name not in oracles:
                rows = con.execute(
                    f"select count(*) from read_parquet('{res_glob}')").fetchone()[0]
                ok = rows > 0
                results[name] = {
                    "status": "PASS" if ok else "FAIL",
                    "reason": f"rows-only by design ({rows} rows)"}
            elif "expected/sf" in oracles[name]:
                results[name] = {
                    "status": "SKIP",
                    "reason": "fixture oracle — committed fixtures exist only for driver-shipped SFs"}
            else:
                timer = threading.Timer(budget, con.interrupt)
                timer.start()
                try:
                    want = con.execute(oracles[name]).fetchdf()
                    timer.cancel()
                    got = con.execute(
                        f"select * from read_parquet('{res_glob}')").fetchdf()
                    diff = compare(got, want)
                    results[name] = (
                        {"status": "PASS", "reason": f"{len(got)} rows (1e-9 rel float tol)"}
                        if diff is None else {"status": "FAIL", "reason": diff})
                except duckdb.InterruptException:
                    results[name] = {
                        "status": "SKIP",
                        "reason": f"oracle exceeded {budget:.0f}s in DuckDB at this density "
                                  "(engine result produced; independent check infeasible)"}
                finally:
                    timer.cancel()
        except Exception as e:
            results[name] = {"status": "FAIL", "reason": f"{type(e).__name__}: {e}"}
        finally:
            con.close()
        n[results[name]["status"]] += 1
        print(f'{results[name]["status"]} {name}: {results[name]["reason"]}')

    summary = {"sf_dir": sf_dir, "out_dir": out_dir, "budget_sec": budget,
               "totals": n, "queries": results}
    with open(artifact, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f'== {n["PASS"]} pass, {n["FAIL"]} fail, {n["SKIP"]} skip -> {artifact} ==')
    sys.exit(1 if n["FAIL"] else 0)


if __name__ == "__main__":
    main()
