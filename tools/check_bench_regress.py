#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares the latest bench detail (bench/bench_detail_last.json, written
by `runMain graft.Bench`) against the committed same-SF snapshot
(bench/bench_baseline_sf01.json) and exits 1 if any query regressed
more than REL_LIMIT x AND by more than ABS_FLOOR seconds (the floor
keeps sub-second scheduling jitter from tripping the gate).

The r3->r4 streaming-partition win and the ~40% loaded-run inflation
both showed per-query deltas are the real signal; this makes them a
gate instead of archaeology. Bench runs must be EXCLUSIVE (no
concurrent sbt) or the inflation note in the memory file applies.

Usage:
  python3 tools/check_bench_regress.py            # compare
  python3 tools/check_bench_regress.py --update   # rebless baseline
"""
import json
import os
import sys

REL_LIMIT = 1.5
ABS_FLOOR = 0.75  # seconds

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(HERE, "bench", "bench_baseline_sf01.json")
CURRENT = os.path.join(HERE, "bench", "bench_detail_last.json")


def main():
    if "--update" in sys.argv:
        with open(CURRENT) as f:
            cur = json.load(f)
        if os.path.exists(BASELINE):
            with open(BASELINE) as f:
                old = json.load(f)
            if len(cur.get("queries", {})) < 0.9 * len(old.get("queries", {})):
                print(f"REFUSE --update: current detail has "
                      f"{len(cur.get('queries', {}))} queries vs baseline "
                      f"{len(old.get('queries', {}))} — subset/truncated run")
                return 1
        with open(BASELINE, "w") as f:
            json.dump(cur, f, indent=0, sort_keys=True)
        print(f"baseline updated from {CURRENT} "
              f"({len(cur['queries'])} queries, sf={cur.get('sf')})")
        return 0
    with open(BASELINE) as f:
        base = json.load(f)
    with open(CURRENT) as f:
        cur = json.load(f)
    if base.get("sf") != cur.get("sf"):
        print(f"SKIP: baseline sf {base.get('sf')} != current sf {cur.get('sf')}")
        return 0
    bq, cq = base["queries"], cur["queries"]
    # A current detail much smaller than the baseline means a subset or
    # truncated run landed in bench_detail_last.json — comparing (or
    # reblessing) against it would silently shrink the gate. Bench now
    # writes SPARK_GRAFT_QUERIES runs to bench_detail_subset.json, but
    # guard against stale/hand-edited files too.
    if len(cq) < 0.9 * len(bq):
        print(f"REFUSE: current detail has {len(cq)} queries vs baseline "
              f"{len(bq)} — subset/truncated run; re-run the full suite")
        return 1
    shared = sorted(set(bq) & set(cq))
    regressions = []
    improved = []
    for name in shared:
        b, c = bq[name], cq[name]
        if b < 0 or c < 0:
            continue
        if c > b * REL_LIMIT and c - b > ABS_FLOOR:
            regressions.append((name, b, c))
        elif b > c * REL_LIMIT and b - c > ABS_FLOOR:
            improved.append((name, b, c))
    for name, b, c in sorted(improved, key=lambda t: t[1] - t[2], reverse=True)[:8]:
        print(f"improved  {name}: {b:.2f}s -> {c:.2f}s")
    if regressions:
        for name, b, c in sorted(regressions, key=lambda t: t[2] / t[1], reverse=True):
            print(f"REGRESSED {name}: {b:.2f}s -> {c:.2f}s ({c / b:.2f}x)")
        print(f"== {len(regressions)} regression(s) over {REL_LIMIT}x "
              f"(+{ABS_FLOOR}s floor) across {len(shared)} shared queries ==")
        return 1
    print(f"== no regressions over {REL_LIMIT}x across {len(shared)} shared queries ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
