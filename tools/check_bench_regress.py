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

LOADED-RUN DETECTION (round 6): the r5 driver run inflated 21 queries
4.3-10.8x with zero code change — the inflation was monotone in per-
query Spark-JOB COUNT (scheduler/GC contention multiplies per-job
overhead on a busy machine), while 1-2-job queries stayed flat. Bench
now records njobs/gc_ms per query in the detail JSON; when a run shows
that signature (many flags, all concentrated in many-job queries,
low-job queries flat) the gate WARNS instead of failing — and REFUSES
to rebless such a run as baseline, so a loaded run can't mask future
real regressions (ADVICE r5 item 1).

Usage:
  python3 tools/check_bench_regress.py            # compare
  python3 tools/check_bench_regress.py --update   # rebless baseline
"""
import json
import os
import statistics
import sys

REL_LIMIT = 1.5
ABS_FLOOR = 0.75  # seconds

# loaded-run signature thresholds (see module docstring)
LOADED_MIN_FLAGS = 5       # uniform inflation hits many queries
LOADED_LOW_JOBS = 3        # "single-job-ish" queries...
LOADED_LOW_FLAT = 1.25     # ...must be flat (median ratio at most this)
LOADED_FLAGGED_JOBS = 5    # flagged queries are many-job (median at least this)

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(HERE, "bench", "bench_baseline_sf01.json")
CURRENT = os.path.join(HERE, "bench", "bench_detail_last.json")


def njobs_map(detail):
    sb = detail.get("shuffle_bytes", {})
    return {k: v["njobs"] for k, v in sb.items()
            if isinstance(v, dict) and v.get("njobs") is not None}


def loaded_run_signature(base, cur, regressions):
    """True iff the regression set looks like machine load amplified by
    sequential job count rather than a code change."""
    if len(regressions) < LOADED_MIN_FLAGS:
        return False
    nj = njobs_map(cur)
    if not nj:
        return False
    bq, cq = base["queries"], cur["queries"]
    low_ratios = [cq[n] / bq[n] for n in bq.keys() & cq.keys()
                  if nj.get(n, 99) <= LOADED_LOW_JOBS and bq[n] > 0.2 and cq[n] > 0]
    flagged_jobs = [nj[n] for n, _, _ in regressions if n in nj]
    if not low_ratios or not flagged_jobs:
        return False
    return (statistics.median(low_ratios) <= LOADED_LOW_FLAT
            and statistics.median(flagged_jobs) >= LOADED_FLAGGED_JOBS)


def find_regressions(base, cur):
    bq, cq = base["queries"], cur["queries"]
    shared = sorted(set(bq) & set(cq))
    regressions, improved = [], []
    for name in shared:
        b, c = bq[name], cq[name]
        if b < 0 or c < 0:
            continue
        if c > b * REL_LIMIT and c - b > ABS_FLOOR:
            regressions.append((name, b, c))
        elif b > c * REL_LIMIT and b - c > ABS_FLOOR:
            improved.append((name, b, c))
    return shared, regressions, improved


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
            if old.get("sf") == cur.get("sf"):
                _, regressions, _ = find_regressions(old, cur)
                if loaded_run_signature(old, cur, regressions):
                    print("REFUSE --update: current detail carries the "
                          f"loaded-run signature ({len(regressions)} flags, "
                          "inflation concentrated in many-job queries) — "
                          "reblessing it would mask future real regressions; "
                          "re-run the suite exclusively")
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
    shared, regressions, improved = find_regressions(base, cur)
    for name, b, c in sorted(improved, key=lambda t: t[1] - t[2], reverse=True)[:8]:
        print(f"improved  {name}: {b:.2f}s -> {c:.2f}s")
    if regressions:
        nj = njobs_map(cur)
        for name, b, c in sorted(regressions, key=lambda t: t[2] / t[1], reverse=True):
            jobs = nj.get(name)
            suffix = f" njobs={jobs}" if jobs is not None else ""
            print(f"REGRESSED {name}: {b:.2f}s -> {c:.2f}s ({c / b:.2f}x){suffix}")
        if loaded_run_signature(base, cur, regressions):
            print(f"WARN: {len(regressions)} flag(s) carry the loaded-run "
                  "signature — inflation concentrated in many-job queries "
                  "while low-job queries are flat. Treating as machine load, "
                  "NOT a code regression; re-run exclusively to confirm. "
                  "(--update will refuse this detail.)")
            return 0
        print(f"== {len(regressions)} regression(s) over {REL_LIMIT}x "
              f"(+{ABS_FLOOR}s floor) across {len(shared)} shared queries ==")
        return 1
    print(f"== no regressions over {REL_LIMIT}x across {len(shared)} shared queries ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
