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

NOISE CALIBRATION (round 9): Bench now runs a constant-work probe
(identical plan + bytes every session) and records its median as
noise_median_sec in the detail JSON. When both baseline and current
carry it, the gate scales REL_LIMIT by the measured headwind
(current/baseline noise, at least 1.0) — a 2.2x-loaded machine then
needs a query to regress 2.2x MORE than the calm threshold before it
flags, which is exactly the round-8 adjudication done by arithmetic
instead of by hand. Past REFUSE_HEADWIND the comparison is refused
outright (nothing can be concluded on a machine that loaded), and
--update refuses to rebless a loaded session's detail.

Usage:
  python3 tools/check_bench_regress.py            # compare
  python3 tools/check_bench_regress.py --update   # rebless baseline
  python3 tools/check_bench_regress.py --selftest # gate self-check
"""
import json
import os
import statistics
import sys

REL_LIMIT = 1.5
ABS_FLOOR = 0.75  # seconds
NOISE_SCALE_FROM = 1.3   # headwinds below this are treated as calm
REFUSE_HEADWIND = 4.0    # beyond this no per-query comparison is meaningful

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


def headwind(base, cur):
    """current/baseline constant-work probe ratio, >=1.0; None when
    either side predates the probe (or it errored, recorded as -1)."""
    b = base.get("noise_median_sec")
    c = cur.get("noise_median_sec")
    if not b or not c or b <= 0 or c <= 0:
        return None
    return max(1.0, c / b)


def find_regressions(base, cur):
    bq, cq = base["queries"], cur["queries"]
    # scale the relative threshold by the measured machine headwind —
    # on a loaded session a query must regress headwind x MORE than the
    # calm limit before it flags (constant-work inflation is machine
    # load by definition, not a code change)
    hw = headwind(base, cur)
    rel = REL_LIMIT * (hw if hw is not None and hw > NOISE_SCALE_FROM else 1.0)
    shared = sorted(set(bq) & set(cq))
    regressions, improved = [], []
    for name in shared:
        b, c = bq[name], cq[name]
        if b < 0 or c < 0:
            continue
        if c > b * rel and c - b > ABS_FLOOR:
            regressions.append((name, b, c))
        elif b > c * REL_LIMIT and b - c > ABS_FLOOR:
            improved.append((name, b, c))
    return shared, regressions, improved


def selftest():
    """Gate behavior pinned as executable cases: a loaded session must
    produce ZERO false flags while a genuinely regressed query still
    trips it — at calm AND under load."""
    names = [f"q{i}" for i in range(20)]
    base = {"sf": "sfX", "noise_median_sec": 1.0,
            "queries": {n: 2.0 for n in names}}

    def cur(mult_all, noise, planted=None, planted_mult=1.0):
        q = {n: 2.0 * mult_all for n in names}
        if planted:
            q[planted] = 2.0 * mult_all * planted_mult
        return {"sf": "sfX", "noise_median_sec": noise, "queries": q}

    cases = [
        # (label, current, expect_flags)
        ("calm, no change", cur(1.0, 1.0), 0),
        ("calm, one planted 3x regression", cur(1.0, 1.0, "q7", 3.0), 1),
        ("2.2x-loaded session, all queries uniformly inflated (round-8 shape)",
         cur(2.2, 2.2), 0),
        ("2.2x-loaded session + planted 8x real regression",
         cur(2.2, 2.2, "q7", 8.0), 1),
        ("pre-probe details (no noise field) keep the calm threshold",
         {"sf": "sfX", "queries": cur(1.0, 1.0, "q7", 3.0)["queries"]}, 1),
    ]
    ok = True
    for label, c, expect in cases:
        _, regressions, _ = find_regressions(base, c)
        got = len(regressions)
        status = "ok" if got == expect else "FAIL"
        ok &= got == expect
        print(f"[selftest] {status}: {label} -> {got} flag(s), expected {expect}")
    hw = headwind(base, cur(5.0, 5.0))
    refused = hw is not None and hw > REFUSE_HEADWIND
    status = "ok" if refused else "FAIL"
    ok &= refused
    print(f"[selftest] {status}: a {hw:.1f}x headwind refuses comparison outright")
    print("[selftest] ALL OK" if ok else "[selftest] FAILURES")
    return 0 if ok else 1


def main():
    if "--selftest" in sys.argv:
        return selftest()
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
                hw = headwind(old, cur)
                if hw is not None and hw > NOISE_SCALE_FROM:
                    print(f"REFUSE --update: constant-work probe measured a "
                          f"{hw:.2f}x headwind vs the blessed baseline — a "
                          "loaded session's walls would mask future real "
                          "regressions; re-run the suite exclusively")
                    return 1
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
    hw = headwind(base, cur)
    if hw is not None and hw > REFUSE_HEADWIND:
        print(f"REFUSE: constant-work probe measured a {hw:.2f}x headwind "
              f"(> {REFUSE_HEADWIND}x) — per-query walls carry no code "
              "signal on a machine this loaded; re-run exclusively")
        return 0
    if hw is not None and hw > NOISE_SCALE_FROM:
        print(f"NOTE: {hw:.2f}x measured headwind — relative threshold "
              f"scaled to {REL_LIMIT * hw:.2f}x for this comparison")
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
