#!/usr/bin/env python
"""Three-point scale law for the STREAMING twin family (VERDICT r8 #5).

The micro-batch/state-store overhead family (the ``stream_*`` twins,
3.4-6.3x bench slopes at 10x data in rounds 7-8) was a two-point
extrapolation; the LSH pair law got its third point in round 8
(.benchmarks/jaccard_pair_counts_3pt.json). This measures the same
third point: every selected twin runs WARM (one untimed warming run,
then min-of-N) at sf0.1, sf1 (10x) and the factor-26 fixture
(/tmp/sf26), in one session. If the overhead is a constant factor —
per-micro-batch scheduling + state-store churn that amortizes as data
grows — the sf1->sf26 leg (2.6x data) must come in at <= ~2.6x
(linear or better), and the fitted log-log exponent over the three
points must stay ~<= 1. A twin breaking that gets the
stream_time_weighted_value partial-sums treatment next round.

Usage: python scripts/measure_stream_3pt.py [--reps 2]
       [--queries stream_error_runs,...]   (default: the family's 9
       steepest/most-representative twins incl. one flat control)
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

DEFAULT_QUERIES = [
    # the steep end of the family (r8 bench slopes in parentheses)
    "stream_error_runs",            # 6.3x — both state providers profiled
    "stream_time_weighted_value",   # 4.5x — after the partial-sums rework
    "stream_session_native",        # 2.9x
    "stream_minute_user_agg",       # 2.8x
    "stream_minute_user_append",    # 2.8x
    "stream_concurrent_intervals",  # 2.0x
    "stream_click_error_join",      # 1.4x — stream-stream join shape
    "stream_dedup_replay",          # 1.3x — dedup-state shape
    "stream_minute_latency_bands",  # 1.0x — flat control (round-8 twin)
]
POINTS = [
    ("sf0.1", "/root/testdata/sf0.1", 1.0),
    ("sf1", "/tmp/sf1", 10.0),
    ("sf26", "/tmp/sf26", 26.0),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]

    for _, d, _ in POINTS:
        if not os.path.isdir(d):
            sys.exit(
                f"missing fixture {d} — build with "
                "scripts/make_scale_fixture.py (factor 10 / 26)"
            )

    from _bench_session import bench_spark, min_of_warm, setup_bench_env  # noqa: E402,PLC0415

    setup_bench_env()
    from orca_ztbus_python_processor_spark.workloads.base import (  # noqa: E402,PLC0415
        merged_catalog,
    )

    spark = bench_spark("stream_3pt")
    catalog = merged_catalog()

    results: dict[str, dict] = {}
    for name in names:
        fn = catalog.queries[name]
        walls = {}
        for label, sf_dir, _scale in POINTS:
            walls[label] = min_of_warm(spark, fn, sf_dir, args.reps)
        s01, s1, s26 = walls["sf0.1"], walls["sf1"], walls["sf26"]
        # log-log least-squares exponent over the three (scale, wall)
        # points: wall ~ scale^beta
        xs = [math.log(s) for _, _, s in POINTS]
        ys = [math.log(max(w, 1e-6)) for w in (s01, s1, s26)]
        mx, my = sum(xs) / 3, sum(ys) / 3
        beta = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        results[name] = {
            "wall_sec": walls,
            "slope_sf0.1_to_sf1": round(s1 / max(s01, 1e-9), 2),
            "slope_sf1_to_sf26": round(s26 / max(s1, 1e-9), 2),
            "loglog_exponent": round(beta, 3),
            "sublinear_second_leg": s26 / max(s1, 1e-9) <= 2.6,
        }
        print(json.dumps({"q": name, **results[name]}), flush=True)

    out = {
        "method": (
            f"min-of-{args.reps} after one untimed warming run per point, "
            "single session, tmpfs local dirs; scales 1x/10x/26x of sf0.1"
        ),
        "points": {lbl: d for lbl, d, _ in POINTS},
        "queries": results,
    }
    path = os.path.join(REPO_ROOT, ".benchmarks", "stream_3pt.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    n_lin = sum(1 for r in results.values() if r["sublinear_second_leg"])
    print(
        f"wrote .benchmarks/stream_3pt.json — {n_lin}/{len(results)} "
        "twins linear-or-better on the sf1->sf26 leg"
    )


if __name__ == "__main__":
    main()
