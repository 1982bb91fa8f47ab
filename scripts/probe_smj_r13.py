#!/usr/bin/env python
"""Round-13 SMJ-site probe (VERDICT r12 #9): the r12 plan census counts
14 queries with a static SortMergeJoin in their initial plan. This
measures each under (a) default planner prefs and (b)
spark.sql.join.preferSortMergeJoin=false (a session-start knob that
lets the planner pick shuffled-hash where its size conditions hold) in
DEDICATED bench sessions, ABBA cell order, 1 warm + min-of-N per query
per visit. The conf cell is a SCREEN, not an adoption: any site that
wins goes on to a per-site SHUFFLE_HASH hint with its own probe —
a global conf flip is exactly the local-tuning this repo avoids.

Writes .benchmarks/smj_probe_r13.json.

Usage: python scripts/probe_smj_r13.py [--reps 3] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# queries with smj > 0 in .benchmarks/plan_census_r12.json
QUERIES = (
    "copurchase_local_clustering_histogram",
    "containment_dedup_retention",
    "text_dedup_retention",
    "audio_fp_dedup",
    "customer_decile_migration",
    "image_phash_dedup",
    "embedding_dup_components_blocked",
    "source_cross_perplexity",
    "embedding_dup_components",
    "kmv_overlap_calibration",
    "trend_mk_theilsen_by_segment",
    "q20_heavy_suppliers",
    "merge_upsert_actions",
    "nation_balance_full_outer",
)


def run_cell(sf: str, prefer_smj: bool, reps: int) -> dict:
    from scripts._bench_session import bench_spark  # noqa: PLC0415

    from orca_ztbus_python_processor_spark.workloads.base import (  # noqa: PLC0415
        merged_catalog,
    )

    spark = bench_spark("smj_probe_r13")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", str(prefer_smj).lower())
    cat = merged_catalog()
    out: dict = {}
    try:
        for q in QUERIES:
            fn = cat.queries[q]
            fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 4))
            out[q] = times
    finally:
        spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from scripts._bench_session import setup_bench_env  # noqa: PLC0415

    setup_bench_env()
    visits: dict[str, list[dict]] = {"default_smj": [], "prefer_shj": []}
    for key, pref in (
        ("default_smj", True), ("prefer_shj", False),
        ("prefer_shj", False), ("default_smj", True),
    ):
        res = run_cell(args.sf, pref, args.reps)
        visits[key].append(res)
        print(key, {q: min(v) for q, v in res.items()}, flush=True)

    cells = {}
    for q in QUERIES:
        d = min(min(v[q]) for v in visits["default_smj"])
        s = min(min(v[q]) for v in visits["prefer_shj"])
        cells[q] = {
            "default_smj_min": d,
            "prefer_shj_min": s,
            "shj_over_smj": round(s / d, 3),
        }
    out = {
        "method": "ABBA (default, shj, shj, default) dedicated bench "
        "sessions, 1 warm + min-of-N per query per visit, min across "
        "visits; preferSortMergeJoin=false is the screen — adoption is "
        "per-site SHUFFLE_HASH hints only",
        "reps_per_visit": args.reps,
        "sf": args.sf,
        "cells": cells,
    }
    path = os.path.join(REPO_ROOT, ".benchmarks", "smj_probe_r13.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
