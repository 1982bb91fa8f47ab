#!/usr/bin/env python
"""Round-12 catalog-wide physical-plan census: for every query, count
Exchange / BroadcastExchange / SortMergeJoin / ShuffledHashJoin /
BroadcastHashJoin / Window / BatchEvalPython / ArrowEvalPython nodes in
the (pre-AQE) physical plan and record fn() build wall. Static — no
query execution beyond the eager fences queries run at build time.

Writes .benchmarks/plan_census_r12.json.

Usage: python scripts/plan_census_r12.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from scripts._bench_session import bench_spark, setup_bench_env  # noqa: E402

MARKS = [
    ("exchange", r"\bExchange (hash|range|SinglePartition|rangepartitioning)"),
    ("bcast_exchange", r"\bBroadcastExchange\b"),
    ("smj", r"\bSortMergeJoin\b"),
    ("shj", r"\bShuffledHashJoin\b"),
    ("bhj", r"\bBroadcastHashJoin\b"),
    ("bnlj", r"\bBroadcastNestedLoopJoin\b"),
    ("window", r"\bWindow\b"),
    ("py_batch", r"\bBatchEvalPython\b"),
    ("py_arrow", r"\b(ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow|FlatMapCoGroupsInPandas)\b"),
    ("sort", r"\bSort \["),
    ("scans", r"\bScan parquet\b|\bFileScan parquet\b"),
    ("scan_rdd", r"\bScan ExistingRDD\b"),
    ("agg", r"\bHashAggregate\b|\bSortAggregate\b|\bObjectHashAggregate\b"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    setup_bench_env()
    from orca_ztbus_python_processor_spark.workloads.base import merged_catalog  # noqa: PLC0415

    catalog = merged_catalog()
    spark = bench_spark("plan_census_r12")

    out: dict[str, dict] = {}
    for name, fn in sorted(catalog.queries.items()):
        t0 = time.perf_counter()
        try:
            df = fn(spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            out[name] = {"error": repr(ex)[:200]}
            print(name, "ERROR", flush=True)
            continue
        rec = {k: len(re.findall(p, plan)) for k, p in MARKS}
        rec["build_s"] = round(time.perf_counter() - t0, 3)
        out[name] = rec
        print(json.dumps({"q": name, **rec}), flush=True)

    path = os.path.join(REPO_ROOT, ".benchmarks", "plan_census_r12.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
