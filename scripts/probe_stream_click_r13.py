#!/usr/bin/env python
"""Round-13 probe: stream_click_error_join / _left_join floor analysis
(VERDICT r12 #4 — heaviest untouched pair, 8c-faster-than-32c).

Sweeps state shard count x state-store provider in DEDICATED bench-style
sessions (one session per cell — the provider class and shuffle
partition count are query-start knobs), ABBA rep order inside each
cell (min-of-N), and records the streaming progress breakdown
(addBatch / getBatch / commitOffsets, state rows / memory) for the
default cell so the floor's composition is on the record, not guessed.

Writes .benchmarks/stream_click_probe_r13.json.

Usage: python scripts/probe_stream_click_r13.py [--reps 3]
       [--sf /root/testdata/sf0.1]
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

PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state."
               "RocksDBStateStoreProvider",
}
QUERIES = ("stream_click_error_join", "stream_click_error_left_join")


def run_cell(sf: str, shards: int, provider: str, reps: int) -> dict:
    """One (shards, provider) cell in a fresh bench-style session."""
    from scripts._bench_session import bench_spark  # noqa: PLC0415

    from orca_ztbus_python_processor_spark.streaming import pipeline  # noqa: PLC0415
    from orca_ztbus_python_processor_spark.workloads.base import (  # noqa: PLC0415
        merged_catalog,
    )

    spark = bench_spark("stream_click_probe_r13")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", PROVIDERS[provider]
    )
    old_shards = pipeline.STREAM_STATE_SHARDS
    pipeline.STREAM_STATE_SHARDS = shards
    cat = merged_catalog()
    out: dict = {}
    try:
        # one untimed warming run (JVM + python worker pool)
        cat.queries[QUERIES[0]](spark, sf).count()
        for q in QUERIES:
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                cat.queries[q](spark, sf).count()
                times.append(round(time.perf_counter() - t0, 3))
            out[q] = {"min": min(times), "runs": times}
        if shards == 8 and provider == "hdfs":  # breakdown for the default cell only
            out["progress_last"] = _capture_progress(spark, sf)
    finally:
        pipeline.STREAM_STATE_SHARDS = old_shards
        spark.stop()
    return out


def _capture_progress(spark, sf: str) -> list:
    """One instrumented run of the inner-join query: intercept
    run_to_memory (module-level import in streamqueries) to keep the
    StreamingQuery handle, then read its recentProgress — the
    addBatch / state-operator breakdown the sweep cells can't see
    (availableNow queries are inactive by the time .count() returns)."""
    from orca_ztbus_python_processor_spark.streaming import pipeline  # noqa: PLC0415
    from orca_ztbus_python_processor_spark.workloads import streamqueries  # noqa: PLC0415

    captured: list = []
    real = pipeline.run_to_memory

    def tap(stream_df, query_name, output_mode="complete"):
        q = real(stream_df, query_name, output_mode)
        for p in q.recentProgress:
            if not isinstance(p, dict):  # StreamingQueryProgress object
                p = json.loads(p.json)
            captured.append(
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": p.get("durationMs"),
                    "stateOperators": [
                        {
                            k: so.get(k)
                            for k in (
                                "operatorName", "numRowsTotal",
                                "numRowsUpdated", "commitTimeMs",
                                "memoryUsedBytes",
                            )
                        }
                        for so in p.get("stateOperators", [])
                    ],
                }
            )
        return q

    streamqueries.run_to_memory = tap
    try:
        streamqueries.CATALOG.queries["stream_click_error_join"](spark, sf).count()
    finally:
        streamqueries.run_to_memory = real
    return captured


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--shards", default="2,4,8,16")
    ap.add_argument("--providers", default="hdfs,rocksdb")
    args = ap.parse_args()

    from scripts._bench_session import setup_bench_env  # noqa: PLC0415

    setup_bench_env()
    cells: dict[str, dict] = {}
    shard_list = [int(s) for s in args.shards.split(",")]
    prov_list = args.providers.split(",")
    # ABBA at the cell level: forward then reverse order, keep min.
    order = [(s, p) for p in prov_list for s in shard_list]
    for s, p in order + order[::-1]:
        key = f"{p}_shards{s}"
        res = run_cell(args.sf, s, p, args.reps)
        if key in cells:
            for q in QUERIES:
                prev = cells[key][q]
                cells[key][q] = {
                    "min": min(prev["min"], res[q]["min"]),
                    "runs": prev["runs"] + res[q]["runs"],
                }
        else:
            cells[key] = res
        print(key, {q: cells[key][q]["min"] for q in QUERIES}, flush=True)

    out = {
        "method": "one bench-style session per (provider, shards) cell, "
        "1 warm + min-of-N per query per visit, two visits in ABBA cell "
        "order, min across visits",
        "reps_per_visit": args.reps,
        "sf": args.sf,
        "cells": cells,
    }
    path = os.path.join(REPO_ROOT, ".benchmarks", "stream_click_probe_r13.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
