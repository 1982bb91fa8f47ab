#!/usr/bin/env python
"""Measure the stateful-streaming scaling slope under both state-store
providers (VERDICT r4 "Next round" #3).

``stream_error_runs`` (applyInPandasWithState FSM) and
``stream_session_native`` (session_window agg) showed the steepest
honest sf0.1 -> sf1 slopes in the round-4 bench (6.5x / 7.5x at 10x
data). The hypothesis recorded there: state-store + micro-batch fixed
overhead of the HDFS-backed default provider, not a plan problem. This
script runs both queries at both scales under

  * HDFSBackedStateStoreProvider (Spark default), and
  * RocksDBStateStoreProvider (bundled with Spark, changelog off),

min-of-N wall per cell, in SEPARATE SparkSessions per provider (the
provider class is read at query start; isolating sessions keeps JVM
warmup symmetric), and writes .benchmarks/state_store_providers.json.
docs/SCALE.md carries the conclusion table.

Usage: python scripts/measure_state_store.py [--reps 2]
       [--sf01 /root/testdata/sf0.1] [--sf1 /tmp/sf1]
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
QUERIES = ("stream_error_runs", "stream_session_native")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", default="/tmp/sf1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from orca_ztbus_python_processor_spark.session import get_spark
    from orca_ztbus_python_processor_spark.workloads.base import merged_catalog

    results: dict[str, dict] = {}
    for pname, pclass in PROVIDERS.items():
        spark = get_spark(f"state-store-{pname}")
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", pclass)
        cat = merged_catalog()
        # warm the Python worker pool + codegen once per session
        cat.queries["stream_error_runs"](spark, args.sf01).count()
        for q in QUERIES:
            for label, sf_dir in (("sf0.1", args.sf01), ("sf1", args.sf1)):
                if not os.path.isdir(sf_dir):
                    print(f"skip {q}@{label}: no fixture at {sf_dir}")
                    continue
                best = float("inf")
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    cat.queries[q](spark, sf_dir).count()
                    best = min(best, time.perf_counter() - t0)
                results.setdefault(q, {}).setdefault(pname, {})[label] = round(best, 3)
                print(f"{q} [{pname}] {label}: {best:.2f}s", flush=True)
        spark.stop()
        # a stopped session leaves a dead default; force a fresh JVM-side
        # session for the next provider
        SparkSession.builder._options = {}

    for q, by_provider in results.items():
        for pname, cells in by_provider.items():
            if "sf0.1" in cells and "sf1" in cells:
                cells["slope_10x"] = round(cells["sf1"] / cells["sf0.1"], 2)

    out = os.path.join(REPO_ROOT, ".benchmarks", "state_store_providers.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"reps": args.reps, "results": results}, f, indent=1, sort_keys=True)
    print(json.dumps(results, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
