#!/usr/bin/env python
"""Round-12 per-query profiler: for each named query, measure
construction time (the eager fences inside fn()), cold noop-write wall,
warm min-of-N, and capture .explain("formatted") to plans/r13/.

Usage:
  python scripts/profile_r13.py [--sf /root/testdata/sf0.1] [--reps 3]
      [--plans-suffix before] query1 query2 ...
  python scripts/profile_r13.py --top N        # N most expensive from
                                               # .benchmarks/bench_sf0.1.json
Writes .benchmarks/profile_r13_<suffix>.json and (with --plans-suffix)
plans/r13/<query>_<suffix>.txt.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from scripts._bench_session import bench_spark, setup_bench_env  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--plans-suffix", default="")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    setup_bench_env()
    from orca_ztbus_python_processor_spark.workloads.base import merged_catalog  # noqa: PLC0415

    catalog = merged_catalog()
    names = list(args.queries)
    if args.top:
        with open(os.path.join(REPO_ROOT, ".benchmarks", "bench_sf0.1.json")) as f:
            qs = json.load(f)["queries"]
        names += [
            k for k, _ in sorted(qs.items(), key=lambda kv: -kv[1])[: args.top]
        ]
    names = [n for n in dict.fromkeys(names) if n in catalog.queries]

    spark = bench_spark("profile_r13")
    plans_dir = os.path.join(REPO_ROOT, "plans", "r13")
    if args.plans_suffix:
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn = catalog.queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, args.sf)
        t_build = time.perf_counter() - t0
        if args.plans_suffix:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(plans_dir, f"{name}_{args.plans_suffix}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_cold = time.perf_counter() - t0
        warm: list[float] = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            warm.append(round(time.perf_counter() - t0, 4))
        out[name] = {
            "build_s": round(t_build, 4),
            "cold_s": round(t_cold, 4),
            "warm_min_s": min(warm),
            "warm_runs": warm,
        }
        print(json.dumps({"q": name, **out[name]}), flush=True)

    path = os.path.join(
        REPO_ROOT,
        ".benchmarks",
        f"profile_r13_{args.plans_suffix or 'probe'}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
