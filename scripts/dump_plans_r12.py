#!/usr/bin/env python
"""Dump .explain("formatted") for a list of queries to plans/r12/
without executing warm reps (plan capture only; eager build fences
still run). Usage:
  python scripts/dump_plans_r12.py --suffix before --out-dir /root/repo/plans/r12 q1 q2 ...
Run from any checkout; --out-dir lets a pre-change worktree write into
the live repo's plans directory.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from scripts._bench_session import bench_spark, setup_bench_env  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--out-dir", default=os.path.join(REPO_ROOT, "plans", "r12"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    setup_bench_env()
    from orca_ztbus_python_processor_spark.workloads.base import merged_catalog  # noqa: PLC0415

    catalog = merged_catalog()
    spark = bench_spark("dump_plans_r12")
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.queries:
        if name not in catalog.queries:
            print(name, "MISSING", flush=True)
            continue
        try:
            df = catalog.queries[name](spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.out_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(name, "ok", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(name, "ERROR", repr(ex)[:200], flush=True)


if __name__ == "__main__":
    main()
