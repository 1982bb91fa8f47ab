#!/usr/bin/env python
"""Round-13 re-run of the rank-rewrite scale probe (VERDICT r12 #2
"done" criterion): the round-12 probe showed the range-shuffle order
statistics still 1.4-1.9x SLOWER than the r10 window forms at sf26;
round 13 replaced that machinery with iterative histogram selection.
This re-measures the same three queries at the same scale point with
the same method — ABBA (r10, HEAD, HEAD, r10) dedicated bench sessions,
each min-of-3 after one untimed warming run through the noop sink,
per-tree MIN across both passes — and writes
.benchmarks/rank_rewrite_sf26_probe_r13.json.

The r10 tree (unmodified c4df88d worktree, its own code) holds the
low-cardinality-key window plans whose wall grows at the data rate.

Usage: python scripts/probe_rank_sf26_r13.py [--sf /tmp/sf26]
       [--r10-tree /tmp/wt_r10] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = (
    "median_ci_by_priority",
    "conformal_threshold_by_type",
    "sequence_packing_profile",
)

_CHILD = r"""
import json, sys, time
repo = sys.argv[1]
sf = sys.argv[2]
reps = int(sys.argv[3])
names = sys.argv[4].split(",")
sys.path.insert(0, repo)
sys.path.insert(0, repo + "/scripts")
from _bench_session import bench_spark, setup_bench_env
setup_bench_env()
spark = bench_spark("rank_sf26_probe")
from orca_ztbus_python_processor_spark.workloads.base import merged_catalog
cat = merged_catalog()
out = {}
for name in names:
    fn = cat.queries[name]
    fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 4))
    out[name] = times
print("RESULT " + json.dumps(out))
"""


def run_tree(tree: str, sf: str, reps: int) -> dict:
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, tree, sf, str(reps), ",".join(QUERIES)],
        capture_output=True, text=True, env=env, check=False,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"probe child in {tree} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf26")
    ap.add_argument("--r10-tree", default="/tmp/wt_r10")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    passes: dict[str, list[dict]] = {"r10": [], "head": []}
    for tree_key, tree in (
        ("r10", args.r10_tree), ("head", REPO_ROOT),
        ("head", REPO_ROOT), ("r10", args.r10_tree),
    ):
        res = run_tree(tree, args.sf, args.reps)
        passes[tree_key].append(res)
        print(tree_key, {q: min(v) for q, v in res.items()}, flush=True)

    probes = {}
    for q in QUERIES:
        r10 = min(min(p[q]) for p in passes["r10"])
        head = min(min(p[q]) for p in passes["head"])
        probes[q] = {
            "warm_r10_tree": r10,
            "warm_head_tree": head,
            "warm_ratio": round(head / r10, 3),
            "r10_passes": [p[q] for p in passes["r10"]],
            "head_passes": [p[q] for p in passes["head"]],
        }
    out = {
        "method": "ABBA (r10, HEAD, HEAD, r10) dedicated bench sessions, "
        "each min-of-3 after one untimed warming run through the noop "
        "sink, tmpfs local dirs, per-tree MIN across both passes; r10 "
        "tree = unmodified c4df88d worktree running its own code; HEAD "
        "= round-13 histogram-selection machinery",
        "sf_dir": args.sf,
        "probes": probes,
    }
    path = os.path.join(REPO_ROOT, ".benchmarks", "rank_rewrite_sf26_probe_r13.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
