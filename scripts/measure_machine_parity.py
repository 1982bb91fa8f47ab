#!/usr/bin/env python
"""Same-VM full-suite parity: unmodified round-10 tree vs HEAD
(VERDICT r11 finding #2 / "Next round" #3).

Round 11's headline parity claim (r10 tree replayed on the r11 VM:
289.3 s vs HEAD 290.2 s, ratio 0.999, median per-query 0.986) lived
only as prose in docs/SCALE.md — no committed per-query artifact, so
the judge could not adjudicate per-query same-VM deltas. This script
makes the replay a committed, re-runnable artifact on WHATEVER VM it
runs on:

1. ``git worktree add`` the unmodified round-10 tree (c4df88d),
2. run each tree's own ``bench.py`` (full catalog, min-of-2 in
   process) as a dedicated subprocess in ABBA order
   (r10, HEAD, HEAD, r10), harvesting the per-query JSON artifact the
   run writes into its own tree after every pass,
3. per-tree per-query MIN across both passes (cancels the order
   effect the r10-regression probe measured),
4. write ``.benchmarks/machine_parity_r11.json`` following the
   machine_drift_r10.json schema: both per-query maps, the
   common-query totals, total and median per-query HEAD/r10 ratios.

The HEAD tree's working-copy ``bench_sf0.1.json`` is restored from
git afterwards so this measurement never masquerades as the round's
committed bench pair.

Usage: python scripts/measure_machine_parity.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

R10_COMMIT = "c4df88d"
R10_TREE = "/tmp/r10tree_probe"


def _run_bench(tree: str, sf: str) -> dict:
    """Run ``tree``'s own bench.py as a subprocess; return the
    per-query artifact it wrote into its own .benchmarks/."""
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf
    env.pop("SPARK_LOCAL_DIRS", None)  # let each bench set up its own tmpfs
    proc = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        capture_output=True,
        text=True,
        check=False,
        timeout=3600,
        cwd=tree,
        env=env,
    )
    art = os.path.join(tree, ".benchmarks", "bench_sf0.1.json")
    if proc.returncode != 0 or not os.path.exists(art):
        raise RuntimeError(
            f"bench in {tree} failed (rc={proc.returncode}):\n"
            f"{proc.stderr[-3000:]}"
        )
    with open(art) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    if not os.path.isdir(R10_TREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", R10_TREE, R10_COMMIT],
            cwd=REPO_ROOT,
            check=True,
        )

    passes = {}
    per_pass_queries = {}
    for label, tree in (
        ("r10_a", R10_TREE),
        ("head_a", REPO_ROOT),
        ("head_b", REPO_ROOT),
        ("r10_b", R10_TREE),
    ):
        art = _run_bench(tree, args.sf)
        per_pass_queries[label] = art["queries"]
        passes[label] = round(sum(art["queries"].values()), 2)
        print(json.dumps({"pass": label, "total_sec": passes[label],
                          "n_queries": len(art["queries"])}), flush=True)

    r10_q = {
        q: min(per_pass_queries["r10_a"][q], per_pass_queries["r10_b"][q])
        for q in per_pass_queries["r10_a"]
    }
    head_q = {
        q: min(per_pass_queries["head_a"][q], per_pass_queries["head_b"][q])
        for q in per_pass_queries["head_a"]
    }
    common = sorted(set(r10_q) & set(head_q))
    r10_common = round(sum(r10_q[q] for q in common), 2)
    head_common = round(sum(head_q[q] for q in common), 2)
    ratios = [head_q[q] / max(r10_q[q], 1e-9) for q in common]

    out = {
        "method": (
            "ABBA (r10, HEAD, HEAD, r10) full-suite bench.py runs in "
            "dedicated subprocesses on ONE VM in one session, each pass "
            "min-of-2 in process, per-tree per-query MIN across both "
            f"passes; r10 tree = unmodified {R10_COMMIT} worktree "
            "running its own bench.py byte-for-byte"
        ),
        "r10_commit": R10_COMMIT,
        "sf": args.sf,
        "pass_totals_sec": passes,
        "r10_tree_per_query": {q: round(v, 4) for q, v in sorted(r10_q.items())},
        "head_tree_per_query": {q: round(v, 4) for q, v in sorted(head_q.items())},
        "same_vm_common_queries": len(common),
        "same_vm_r10_code_common_sec": r10_common,
        "same_vm_head_code_common_sec": head_common,
        "same_vm_round_over_round_ratio": round(
            head_common / max(r10_common, 1e-9), 3
        ),
        "same_vm_median_per_query_ratio": round(statistics.median(ratios), 3),
        "head_only_queries": sorted(set(head_q) - set(r10_q)),
        "head_only_total_sec": round(
            sum(v for q, v in head_q.items() if q not in r10_q), 2
        ),
    }
    path = os.path.join(REPO_ROOT, ".benchmarks", "machine_parity_r11.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    # never let a parity pass impersonate the round's committed pair
    subprocess.run(
        ["git", "checkout", "--", ".benchmarks/bench_sf0.1.json"],
        cwd=REPO_ROOT,
        check=False,
    )
    print(json.dumps({
        "same_vm_round_over_round_ratio": out["same_vm_round_over_round_ratio"],
        "same_vm_median_per_query_ratio": out["same_vm_median_per_query_ratio"],
        "common": len(common),
    }))


if __name__ == "__main__":
    main()
