#!/usr/bin/env python
"""Cross-tree warm probe of the five unexplained round-10 bench
regressions (VERDICT r10 "Next round" #1).

Round 10's same-VM comparison (r9 code replayed on the r10 box,
.benchmarks/machine_drift_r10.json) left five queries 1.4-1.5x slower
with no plan change identified: bm25_keyword_topk,
bigram_lm_quality_score, activity_bitmap_profile,
type_dow_mutual_information, ztbus_brake_run_windows. All are sub-2 s
min-of-2 readings inside a 316-query suite run — exactly the regime
where the warm-probe ritual exists to separate plan regressions from
measurement noise. This script runs that ritual CROSS-TREE:

1. `git worktree add` the unmodified round-9 tree (e3ff0df) if absent,
2. for EACH tree (r9 worktree, this repo's HEAD), measure the five
   queries warm — one untimed warming run, then min-of-N through the
   same noop sink bench.py times — in a dedicated bench-configured
   subprocess per tree, in an ABBA sequence (r9, HEAD, HEAD, r9) with
   the per-tree MIN across both passes. Rationale (measured, this
   round): a single A-then-B pass is dominated by an ORDER effect —
   whichever tree's JVM runs second on this box reads 20-90% slower
   at sub-second walls (an r9-first pass called three queries 1.2-1.9x
   regressions; the reversed pass called the same queries 0.70-1.05x).
   The ABBA min cancels the order effect,
3. write ``.benchmarks/warm_probes_r10_regressions.json`` with a
   per-query verdict: ``noise`` if the warm HEAD/r9 ratio is within
   the NOISE_BAND, else ``regression``.

The subprocess payload (--measure-tree) is tree-independent: it
imports session + catalog from the TARGET tree only, so the r9 tree
runs its own round-9 code byte-for-byte.

Usage: python scripts/probe_r10_regressions.py [--sf /root/testdata/sf0.1]
       [--reps 7]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "bm25_keyword_topk",
    "bigram_lm_quality_score",
    "activity_bitmap_profile",
    "type_dow_mutual_information",
    "ztbus_brake_run_windows",
]
R9_COMMIT = "e3ff0df"
R9_TREE = "/tmp/r9tree_probe"
# warm min-of-7 on this box still jitters ~10% at sub-second walls
# (measured across the round-10 isolated escalations); 1.2x is the
# smallest ratio worth calling a plan regression at this grain.
NOISE_BAND = 1.2


def _measure_tree(tree: str, sf: str, reps: int) -> None:
    """Subprocess payload: measure QUERIES warm using ONLY the target
    tree's code; print one MEASURED json line."""
    sys.path.insert(0, tree)
    # tmpfs local dirs, as bench.py / _bench_session.setup_bench_env do
    # (inlined: the r9 tree must not depend on HEAD's scripts/)
    if os.path.isdir("/dev/shm") and "SPARK_LOCAL_DIRS" not in os.environ:
        shm = "/dev/shm/spark_bench_local"
        os.makedirs(shm, exist_ok=True)
        os.environ["SPARK_LOCAL_DIRS"] = shm
        import tempfile  # noqa: PLC0415

        os.environ.setdefault("TMPDIR", shm)
        tempfile.tempdir = shm
    from orca_ztbus_python_processor_spark.session import get_spark  # noqa: PLC0415
    from orca_ztbus_python_processor_spark.workloads.base import (  # noqa: PLC0415
        merged_catalog,
    )

    spark = get_spark("probe_r10_regressions")
    # warm the Python worker pool (first Arrow stage pays spin-up)
    spark.range(256).repartition(16).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    cat = merged_catalog()
    out = {}
    for name in QUERIES:
        fn = cat.queries[name]
        fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
    print("MEASURED " + json.dumps(out), flush=True)


def _run_tree(tree: str, sf: str, reps: int) -> dict[str, float]:
    proc = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--measure-tree",
            tree,
            "--sf",
            sf,
            "--reps",
            str(reps),
        ],
        capture_output=True,
        text=True,
        check=False,
        timeout=1800,
        cwd=tree,
    )
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("MEASURED ")),
        None,
    )
    if line is None:
        raise RuntimeError(
            f"measurement in {tree} failed:\n{proc.stderr[-3000:]}"
        )
    return json.loads(line[len("MEASURED "):])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--measure-tree", default=None, help="internal")
    args = ap.parse_args()

    if args.measure_tree:
        _measure_tree(args.measure_tree, args.sf, args.reps)
        return

    if not os.path.isdir(R9_TREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", R9_TREE, R9_COMMIT],
            cwd=REPO_ROOT,
            check=True,
        )

    drift_path = os.path.join(REPO_ROOT, ".benchmarks", "machine_drift_r10.json")
    bench_path = os.path.join(REPO_ROOT, ".benchmarks", "bench_sf0.1.json")
    with open(drift_path) as f:
        r9_suite = json.load(f)["r9_code_r10vm_per_query"]
    with open(bench_path) as f:
        r10_suite = json.load(f)["queries"]

    # ABBA: per-tree min across two passes cancels the JVM order effect
    r9_a = _run_tree(R9_TREE, args.sf, args.reps)
    head_a = _run_tree(REPO_ROOT, args.sf, args.reps)
    head_b = _run_tree(REPO_ROOT, args.sf, args.reps)
    r9_b = _run_tree(R9_TREE, args.sf, args.reps)
    r9_warm = {q: min(r9_a[q], r9_b[q]) for q in QUERIES}
    head_warm = {q: min(head_a[q], head_b[q]) for q in QUERIES}

    probes = {}
    n_noise = 0
    for name in QUERIES:
        ratio = round(head_warm[name] / max(r9_warm[name], 1e-9), 3)
        verdict = "noise" if ratio <= NOISE_BAND else "regression"
        n_noise += verdict == "noise"
        probes[name] = {
            "suite_minof2_r9_tree_this_vm": r9_suite.get(name),
            "suite_minof2_r10_tree": r10_suite.get(name),
            "suite_ratio": round(
                r10_suite[name] / max(r9_suite[name], 1e-9), 3
            ),
            "warm_r9_tree": r9_warm[name],
            "warm_r9_tree_passes": [r9_a[name], r9_b[name]],
            "warm_head_tree": head_warm[name],
            "warm_head_tree_passes": [head_a[name], head_b[name]],
            "warm_ratio": ratio,
            "verdict": verdict,
        }
        print(json.dumps({"probe": name, **probes[name]}), flush=True)

    out = {
        "method": (
            f"ABBA (r9, HEAD, HEAD, r9) dedicated bench sessions, each "
            f"min-of-{args.reps} after one untimed warming run through "
            "the noop sink, tmpfs local dirs, per-tree MIN across both "
            "passes (cancels the measured second-JVM order effect); r9 "
            f"tree = unmodified {R9_COMMIT} worktree running its own "
            f"code; verdict 'noise' when warm HEAD/r9 ratio <= {NOISE_BAND}"
        ),
        "reps": args.reps,
        "sf": args.sf,
        "noise_band": NOISE_BAND,
        "probes": probes,
        "summary": f"{n_noise}/{len(QUERIES)} noise, "
        f"{len(QUERIES) - n_noise}/{len(QUERIES)} regression",
    }
    with open(
        os.path.join(REPO_ROOT, ".benchmarks", "warm_probes_r10_regressions.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(out["summary"])


if __name__ == "__main__":
    main()
