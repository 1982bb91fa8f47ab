#!/usr/bin/env python
"""Cross-tree warm probe of the round-11 unexplained bench readings
(VERDICT r11 "Next round" #4) plus the pagerank ABBA replay (#3).

Round 11 left three multi-second readings unexplained — all cross-VM,
all plausible noise, none probed:

* ``kmeans_embedding_profile`` 2.50 -> 4.48 s (its r11 diff is pure
  f32 casts at materialized round boundaries — a real regression is
  implausible, but the round's own lesson is probe, don't shrug),
* ``image_phash_dedup`` 1.41 -> 3.40 s (untouched in r11),
* ``iqr_outlier_profile`` 1.16 -> 2.56 s (untouched in r11),

and the ``copurchase_pagerank_topk`` dedicated ABBA probe (0.95x)
existed only as prose in docs/SCALE.md — VERDICT r11 finding #2 wants
it as a committed artifact, so it is re-run here as a fourth probe.

Method identical to scripts/probe_r10_regressions.py (the r10 ritual):
ABBA (r10, HEAD, HEAD, r10) dedicated bench sessions against the
unmodified round-10 tree, per-tree MIN across both passes to cancel
the measured second-JVM order effect, verdict ``noise`` when the warm
HEAD/r10 ratio is within NOISE_BAND.

Usage: python scripts/probe_r11_regressions.py
       [--sf /root/testdata/sf0.1] [--reps 7]
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
    "kmeans_embedding_profile",
    "image_phash_dedup",
    "iqr_outlier_profile",
    "copurchase_pagerank_topk",
]
R10_COMMIT = "c4df88d"
R10_TREE = "/tmp/r10tree_probe"
# same grain as probe_r10_regressions.py: warm min-of-7 still jitters
# ~10% at these walls; 1.2x is the smallest ratio worth calling a plan
# regression.
NOISE_BAND = 1.2


def _measure_tree(tree: str, sf: str, reps: int) -> None:
    """Subprocess payload: measure QUERIES warm using ONLY the target
    tree's code; print one MEASURED json line."""
    sys.path.insert(0, tree)
    # tmpfs local dirs, as bench.py does (inlined: the r10 tree must
    # not depend on HEAD's scripts/)
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

    spark = get_spark("probe_r11_regressions")
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
            *(["--queries", ",".join(QUERIES)]),
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
    ap.add_argument(
        "--queries", default=None,
        help="comma list overriding the default probe set",
    )
    ap.add_argument(
        "--out", default="warm_probes_r11_regressions.json",
        help="artifact filename under .benchmarks/",
    )
    args = ap.parse_args()
    if args.queries:
        QUERIES[:] = [q for q in args.queries.split(",") if q]

    if args.measure_tree:
        _measure_tree(args.measure_tree, args.sf, args.reps)
        return

    if not os.path.isdir(R10_TREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", R10_TREE, R10_COMMIT],
            cwd=REPO_ROOT,
            check=True,
        )

    # the driver's r11 suite numbers (the readings under test) and the
    # builder's committed r10 suite numbers, for context columns
    bench_path = os.path.join(REPO_ROOT, ".benchmarks", "bench_sf0.1.json")
    with open(bench_path) as f:
        r11_suite = json.load(f).get("queries", {})

    # ABBA: per-tree min across two passes cancels the JVM order effect
    r10_a = _run_tree(R10_TREE, args.sf, args.reps)
    head_a = _run_tree(REPO_ROOT, args.sf, args.reps)
    head_b = _run_tree(REPO_ROOT, args.sf, args.reps)
    r10_b = _run_tree(R10_TREE, args.sf, args.reps)
    r10_warm = {q: min(r10_a[q], r10_b[q]) for q in QUERIES}
    head_warm = {q: min(head_a[q], head_b[q]) for q in QUERIES}

    probes = {}
    n_noise = 0
    for name in QUERIES:
        ratio = round(head_warm[name] / max(r10_warm[name], 1e-9), 3)
        verdict = "noise" if ratio <= NOISE_BAND else "regression"
        n_noise += verdict == "noise"
        probes[name] = {
            "suite_minof2_latest_committed": r11_suite.get(name),
            "warm_r10_tree": r10_warm[name],
            "warm_r10_tree_passes": [r10_a[name], r10_b[name]],
            "warm_head_tree": head_warm[name],
            "warm_head_tree_passes": [head_a[name], head_b[name]],
            "warm_ratio": ratio,
            "verdict": verdict,
        }
        print(json.dumps({"probe": name, **probes[name]}), flush=True)

    out = {
        "method": (
            f"ABBA (r10, HEAD, HEAD, r10) dedicated bench sessions, each "
            f"min-of-{args.reps} after one untimed warming run through "
            "the noop sink, tmpfs local dirs, per-tree MIN across both "
            f"passes (cancels the second-JVM order effect); r10 tree = "
            f"unmodified {R10_COMMIT} worktree running its own code; "
            f"verdict 'noise' when warm HEAD/r10 ratio <= {NOISE_BAND}"
        ),
        "reps": args.reps,
        "sf": args.sf,
        "noise_band": NOISE_BAND,
        "probes": probes,
        "summary": f"{n_noise}/{len(QUERIES)} noise, "
        f"{len(QUERIES) - n_noise}/{len(QUERIES)} regression",
    }
    with open(
        os.path.join(REPO_ROOT, ".benchmarks", args.out), "w"
    ) as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(out["summary"])


if __name__ == "__main__":
    main()
