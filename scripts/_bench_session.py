"""Shared measurement-session plumbing for the bench-side scripts
(warm_probe.py, measure_stream_3pt.py — extracted round 9 so the
three copies of the tmpfs/warm-up/min-of-N pattern cannot drift;
bench.py remains the canonical in-line statement of the pattern since
the driver executes it standalone)."""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def setup_bench_env() -> None:
    """Route shuffle/spill/temp dirs to tmpfs, as bench.py does: the
    scripts measure PLAN cost, and virtualized block storage injects
    multi-second fsync noise that min-of-reps cannot absorb."""
    if os.path.isdir("/dev/shm") and "SPARK_LOCAL_DIRS" not in os.environ:
        shm = "/dev/shm/spark_bench_local"
        os.makedirs(shm, exist_ok=True)
        os.environ["SPARK_LOCAL_DIRS"] = shm
        import tempfile  # noqa: PLC0415

        os.environ.setdefault("TMPDIR", shm)
        tempfile.tempdir = shm


def bench_spark(app: str):
    """Bench-configured session with the Python worker pool warmed
    (the first Arrow stage otherwise pays worker spin-up)."""
    from orca_ztbus_python_processor_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark(app)
    spark.range(256).repartition(16).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    return spark


def min_of_warm(spark, fn, sf_dir: str, reps: int) -> float:
    """One untimed warming run, then min-of-``reps`` through the same
    noop sink bench.py times against."""
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)
