"""SparkSession factory tuned for the driver harness (local[N]) while
keeping every setting cluster-safe for the 100 TB target.

Scale posture:
  - AQE on: runtime coalescing, skew-join splitting, dynamic broadcast.
  - shuffle.partitions sized to cores locally; on a real cluster this is
    overridden (or left to AQE's coalescing from a high initial value).
  - UTC session timezone so timestamps agree bit-for-bit with the
    DuckDB oracle (naive-UTC parquet timestamps).
  - Arrow enabled for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "orca-ztbus-spark", cpus: int | None = None) -> SparkSession:
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS); read as int64 ns and
        # truncate explicitly (sources/parquet.py). Session-wide on
        # purpose — see ensure_engine_confs().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_engine_confs(spark: SparkSession) -> None:
    """Apply the engine's SESSION-WIDE conf requirements to a session we
    did not build (e.g. the verification driver's).

    The engine's semantics require, for every read in the session:
      - UTC session timezone (naive-UTC timestamps, bit-for-bit oracle
        parity), and
      - ``nanosAsLong`` parquet reads (events carries TIMESTAMP(NANOS),
        which Spark's vectorized reader otherwise rejects; the ns→us
        truncation is done explicitly in ``sources/parquet.read_table``).

    These are deliberate engine-level invariants, not per-read toggles —
    documented here and in the README so a caller embedding the engine
    in a shared session knows the session-wide effect. Both confs are
    runtime-settable; setting them idempotently is a no-op RPC when the
    value already matches.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
