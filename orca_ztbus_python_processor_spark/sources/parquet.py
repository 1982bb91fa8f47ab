"""Batch parquet catalog over the driver corpus.

Spark's parquet source gives predicate pushdown, column pruning,
row-group skipping and a vectorized reader for free — the reference's
hand-assembled SELECT strings (reference ``processor/main.py:91-144``)
collapse into ``spark.read.parquet(...).where(...)``.

100 TB posture: at scale the same tables would live as a
date-partitioned / key-bucketed layout (see ``docs/SCALE.md``); the
loader only binds paths, so swapping in a partitioned root or a catalog
table is a one-line change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_ztbus_python_processor_spark.schemas import CORPUS_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table, normalizing physical-type quirks.

    ``events.ts`` has shipped in two physical layouts across driver
    testdata generations: parquet TIMESTAMP(NANOS) (which Spark's
    reader rejects — read as raw int64 via ``nanosAsLong`` and
    truncated ns→us with integer division, matching DuckDB's reader)
    and plain TIMESTAMP micros (read natively). We branch on the loaded
    dtype so both generations work; either way the column lands as a
    session-tz (UTC) ``TimestampType``.

    Sessions built by ``session.get_spark`` already carry the engine's
    session-wide confs (UTC timezone, nanosAsLong); for a caller-owned
    session (the verification driver's) they are applied here once via
    ``ensure_engine_confs`` — a documented session-wide requirement of
    the engine, not a hidden per-read toggle.
    """
    from orca_ztbus_python_processor_spark.session import ensure_engine_confs  # noqa: PLC0415

    ensure_engine_confs(spark)
    path = table_path(sf_dir, name)
    if name == "events":
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":  # TIMESTAMP(NANOS) generation, read as int64 ns
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        else:  # native timestamp / timestamp_ntz generation
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every corpus table as a DataFrame (lazy; nothing is read yet)."""
    return {name: read_table(spark, sf_dir, name) for name in CORPUS_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load and register each table as a temp view for the SQL API."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
