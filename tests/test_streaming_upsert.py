"""Multi-batch equivalence for the foreachBatch MERGE-INTO sink
(``stream_upsert_snapshot``): the snapshot after N micro-batches must
equal the batch latest-per-key aggregate over the union of all input —
the associativity claim the single-batch catalog entry cannot exercise
on its one-file source.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from orca_ztbus_python_processor_spark.sources.parquet import read_table
from orca_ztbus_python_processor_spark.workloads.streamqueries import (
    _snapshot_merge_sink,
)

from tests.conftest import SMOKE_SF_DIR


def test_multi_batch_upsert_equals_batch_aggregate(spark):
    ev = read_table(spark, SMOKE_SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = tempfile.mkdtemp(prefix="upsert_src_")
    # two disjoint halves as separate files -> two micro-batches
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/h0")
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/h1")
    schema = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/h*")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    snap_root = tempfile.mkdtemp(prefix="upsert_snap_")
    final = _snapshot_merge_sink(stream, snap_root)

    # more than one snapshot version must exist (i.e. the merge really
    # ran across >= 2 micro-batches, not one availableNow megabatch)
    versions = [d for d in os.listdir(snap_root) if d.startswith("v")]
    assert len(versions) >= 2, versions

    got = {
        r["user_id"]: (r["w"]["ts"], r["w"]["event_id"], r["w"]["event_type"])
        for r in spark.read.parquet(final).collect()
    }
    want = {
        r["user_id"]: (r["w"]["ts"], r["w"]["event_id"], r["w"]["event_type"])
        for r in ev.groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    F.col("ts"), F.col("event_id"), F.col("event_type"), F.col("value")
                )
            ).alias("w")
        )
        .collect()
    }
    assert got == want
