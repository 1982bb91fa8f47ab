"""Distributed global rank / ntile without a single-partition sort.

``F.ntile(k).over(Window.orderBy(...))`` with no ``partitionBy`` is
correct but moves EVERY row to one task (Spark warns
``WindowExec: No Partition Defined``) — a scale wall for entity-grain
frames (every customer / user at 100 TB). This module is the
distributed twin, built on the same partition-offset addressing as
``functions.quantiles.exact_group_quantiles``:

  1. range-repartition on the sort key and pin the layout (lazy
     ``localCheckpoint``) so partition ids are stable across passes —
     range partitioning means pid order == global sort order;
  2. count rows per partition (n_partitions scalars, the only driver
     traffic), prefix-sum them into per-partition rank offsets;
  3. one PARTITIONED window (``partitionBy(pid)``) assigns local row
     numbers — each window cell is bounded by partition size — and a
     broadcast offset join yields the exact global 0-based rank;
  4. ntile bucket = integer arithmetic on the rank: with n rows and k
     buckets, the first ``n % k`` buckets hold ``n // k + 1`` rows, the
     rest ``n // k`` — exactly SQL NTILE (DuckDB/Spark agree).

The caller MUST pass a total order (include a unique tie-break column),
both for deterministic output and because rows with equal sort keys
must not straddle a range-partition boundary with different ranks.

SURVEY.md §2 O3/W-family at entity grain; replaces the round-5
unpartitioned-ntile plans flagged in VERDICT.md round 5 ("What's
wrong" #1/#2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def with_global_rank(
    df: DataFrame,
    order_by: list[Column],
    out_col: str = "rank0",
) -> tuple[DataFrame, int]:
    """Add an exact global 0-based rank column under ``order_by``.

    Returns ``(df_with_rank, n_rows)`` — ``n_rows`` is known for free
    from the per-partition counts pass, and every ntile/decile caller
    needs it. All input columns are preserved; no stage holds more
    than one range partition.
    """
    spark = df.sparkSession
    nparts = max(spark.sparkContext.defaultParallelism, 2)
    # Pin the input once (lazy localCheckpoint, materialized by the
    # sampling job) before range partitioning: the RangePartitioner's
    # sampling job and the shuffle each evaluate their child in full,
    # so without the pin the caller's upstream (scan + joins) runs
    # twice per call (functions/quantiles.py module docstring).
    s = (
        df.localCheckpoint(eager=False)
        .repartitionByRange(nparts, *order_by)
        .localCheckpoint(eager=False)
    )
    s = s.withColumn("_pid", F.spark_partition_id())

    # Per-partition counts: n_partitions scalars — the only driver
    # traffic. pid order == ascending order_by range order.
    cells = sorted(
        ((r["_pid"], r["count"]) for r in s.groupBy("_pid").count().collect())
    )
    n = sum(c for _, c in cells)
    offs, off = [], 0
    for pid, c in cells:
        offs.append((pid, off))
        off += c
    odf = F.broadcast(spark.createDataFrame(offs or [(0, 0)], "_pid int, _off long"))

    local = F.row_number().over(W.partitionBy("_pid").orderBy(*order_by))
    ranked = (
        s.withColumn("_lr", local.cast("long") - 1)
        .join(odf, "_pid")
        .withColumn(out_col, F.col("_lr") + F.col("_off"))
        .drop("_pid", "_lr", "_off")
    )
    return ranked, n


def with_global_ntile(
    df: DataFrame,
    n_buckets: int,
    order_by: list[Column],
    out_col: str,
) -> DataFrame:
    """Add an exact NTILE(n_buckets) column under ``order_by`` — SQL
    semantics (first ``n % k`` buckets one row larger), no
    single-partition sort. ``order_by`` must be a total order.
    """
    ranked, n = with_global_rank(df, order_by, "_r0")
    q, rem = divmod(n, n_buckets)
    r0 = F.col("_r0")
    if q == 0:
        # Fewer rows than buckets: bucket i gets row i.
        bucket = r0 + 1
    else:
        head = rem * (q + 1)  # rows covered by the (q+1)-sized buckets
        bucket = (
            F.when(r0 < head, F.floor(r0 / (q + 1)))
            .otherwise(rem + F.floor((r0 - head) / q))
            + 1
        )
    return ranked.withColumn(out_col, bucket.cast("int")).drop("_r0")
