"""Interval (range-containment) join: match each point row to the
intervals that contain it, per key.

The naive plan — ``points JOIN intervals ON key AND start <= t AND
t <= end`` — is a non-equi join: Spark plans it as a broadcast
nested-loop or cartesian product whose cost is |points| × |intervals
per key|. The scalable form bins time:

  1. each interval explodes into the bins it overlaps
     (``sequence(floor(start), floor(end))`` — cheap: intervals are few
     and short relative to points);
  2. each point maps to exactly ONE bin (``floor(t)``);
  3. equi-join on (key, bin) — hash join, pushdown, AQE all apply;
  4. the exact range predicate filters bin-grazing false positives.

A (point, interval) pair can meet in at most one bin — the point's —
so no post-join dedup is needed. ``bin_seconds`` trades explode factor
against join selectivity: set it near the median interval length.

This is the relational dual of the session assignment the reference
does by re-scanning ``time BETWEEN from AND to`` per window
(``/root/reference/processor/main.py:137-142``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__bin"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_time: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 60,
    how: str = "inner",
) -> DataFrame:
    """Join points into their containing [start, end] intervals
    (inclusive both ends), equi-join-only.

    ``how='inner'`` keeps matched points; ``'left'`` keeps every point
    with NULL interval columns when nothing contains it (implemented as
    inner + anti-union so the bin column never leaks).
    """
    keys = [on] if isinstance(on, str) else list(on)
    bin_us = bin_seconds * 1_000_000

    p = points.withColumn(_BIN, F.expr(f"unix_micros({point_time}) div {bin_us}"))
    iv = intervals.withColumn(
        _BIN,
        F.explode(
            F.expr(
                f"sequence(unix_micros({start_col}) div {bin_us},"
                f" unix_micros({end_col}) div {bin_us})"
            )
        ),
    )
    matched = (
        p.join(iv, [*keys, _BIN], "inner")
        .where(
            (F.col(point_time) >= F.col(start_col))
            & (F.col(point_time) <= F.col(end_col))
        )
        .drop(_BIN)
    )
    if how == "inner":
        return matched
    if how != "left":
        raise ValueError(f"unsupported how: {how!r}")
    iv_cols = [c for c in intervals.columns if c not in keys]
    unmatched = points.join(
        matched.select(*points.columns), points.columns, "left_anti"
    ).select(
        *points.columns,
        *[F.lit(None).cast(intervals.schema[c].dataType).alias(c) for c in iv_cols],
    )
    return matched.select(*points.columns, *iv_cols).unionByName(unmatched)
