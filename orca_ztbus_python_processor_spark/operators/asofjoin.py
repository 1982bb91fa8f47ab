"""As-of (temporal) join: enrich each left row with the most recent
right row at or before its timestamp, per key.

The reference approximates this with its boundary-lookback loop —
iteratively re-reading earlier time slices to stitch preceding state
onto the current window (``/root/reference/processor/main.py:249-289``,
SURVEY.md §2.3 J2). The Spark-native form needs no re-reads: it is a
single partition-by-key pass.

Implementation (the scalable union-window pattern, not a range join):

  1. tag right rows and left rows, align their time columns;
  2. union; one shuffle partitions by key and sorts by (time, side);
  3. ``last(col, ignoreNulls=True)`` over rows UNBOUNDED PRECEDING ..
     CURRENT ROW carries the latest right-row payload forward;
  4. keep left rows.

Why not a range join: ``l.key = r.key AND r.t <= l.t`` explodes to
|left| x |matching right| intermediate rows before the per-row max is
taken. The union-window form shuffles |left| + |right| rows exactly
once and holds O(1) state per partition row — the plan survives a
100x scale-up as long as keys are not pathologically skewed (AQE skew
splitting cannot help a window, so salt the key upstream if one key
dominates).

Tie semantics match DuckDB/pandas ``ASOF JOIN ... ON l.t >= r.t``
(inclusive): a right row at exactly ``l.t`` is visible. Right rows must
be unique per (key, time) — pre-aggregate duplicates or the carried
payload is the last one in (time, key) sort order, which is
deterministic only if the caller made it so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_SIDE = "__asof_side"
_TIME = "__asof_t"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    payload_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: ``backward`` (default) pairs each left row with the
    latest right row at or before its time; ``forward`` with the
    earliest right row at or after it (both inclusive, matching DuckDB
    ``ASOF ... ON l.t >= r.t`` / ``l.t <= r.t``).

    Returns every ``left`` row plus each requested right payload column
    (NULL when no right row qualifies). ``payload_cols`` defaults to
    every right column except the keys and time column. The forward
    form is the same single union-window pass with the time sort
    reversed — carrying state from the future end of the partition
    instead of the past; cost and scale behavior are identical.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in {*keys, right_time}]
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns collide with left columns: {sorted(overlap)}")

    left_cols = [c for c in left.columns]
    l = left.select(
        *left_cols,
        F.col(left_time).alias(_TIME),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_time).alias(_TIME),
        F.lit(1).alias(_SIDE),
        *payload_cols,
    ).select(*l.columns)  # align column order for unionByName-free union

    # right rows sort BEFORE left rows at equal time (side desc) so a
    # right row at exactly t is visible to the left row at t (inclusive).
    # backward walks time ascending (carry the latest past right row);
    # forward walks time descending (carry the earliest future one).
    time_order = F.col(_TIME).asc() if direction == "backward" else F.col(_TIME).desc()
    w = (
        W.partitionBy(*keys)
        .orderBy(time_order, F.col(_SIDE).desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Carry ONE struct of all payload columns, not each column
    # independently: per-column last(ignorenulls) would let a NULL in
    # one payload column of the matched row silently inherit that
    # column from a FARTHER right row while the others came from the
    # nearest — mixing rows, unlike DuckDB ASOF (which takes the whole
    # matched row, NULLs included). The struct is non-null exactly on
    # right rows, so last(ignorenulls) picks the nearest right ROW and
    # unpacking preserves its NULLs.
    payload_struct = F.when(
        F.col(_SIDE) == 1, F.struct(*[F.col(c) for c in payload_cols])
    )
    carried = l.unionByName(r).select(
        *left_cols,
        _SIDE,
        F.last(payload_struct, ignorenulls=True).over(w).alias("__asof_p"),
    )
    return (
        carried.where(F.col(_SIDE) == 0)
        .select(
            *left_cols,
            *[F.col(f"__asof_p.{c}").alias(c) for c in payload_cols],
        )
    )
