"""Contiguous-run (session) detection — the Spark-native rewrite of the
reference's brake-run FSM + boundary lookback
(reference ``processor/main.py:237-338``; SURVEY.md §2.5 W3, §2.8 ST3-ST5).

The reference walks each minute window row-by-row, re-reading up to
20 x 20 s of earlier telemetry when a run straddles the window start.
In batch, with all data visible, the identical semantics fall out of
gap-and-islands window functions (one shuffle on the key, local sort),
plus pure column arithmetic for the reference's per-window emission
rules:

  * a run is ``[first-true-sample, last-true-sample]``
    (``processor/main.py:311-313``: end = row before the closing false);
  * a run closes on the first false sample; a trailing open run is NOT
    emitted (``:300-337``, FIXTURES.md B1 case 5);
  * the emitting window is the one whose inclusive [from, to] range
    contains the closing false sample (the reference scans
    ``time BETWEEN from AND to``, ``processor/main.py:137-138``, so a
    boundary sample belongs to the earlier window first —
    FIXTURES.md B1 case 4);
  * the emitted start is truncated to ``window_start - 400 s`` when the
    run reaches past the lookback budget
    (20 iterations x 20 s, ``:246-247,270-279`` — FIXTURES.md B1 case 3);
  * runs wholly inside earlier windows are suppressed — emitted exactly
    once, by their own closing window (``:281-289`` — B1 case 7).

Scale: one shuffle per key set; at 100 TB the key (trip_id) is the
bucket column of the storage layout, so the sort is partition-local.
The streaming form (same semantics, incremental) is
``streaming/sessions.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

DEFAULT_LOOKBACK_S = 20 * 20  # 20 iterations x 20 s, processor/main.py:246-247


def flag_runs(
    df: DataFrame,
    flag_col: str,
    time_col: str = "time",
    keys: tuple[str, ...] = ("trip_id",),
    closed_only: bool = True,
    order_by: tuple[str, ...] | None = None,
) -> DataFrame:
    """Gap-and-islands: one row per contiguous ``flag=true`` run per key.

    Output: ``<keys...>, time_from, time_to, n_samples, closing_time``
    (``closing_time`` = timestamp of the first false sample after the
    run; NULL for a trailing open run). With ``closed_only`` the
    trailing open run is dropped — the reference FSM's emission rule.
    ``order_by`` adds tie-break columns after ``time_col`` for streams
    whose timestamps are not unique per key.
    """
    order_cols = list(order_by) if order_by else [time_col]
    w = W.partitionBy(*keys).orderBy(*order_cols)
    run_id = F.sum(
        F.when(
            ~F.col(flag_col).eqNullSafe(F.lag(flag_col).over(w)), 1
        ).otherwise(0)
    ).over(w.rowsBetween(W.unboundedPreceding, 0))

    select_cols = list(dict.fromkeys([*keys, *order_cols, time_col, flag_col]))
    # Only a run's LAST sample (whose successor is a false sample) carries
    # a non-null _run_close; max() then yields the closing false sample's
    # timestamp, or NULL for a trailing open run. (Deliberately not
    # max_by: engines disagree on whether max_by skips NULL values —
    # DuckDB ignores them, which would resurrect trailing open runs.)
    run_close = F.when(
        F.lead(flag_col).over(w) == F.lit(False), F.lead(time_col).over(w)
    )
    runs = (
        df.select(*select_cols)
        .withColumn("_run_close", run_close)
        .withColumn("_run_id", run_id)
        .where(F.col(flag_col))
        .groupBy(*keys, "_run_id")
        .agg(
            F.min(time_col).alias("time_from"),
            F.max(time_col).alias("time_to"),
            F.count("*").alias("n_samples"),
            F.max("_run_close").alias("closing_time"),
        )
        .drop("_run_id")
    )
    if closed_only:
        runs = runs.where(F.col("closing_time").isNotNull())
    return runs


def _window_start_of(ts: Column, duration_us: int) -> Column:
    """Tumbling-window start containing ``ts``, treating an exact
    boundary sample as belonging to the EARLIER window (inclusive-end
    scan semantics, reference processor/main.py:137-138)."""
    us = F.unix_micros(ts)
    start = (us - F.lit(1)) - ((us - F.lit(1)) % F.lit(duration_us))
    return F.timestamp_micros(start)


def emitted_run_windows(
    df: DataFrame,
    flag_col: str,
    time_col: str = "time",
    keys: tuple[str, ...] = ("trip_id",),
    window_duration: str = "60 seconds",
    lookback_s: int = DEFAULT_LOOKBACK_S,
) -> DataFrame:
    """Exact reference-parity emission: which minute window emits each
    run, and with what (possibly lookback-truncated) start.

    Output: ``<keys...>, time_from, time_to, emitting_window_start,
    n_samples`` — one row per emitted run, bit-for-bit the reference
    FSM + lookback behavior on gap-free 1 Hz data.
    """
    dur_us = 60_000_000 if window_duration == "60 seconds" else None
    if dur_us is None:
        qty, unit = window_duration.split()
        dur_us = int(qty) * {"seconds": 1_000_000, "minutes": 60_000_000}[unit]

    runs = flag_runs(df, flag_col, time_col, keys, closed_only=True)
    w_start = _window_start_of(F.col("closing_time"), dur_us)
    lookback_floor = w_start - F.expr(f"INTERVAL {lookback_s} SECONDS")
    return runs.select(
        *keys,
        F.greatest(F.col("time_from"), lookback_floor).alias("time_from"),
        F.col("time_to"),
        w_start.alias("emitting_window_start"),
        F.col("n_samples"),
    )
