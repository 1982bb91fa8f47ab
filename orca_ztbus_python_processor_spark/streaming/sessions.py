"""Exact-FSM stateful streaming run detection via
``applyInPandasWithState`` (SURVEY.md §2.8 ST3-ST5, §4 custom-strategy
note (a)).

``session_window`` (``pipeline.session_runs_stream``) matches the
reference FSM on gap-free 1 Hz data; this operator reproduces the FSM
*mechanically* — open on rising edge, close on the first false sample,
trailing run held open across micro-batches (reference
``processor/main.py:296-338``) — so it also holds on irregular
sampling, and serves as the exactness oracle for the session-window
form.

State per key: (run_open, run_start_us, last_true_us). Rows must
arrive in event-time order across batches (true for replayed/archival
sources; at the Kafka edge pair with a watermark-sorted pre-stage).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "key long, time_from timestamp, time_to timestamp, n_samples long"
)
STATE_SCHEMA = "run_open boolean, run_start long, last_true long, n long"


def _fsm_fn(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        run_open, run_start, last_true, n = state.get
    else:
        run_open, run_start, last_true, n = False, 0, 0, 0

    # Concatenate every Arrow chunk of the group BEFORE sorting: state
    # (run_open/last_true) carries across chunks, so a per-chunk sort
    # would mis-order a group whose micro-batch data spans multiple
    # chunks (rows > arrow.maxRecordsPerBatch, or unordered chunk
    # delivery after the state shuffle). Stable mergesort keeps arrival
    # order deterministic on timestamp ties.
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    out_rows: list[tuple[Any, int, int, int]] = []
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["_ts_us", "_oid"], kind="mergesort"
        )
        for ts_us, flag in zip(pdf["_ts_us"], pdf["_flag"]):
            if flag and not run_open:
                run_open, run_start, n = True, int(ts_us), 1
                last_true = int(ts_us)
            elif flag and run_open:
                last_true = int(ts_us)
                n += 1
            elif not flag and run_open:
                # close on the first false sample; emit [first, last] true
                out_rows.append((key[0], run_start, last_true, n))
                run_open, n = False, 0

    state.update((run_open, run_start, last_true, n))
    if out_rows:
        df = pd.DataFrame(
            out_rows, columns=["key", "time_from", "time_to", "n_samples"]
        )
        df["time_from"] = pd.to_datetime(df["time_from"], unit="us")
        df["time_to"] = pd.to_datetime(df["time_to"], unit="us")
        yield df


def fsm_runs_stream(
    events: DataFrame,
    flag_col: str,
    key_col: str,
    time_col: str = "ts",
    watermark: str = "400 seconds",
    order_col: str | None = None,
) -> DataFrame:
    """Apply the exact FSM over a stream, keyed by ``key_col``.

    Output: ``key, time_from, time_to, n_samples`` — one row per CLOSED
    run; the trailing open run is retained in state, never emitted
    (reference ST5 semantics). ``order_col`` is the deterministic
    secondary sort key on timestamp ties (pass the source's event id
    when its batch twin orders by ``(ts, event_id)``); with ties and no
    ``order_col`` the run boundaries on tied flags are
    arrival-order-dependent.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    prepared = (
        events.withWatermark(time_col, watermark)
        .select(
            F.col(key_col).alias("key"),
            F.unix_micros(F.col(time_col)).alias("_ts_us"),
            F.col(flag_col).alias("_flag"),
            (
                F.col(order_col) if order_col is not None else F.lit(0)
            ).cast("long").alias("_oid"),
        )
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _fsm_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TWAP_OUTPUT_SCHEMA = "key long, held_value double, dur_us long"
TWAP_STATE_SCHEMA = "has_prev boolean, prev_ts long, prev_value double"


def _twap_fn(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Interval closer: each arriving event CLOSES the key's previous
    holding interval (emitting the held value and its duration) and
    becomes the new open interval. The final interval per key stays in
    state — the step-function integral over a half-open observation
    window never sees it, which is exactly the batch TWAP's
    dur-IS-NOT-NULL contract.

    Ordering contract: ALL Arrow chunks of the group are concatenated
    before ONE stable sort on (_ts_us, _oid) — prev_ts carries across
    chunks, so a per-chunk sort would compute negative/incorrect
    durations whenever a micro-batch's group spans multiple chunks;
    the _oid tie-break makes interval order on equal timestamps match
    the batch oracle's (ts, event_id) window ordering exactly."""
    import numpy as np  # noqa: PLC0415

    if state.exists:
        has_prev, prev_ts, prev_value = state.get
    else:
        has_prev, prev_ts, prev_value = False, 0, 0.0

    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["_ts_us", "_oid"], kind="mergesort"
        )
        ts = pdf["_ts_us"].to_numpy(dtype=np.int64)
        val = pdf["_value"].to_numpy(dtype=np.float64)
        # Vectorized interval closing: the batch's own pairs close in
        # one diff; the carried open interval closes against the first
        # arrival. No per-row Python.
        if has_prev:
            ts = np.concatenate(([prev_ts], ts))
            val = np.concatenate(([prev_value], val))
        if len(ts) > 1:
            yield pd.DataFrame(
                {
                    "key": np.full(len(ts) - 1, key[0]),
                    "held_value": val[:-1],
                    "dur_us": np.diff(ts),
                }
            )
        has_prev, prev_ts, prev_value = True, int(ts[-1]), float(val[-1])

    state.update((has_prev, prev_ts, prev_value))


def twap_intervals_stream(
    events: DataFrame,
    key_col: str,
    value_col: str,
    time_col: str = "ts",
    watermark: str = "10 minutes",
    order_col: str | None = "event_id",
) -> DataFrame:
    """Streaming holding-interval emission for time-weighted averaging,
    keyed by ``key_col``: one output row per CLOSED interval
    (``key, held_value, dur_us``); O(1) state per key (the single open
    interval). ``order_col`` is the deterministic secondary sort key on
    timestamp ties — pass the same column the batch twin's window
    orders by so the interval sequence (and thus every duration) is
    engine-portable; ``None`` for sources whose (key, time) pairs are
    already unique."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    oid = F.col(order_col) if order_col is not None else F.lit(0)
    prepared = (
        events.withWatermark(time_col, watermark)
        .select(
            F.col(key_col).alias("key"),
            F.unix_micros(F.col(time_col)).alias("_ts_us"),
            F.col(value_col).alias("_value"),
            oid.alias("_oid"),
        )
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _twap_fn,
        outputStructType=TWAP_OUTPUT_SCHEMA,
        stateStructType=TWAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TWAP_PARTIAL_SCHEMA = "key long, n_intervals long, sum_dur_us long, sum_val_dur double"


def _twap_partial_fn(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Partial-aggregating interval closer: identical interval
    semantics to ``_twap_fn`` (each event closes the key's open
    interval; the final one stays in state), but each micro-batch
    emits ONE partial-sum row per key — (count, Σdur, Σvalue*dur) over
    the intervals the batch closed — instead of one row per interval.
    Sink/emission volume collapses from O(events) to O(keys x
    batches); downstream summation of partials is exactly the total
    rollup (count/sum are associative)."""
    import numpy as np  # noqa: PLC0415

    if state.exists:
        has_prev, prev_ts, prev_value = state.get
    else:
        has_prev, prev_ts, prev_value = False, 0, 0.0

    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["_ts_us", "_oid"], kind="mergesort"
        )
        ts = pdf["_ts_us"].to_numpy(dtype=np.int64)
        val = pdf["_value"].to_numpy(dtype=np.float64)
        if has_prev:
            ts = np.concatenate(([prev_ts], ts))
            val = np.concatenate(([prev_value], val))
        if len(ts) > 1:
            durs = np.diff(ts)
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n_intervals": [len(durs)],
                    "sum_dur_us": [int(durs.sum())],
                    # float64 partial; the final quotient is f32-cast
                    # downstream, which absorbs association-order ulps
                    # exactly as it did for the row-emission form
                    "sum_val_dur": [float((val[:-1] * durs).sum())],
                }
            )
        has_prev, prev_ts, prev_value = True, int(ts[-1]), float(val[-1])

    state.update((has_prev, prev_ts, prev_value))


def twap_partials_stream(
    events: DataFrame,
    key_col: str,
    value_col: str,
    time_col: str = "ts",
    watermark: str = "10 minutes",
    order_col: str | None = "event_id",
) -> DataFrame:
    """Per-batch PARTIAL time-weighted sums, keyed by ``key_col`` —
    the scale form of ``twap_intervals_stream`` (VERDICT r7 #3): the
    stateful operator already walks every interval, so emitting the
    per-key partial sums instead of the raw intervals removes the
    O(events) emission/sink volume (measured at sf1: 985k sink rows →
    ≤ n_keys per batch) while the final rollup over partials stays an
    exact associative sum. State is the same single open interval per
    key."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    oid = F.col(order_col) if order_col is not None else F.lit(0)
    prepared = (
        events.withWatermark(time_col, watermark)
        .select(
            F.col(key_col).alias("key"),
            F.unix_micros(F.col(time_col)).alias("_ts_us"),
            F.col(value_col).alias("_value"),
            oid.alias("_oid"),
        )
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _twap_partial_fn,
        outputStructType=TWAP_PARTIAL_SCHEMA,
        stateStructType=TWAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
