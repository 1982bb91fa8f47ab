"""The events.ts physical-layout sniff must route every generation the
driver testdata has shipped (or could ship) correctly:

- TIMESTAMP(NANOS), with or without the isAdjustedToUTC annotation —
  Spark loads both as bigint under nanosAsLong, so both MUST take the
  ns->us truncation path (a tz-annotated nanos column routed to the
  cast path would be interpreted as epoch-SECONDS: silent corruption).
- TIMESTAMP micros (the current generation) — native read + cast.
- bare INT64 with no logical type — must raise, never guess a unit.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orca_ztbus_python_processor_spark.sources.parquet import (
    _events_ts_arrow_type,
    events_ts_is_nanos,
    read_table,
)

TS_US = [
    datetime.datetime(2024, 1, 1, 0, 0, 1, 123456),
    datetime.datetime(2024, 1, 2, 12, 30, 0, 999999),
]


def _epoch_us(t: datetime.datetime) -> int:
    # interpret the naive wall time as UTC explicitly (the engine's
    # session tz), independent of the host timezone
    return int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)


def _write_events(tmp_path, ts_array):
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "error"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _read_epoch_us(spark, sf_dir):
    # compare INSTANTS (epoch micros), not collect()ed datetimes:
    # PySpark's TimestampType.fromInternal renders in the HOST-local
    # timezone, so naive-datetime equality would only hold on a UTC host
    import pyspark.sql.functions as F

    df = read_table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("us")
    )
    return sorted(r["us"] for r in df.collect())


@pytest.mark.parametrize("tz", [None, "UTC"])
def test_nanos_generations_route_to_truncation(spark, tmp_path, tz):
    ns_vals = [_epoch_us(t) * 1000 + 789 for t in TS_US]
    sf_dir = _write_events(tmp_path, pa.array(ns_vals, pa.timestamp("ns", tz=tz)))
    assert events_ts_is_nanos(sf_dir), _events_ts_arrow_type(
        str(tmp_path / "events.parquet")
    )
    # ns -> us integer truncation: the trailing 789 ns drop away
    assert _read_epoch_us(spark, sf_dir) == sorted(_epoch_us(t) for t in TS_US)


def test_micros_generation_reads_natively(spark, tmp_path):
    sf_dir = _write_events(tmp_path, pa.array(TS_US, pa.timestamp("us")))
    assert not events_ts_is_nanos(sf_dir)
    assert _read_epoch_us(spark, sf_dir) == sorted(_epoch_us(t) for t in TS_US)


def test_bare_int64_ts_refuses_to_guess(tmp_path):
    vals = [_epoch_us(t) for t in TS_US]
    sf_dir = _write_events(tmp_path, pa.array(vals, pa.int64()))
    with pytest.raises(ValueError, match="Refusing to guess"):
        events_ts_is_nanos(sf_dir)


def test_rewritten_fixture_is_resniffed(tmp_path):
    """The sniff memo keys on (path, size, mtime_ns): rewriting the same
    path with a different timestamp generation in-process (driver
    regenerating testdata, tests reusing tmp dirs) must re-read the
    footer, not serve the stale generation's routing."""
    sf_dir = _write_events(tmp_path, pa.array(TS_US, pa.timestamp("us")))
    assert not events_ts_is_nanos(sf_dir)
    ns_vals = [_epoch_us(t) * 1000 for t in TS_US]
    _write_events(tmp_path, pa.array(ns_vals, pa.timestamp("ns")))
    assert events_ts_is_nanos(sf_dir)
