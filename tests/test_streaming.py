"""Streaming tests (SURVEY.md §5 strategy #3): batch ≡ stream
equivalence via availableNow, simulator projection parity, and
session-window / exact-FSM run detection against the batch
gap-and-islands oracle."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from orca_ztbus_python_processor_spark.functions.stats import f32
from orca_ztbus_python_processor_spark.operators.sessionize import flag_runs
from orca_ztbus_python_processor_spark.sources.parquet import read_table
from orca_ztbus_python_processor_spark.streaming.pipeline import (
    read_events_stream,
    run_to_memory,
    session_runs_stream,
    windowed_agg_stream,
)
from orca_ztbus_python_processor_spark.streaming.sessions import fsm_runs_stream
from orca_ztbus_python_processor_spark.streaming.simulator import (
    DEFAULT_EPOCH,
    ticks_to_windows,
)

from tests.conftest import SMOKE_SF_DIR

T0 = dt.datetime(2021, 3, 9, 14, 15, 0)


def test_batch_stream_equivalence_minute_agg(spark):
    aggs = [F.count("*").alias("n_events"), f32(F.sum("value")).alias("sum_value")]

    stream = windowed_agg_stream(read_events_stream(spark, SMOKE_SF_DIR), aggs)
    run_to_memory(stream, "stream_minute_agg", output_mode="complete")
    got = (
        spark.table("stream_minute_agg")
        .toPandas()
        .sort_values(["time_from", "user_id"])
        .reset_index(drop=True)
    )

    batch = (
        read_table(spark, SMOKE_SF_DIR, "events")
        .groupBy(F.window("ts", "60 seconds").alias("w"), "user_id")
        .agg(*aggs)
        .select(
            F.col("w.start").alias("time_from"),
            F.col("w.end").alias("time_to"),
            "user_id",
            "n_events",
            "sum_value",
        )
        .toPandas()
        .sort_values(["time_from", "user_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, batch)


def test_simulator_tick_projection(spark):
    ticks = spark.createDataFrame(pd.DataFrame({"value": range(5)}))
    out = ticks_to_windows(ticks).toPandas().sort_values("time_from").reset_index(drop=True)
    assert out["time_from"].iloc[0].to_pydatetime() == DEFAULT_EPOCH
    assert out["time_to"].iloc[0].to_pydatetime() == DEFAULT_EPOCH + dt.timedelta(seconds=60)
    assert out["time_from"].iloc[4].to_pydatetime() == DEFAULT_EPOCH + dt.timedelta(seconds=240)
    assert (out["name"] == "EveryMinute").all()
    # 60x replay: 5 ticks (5 wall-clock s at 1 tick/s) cover 300 s of event time
    assert (
        out["time_to"].iloc[4] - out["time_from"].iloc[0]
    ).total_seconds() == 300


@pytest.fixture(scope="module")
def flag_stream_dir(spark, tmp_path_factory):
    """1 Hz flag fixture written as parquet for streaming reads; a
    far-future sentinel row advances the watermark past every real
    session so append mode finalizes them."""
    path = str(tmp_path_factory.mktemp("flagstream") / "data")
    rows = []
    true_ranges = [(5, 10), (50, 70), (130, 140), (142, 150)]
    flag = [False] * 300
    for lo, hi in true_ranges:
        for s in range(lo, hi + 1):
            flag[s] = True
    for i in range(300):
        rows.append((1, T0 + dt.timedelta(seconds=i), flag[i]))
    rows.append((99, T0 + dt.timedelta(days=1), True))  # watermark sentinel
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "flag"])
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    return path


def test_session_window_stream_matches_flag_runs(spark, flag_stream_dir):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, flag boolean")
        .parquet(flag_stream_dir)
    )
    sessions = session_runs_stream(stream, "flag", keys=("user_id",))
    run_to_memory(sessions, "session_runs", output_mode="append")
    got = (
        spark.table("session_runs")
        .where("user_id = 1")
        .toPandas()
        .sort_values("time_from")
        .reset_index(drop=True)
    )

    batch_df = spark.read.parquet(flag_stream_dir).where("user_id = 1")
    expected = (
        flag_runs(batch_df, "flag", time_col="ts", keys=("user_id",), closed_only=False)
        .toPandas()
        .sort_values("time_from")
        .reset_index(drop=True)
    )
    assert len(got) == len(expected) == 4
    for i in range(len(got)):
        assert got["time_from"].iloc[i] == expected["time_from"].iloc[i]
        # session_window end = last sample + gap
        assert got["time_to"].iloc[i] - dt.timedelta(milliseconds=1500) == expected["time_to"].iloc[i]
        assert got["n_samples"].iloc[i] == expected["n_samples"].iloc[i]


def test_fsm_stream_exact_runs(spark, flag_stream_dir):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, flag boolean")
        .parquet(flag_stream_dir)
    )
    runs = fsm_runs_stream(stream, "flag", key_col="user_id")
    run_to_memory(runs, "fsm_runs", output_mode="append")
    got = (
        spark.table("fsm_runs")
        .where("key = 1")
        .toPandas()
        .sort_values("time_from")
        .reset_index(drop=True)
    )
    expected = (
        flag_runs(
            spark.read.parquet(flag_stream_dir).where("user_id = 1"),
            "flag",
            time_col="ts",
            keys=("user_id",),
            closed_only=True,
        )
        .toPandas()
        .sort_values("time_from")
        .reset_index(drop=True)
    )
    assert len(got) == len(expected) == 4
    for col in ("time_from", "time_to"):
        assert (got[col] == expected[col]).all()
    assert (got["n_samples"] == expected["n_samples"]).all()
    # the far-future sentinel run (key=99) is open -> never emitted
    assert spark.table("fsm_runs").where("key = 99").count() == 0


def test_checkpoint_resume_exactly_once(spark, tmp_path):
    """ST6: a checkpointed file-stream sink resumes after restart
    without reprocessing — every input row lands in the sink exactly
    once across two separate query incarnations."""
    from orca_ztbus_python_processor_spark.streaming.pipeline import windows_table_sink

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch_file(name: str, lo: int, hi: int) -> None:
        pdf = pd.DataFrame(
            {
                "event_id": range(lo, hi),
                "ts": [T0 + dt.timedelta(seconds=i) for i in range(lo, hi)],
            }
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(in_dir)

    write_batch_file("a", 0, 50)
    stream = spark.readStream.schema("event_id long, ts timestamp").parquet(in_dir)
    q = windows_table_sink(stream, ckpt, out_dir)
    q.awaitTermination()

    write_batch_file("b", 50, 100)
    stream2 = spark.readStream.schema("event_id long, ts timestamp").parquet(in_dir)
    q2 = windows_table_sink(stream2, ckpt, out_dir)
    q2.awaitTermination()

    got = spark.read.parquet(out_dir).select("event_id").toPandas()["event_id"]
    assert len(got) == 100, f"expected exactly-once delivery of 100 rows, got {len(got)}"
    assert sorted(got) == list(range(100))


def test_twap_stream_state_carries_across_batches(spark, tmp_path):
    """twap_intervals_stream holds ONE open interval per key in state:
    an interval whose closing event arrives in a LATER micro-batch must
    still be emitted with the duration measured from the earlier batch's
    event (state carry), and each key's final interval stays open
    (never emitted)."""
    import pandas as pd  # noqa: PLC0415

    from orca_ztbus_python_processor_spark.streaming.sessions import (  # noqa: PLC0415
        twap_intervals_stream,
    )

    d = str(tmp_path / "twap_in")
    b1 = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:10",
                                  "2024-01-01 00:00:05"]),
            "value": [10.0, 20.0, 5.0],
        }
    )
    b2 = pd.DataFrame(
        {
            "user_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-01 00:00:40", "2024-01-01 00:01:05"]),
            "value": [30.0, 7.0],
        }
    )
    spark.createDataFrame(b1).coalesce(1).write.parquet(d + "/f1")
    spark.createDataFrame(b2).coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(d + "/f*/*.parquet")
    )
    out = twap_intervals_stream(
        stream, key_col="user_id", value_col="value", order_col=None
    )
    run_to_memory(out, "twap_intervals", output_mode="append")
    got = (
        spark.table("twap_intervals")
        .toPandas()
        .sort_values(["key", "dur_us"])
        .reset_index(drop=True)
    )
    # user 1: 10.0 held 10 s, 20.0 held 30 s (closed ACROSS the batch
    # boundary); 30.0 stays open. user 2: 5.0 held 60 s; 7.0 open.
    expect = {(1, 10.0, 10_000_000), (1, 20.0, 30_000_000), (2, 5.0, 60_000_000)}
    assert {(r.key, r.held_value, r.dur_us) for r in got.itertuples()} == expect

    # the PARTIAL-sum form (VERDICT r7 #3 — O(keys x batches) emission
    # instead of O(events)) must carry the same state across the same
    # batch boundary: per-batch partials summed per key == the interval
    # rows rolled up. Batch structure: user 1 closes one interval in
    # batch 1 (dur 10 s) and one ACROSS the boundary in batch 2 (30 s);
    # user 2 closes only the cross-boundary one.
    from orca_ztbus_python_processor_spark.streaming.sessions import (  # noqa: PLC0415
        twap_partials_stream,
    )

    stream2 = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(d + "/f*/*.parquet")
    )
    out2 = twap_partials_stream(
        stream2, key_col="user_id", value_col="value", order_col=None
    )
    run_to_memory(out2, "twap_partials", output_mode="append")
    partials = spark.table("twap_partials").toPandas()
    # 3 partial rows: (u1 batch1), (u1 batch2), (u2 batch2)
    assert len(partials) == 3
    rolled = partials.groupby("key")[["n_intervals", "sum_dur_us", "sum_val_dur"]].sum()
    assert rolled.loc[1, "n_intervals"] == 2
    assert rolled.loc[1, "sum_dur_us"] == 40_000_000
    assert rolled.loc[1, "sum_val_dur"] == 10.0 * 10_000_000 + 20.0 * 30_000_000
    assert rolled.loc[2, "n_intervals"] == 1
    assert rolled.loc[2, "sum_dur_us"] == 60_000_000
    assert rolled.loc[2, "sum_val_dur"] == 5.0 * 60_000_000


def test_stream_left_outer_eviction_boundary(spark, tmp_path):
    """Pins the stream-stream LEFT OUTER eviction contract that
    stream_click_error_left_join's oracle encodes: with both sides
    watermarked 10 min and the join bound e_ts <= c_ts + 5 min, an
    unmatched click emits its NULL row iff
    c_ts < global_wm - 5 min, where global_wm = min(max click ts,
    max error ts) - 10 min. Constructed so the boundary cases are
    unambiguous whole seconds (no ms-floor interaction)."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415

    T0 = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1: matched pair (error 2 min after click)
        (1, T0, "click"), (1, T0 + 2 * m, "error"),
        # user 2: unmatched click well below the cutoff -> NULL emitted
        (2, T0, "click"),
        # user 4: unmatched click just ABOVE the cutoff -> held in state
        (4, T0 + 46 * m, "click"),
        # user 5: unmatched click AT the cutoff -> strict <, held
        (5, T0 + 45 * m, "click"),
        # watermark anchors: max click 70 min, max error 60 min
        # -> global_wm = min(70, 60) - 10 = 50 min; cutoff = 45 min
        (8, T0 + 60 * m, "error"),
        (9, T0 + 70 * m, "click"),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    d = str(tmp_path / "lo_events")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(d)

    ev = spark.readStream.schema("user_id long, ts timestamp, event_type string").parquet(d)
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "10 minutes")
    )
    errors = (
        ev.where(F.col("event_type") == "error")
        .select(F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"))
        .withWatermark("e_ts", "10 minutes")
    )
    joined = clicks.join(
        errors,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("e_ts") > F.col("c_ts"))
        & (F.col("e_ts") <= F.col("c_ts") + F.expr("INTERVAL 5 MINUTES")),
        "left_outer",
    )
    run_to_memory(joined, "lo_boundary", output_mode="append")
    got = spark.table("lo_boundary").toPandas()
    matched = got[got.e_user.notna()]
    nulls = got[got.e_user.isna()]
    assert set(matched.c_user) == {1}
    # user 2 evicted (below cutoff); users 4 (above) and 5 (exactly at,
    # strict <) stay in state; user 9's click is above the cutoff too
    assert set(nulls.c_user) == {2}
