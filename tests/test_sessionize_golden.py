"""Golden FSM tests — FIXTURES.md B1 cases 1-8, expected emissions
enumerated by hand against the reference semantics
(``processor/main.py:237-338``).

Timeline: 1 Hz per trip from the reference epoch; tumbling 60 s
windows W0=[T0,T0+60], W1=[T0+60,T0+120], ...
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from orca_ztbus_python_processor_spark.operators.sessionize import (
    emitted_run_windows,
    flag_runs,
)

T0 = dt.datetime(2021, 3, 9, 14, 15, 0)


def _trip(trip_id: int, n: int, true_ranges: list[tuple[int, int]]) -> pd.DataFrame:
    flag = [False] * n
    for lo, hi in true_ranges:  # inclusive
        for s in range(lo, hi + 1):
            flag[s] = True
    return pd.DataFrame(
        {
            "trip_id": trip_id,
            "time": [T0 + dt.timedelta(seconds=i) for i in range(n)],
            "flag": flag,
        }
    )


@pytest.fixture(scope="module")
def fixture_df(spark):
    pdf = pd.concat(
        [
            # B1 cases 1 (plain), 2 (straddle), 6 (two runs, single false
            # separator), 4 (closing false exactly on the W2/W3 boundary), 8
            _trip(1, 600, [(5, 10), (50, 70), (130, 140), (142, 150), (170, 179)]),
            # B1 cases 3 (466 s run > 400 s lookback budget) and 5 (trailing
            # open run, never emitted)
            _trip(2, 900, [(190, 655), (700, 899)]),
            # B1 case 7 (earlier captured run + straddling run — each
            # emitted exactly once, by its own closing window)
            _trip(3, 600, [(300, 310), (350, 380)]),
        ],
        ignore_index=True,
    )
    return spark.createDataFrame(pdf)


def s(sec: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


EXPECTED_EMISSIONS = {
    # trip -> [(time_from, time_to, emitting_window_start)]
    1: [
        (s(5), s(10), s(0)),  # case 1: inside W0
        (s(50), s(70), s(60)),  # case 2: straddle, true start recovered
        (s(130), s(140), s(120)),  # case 6a
        (s(142), s(150), s(120)),  # case 6b: single-false separator
        (s(170), s(179), s(120)),  # case 4: boundary false belongs to W2
    ],
    2: [
        (s(200), s(655), s(600)),  # case 3: start truncated to 600-400
    ],
    3: [
        (s(300), s(310), s(300)),  # case 7: captured by its own window
        (s(350), s(380), s(360)),  # ...not re-emitted by the next one
    ],
}


def test_emitted_run_windows_reference_parity(fixture_df):
    got = (
        emitted_run_windows(fixture_df, "flag", "time", ("trip_id",))
        .toPandas()
        .sort_values(["trip_id", "time_from"])
        .reset_index(drop=True)
    )
    expected_rows = [
        (trip, tf, tt, ws)
        for trip, runs in EXPECTED_EMISSIONS.items()
        for tf, tt, ws in runs
    ]
    assert len(got) == len(expected_rows)
    for i, (trip, tf, tt, ws) in enumerate(expected_rows):
        row = got.iloc[i]
        assert row["trip_id"] == trip, (i, row)
        assert row["time_from"].to_pydatetime() == tf, (i, row)
        assert row["time_to"].to_pydatetime() == tt, (i, row)
        assert row["emitting_window_start"].to_pydatetime() == ws, (i, row)


def test_trailing_open_run_not_emitted(fixture_df):
    closed = flag_runs(fixture_df, "flag", "time", ("trip_id",), closed_only=True)
    all_runs = flag_runs(fixture_df, "flag", "time", ("trip_id",), closed_only=False)
    closed_pd = closed.where("trip_id = 2").toPandas()
    all_pd = all_runs.where("trip_id = 2").toPandas()
    assert len(closed_pd) == 1  # only the 190..655 run
    assert len(all_pd) == 2  # + the open 700..899 run
    open_run = all_pd[all_pd["closing_time"].isna()].iloc[0]
    assert open_run["time_from"].to_pydatetime() == s(700)
    assert open_run["time_to"].to_pydatetime() == s(899)


def test_zero_true_window_has_no_emissions(fixture_df):
    # B1 case 8: windows with no true samples emit nothing — e.g. W8
    # (480-540) of trip 1 has zero emissions attributed
    got = emitted_run_windows(fixture_df, "flag", "time", ("trip_id",)).toPandas()
    w8 = got[(got["trip_id"] == 1) & (got["emitting_window_start"] == s(480))]
    assert len(w8) == 0


def test_untruncated_run_available(fixture_df):
    # the clean operator (no reference lookback bound) keeps the true start
    runs = flag_runs(fixture_df, "flag", "time", ("trip_id",)).where("trip_id = 2")
    row = runs.toPandas().iloc[0]
    assert row["time_from"].to_pydatetime() == s(190)
    assert row["n_samples"] == 466
