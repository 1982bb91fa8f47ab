"""Degenerate-input behavior: empty join sides, sub-shingle texts,
empty strings — the inputs a 100 TB corpus WILL contain somewhere."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from orca_ztbus_python_processor_spark.operators.asofjoin import asof_join
from orca_ztbus_python_processor_spark.operators.dedup import (
    minhash_candidate_pairs,
    minhash_near_dups,
    winnow_fingerprints,
)
from orca_ztbus_python_processor_spark.operators.intervaljoin import interval_join


def test_asof_join_empty_right(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": [dt.datetime(2024, 1, 1)], "x": [7]})
    )
    right = spark.createDataFrame([], schema="k long, rt timestamp, p long")
    out = asof_join(left, right, on="k", left_time="t", right_time="rt").collect()
    assert len(out) == 1
    assert out[0]["x"] == 7 and out[0]["p"] is None


def test_interval_join_empty_intervals(spark):
    pts = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": [dt.datetime(2024, 1, 1)], "pid": [1]})
    )
    ivs = spark.createDataFrame([], schema="k long, s timestamp, e timestamp")
    assert interval_join(pts, ivs, "k", "t", "s", "e").count() == 0
    left = interval_join(pts, ivs, "k", "t", "s", "e", how="left").collect()
    assert len(left) == 1 and left[0]["s"] is None


def test_dedup_short_and_empty_texts(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": ["ab", "ab", "", "abcdefghij klm nop", "abcdefghij klm nop"],
            }
        )
    )
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_candidate_pairs(docs).collect()}
    assert (1, 2) in pairs  # identical sub-shingle texts still collide
    assert (4, 5) in pairs
    assert not any(3 in p for p in pairs)  # empty text joins nothing
    dups = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dups(docs, threshold=0.5).collect()
    }
    assert dups[(1, 2)] == 1.0
    assert dups[(4, 5)] == 1.0


def test_winnow_short_text(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["abc", ""]})
    )
    out = winnow_fingerprints(docs).collect()
    assert {r["doc_id"] for r in out} == {1}  # short text -> 1 fp; empty -> none
    assert len(out) == 1


def test_register_views_sql_api(spark):
    from orca_ztbus_python_processor_spark.sources.parquet import register_views
    from tests.conftest import SMOKE_SF_DIR

    register_views(spark, SMOKE_SF_DIR)
    n = spark.sql(
        "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()[0]["n"]
    assert n > 0


def test_approx_quantiles_within_rank_bound(spark):
    """approx_percentile's guarantee is on RANK, not value (it returns a
    real sample, no interpolation): at accuracy 10k the result must lie
    within the exact [q-0.01, q+0.01] quantile envelope per group."""
    from orca_ztbus_python_processor_spark.workloads.base import merged_catalog

    from tests.conftest import ORACLE_SF_DIR

    cat = merged_catalog()
    approx = {
        r["event_type"]: r
        for r in cat.queries["approx_value_quantiles"](spark, ORACLE_SF_DIR).collect()
    }
    from orca_ztbus_python_processor_spark.sources.parquet import read_table
    import pyspark.sql.functions as F

    exact = {
        r["event_type"]: r
        for r in read_table(spark, ORACLE_SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.percentile("value", 0.49).alias("p50_lo"),
            F.percentile("value", 0.51).alias("p50_hi"),
            F.percentile("value", 0.94).alias("p95_lo"),
            F.percentile("value", 0.96).alias("p95_hi"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    eps = 1e-4  # float32 cast slack on the query output
    for et, row in approx.items():
        e = exact[et]
        assert e["p50_lo"] - eps <= row["p50_approx"] <= e["p50_hi"] + eps, (et, row)
        assert e["p95_lo"] - eps <= row["p95_approx"] <= e["p95_hi"] + eps, (et, row)


def test_approx_distinct_users_daily_within_envelope(spark):
    """VERDICT r7 #4: the daily HLL++ estimate must sit inside the
    error envelope of the EXACT per-day distinct count — rsd=0.02 is
    the requested relative standard deviation, so 5 sigma = 10%, plus
    the small-cardinality floor where HLL++ switches to near-exact
    linear counting."""
    from orca_ztbus_python_processor_spark.workloads.base import merged_catalog
    from orca_ztbus_python_processor_spark.sources.parquet import read_table
    import pyspark.sql.functions as F

    from tests.conftest import SMOKE_SF_DIR

    cat = merged_catalog()
    approx = {
        str(r["day"]): (r["approx_users"], r["n_events"])
        for r in cat.queries["approx_distinct_users_daily"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    exact = {
        str(r["day"]): (r["users"], r["n"])
        for r in read_table(spark, SMOKE_SF_DIR, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("users"), F.count("*").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for day, (est, n_ev) in approx.items():
        users, n = exact[day]
        assert n_ev == n, day
        assert abs(est - users) <= max(3, 0.10 * users), (day, est, users)


def test_approx_distinct_users_daily_golden_on_seeded_fixture(spark):
    """Deterministic-output pin (the r7 golden treatment): HLL++ is a
    deterministic function of its input, so the seeded sf0.001 fixture
    has ONE correct output — config or hash drift surfaces as a value
    diff, not just an envelope violation."""
    from orca_ztbus_python_processor_spark.workloads.base import merged_catalog

    from tests.conftest import SMOKE_SF_DIR

    rows = merged_catalog().queries["approx_distinct_users_daily"](
        spark, SMOKE_SF_DIR
    ).collect()
    got = sorted((str(r["day"]), r["approx_users"], r["n_events"]) for r in rows)
    assert len(got) == 30
    # sf0.001 has 15 users; daily actives vary 11-15 and HLL++ is exact
    # in this linear-counting regime, so the estimates ARE the actives
    assert set(u for _, u, _ in got) == {11, 12, 13, 14, 15}, got[:5]
    assert got[0] == ("2024-01-01", 15, 33), got[0]
    assert sum(n for _, _, n in got) == 1000


def test_approx_value_quantiles_golden_on_seeded_fixture(spark):
    """Value pin for the quantile sketch path: approx_percentile is
    deterministic, so the seeded fixture output is a constant."""
    import pytest as _pytest

    from orca_ztbus_python_processor_spark.workloads.base import merged_catalog

    from tests.conftest import SMOKE_SF_DIR

    rows = merged_catalog().queries["approx_value_quantiles"](
        spark, SMOKE_SF_DIR
    ).collect()
    got = {r["event_type"]: r for r in rows}
    assert {et: r["n"] for et, r in got.items()} == {
        "click": 210, "view": 188, "purchase": 202, "error": 201,
        "signup": 199,
    }
    assert got["click"]["p50_approx"] == _pytest.approx(33.19, abs=1e-2)
    assert got["error"]["p95_approx"] == _pytest.approx(124.60, abs=1e-2)


def test_straddle_fixture_exercises_fsm_edges(spark):
    """ztbus_brake_straddle_windows only tests the reference FSM's edge
    semantics (processor/main.py:246-293) if the fixture actually
    produces them; assert each edge class is present so a corpus change
    can't silently reduce the entry to the trivial path."""
    import pyspark.sql.functions as F

    from orca_ztbus_python_processor_spark.operators.sessionize import flag_runs
    from orca_ztbus_python_processor_spark.workloads.ztbus import (
        straddle_fixture,
        ztbus_brake_straddle_windows,
    )
    from tests.conftest import SMOKE_SF_DIR

    raw_runs = {
        (r["trip_id"], r["time_to"]): r["time_from"]
        for r in flag_runs(
            straddle_fixture(spark, SMOKE_SF_DIR), "flag", "time", ("trip_id",)
        ).collect()
    }
    emitted = ztbus_brake_straddle_windows(spark, SMOKE_SF_DIR).collect()
    assert len(emitted) > 0

    straddling = truncated = boundary_close = 0
    for r in emitted:
        w_start = r["emitting_window_start"]
        raw_from = raw_runs[(r["trip_id"], r["time_to"])]
        if raw_from < w_start:
            straddling += 1
        if raw_from < r["time_from"]:
            truncated += 1  # lookback floor applied
        closing = r["time_to"] + __import__("datetime").timedelta(seconds=40)
        if closing.second == 0 and closing.microsecond == 0 and w_start == closing - __import__("datetime").timedelta(seconds=60):
            boundary_close += 1
    assert straddling > 0, "no run straddles its emitting window start"
    assert truncated > 0, "no run hit the 400 s lookback truncation"
    assert boundary_close > 0, "no run closes exactly on a window boundary"


def test_penny_allocation_reconciles_every_order(spark):
    """The largest-remainder construction guarantees per-order
    reconciliation: sum(alloc_cents) == round(o_totalprice*100) for
    EVERY order — the invariant that makes proration finance-safe."""
    from pyspark.sql import functions as F

    from orca_ztbus_python_processor_spark.workloads.base import merged_catalog
    from tests.conftest import SMOKE_SF_DIR

    cat = merged_catalog()
    alloc = cat.queries["order_penny_allocation"](spark, SMOKE_SF_DIR)
    totals = (
        spark.read.parquet(f"{SMOKE_SF_DIR}/orders.parquet")
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_c"),
        )
    )
    bad = (
        alloc.groupBy("l_orderkey")
        .agg(F.sum("alloc_cents").alias("s"))
        .join(totals, "l_orderkey")
        .where(F.col("s") != F.col("total_c"))
        .count()
    )
    assert bad == 0
