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
