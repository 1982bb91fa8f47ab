"""Round-12 machinery: exact_group_rank_values / exact_group_rank_value
(the order-statistic pick that replaced the low-cardinality-key window
sorts, VERDICT r11 #1/#2) and group_prefix_sum (the distributed
cumulative-offset layout behind sequence_packing_profile).

Each is pinned against an independent single-process reference
(sorted-list indexing / running-total loop), including tie and
out-of-range corners the catalog fixtures may not exercise.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from orca_ztbus_python_processor_spark.functions.quantiles import (
    exact_group_rank_value,
    exact_group_rank_values,
    group_prefix_sum,
)


@pytest.fixture(scope="module")
def grouped_df(spark):
    rng = random.Random(1207)
    rows = []
    for g, n in [("a", 137), ("b", 64), ("c", 1), ("d", 9)]:
        for i in range(n):
            # coarse grid forces heavy ties in every group
            rows.append((g, float(rng.randrange(0, 17)), i))
    return spark.createDataFrame(rows, "g string, v double, i int"), rows


def _ref_rank(rows, g, rank):
    vs = sorted(v for gg, v, _ in rows if gg == g)
    return vs[rank - 1] if 1 <= rank <= len(vs) else None


def test_rank_values_match_sorted_reference(grouped_df):
    df, rows = grouped_df
    out = {
        r["g"]: r
        for r in exact_group_rank_values(
            df,
            "g",
            "v",
            lambda n: {
                "lo": 1,
                "med": (n + 1) // 2,
                "p90": math.ceil(0.9 * n),
                "hi": n,
            },
        ).collect()
    }
    assert set(out) == {"a", "b", "c", "d"}
    for g in out:
        n = out[g]["n"]
        assert n == len([1 for gg, _, _ in rows if gg == g])
        for label, rank in [
            ("lo", 1),
            ("med", (n + 1) // 2),
            ("p90", math.ceil(0.9 * n)),
            ("hi", n),
        ]:
            assert out[g][label] == _ref_rank(rows, g, rank), (g, label)


def test_rank_values_out_of_range_yields_null_not_missing_row(grouped_df):
    """A rank beyond the group (conformal's k > n corner) must emit the
    group row with a NULL value — same as SQL max(CASE WHEN rn = k)."""
    df, rows = grouped_df
    out = {
        r["g"]: r
        for r in exact_group_rank_values(
            df, "g", "v", lambda n: {"beyond": n + 1, "ok": 1}
        ).collect()
    }
    assert set(out) == {"a", "b", "c", "d"}
    for g in out:
        assert out[g]["beyond"] is None
        assert out[g]["ok"] == _ref_rank(rows, g, 1)


def test_rank_value_single_wrapper(grouped_df):
    df, rows = grouped_df
    out = {
        r["g"]: r["q90"]
        for r in exact_group_rank_value(
            df, "g", "v", lambda n: math.ceil(0.9 * n), out_col="q90"
        ).collect()
    }
    for g in out:
        n = len([1 for gg, _, _ in rows if gg == g])
        assert out[g] == _ref_rank(rows, g, math.ceil(0.9 * n))


def test_rank_values_ignore_nulls(spark):
    df = spark.createDataFrame(
        [("a", 3.0), ("a", None), ("a", 1.0), ("a", None), ("a", 2.0)],
        "g string, v double",
    )
    row = exact_group_rank_values(df, "g", "v", lambda n: {"hi": n}).collect()[0]
    assert row["n"] == 3 and row["hi"] == 3.0


def test_group_prefix_sum_matches_running_total(spark):
    rng = random.Random(42)
    rows = [
        (g, i, rng.randrange(0, 600))
        for g in ("x", "y", "z")
        for i in range(rng.randrange(50, 220))
    ]
    df = spark.createDataFrame(rows, "g string, ord int, w long")
    got = {
        (r["g"], r["ord"]): r["off"]
        for r in group_prefix_sum(df, "g", "ord", "w", out_col="off").collect()
    }
    assert len(got) == len(rows)
    ref: dict = {}
    run: dict = {}
    for g, i, w in sorted(rows):
        ref[(g, i)] = run.get(g, 0)
        run[g] = run.get(g, 0) + w
    assert got == ref


def test_group_prefix_sum_keeps_input_columns(spark):
    df = spark.createDataFrame(
        [("a", 1, 10, "k1"), ("a", 2, 5, "k2")], "g string, ord int, w long, tag string"
    )
    out = group_prefix_sum(df, "g", "ord", "w")
    assert set(out.columns) == {"g", "ord", "w", "tag", "prefix_sum"}
    rows = {r["ord"]: r for r in out.collect()}
    assert rows[1]["prefix_sum"] == 0 and rows[2]["prefix_sum"] == 10
    assert rows[2]["tag"] == "k2"


def test_rank_values_no_corpus_grain_window(spark, grouped_df):
    """The machinery's only window is (pid, g)-keyed — bounded by
    partition size; the lint helper in test_plan_quality must see
    nothing (self-check that the fix device stays exempt AND clean)."""
    from tests.test_plan_quality import _low_card_windows

    df, _ = grouped_df
    out = exact_group_rank_values(df, "g", "v", lambda n: {"med": (n + 1) // 2})
    assert _low_card_windows(spark, out) == []
