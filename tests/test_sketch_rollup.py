"""Algebraic gates for the mergeable-sketch rollup
(``hll_weekly_rollup``): HLL union must be lossless (estimate from
unioned daily sketches == estimate from a direct weekly sketch,
EXACTLY — same sketch algorithm, same lgConfigK) and the estimate must
sit inside the HLL error envelope of the exact distinct count. These
two properties are what make per-day sketches a valid materialized
pre-aggregation at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orca_ztbus_python_processor_spark.sources.parquet import read_table
from orca_ztbus_python_processor_spark.workloads.base import merged_catalog

from tests.conftest import SMOKE_SF_DIR


def _weekly_direct(spark):
    ev = read_table(spark, SMOKE_SF_DIR, "events")
    return {
        r["week_start"]: (r["direct_est"], r["exact"])
        for r in ev.groupBy(
            F.date_trunc("week", F.col("ts")).alias("week_start")
        )
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_est"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    }


def test_union_of_daily_sketches_equals_direct_weekly_sketch(spark):
    cat = merged_catalog()
    rolled = {
        r["week_start"]: r["approx_distinct_users"]
        for r in cat.queries["hll_weekly_rollup"](spark, SMOKE_SF_DIR).collect()
    }
    direct = _weekly_direct(spark)
    assert rolled.keys() == direct.keys()
    for wk, est in rolled.items():
        # lossless merge: identical sketch algorithm at identical size
        # => the unioned estimate is EXACTLY the direct one
        assert est == direct[wk][0], (wk, est, direct[wk][0])


def test_estimate_within_hll_error_envelope(spark):
    direct = _weekly_direct(spark)
    for wk, (est, exact) in direct.items():
        # default lgConfigK=12 => rsd ~1.6%; allow 5 sigma plus the
        # small-cardinality floor (HLL is near-exact below ~2.5k)
        assert abs(est - exact) <= max(3, 0.08 * exact), (wk, est, exact)


def test_weekly_rollup_golden_on_seeded_fixture(spark):
    """Deterministic-output pin (VERDICT r5 item 7): HLL sketches are
    deterministic functions of their input, so the seeded sf0.001
    fixture has ONE correct output. Any drift in the sketch config,
    week truncation, or union path surfaces as a value diff here, not
    just an envelope violation."""
    rows = merged_catalog().queries["hll_weekly_rollup"](spark, SMOKE_SF_DIR).collect()
    got = sorted(
        (str(r["week_start"]), r["n_days"], r["approx_distinct_users"])
        for r in rows
    )
    assert got == [
        ("2024-01-01 00:00:00", 7, 15),
        ("2024-01-08 00:00:00", 7, 15),
        ("2024-01-15 00:00:00", 7, 15),
        ("2024-01-22 00:00:00", 7, 15),
        ("2024-01-29 00:00:00", 2, 15),
    ]
