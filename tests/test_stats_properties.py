"""Property tests (SURVEY.md §5 strategy #4): the stat bundle against
pandas on random frames — pandas IS the reference semantics
(``/root/reference/processor/other_metrics.py:27-38``), so ddof=1
stddev and linear-interpolated quantiles must agree to float32."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from orca_ztbus_python_processor_spark.functions.stats import column_stats

floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)


@st.composite
def value_lists(draw):
    return draw(st.lists(floats, min_size=2, max_size=60))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=value_lists())
def test_column_stats_matches_pandas(spark, values):
    pdf = pd.DataFrame({"v": np.array(values, dtype=np.float64)})
    got = (
        spark.createDataFrame(pdf)
        .agg(*column_stats("v"))
        .collect()[0]
        .asDict()
    )
    desc = pdf["v"].describe()  # count/mean/std/min/25%/50%/75%/max, ddof=1
    expect = {
        "count": desc["count"],
        "mean": desc["mean"],
        "std": desc["std"],
        "var": pdf["v"].var(),  # ddof=1, reference pandas semantics
        "min": desc["min"],
        "p25": desc["25%"],
        "p50": desc["50%"],
        "p75": desc["75%"],
        "max": desc["max"],
    }
    assert got["count"] == expect["count"]
    for k in ("mean", "std", "var", "min", "p25", "p50", "p75", "max"):
        g, e = got[k], np.float32(expect[k])
        if e is None or (isinstance(e, float) and math.isnan(e)):
            assert g is None or math.isnan(g), k
        else:
            assert g == pytest.approx(float(e), rel=2e-6), (k, g, e)


def test_approx_distinct_within_rsd(spark):
    from pyspark.sql import functions as F

    from orca_ztbus_python_processor_spark.sources.parquet import read_table
    from tests.conftest import SMOKE_SF_DIR

    ev = read_table(spark, SMOKE_SF_DIR, "events")
    both = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert both
    for r in both:
        assert abs(r["approx"] - r["exact"]) <= max(3, 0.06 * r["exact"]), r


def test_exact_group_quantiles_edges(spark):
    """Distributed rank-pick quantiles: parity with F.percentile on a
    ragged fixture (ties, singleton group, NULLs, negative values)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from orca_ztbus_python_processor_spark.functions.quantiles import (
        exact_group_quantiles,
    )

    pdf = pd.DataFrame(
        {
            "g": ["a"] * 7 + ["b"] + ["c"] * 4,
            "v": [5.0, -1.0, 3.0, 3.0, None, 2.0, 8.0, 42.0, 0.25, 0.5, 0.75, 1.0],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        r["g"]: r
        for r in exact_group_quantiles(df, "g", "v", qs=(0.25, 0.5, 0.75)).collect()
    }
    ref = {
        r["g"]: r
        for r in df.where(F.col("v").isNotNull())
        .groupBy("g")
        .agg(
            F.count("v").alias("n"),
            F.percentile("v", F.lit(0.25)).cast("float").alias("p25"),
            F.percentile("v", F.lit(0.5)).cast("float").alias("p50"),
            F.percentile("v", F.lit(0.75)).cast("float").alias("p75"),
        )
        .collect()
    }
    assert set(got) == set(ref) == {"a", "b", "c"}
    for g in ref:
        assert got[g]["n"] == ref[g]["n"], g
        for c in ("p25", "p50", "p75"):
            assert got[g][c] == pytest.approx(ref[g][c], abs=1e-6), (g, c)

    # empty input -> empty result, not an error
    empty = spark.createDataFrame([], "g string, v double")
    assert exact_group_quantiles(empty, "g", "v").count() == 0


def test_exact_group_quantiles_numeric_group_col(spark):
    """Group column type is propagated (not hardcoded string): bigint
    groups work and match F.percentile."""
    import pandas as pd
    from pyspark.sql import functions as F

    from orca_ztbus_python_processor_spark.functions.quantiles import (
        exact_group_quantiles,
    )

    pdf = pd.DataFrame({"g": [1] * 5 + [2] * 3, "v": [float(x) for x in range(8)]})
    df = spark.createDataFrame(pdf)
    got = {r["g"]: r for r in exact_group_quantiles(df, "g", "v").collect()}
    ref = {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            F.count("v").alias("n"),
            F.percentile("v", F.lit(0.5)).cast("float").alias("p50"),
        )
        .collect()
    }
    for g in (1, 2):
        assert got[g]["n"] == ref[g]["n"]
        assert got[g]["p50"] == ref[g]["p50"]
