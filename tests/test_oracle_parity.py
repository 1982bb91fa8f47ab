"""Oracle-differential tests: every SQL-expressible query in the
catalog must match its DuckDB twin exactly — row count, column set,
and values (order-insensitive) — the same gate the driver applies at
sf0.01 (SURVEY.md §5 strategy #1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from orca_ztbus_python_processor_spark.workloads.base import merged_catalog

from tests.conftest import ORACLE_SF_DIR

CATALOG = merged_catalog()
ORACLE_NAMES = sorted(CATALOG.oracles)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, dtype-normalized, row-sorted frame."""
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_integer_dtype(s) or str(s.dtype).startswith(("Int", "UInt", "uint")):
            df[col] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            # engine outputs are float32-cast already; compare as float32
            df[col] = s.astype("float32")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[col] = s.astype("datetime64[us]")
        elif s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if s.dropna().size else None, float):
            df[col] = s.astype("float32")
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_matches_oracle(spark, duck, name):
    spark_df = CATALOG.queries[name](spark, ORACLE_SF_DIR).toPandas()
    duck_df = duck.execute(CATALOG.oracles[name]).df()

    assert len(spark_df) == len(duck_df), f"{name}: row count {len(spark_df)} != {len(duck_df)}"
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} != {sorted(duck_df.columns)}"
    )
    # dtype *kinds* must agree pre-normalization (int vs float vs ts vs str) —
    # a DuckDB HUGEINT->float64 leak would silently pass a value compare but
    # fail the driver's schema/hash gate.
    for col in spark_df.columns:
        sk, dk = spark_df[col].dtype.kind, duck_df[col].dtype.kind
        assert sk == dk, f"{name}.{col}: dtype kind {sk} (spark) != {dk} (oracle)"

    a, b = normalize(spark_df), normalize(duck_df)
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av):
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            assert eq.all(), (
                f"{name}.{col}: {int((~eq).sum())} mismatches, e.g. "
                f"{av[~eq].head(3).tolist()} vs {bv[~eq].head(3).tolist()}"
            )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            assert eq.all(), (
                f"{name}.{col}: {int((~eq).sum())} mismatches, e.g. "
                f"{av[~eq].head(3).tolist()} vs {bv[~eq].head(3).tolist()}"
            )


def test_rows_only_queries_run(spark):
    """Queries without an oracle must still run and return a stable schema."""
    for name, fn in CATALOG.queries.items():
        if name in CATALOG.oracles:
            continue
        df = fn(spark, ORACLE_SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
