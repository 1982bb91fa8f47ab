"""Aggregate/scalar expression builders shared by the query catalog and
the ZTBus algorithm library.

Parity decisions (SURVEY.md §7 "semantic decisions"):
  - Exact ``median`` / ``percentile`` (linear interpolation, pandas
    default — reference ``processor/main.py:465,571``), never
    ``percentile_approx`` where an oracle compares values. The approx
    forms are the documented 100 TB scale path.
  - ``stddev_samp`` / ``var_samp`` — pandas ddof=1 (reference
    ``processor/main.py:570,595``).
  - ``f32``: every derived floating aggregate is cast to float32 at the
    output boundary. Double-precision sums are order-dependent at the
    ~1e-12 relative level (Spark and DuckDB will not add in the same
    order); float32 has 2^-24 relative spacing, ~4 orders of magnitude
    coarser, so the cast makes the value hash summation-order-proof
    without giving up meaningful precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def f32(col: Column) -> Column:
    """Cast a derived floating value to float32 for hash-stable output."""
    return col.cast("float")


def guarded_div(num: Column, denom: Column) -> Column:
    """NULL-on-zero-denominator division.

    Reference: ``kwh_per_km = kwh / km if km > 0 else None``
    (``processor/main.py:506-514,538-543``).
    """
    return F.when(denom > 0, num / denom).otherwise(F.lit(None))


def column_stats(col: str | Column, prefix: str = "") -> list[Column]:
    """The describe() stat bundle: count/mean/std/min/25p/50p/75p/max.

    Reference: ``other_metrics.py:27-38`` — one pandas ``describe()``
    per column, declared for 32 (column × window-type) algorithm
    surfaces. Here it is a single fused aggregation list usable inside
    any ``groupBy().agg(...)``; Catalyst evaluates all eight in one
    pass over the data.
    """
    c = F.col(col) if isinstance(col, str) else col
    p = prefix
    return [
        F.count(c).alias(f"{p}count"),
        f32(F.avg(c)).alias(f"{p}mean"),
        f32(F.stddev_samp(c)).alias(f"{p}std"),
        f32(F.var_samp(c)).alias(f"{p}var"),
        f32(F.min(c)).alias(f"{p}min"),
        f32(F.percentile(c, F.lit(0.25))).alias(f"{p}p25"),
        f32(F.median(c)).alias(f"{p}p50"),
        f32(F.percentile(c, F.lit(0.75))).alias(f"{p}p75"),
        f32(F.max(c)).alias(f"{p}max"),
    ]


def oracle_column_stats(col: str, prefix: str = "") -> str:
    """DuckDB SQL fragment equivalent of :func:`column_stats`."""
    p = prefix
    return f"""
        count({col}) AS {p}count,
        CAST(avg({col}) AS REAL) AS {p}mean,
        CAST(stddev_samp({col}) AS REAL) AS {p}std,
        CAST(var_samp({col}) AS REAL) AS {p}var,
        CAST(min({col}) AS REAL) AS {p}min,
        CAST(quantile_cont(CAST({col} AS DOUBLE), 0.25) AS REAL) AS {p}p25,
        CAST(quantile_cont(CAST({col} AS DOUBLE), 0.50) AS REAL) AS {p}p50,
        CAST(quantile_cont(CAST({col} AS DOUBLE), 0.75) AS REAL) AS {p}p75,
        CAST(max({col}) AS REAL) AS {p}max
    """
