"""Skew operators must be exact rewrites: salted forms equal their
unsalted equivalents row-for-row."""

from __future__ import annotations

from pyspark.sql import functions as F

from orca_ztbus_python_processor_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)
from orca_ztbus_python_processor_spark.sources.parquet import read_table

from tests.conftest import SMOKE_SF_DIR


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    ev = read_table(spark, SMOKE_SF_DIR, "events").select("event_id", "user_id", "value")
    cust = read_table(spark, SMOKE_SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    plain = ev.join(cust, "user_id")
    salted = salted_join(ev, cust, "user_id", n_salts=4)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_left(spark):
    ev = read_table(spark, SMOKE_SF_DIR, "events").select("event_id", "user_id")
    dim = (
        read_table(spark, SMOKE_SF_DIR, "customer")
        .where(F.col("c_custkey") < 50)
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    plain = ev.join(dim, "user_id", "left")
    salted = salted_join(ev, dim, "user_id", n_salts=4, how="left")
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_count_distinct_exact(spark):
    ev = read_table(spark, SMOKE_SF_DIR, "events")
    exact = {
        (r["event_type"],): r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    salted = {
        (r["event_type"],): r["n_distinct"]
        for r in salted_count_distinct(ev, ["event_type"], "user_id").collect()
    }
    assert salted == exact
