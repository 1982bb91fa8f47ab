"""Correctness + soundness gates for the 2-pass heavy-hitters exact
top-k (operators/freqsketch.py): exactness against a naive global
count on skewed synthetic data where the candidate pass actually
truncates, and the LOUD-failure contract on unsound parameters (flat
distribution + tiny capacity must raise, never return a wrong top-k).
"""

from __future__ import annotations

import numpy as np
import pytest

from orca_ztbus_python_processor_spark.operators.freqsketch import (
    heavy_hitters_topk,
)

K = 20


def _zipf_items(spark, n_distinct=3000, n_rows=60_000):
    """Deterministic Zipf-ish stream: item i appears ~n/(i+1) times —
    heavily skewed, dictionary far larger than the candidate capacity
    used in the test."""
    rng = np.random.RandomState(5)
    ranks = rng.zipf(1.3, size=n_rows) % n_distinct
    rows = [(f"tok{int(r):05d}",) for r in ranks]
    return spark.createDataFrame(rows, "item string").repartition(8)


def test_exact_topk_matches_naive_on_skewed_data(spark):
    from pyspark.sql import functions as F

    items = _zipf_items(spark).localCheckpoint(eager=False)
    got = [
        (r["item"], r["n"])
        for r in heavy_hitters_topk(items, "item", k=K, capacity=256).collect()
    ]
    naive = [
        (r["item"], r["n"])
        for r in items.groupBy("item")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("item"))
        .limit(K)
        .collect()
    ]
    assert got == naive


def test_unsound_capacity_raises_not_wrong_answer(spark):
    """Near-uniform distribution with a capacity far below the
    dictionary: the k-th count cannot clear n/capacity, so the
    operator must refuse."""
    rows = [(f"u{i % 4000:05d}",) for i in range(40_000)]  # all counts = 10
    items = spark.createDataFrame(rows, "item string").repartition(8)
    with pytest.raises(ValueError, match="unsound"):
        heavy_hitters_topk(items, "item", k=K, capacity=K)


def test_small_dictionary_is_trivially_exact(spark):
    from pyspark.sql import functions as F

    rows = [(f"w{i % 7}",) for i in range(1000)]
    items = spark.createDataFrame(rows, "item string").repartition(4)
    got = heavy_hitters_topk(items, "item", k=50, capacity=4096).collect()
    assert len(got) == 7
    assert sum(r["n"] for r in got) == 1000


def test_empty_input_returns_empty(spark):
    items = spark.createDataFrame([], "item string")
    assert heavy_hitters_topk(items, "item", k=5, capacity=64).count() == 0


def test_capacity_below_k_rejected(spark):
    """capacity < k would let the candidate union silently hold fewer
    than k items while the dictionary holds more — rejected up front."""
    items = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters_topk(items, "item", k=100, capacity=50)
