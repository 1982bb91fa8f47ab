"""Golden-semantics tests for the as-of join (tie/boundary/no-match
cases the reference's lookback loop encodes — processor/main.py:249-289)
and recall tests for the cell-blocked embedding near-dup."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from orca_ztbus_python_processor_spark.operators.asofjoin import asof_join
from orca_ztbus_python_processor_spark.operators.similarity import (
    embedding_near_dup_pairs,
)
from orca_ztbus_python_processor_spark.sources.parquet import read_table

from tests.conftest import SMOKE_SF_DIR


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_golden(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 1, 2, 3],
                "t": [
                    _ts("2024-01-01 00:00:00"),  # before any right row -> NULL
                    _ts("2024-01-02 00:00:00"),  # exactly at right t -> inclusive
                    _ts("2024-01-02 00:00:01"),  # just after
                    _ts("2024-01-05 00:00:00"),  # after second right row
                    _ts("2024-01-03 00:00:00"),  # key with one right row
                    _ts("2024-01-03 00:00:00"),  # key with NO right rows -> NULL
                ],
                "row": [1, 2, 3, 4, 5, 6],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2],
                "rt": [
                    _ts("2024-01-02 00:00:00"),
                    _ts("2024-01-04 00:00:00"),
                    _ts("2024-01-01 00:00:00"),
                ],
                "payload": [10, 20, 30],
            }
        )
    )
    got = {
        r["row"]: r["payload"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt"
        ).collect()
    }
    assert got == {1: None, 2: 10, 3: 10, 4: 20, 5: 30, 6: None}


def test_asof_join_forward_golden(spark):
    """Forward direction: earliest right row at or AFTER each left time
    (inclusive), mirroring DuckDB ASOF ... ON l.t <= r.t."""
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 1, 2, 3],
                "t": [
                    _ts("2024-01-01 00:00:00"),  # before first right -> 10
                    _ts("2024-01-02 00:00:00"),  # exactly at right t -> inclusive 10
                    _ts("2024-01-02 00:00:01"),  # just after first -> 20
                    _ts("2024-01-05 00:00:00"),  # after last right row -> NULL
                    _ts("2024-01-01 00:00:00"),  # key with one later right row
                    _ts("2024-01-03 00:00:00"),  # key with NO right rows -> NULL
                ],
                "row": [1, 2, 3, 4, 5, 6],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2],
                "rt": [
                    _ts("2024-01-02 00:00:00"),
                    _ts("2024-01-04 00:00:00"),
                    _ts("2024-01-01 06:00:00"),
                ],
                "payload": [10, 20, 30],
            }
        )
    )
    got = {
        r["row"]: r["payload"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            direction="forward",
        ).collect()
    }
    assert got == {1: 10, 2: 10, 3: 20, 4: None, 5: 30, 6: None}


def test_asof_join_matches_oracle_shape(spark):
    """Every left row survives exactly once (left-join cardinality)."""
    ev = read_table(spark, SMOKE_SF_DIR, "events").select("event_id", "ts", "user_id")
    orders = (
        read_table(spark, SMOKE_SF_DIR, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("od"))
        .agg(F.max("o_orderkey").alias("ok"))
    )
    out = asof_join(
        ev, orders, on="user_id", left_time="ts", right_time="od",
        payload_cols=["ok", "od"],
    )
    assert out.count() == ev.count()
    # carried payload is never from the future
    bad = out.where(F.col("od") > F.col("ts")).count()
    assert bad == 0


def test_embedding_near_dup_blocked_recall(spark):
    emb = read_table(spark, SMOKE_SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )

    import numpy as np

    pdf = emb.toPandas()
    mat = np.array(pdf["emb"].tolist())
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    sims = mat @ mat.T
    iu = np.triu_indices(len(ids), k=1)
    truth = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j, s in zip(iu[0], iu[1], sims[iu])
        if s >= 0.3
    }

    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.3).collect()
    }
    assert got <= truth or not truth, "blocked variant must not invent pairs"
    recall = len(got & truth) / len(truth) if truth else 1.0
    assert recall >= 0.6, f"cell-blocked recall too low: {recall:.2f}"


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property: asof_join == pd.merge_asof (backward, inclusive) on a
    randomized fixture with ties, gaps, and keyless rows."""
    import numpy as np

    rng = np.random.default_rng(7)
    n_l, n_r = 300, 60
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_l),
            "t": pd.to_datetime(rng.integers(0, 10_000, n_l), unit="s"),
            "row_id": np.arange(n_l),
        }
    )
    right = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 10, n_r),  # some keys absent from left
                "rt": pd.to_datetime(rng.integers(0, 10_000, n_r), unit="s"),
                "payload": np.arange(n_r),
            }
        )
        .drop_duplicates(subset=["k", "rt"])
        .reset_index(drop=True)
    )

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            left_time="t",
            right_time="rt",
            payload_cols=["payload"],
        )
        .toPandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    expected = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("rt"),
        left_on="t",
        right_on="rt",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("row_id").reset_index(drop=True)
    assert (got["payload"].fillna(-1) == expected["payload"].fillna(-1)).all()


def test_connected_components_golden(spark):
    """Path, clique, singleton-edge and isolated-pair topologies resolve
    to min-id components; pointer jumping must handle a long path (the
    worst diameter case)."""
    from orca_ztbus_python_processor_spark.operators.dedup import (
        connected_components,
    )

    # component A: path 1-2-3-4-5-6-7 (diameter 6)
    # component B: clique {10,11,12}
    # component C: single edge {20, 21}
    edges = [(i, i + 1) for i in range(1, 7)] + [
        (10, 11), (10, 12), (11, 12), (20, 21),
    ]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    want = {(i, 1) for i in range(1, 8)} | {(i, 10) for i in (10, 11, 12)} | {
        (20, 20), (21, 20),
    }
    # default path (small graph -> bounded driver union-find)
    got = {
        (r.node, r.component)
        for r in connected_components(pairs).collect()
    }
    assert got == want
    # distributed min-label loop, forced: must agree with the fast path
    got_loop = {
        (r.node, r.component)
        for r in connected_components(pairs, small_graph_edge_limit=0).collect()
    }
    assert got_loop == want


def test_asof_join_forward_matches_pandas_merge_asof(spark):
    """Property: asof_join(direction="forward") == pd.merge_asof
    (forward, inclusive) on a randomized fixture with ties, gaps, and
    keyless rows."""
    import numpy as np

    rng = np.random.default_rng(11)
    n_l, n_r = 300, 60
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_l),
            "t": pd.to_datetime(rng.integers(0, 10_000, n_l), unit="s"),
            "row_id": np.arange(n_l),
        }
    )
    right = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 10, n_r),
                "rt": pd.to_datetime(rng.integers(0, 10_000, n_r), unit="s"),
                "payload": np.arange(n_r),
            }
        )
        .drop_duplicates(subset=["k", "rt"])
        .reset_index(drop=True)
    )

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            left_time="t",
            right_time="rt",
            payload_cols=["payload"],
            direction="forward",
        )
        .toPandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    expected = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("rt"),
        left_on="t",
        right_on="rt",
        by="k",
        direction="forward",
        allow_exact_matches=True,
    ).sort_values("row_id").reset_index(drop=True)
    assert (got["payload"].fillna(-1) == expected["payload"].fillna(-1)).all()
