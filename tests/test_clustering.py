"""Exact parity of the distributed Lloyd's k-means (operators/
clustering.py) against an independent double-precision numpy reference
on the fixture corpus — the rows-only catalog entry
``kmeans_embedding_profile``'s correctness gate (iterative, not
SQL-expressible; SURVEY §5 strategy for non-oracle operators).
"""

from __future__ import annotations

import numpy as np
import pytest

from orca_ztbus_python_processor_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
)
from orca_ztbus_python_processor_spark.sources.parquet import read_table

from tests.conftest import SMOKE_SF_DIR

K, ITERS = 8, 5


def _ref_d2(X: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """SAME expanded |x|^2 - 2xC^T + |c|^2 form (clamped at 0) as
    operators.clustering._dist_matrix: the pinned contract is exact
    equality with the implementation's arithmetic, not equality with a
    differently-rounded direct (x-c)^2 sum that could flip argmin on
    near-tied centers."""
    d2 = (
        (X * X).sum(axis=1)[:, None]
        - 2.0 * (X @ centers.T)
        + (centers * centers).sum(axis=1)[None, :]
    )
    return np.maximum(d2, 0.0)


def _numpy_kmeans(ids: np.ndarray, X: np.ndarray, k: int, iters: int):
    """Independent reference: identical contract (lowest-id init,
    lowest-cluster tie-break, empty cluster keeps its center)."""
    order = np.argsort(ids, kind="stable")
    centers = X[order[:k]].astype(np.float64).copy()
    for _ in range(iters):
        assign = _ref_d2(X, centers).argmin(axis=1)  # FIRST min: lowest id
        for j in range(k):
            mask = assign == j
            if mask.any():
                centers[j] = X[mask].mean(axis=0)
    return _ref_d2(X, centers).argmin(axis=1), centers


@pytest.fixture(scope="module")
def emb(spark):
    from pyspark.sql import functions as F

    df = read_table(spark, SMOKE_SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    pdf = df.toPandas()
    return df, pdf["vec_id"].to_numpy(), np.vstack(pdf["emb"].to_numpy())


def test_kmeans_matches_numpy_reference(spark, emb):
    df, ids, X = emb
    assigned, centers = kmeans_fit(df, k=K, iters=ITERS)
    got = {r["vec_id"]: r["cluster"] for r in assigned.select("vec_id", "cluster").collect()}
    ref_assign, ref_centers = _numpy_kmeans(ids, X, K, ITERS)
    mismatches = [i for i, vid in enumerate(ids) if got[vid] != ref_assign[i]]
    assert not mismatches, f"{len(mismatches)} assignment mismatches, e.g. ids {mismatches[:5]}"
    np.testing.assert_allclose(np.array(centers), ref_centers, rtol=1e-9, atol=1e-12)


def test_assignment_tie_breaks_to_lowest_cluster(spark):
    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, emb array<double>")
    # two identical centers: the tie must resolve to cluster 0
    out = assign_clusters(df, [[0.0, 0.0], [0.0, 0.0], [9.0, 9.0]]).collect()[0]
    assert out["cluster"] == 0
    assert out["sq_dist"] == 1.0


def test_empty_cluster_keeps_its_center(spark):
    # k=3 over 3 points where one init center is immediately orphaned:
    # points 1 and 2 are coincident, so center 1 (init = point 1) and
    # center 2 (init = point 2) collapse onto the same location after
    # one update; the run must still return 3 centers, none NaN.
    rows = [(0, [0.0, 0.0]), (1, [5.0, 5.0]), (2, [5.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    assigned, centers = kmeans_fit(df, k=3, iters=2)
    assert len(centers) == 3
    assert not any(np.isnan(c).any() for c in np.array(centers))
    sizes = {r["cluster"]: r["n"] for r in assigned.groupBy("cluster").count().withColumnRenamed("count", "n").collect()}
    assert sum(sizes.values()) == 3


def test_kmeans_plan_is_arrow_vectorized(spark, emb):
    """Assignment is the sanctioned Arrow escape hatch (UD5): ONE
    MapInPandas stage (vectorized numpy matmul per batch), never a
    row-at-a-time Python UDF, never a cross join against the centers."""
    df, _, _ = emb
    assigned, _ = kmeans_fit(df, k=K, iters=1)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_kmeans_quantized_matches_numpy_reference(spark, emb):
    """The oracle-promotion variant (quantize_f32=True): distances
    round to f32 before each argmin and centers round to f32 at each
    round boundary. Parity against an independent numpy replication of
    the SAME quantized trajectory — and a materiality check that the
    final assignment stays close to the unquantized one."""
    df, ids, X = emb
    assigned, centers = kmeans_fit(df, k=K, iters=ITERS, quantize_f32=True)
    got = {
        r["vec_id"]: (r["cluster"], r["sq_dist"])
        for r in assigned.select("vec_id", "cluster", "sq_dist").collect()
    }

    order = np.argsort(ids, kind="stable")
    C = X[order[:K]].astype(np.float64).copy()
    for _ in range(ITERS):
        a = _ref_d2(X, C).astype(np.float32).argmin(axis=1)
        for j in range(K):
            m = a == j
            if m.any():
                C[j] = (X[m].sum(axis=0) / m.sum()).astype(
                    np.float32
                ).astype(np.float64)
    d2 = _ref_d2(X, C).astype(np.float32).astype(np.float64)
    ref_a = d2.argmin(axis=1)
    ref_sq = d2[np.arange(len(ref_a)), ref_a]

    for i, vid in enumerate(ids):
        assert got[vid][0] == ref_a[i]
        assert got[vid][1] == ref_sq[i]  # bit-exact: both f32-quantized
    np.testing.assert_array_equal(np.array(centers), C)
    # materiality: quantization must not meaningfully re-cluster
    unq_assigned, _ = kmeans_fit(df, k=K, iters=ITERS)
    unq = {
        r["vec_id"]: r["cluster"]
        for r in unq_assigned.select("vec_id", "cluster").collect()
    }
    n_moved = sum(1 for vid in unq if unq[vid] != got[vid][0])
    assert n_moved <= max(2, len(unq) // 100), n_moved


def test_kmeans_final_inertia_golden(spark, emb):
    """Deterministic-output pin (VERDICT r5 item 7): the fixed-seed
    contract (lowest-id init, 5 Lloyd iterations, first-min tie-break)
    makes the final inertia on the seeded fixture a single number; any
    numeric drift in the assignment/update path fails loudly here even
    if the numpy parity test's tolerances were ever loosened."""
    from pyspark.sql import functions as F

    df, _, _ = emb
    assigned, _ = kmeans_fit(df, k=K, iters=ITERS)
    inertia = assigned.agg(F.sum("sq_dist")).collect()[0][0]
    assert inertia == pytest.approx(464.6290203830815, rel=1e-9)
