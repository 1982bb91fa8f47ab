"""Distributed Lloyd's k-means over an embedding column — the
clustering step of corpus curation (diversity sampling, per-cluster
quota balancing, IVF coarse-quantizer training; the trained-centroid
generalization of the sampled quantizer in ``operators/similarity.py``).

Scale posture (broadcast-Lloyd, Arrow-vectorized):
  - **Init is deterministic and bounded**: the k lowest-id vectors via
    ``TakeOrderedAndProject`` (k rows to the driver, never a sort of
    the corpus) — reproducible across engines, no RNG.
  - **Assignment is Arrow-batched numpy**: centers are a k x d closure
    matrix shipped with the task; each Arrow batch computes all k
    distances as ONE BLAS matmul (``|x|^2 - 2 X C^T + |c|^2``) and
    takes the row argmin — numpy's argmin keeps the FIRST minimum, so
    ties break to the lowest cluster id. This replaced a JVM
    ``zip_with``/``aggregate`` fold: per-element higher-order-function
    lambdas are interpreted (not codegen'd) in Spark, and k x d
    interpreted lambda steps per row per iteration measured ~3.5x
    slower at 10x data than one vectorized matmul per batch
    (9.7 s -> 2.7 s at sf1). Same tradeoff as
    ``operators/similarity.py`` — vectorized Arrow batches are the
    sanctioned UDF escape hatch (SURVEY §2.10 UD5); row-at-a-time
    Python remains banned.
  - **Update is fused into the same pass**: each assignment batch also
    accumulates per-cluster (count, component-sum) partials, so one
    ``mapInPandas`` emits at most k rows per PARTITION (k x (d+1)
    numbers) and the exchange reduces k rows total — no posexplode
    widening, no per-element shuffle.
  - **Driver traffic per iteration = the k*d centers matrix** (the
    same bounded-scalar contract as ``connected_components``'s
    convergence probe and ``exact_group_quantiles``'s counts matrix).
  - Empty clusters keep their previous center (deterministic, no
    re-seeding RNG).

Iterations are a fixed budget (Lloyd converges fast; a fixed budget is
the reproducible choice for a catalog query — no data-dependent stop).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _dist_matrix(X, C):  # noqa: N803 - matrix names
    """All pairwise squared distances, expanded form: one BLAS matmul.

    ``|x - c|^2 = |x|^2 - 2 x.c + |c|^2`` — the vectorized identity.
    Row-wise, so Arrow batch boundaries cannot change any value.

    The expansion can go slightly NEGATIVE under float cancellation
    (x ≈ c), so clamp at 0 — a true distance is non-negative, and the
    clamp keeps inertia sums well-defined. Near-tie caveat: for two
    centers within ~sqrt(eps)·|x| of the same distance, argmin under
    this form may differ from the direct (x-c)^2 sum; the numpy parity
    reference in tests/test_clustering.py therefore uses this SAME
    expanded form, so the pinned contract matches the implementation
    exactly rather than to within an unstated tolerance.
    """
    import numpy as np

    d2 = (
        (X * X).sum(axis=1)[:, None]
        - 2.0 * (X @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    return np.maximum(d2, 0.0)


def assign_clusters(
    df: DataFrame,
    centers: list[list[float]],
    vec_col: str = "emb",
    quantize_f32: bool = False,
) -> DataFrame:
    """Nearest-center assignment: adds ``cluster`` (int) and
    ``sq_dist`` (double) columns. Ties break to the lowest cluster id
    (numpy argmin keeps the first minimum).

    ``quantize_f32`` rounds every squared distance to f32 BEFORE the
    argmin (and emits the quantized value as ``sq_dist``) — the oracle
    promotion trick: BLAS pairwise summation (here) and a sequential
    SQL fold (the DuckDB replay) disagree in the last f64 ulps, and
    the f32 grid absorbs that before it can flip an argmin or leak
    into a downstream hash."""
    import numpy as np

    C = np.array([[float(v) for v in c] for c in centers], dtype=np.float64)
    out_schema = StructType(
        [*df.schema.fields,
         StructField("cluster", IntegerType()),
         StructField("sq_dist", DoubleType())]
    )

    def assign(batches: Iterator) -> Iterator:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            d2 = _dist_matrix(X, C)
            if quantize_f32:
                d2 = d2.astype(np.float32).astype(np.float64)
            a = d2.argmin(axis=1)
            pdf = pdf.copy()
            pdf["cluster"] = a.astype(np.int32)
            pdf["sq_dist"] = d2[np.arange(len(a)), a]
            yield pdf

    return df.mapInPandas(assign, schema=out_schema)


_PARTIAL_SCHEMA = StructType(
    [
        StructField("cluster", IntegerType()),
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
    ]
)


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    quantize_f32: bool = False,
) -> tuple[DataFrame, list[list[float]]]:
    """Fixed-budget Lloyd's k-means; returns (assigned frame, centers).

    The returned frame is ``df`` + (cluster, sq_dist) under the FINAL
    centers; ``centers`` is the k x d python matrix (bounded driver
    state — the trained model).

    ``quantize_f32`` makes the whole trajectory representation-stable
    for a SQL replay (the pagerank promotion trick, round 11): every
    squared distance is rounded to f32 before its argmin, and every
    updated center coordinate is rounded to f32 at the round boundary
    — so cross-engine summation-order ulp drift is absorbed at each
    step instead of compounding through the iteration."""
    import numpy as np
    import pandas as pd

    init_rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    centers = np.array(
        [list(map(float, r[vec_col])) for r in init_rows], dtype=np.float64
    )
    d = centers.shape[1]

    for _ in range(iters):
        C = centers

        def partials(batches: Iterator, C=C) -> Iterator:
            S = np.zeros((len(C), d))
            n = np.zeros(len(C), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                d2 = _dist_matrix(X, C)
                if quantize_f32:
                    d2 = d2.astype(np.float32)
                a = d2.argmin(axis=1)
                np.add.at(S, a, X)
                np.add.at(n, a, 1)
            out = pd.DataFrame(
                {"cluster": np.arange(len(C), dtype=np.int32), "n": n, "s": list(S)}
            )
            yield out[out.n > 0]

        cells = (
            df.select(vec_col)
            .mapInPandas(partials, schema=_PARTIAL_SCHEMA)
            .groupBy("cluster")
            .agg(
                F.sum("n").alias("n"),
                F.array(
                    *[F.sum(F.element_at("s", i + 1)) for i in range(d)]
                ).alias("s"),
            )
            .collect()
        )
        new_centers = centers.copy()  # empty cluster -> keep
        for r in cells:
            c_new = np.array(r["s"], dtype=np.float64) / r["n"]
            if quantize_f32:
                c_new = c_new.astype(np.float32).astype(np.float64)
            new_centers[r["cluster"]] = c_new
        centers = new_centers

    centers_list = [list(map(float, c)) for c in centers]
    return (
        assign_clusters(df, centers_list, vec_col, quantize_f32=quantize_f32),
        centers_list,
    )
