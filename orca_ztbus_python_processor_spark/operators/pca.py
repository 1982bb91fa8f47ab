"""Distributed top-principal-component extraction (power iteration)
over an embedding column — the corpus-geometry diagnostic of an
LLM-data pipeline (dominant-direction detection: a high explained-
variance share means the embedding space is collapsing onto one axis —
a known failure mode of noisy corpora / over-deduplicated batches).

This is deliberately NOT a library call: the point is the 100 TB
execution shape, the same bounded-driver-traffic contract as
``operators/clustering.kmeans_fit``:

  - **Mean pass**: one Arrow-batched partial-sum stage — each
    partition emits (count, d-vector sum); the driver reduces
    n_partitions rows.
  - **Power iterations (fixed budget, deterministic init)**: per
    iteration one distributed job; each Arrow batch computes
    ``y += X_cᵀ (X_c v)`` for its rows as TWO BLAS matvecs (never the
    d x d covariance — d² state would be fine at d=64 but the matvec
    form stays linear in d and never materializes C). Partials are
    (d-vector, |xc|² scalar) per partition; driver traffic per
    iteration = n_partitions x (d+2) numbers.
  - **Init is all-ones/√d** — deterministic, no RNG; a fixed vector
    has measure-zero risk of exact orthogonality to the top component,
    and the fixed iteration budget makes the output reproducible
    across engines and runs (same argument as kmeans' lowest-id init).
  - **Sign is canonicalized** (component with the largest |loading|
    made positive, lowest index on ties) — eigenvectors are
    sign-ambiguous; canonicalizing makes the catalog output and the
    numpy parity reference (tests/test_pca.py) comparable verbatim.

Eigenvalue estimate is the Rayleigh quotient vᵀCv = |y|-step norm / n;
total variance (Σ per-dim variance = E|x-μ|²) falls out of the same
partials, so explained-variance share costs nothing extra.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame


def pca_top_component(
    df: DataFrame,
    vec_col: str = "emb",
    iters: int = 8,
    quantize_f32: bool = False,
) -> tuple[list[float], float, float, int]:
    """Power-iterate the top principal component of ``df[vec_col]``.

    Returns ``(loadings, eigenvalue, total_variance, n_rows)`` —
    ``loadings`` is the unit top eigenvector of the covariance matrix
    (sign-canonicalized), ``eigenvalue`` its Rayleigh quotient (the
    variance along it), ``total_variance`` the trace E|x-μ|².

    ``quantize_f32`` makes the trajectory representation-stable for a
    SQL replay (the pagerank/kmeans promotion trick, round 11): the
    mean vector, each round's accumulated ``y``, and each round's
    normalized ``v`` are rounded to f32 — so BLAS-pairwise (numpy) vs
    sequential-fold (DuckDB) summation ulp drift is absorbed at every
    step instead of compounding through the 8 rounds.
    """
    import numpy as np
    import pandas as pd

    src = df.select(vec_col)

    def mean_partials(batches: Iterator) -> Iterator:
        s, n = None, 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            n += len(X)
        if n:
            yield pd.DataFrame({"n": [n], "s": [s]})

    cells = src.mapInPandas(
        mean_partials, schema="n long, s array<double>"
    ).collect()
    n = sum(r["n"] for r in cells)
    if n == 0:
        raise ValueError("pca_top_component: empty input")
    mu = np.sum([np.array(r["s"]) for r in cells], axis=0) / n
    if quantize_f32:
        mu = mu.astype(np.float32).astype(np.float64)
    d = mu.shape[0]

    v = np.ones(d, dtype=np.float64) / np.sqrt(d)
    eigenvalue = 0.0
    total_var = 0.0
    for _ in range(iters):
        V, MU = v, mu

        def iter_partials(batches: Iterator, V=V, MU=MU) -> Iterator:
            y = np.zeros(d, dtype=np.float64)
            tr = 0.0
            got = False
            for pdf in batches:
                if not len(pdf):
                    continue
                got = True
                Xc = np.array(pdf[vec_col].tolist(), dtype=np.float64) - MU
                y += Xc.T @ (Xc @ V)
                tr += float((Xc * Xc).sum())
            if got:
                yield pd.DataFrame({"y": [y], "tr": [tr]})

        parts = src.mapInPandas(
            iter_partials, schema="y array<double>, tr double"
        ).collect()
        y = np.sum([np.array(r["y"]) for r in parts], axis=0)
        if quantize_f32:
            y = y.astype(np.float32).astype(np.float64)
        total_var = sum(r["tr"] for r in parts) / n
        norm = float(np.linalg.norm(y))
        if norm == 0.0:
            break
        eigenvalue = norm / n  # |Cv| with unit v; == Rayleigh at convergence
        v = y / norm
        if quantize_f32:
            v = v.astype(np.float32).astype(np.float64)

    # Sign canon: the largest-|loading| component (lowest index on
    # ties) points positive.
    pivot = int(np.argmax(np.abs(v)))
    if v[pivot] < 0:
        v = -v
    return [float(x) for x in v], float(eigenvalue), float(total_var), int(n)
