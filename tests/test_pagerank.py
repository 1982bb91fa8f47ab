"""Exact parity of the distributed weighted PageRank
(operators/pagerank.py) against an independent numpy reference with the
identical contract (symmetrized edges, uniform init, fixed budget,
teleport floor) — the rows-only catalog entry
``copurchase_pagerank_topk``'s correctness gate.
"""

from __future__ import annotations

import numpy as np
import pytest

from orca_ztbus_python_processor_spark.operators.pagerank import pagerank

DAMPING, ITERS = 0.85, 5


def _numpy_pagerank(edges, iters=ITERS, d=DAMPING):
    """edges: list of (src, dst, w) with src < dst."""
    nodes = sorted({u for e in edges for u in e[:2]})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for u, v, w in edges:
        W[idx[u], idx[v]] += w
        W[idx[v], idx[u]] += w
    out = W.sum(axis=1)
    P = W / out[:, None]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1 - d) / n + d * (P.T @ r)
    return {u: r[idx[u]] for u in nodes}


def _spark_ranks(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    return {r["node"]: r["rank"] for r in pagerank(df, DAMPING, ITERS).collect()}


def test_pagerank_matches_numpy_on_random_graph(spark):
    rng = np.random.RandomState(13)
    n_nodes, n_edges = 60, 200
    seen = set()
    edges = []
    while len(edges) < n_edges:
        u, v = rng.randint(0, n_nodes, size=2)
        if u == v:
            continue
        u, v = (int(min(u, v)), int(max(u, v)))
        if (u, v) in seen:
            continue
        seen.add((u, v))
        edges.append((u, v, float(rng.randint(1, 5))))
    got = _spark_ranks(spark, edges)
    ref = _numpy_pagerank(edges)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], rel=1e-9)


def test_pagerank_quantized_stays_within_f32_of_reference(spark):
    """The oracle-promotion variant (quantize_f32=True, rank vector
    rounded to f32 at every iteration boundary) must stay within f32
    tolerance of the unquantized numpy fixpoint trajectory — the
    quantization absorbs summation-order drift without materially
    changing ranks (VERDICT r10 #3 materiality check)."""
    rng = np.random.RandomState(29)
    edges = []
    seen = set()
    while len(edges) < 150:
        u, v = rng.randint(0, 50, size=2)
        if u == v:
            continue
        u, v = (int(min(u, v)), int(max(u, v)))
        if (u, v) in seen:
            continue
        seen.add((u, v))
        edges.append((u, v, float(rng.randint(1, 5))))
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, DAMPING, ITERS, quantize_f32=True).collect()
    }
    ref = _numpy_pagerank(edges)
    assert set(got) == set(ref)
    for k in ref:
        # 5 rounds x 0.5-ulp f32 rounding each: comfortably inside 1e-5
        assert got[k] == pytest.approx(ref[k], rel=1e-5)
        # every emitted rank is exactly f32-representable
        assert got[k] == float(np.float32(got[k]))


def test_pagerank_star_center_dominates(spark):
    """A star graph: the hub must outrank every leaf, and ranks sum
    to ~1."""
    edges = [(0, i, 1.0) for i in range(1, 9)]
    got = _spark_ranks(spark, edges)
    assert got[0] == max(got.values())
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_weight_sensitivity(spark):
    """Heavier edges pull rank: in a path a-b-c with w(ab) >> w(bc),
    a outranks c."""
    got = _spark_ranks(spark, [(1, 2, 10.0), (2, 3, 1.0)])
    assert got[1] > got[3]


def test_pagerank_ignores_self_loops(spark):
    """ADVICE r6: a self-loop edge would be double-counted by the
    symmetrization, skewing out-weights; it must be dropped, leaving
    ranks identical to the loop-free graph."""
    base = [(0, 1, 2.0), (1, 2, 1.0), (0, 2, 3.0)]
    clean = _spark_ranks(spark, base)
    loopy = _spark_ranks(spark, base + [(1, 1, 5.0), (2, 2, 0.5)])
    assert set(clean) == set(loopy)
    for k in clean:
        assert loopy[k] == pytest.approx(clean[k], rel=1e-12)


def test_pagerank_self_loop_only_nodes_leave_the_graph(spark):
    """Contract (documented in operators/pagerank.py): a node whose
    ONLY edges are self-loops is excluded entirely — no rank row, no
    teleport share — and the remaining graph's ranks equal the graph
    without that node."""
    base = [(0, 1, 2.0), (1, 2, 1.0)]
    clean = _spark_ranks(spark, base)
    with_isolate = _spark_ranks(spark, base + [(9, 9, 4.0)])
    assert 9 not in with_isolate
    assert set(with_isolate) == set(clean)
    for k in clean:
        assert with_isolate[k] == pytest.approx(clean[k], rel=1e-12)
