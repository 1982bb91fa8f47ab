"""Distributed weighted PageRank (fixed-budget power iteration) — the
iterative-graph operator family beyond connected components: edge
importance -> node centrality, used here for co-purchase item ranking
(and, in an LLM-data pipeline, for citation/link-graph document
weighting of the kind web-corpus curation uses).

Execution shape (the same bounded-driver contract as
``operators/clustering`` / ``operators/pca``):

  - Edges are symmetrized once, out-weights computed per node; both
    are lazily checkpointed so each iteration re-reads a pinned
    layout instead of regrowing lineage.
  - Each iteration is ONE shuffle join (contributions = edge weight /
    source out-weight x source rank) + ONE aggregation by destination;
    ranks re-checkpoint per iteration so the plan stays O(1) deep —
    the pointer-jumping discipline ``connected_components`` uses.
  - Driver traffic per iteration: the node count (a scalar, computed
    once). No rank vector ever collects.
  - Undirected graphs have no dangling nodes (every node has out
    edges), so the teleport term is exactly ``(1-d)/N`` — nodes with
    no in-edges settle at the teleport floor via the left join.

Fixed iteration budget + deterministic inputs = reproducible output
(numpy parity in tests/test_pagerank.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    broadcast_nodes_limit: int = 2_000_000,
    quantize_f32: bool = False,
) -> DataFrame:
    """Weighted PageRank over an UNDIRECTED graph given as one row per
    edge ``src, dst, weight`` with ``src < dst`` (symmetrized here).

    Returns ``node, rank`` (double), one row per node appearing in any
    edge. Ranks sum to ~1 over non-isolated nodes.

    Join strategy (the CC small-graph-fast-path duality): the rank
    vector is |nodes| rows — tiny next to the edge table — so up to
    ``broadcast_nodes_limit`` nodes each iteration BROADCASTS the
    ranks onto the pinned transition table (map-side join: the edges
    never re-shuffle; the only exchange per iteration carries
    map-combined per-destination partials, ≤ |nodes| rows/partition).
    With the no-self-join edge build in copurchase_pagerank_topk this
    measured 23 s → ~10 s at the sf1 fixture (12M edge rows). Beyond
    the limit (billion-node graphs) it falls back to the shuffle join,
    whose per-iteration cost is one edge-table exchange — the standard
    Pregel bound.

    ``quantize_f32`` rounds the rank vector to f32 at EVERY iteration
    boundary (the promotion trick from the catalog's other float
    boundaries): each round's input becomes representation-stable, so
    summation-order ulp drift between engines cannot COMPOUND across
    rounds and a SQL replay of the unrolled iteration hash-matches.
    The initial 1/n vector and the per-edge transition probabilities
    are exact IEEE divisions of integers, hence never quantized.
    """
    # Self-loops would be emitted twice by the symmetrization below,
    # silently doubling their weight in out_w and the transition table
    # (ADVICE r6); they carry no ranking signal, so drop them rather
    # than trust the src < dst contract. CONTRACT: a node whose ONLY
    # edges are self-loops leaves the graph entirely — it gets no rank
    # row and no share of the teleport mass (isolated vertices are not
    # part of a co-purchase graph; callers wanting them ranked must
    # union them in as dangling nodes explicitly). Pinned in
    # tests/test_pagerank.py.
    edges_ck = (
        edges.select("src", "dst", "weight")
        .where(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=False)
    )
    sym = edges_ck.unionByName(
        edges_ck.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    # out_w doubles as the node list (one row per node — symmetrized
    # graph), so no separate distinct pass.
    out_w = sym.groupBy("src").agg(F.sum("weight").alias("out_w")).localCheckpoint(
        eager=False
    )
    n = out_w.count()
    base = (1.0 - damping) / n
    small = n <= broadcast_nodes_limit

    # transition weight src->dst, pinned once for all iterations; the
    # out-weight side is node-sized, so it broadcasts under the same
    # threshold as the ranks. Pinned via repartition("dst") + persist(),
    # NOT localCheckpoint: LogicalRDD drops outputPartitioning, which
    # re-inserted a full edge-grain Exchange under EVERY iteration's
    # groupBy(dst) — with HashPartitioning(dst) in the cache, each
    # iteration is broadcast-join + in-place aggregation, ZERO
    # exchanges (round-12; the same device copurchase_label_propagation
    # documents for its src-keyed rounds).
    ow = F.broadcast(out_w) if small else out_w
    trans = (
        sym.join(ow, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("p"))
        .repartition("dst")
        .persist()
    )
    ranks = out_w.select(F.col("src").alias("node"), F.lit(1.0 / n).alias("rank"))
    # try/finally (ADVICE r12): an exception mid-trajectory (or in the
    # final eager checkpoint) must not leave the edge-grain cache pinned
    # for the rest of the session — the exact leak the LPA round-8
    # comment warns about.
    try:
        for i in range(iters):
            rank_side = F.broadcast(ranks) if small else ranks
            contrib = (
                trans.join(rank_side, trans.src == rank_side.node)
                .groupBy("dst")
                .agg(F.sum(F.col("p") * F.col("rank")).alias("inflow"))
            )
            # No nodes re-join needed: the graph is symmetrized, so every
            # node has in-edges and appears in contrib with inflow > 0.
            new_rank = F.lit(base) + F.lit(damping) * F.col("inflow")
            if quantize_f32:
                new_rank = new_rank.cast("float").cast("double")
            ranks = contrib.select(
                F.col("dst").alias("node"),
                new_rank.alias("rank"),
            ).localCheckpoint(eager=i == iters - 1)
            # The LAST iteration checkpoints EAGERLY so the edge cache can
            # be released before returning — a CacheManager entry would
            # otherwise pin executor storage for the rest of the session
            # (the LPA round-8 finding); intermediate rounds stay lazy (the
            # next round's broadcast build materializes them).
    finally:
        trans.unpersist()
    return ranks
