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
) -> DataFrame:
    """Weighted PageRank over an UNDIRECTED graph given as one row per
    edge ``src, dst, weight`` with ``src < dst`` (symmetrized here).

    Returns ``node, rank`` (double), one row per node appearing in any
    edge. Ranks sum to ~1 over non-isolated nodes.
    """
    sym = (
        edges.select("src", "dst", "weight")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                "weight",
            )
        )
        .localCheckpoint(eager=False)
    )
    out_w = sym.groupBy("src").agg(F.sum("weight").alias("out_w"))
    # transition weight src->dst, pinned once for all iterations
    trans = (
        sym.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("p"))
        .localCheckpoint(eager=False)
    )
    nodes = sym.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=False
    )
    n = nodes.count()
    base = (1.0 - damping) / n

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            trans.join(ranks, trans.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
