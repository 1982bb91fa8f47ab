"""Distributed Lloyd's k-means over an embedding column — the
clustering step of corpus curation (diversity sampling, per-cluster
quota balancing, IVF coarse-quantizer training; the trained-centroid
generalization of the sampled quantizer in ``operators/similarity.py``).

Scale posture (the classic broadcast-Lloyd layout):
  - **Init is deterministic and bounded**: the k lowest-id vectors via
    ``TakeOrderedAndProject`` (k rows to the driver, never a sort of
    the corpus) — reproducible across engines, no RNG.
  - **Assignment is map-side**: centers are k*d literals compiled into
    the plan (k,d are model constants, not data-scale), each row folds
    k squared-distances with JVM higher-order functions
    (``zip_with`` + ``aggregate``) and takes ``array_min`` over
    (distance, cluster) structs — deterministic lowest-id tie-break,
    zero Python, zero shuffle.
  - **Update is a partial agg**: ``posexplode`` of assigned vectors ->
    ``groupBy(cluster, dim).avg`` — map-side combine reduces to
    k*d cells before the exchange, so the shuffle carries O(k*d) per
    map task regardless of corpus size.
  - **Driver traffic per iteration = the k*d centers matrix** (the
    same bounded-scalar contract as ``connected_components``'s
    convergence probe and ``exact_group_quantiles``'s counts matrix).
  - Empty clusters keep their previous center (deterministic, no
    re-seeding RNG).

Iterations are a fixed budget (Lloyd converges fast; a fixed budget is
the reproducible choice for a catalog query — no data-dependent stop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec: Column, center: list[float]) -> Column:
    lit_center = F.array(*[F.lit(float(v)) for v in center])
    return F.aggregate(
        F.zip_with(vec, lit_center, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame, centers: list[list[float]], vec_col: str = "emb"
) -> DataFrame:
    """Map-side nearest-center assignment: adds ``cluster`` (int) and
    ``sq_dist`` (double) columns. Ties break to the lowest cluster id
    via struct ordering."""
    vec = F.col(vec_col)
    best = F.array_min(
        F.array(
            *[
                F.struct(_sq_dist(vec, c).alias("d"), F.lit(j).alias("c"))
                for j, c in enumerate(centers)
            ]
        )
    )
    return df.withColumn("_best", best).withColumn(
        "cluster", F.col("_best.c")
    ).withColumn("sq_dist", F.col("_best.d")).drop("_best")


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "emb",
) -> tuple[DataFrame, list[list[float]]]:
    """Fixed-budget Lloyd's k-means; returns (assigned frame, centers).

    The returned frame is ``df`` + (cluster, sq_dist) under the FINAL
    centers; ``centers`` is the k x d python matrix (bounded driver
    state — the trained model)."""
    init_rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    centers = [list(map(float, r[vec_col])) for r in init_rows]
    for _ in range(iters):
        assigned = assign_clusters(df, centers, vec_col)
        cells = (
            assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new_centers = [list(c) for c in centers]  # empty cluster -> keep
        by_cluster: dict[int, dict[int, float]] = {}
        for r in cells:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["m"]
        for j, dims in by_cluster.items():
            new_centers[j] = [dims[i] for i in range(len(dims))]
        centers = new_centers
    return assign_clusters(df, centers, vec_col), centers
