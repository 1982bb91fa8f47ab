"""Approximate nearest-neighbor search over embeddings
(SURVEY.md §2.11 X3, the scale path beside the brute-force baseline in
``workloads/vectors.py``).

Design: IVF (inverted-file) coarse quantization — the standard ANN
layout for cosine search at scale:

  1. train ``nlist`` spherical k-means centroids on a driver-side
     SAMPLE (seeded, deterministic — at 100 TB you train the coarse
     quantizer on a sample regardless of engine);
  2. assign every corpus vector to its nearest centroid (JVM-side:
     centroid matrix enters the plan as array literals; argmax via
     max of (dot, idx) structs) — a map-only pass;
  3. each query probes its ``nprobe`` nearest cells; candidates are
     the union of those inverted lists (equi-join on cell id — the
     brute-force cross join disappears);
  4. exact-cosine re-rank of candidates, top-k.

Recall/cost is tuned by nlist/nprobe. Sign-random-projection LSH was
evaluated and rejected for this corpus: with near-uniform vectors
(top-5 neighbor cosine ~0.32 ⇒ ~71°), the per-bit collision
probability is ~0.6, so any bucket count that prunes meaningfully
also destroys recall — a property of the data, not the
implementation. ``bucket_id`` remains available for strongly
clustered embedding spaces.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_ztbus_python_processor_spark.operators.dedup import _spread


def _dot_literal(emb: Column, plane: list[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in plane])
    return F.aggregate(
        F.zip_with(emb, lit, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )


def bucket_id(emb: Column, dim: int, n_planes: int = 12, seed: int = 42) -> Column:
    """H-bit sign-projection bucket id (for strongly clustered spaces)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).tolist()
    bits = [
        F.when(_dot_literal(emb, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def train_centroids(
    emb_df: DataFrame,
    emb_col: str = "emb",
    nlist: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Spherical k-means on a deterministic sample (driver-side numpy).

    The sample bound keeps driver memory flat regardless of corpus
    size; the quantizer quality depends on the sample, not the corpus.
    The sample is the ``sample_size`` smallest ids (TakeOrdered — one
    scan, no full sort), NOT a bare limit(): limit() keeps whichever
    partitions answer first, so centroids — and every downstream ANN
    result — would vary with file layout and cluster timing.
    """
    sample = np.array(
        [
            r[0]
            for r in emb_df.select(emb_col, id_col)
            .orderBy(id_col)
            .limit(sample_size)
            .collect()
        ],
        dtype=np.float64,
    )
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=nlist, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for j in range(nlist):
            members = sample[assign == j]
            if len(members):
                c = members.sum(axis=0)
                centroids[j] = c / np.maximum(np.linalg.norm(c), 1e-12)
    return centroids.tolist()


def _cell_scores(emb: Column, centroids: list[list[float]]) -> Column:
    """Array of struct(dot, cell_idx) for every centroid."""
    return F.array(
        *[
            F.struct(
                _dot_literal(emb, c).alias("dot"), F.lit(j).alias("cell")
            )
            for j, c in enumerate(centroids)
        ]
    )


def assign_cell(emb: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id (struct max orders by dot, then cell)."""
    return F.array_max(_cell_scores(emb, centroids))["cell"]


def probe_cells(emb: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """The nprobe nearest centroid ids, as an array."""
    sorted_desc = F.reverse(F.array_sort(_cell_scores(emb, centroids)))
    return F.transform(F.slice(sorted_desc, 1, nprobe), lambda s: s["cell"])


def _cells_pandas(
    df: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    id_out: str,
    id_col: str,
    emb_col: str,
) -> DataFrame:
    """(id, emb, cell) rows: each vector under its nprobe nearest cells,
    assigned by one numpy matmul per Arrow batch (the HOF-expression
    form pays interpreted-lambda cost per centroid per row)."""
    import numpy as np
    import pandas as pd

    c = np.asarray(centroids, dtype=np.float64)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf[emb_col].tolist(), dtype=np.float64)
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
            # nprobe nearest cells per vector, nearest first
            order = np.argsort(-(mn @ c.T), axis=1, kind="stable")[:, :nprobe]
            yield pd.DataFrame(
                {
                    id_out: np.repeat(pdf[id_col].to_numpy(), nprobe),
                    emb_col: [e for e in pdf[emb_col] for _ in range(nprobe)],
                    "cell": order.reshape(-1),
                }
            )

    return _spread(df.select(id_col, emb_col)).mapInPandas(
        gen, schema=f"{id_out} long, {emb_col} array<double>, cell int"
    )


def ann_cosine_topk(
    emb_df: DataFrame,
    queries_df: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k cosine neighbors.

    corpus: assigned to its single nearest cell; queries: probe their
    ``nprobe`` nearest cells; candidates = equi-join on cell; re-rank =
    per-query numpy matmul in ``applyInPandas`` (exact cosine over the
    candidate list, top-k with (score desc, id) tie-break — identical
    ordering to the brute-force baseline).

    Output: ``query_id, neighbor_id, score (float32), rank``.
    """
    import numpy as np
    import pandas as pd

    if centroids is None:
        centroids = train_centroids(emb_df, emb_col, nlist=nlist, seed=seed, id_col=id_col)

    corpus = _cells_pandas(emb_df, centroids, 1, "neighbor_id", id_col, emb_col)
    q = _cells_pandas(queries_df, centroids, nprobe, "query_id", id_col, emb_col)
    q = q.withColumnRenamed(emb_col, "qe")

    def topk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop_duplicates(subset=["neighbor_id"])
        qe = np.asarray(pdf["qe"].iloc[0], dtype=np.float64)
        qe = qe / max(np.linalg.norm(qe), 1e-300)
        m = np.array(pdf[emb_col].tolist(), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        score = (m @ qe).astype(np.float32)
        ids = pdf["neighbor_id"].to_numpy()
        order = np.lexsort((ids, -score))[:k]
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "neighbor_id": ids[order],
                "score": score[order],
                "rank": np.arange(1, len(order) + 1, dtype=np.int64),
            }
        )

    return (
        corpus.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id")
        .applyInPandas(
            lambda _, pdf: topk(pdf),
            schema="query_id long, neighbor_id long, score float, rank long",
        )
    )


_PAIR_SCHEMA = "id_a long, id_b long, score float"


def cosine_pairs_bruteforce(
    emb_df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "emb",
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via blocked numpy matmul.

    Per-pair higher-order-function lambdas are interpreted (not
    codegen'd) in Spark, so an n^2 cross join through zip_with/aggregate
    pays ~100x over vectorized math. Instead: broadcast the normalized
    matrix (one copy per executor), then each task computes
    chunk @ matrix.T with numpy — Arrow moves only the input chunk in
    and the surviving pairs out.

    Scale bound: the broadcast matrix must fit an executor (~1 GB per
    2 M x 64-dim float64 shard). Beyond that, shard the corpus and use
    ``embedding_near_dup_pairs`` (cell-blocked — no global broadcast).

    Output: ``id_a, id_b, score`` (float32), id_a < id_b.
    """
    import numpy as np
    import pandas as pd

    spark = emb_df.sparkSession
    pdf = emb_df.select(id_col, emb_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.array(pdf[emb_col].tolist(), dtype=np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    bc = spark.sparkContext.broadcast((ids, mat))

    def chunk_pairs(batches):
        ids_all, m = bc.value
        pos_of = {int(v): p for p, v in enumerate(ids_all)}
        for chunk in batches:
            pos = np.array([pos_of[int(v)] for v in chunk["id_a"]], dtype=np.int64)
            if len(pos) == 0:
                continue
            s = m[pos] @ m.T
            ai, bj = np.nonzero(s >= threshold)
            id_a = ids_all[pos[ai]]
            id_b = ids_all[bj]
            keep = id_a < id_b
            yield pd.DataFrame(
                {
                    "id_a": id_a[keep],
                    "id_b": id_b[keep],
                    "score": s[ai, bj][keep].astype(np.float32),
                }
            )

    src = _spread(emb_df.select(F.col(id_col).alias("id_a")))
    return src.mapInPandas(chunk_pairs, schema=_PAIR_SCHEMA)


def embedding_near_dup_pairs(
    emb_df: DataFrame,
    threshold: float = 0.3,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Cell-blocked embedding near-dup (SURVEY.md §2.11 X1 'embedding-
    cosine near-dup'): SemDeDup-style candidate pruning.

    Every vector is indexed under its ``nprobe`` nearest IVF cells
    (JVM-side probe assignment); each cell's members are gathered by one
    shuffle and verified with an exact within-cell numpy matmul
    (``applyInPandas`` — no global broadcast, so this is the piece that
    scales past the brute-force variant's executor-memory bound).
    Recall misses only pairs whose probe lists are disjoint; parity vs
    brute force is pinned in tests.

    Scale: per-cell cost is quadratic in cell size, so nlist must grow
    with the corpus (cells of ~1-10k vectors keep candidate volume
    linear-ish); a pair found in several shared cells is deduped after
    the threshold filter, when it is already rare.

    Output: ``id_a, id_b, score`` (float32), id_a < id_b.
    """
    import numpy as np
    import pandas as pd

    if centroids is None:
        centroids = train_centroids(emb_df, emb_col, nlist=nlist, seed=seed, id_col=id_col)

    indexed = _cells_pandas(
        emb_df, centroids, nprobe, "id_a", id_col, emb_col
    ).withColumnRenamed(emb_col, "_e")

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id_a"].to_numpy()
        m = np.array(pdf["_e"].tolist(), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        s = m @ m.T
        ai, bj = np.nonzero(s >= threshold)
        id_a, id_b = ids[ai], ids[bj]
        keep = id_a < id_b
        return pd.DataFrame(
            {
                "id_a": id_a[keep],
                "id_b": id_b[keep],
                "score": s[ai, bj][keep].astype(np.float32),
            }
        )

    return (
        indexed.groupBy("cell")
        .applyInPandas(lambda _, pdf: cell_pairs(pdf), schema=_PAIR_SCHEMA)
        .dropDuplicates(["id_a", "id_b"])
    )
