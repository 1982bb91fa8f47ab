"""Near-duplicate detection operators for the documents pipeline
(SURVEY.md §2.11 X1/X2): MinHash + LSH banding, SimHash, and exact
n-gram Jaccard verification — all built from Spark SQL primitives
(no Python UDFs; shingling/hashing/banding run inside whole-stage
codegen).

Scale design (the standard 100 TB near-dup layout):
  - shingle/minhash/simhash signatures are computed map-side; only
    (doc_id, signature) tuples shuffle;
  - LSH banding turns the quadratic all-pairs problem into an
    equi-join on (band_index, band_hash) — candidate buckets;
  - exact Jaccard verification re-joins shingle sets only for
    candidate pairs (tiny compared to the corpus);
  - hash-family parameters are deterministic (seeded) so results are
    reproducible across runs/clusters.

All arithmetic stays within int64 under ANSI mode: base hashes are
folded to 31 bits, multipliers below 2^30, so a*h + b < 2^62.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE_P = (1 << 61) - 1
_HASH_BITS = 2147483647  # 2^31 - 1 fold of the base xxhash64


def _hash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 30), rng.randrange(0, 1 << 30))
        for _ in range(num_hashes)
    ]


def shingles(text_col: str, k: int = 5) -> Column:
    """Distinct k-character shingles of a text column (codegen'd)."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> substring({text_col}, i, {k})))"
    )


def shingle_hashes(text_col: str, k: int = 5) -> Column:
    """31-bit hashes of the distinct shingles."""
    return F.expr(
        f"transform(array_distinct(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> substring({text_col}, i, {k}))), s -> pmod(xxhash64(s), {_HASH_BITS}))"
    )


def minhash_signature(
    hashes_col: str, num_hashes: int = 64, seed: int = 42
) -> list[Column]:
    """One min-hash per (a*h + b) mod p family member, as columns."""
    return [
        F.array_min(
            F.expr(f"transform({hashes_col}, h -> pmod({a} * h + {b}, {MERSENNE_P}))")
        ).alias(f"mh_{j}")
        for j, (a, b) in enumerate(_hash_params(num_hashes, seed))
    ]


def minhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """LSH banding: docs whose signatures collide in >=1 band.

    Output: ``id_a, id_b`` (id_a < id_b), distinct.
    """
    rows = num_hashes // bands
    sig = (
        docs.select(id_col, shingle_hashes(text_col, k).alias("_sh"))
        .select(id_col, *minhash_signature("_sh", num_hashes, seed))
    )
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * rows + r}") for r in range(rows)]).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(id_col, *band_cols)
    stacked = banded.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("band_hash"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band_idx", "bb.band_hash")

    a = stacked.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_hash"
    )
    b = stacked.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_hash"
    )
    return (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs.

    Output: ``id_a, id_b, jaccard`` (float32).
    """
    sets = docs.select(F.col(id_col).alias("_id"), shingles(text_col, k).alias("_set"))
    out = (
        pairs.join(sets.withColumnRenamed("_set", "set_a"), pairs.id_a == F.col("_id"))
        .drop("_id")
        .join(sets.withColumnRenamed("_set", "set_b"), pairs.id_b == F.col("_id"))
        .drop("_id")
    )
    inter = F.size(F.array_intersect("set_a", "set_b")).cast("double")
    union = (F.size("set_a") + F.size("set_b")).cast("double") - inter
    return out.select(
        "id_a",
        "id_b",
        F.when(union > 0, inter / union).otherwise(F.lit(0.0)).cast("float").alias("jaccard"),
    )


def minhash_near_dups(
    docs: DataFrame,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates via banding, then
    exact-Jaccard verification at ``threshold``."""
    cands = minhash_candidate_pairs(docs, id_col, text_col, k, num_hashes, bands, seed)
    return jaccard_pairs(docs, cands, id_col, text_col, k).where(
        F.col("jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signature(text_col: str, bits: int = 64) -> Column:
    """64-bit SimHash over whitespace tokens: bit i of the signature is
    the sign of sum(+-1) of token-hash bit i across tokens."""
    tokens = f"array_distinct(split(trim({text_col}), '\\\\s+'))"
    # sum the per-bit contributions into one 64-bit signature; the top
    # bit uses a negative long literal to stay in range
    terms = []
    for i in range(bits):
        weight = (1 << i) if i < 63 else -(1 << 63)
        terms.append(
            f"CASE WHEN aggregate({tokens}, 0L, (acc, t) ->"
            f" acc + CASE WHEN (xxhash64(t) >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0"
            f" THEN {weight}L ELSE 0L END"
        )
    return F.expr(" + ".join(terms))


def simhash_near_dups(
    docs: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit signature into 4 x 16-bit
    chunks (a pair within hamming distance 3 must agree on >=1 chunk;
    with ``max_hamming`` 6 this is a recall-oriented candidate filter),
    then verify with exact popcount(xor).

    Output: ``id_a, id_b, hamming``.
    """
    sig = docs.select(F.col(id_col), simhash_signature(text_col).alias("sig"))
    chunks = sig.select(
        id_col,
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk_idx"),
                    F.expr(f"(sig >> {c * 16}) & 65535").alias("chunk"),
                )
                for c in range(4)
            ])
        ).alias("cc"),
    ).select(id_col, "sig", "cc.chunk_idx", "cc.chunk")

    a = chunks.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "chunk_idx", "chunk")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "chunk_idx", "chunk")
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.expr("sig_a ^ sig_b")).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Document fingerprinting (winnowing)
# ---------------------------------------------------------------------------

def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    public algorithm): hash all k-grams, slide a window of ``window``
    consecutive hashes, keep each window's minimum, dedupe. A document
    pair sharing any fingerprint shares a k-gram run — the standard
    containment/plagiarism primitive for LLM-corpus dedup.

    Output: ``<id_col>, fingerprint`` (exploded, distinct per doc).
    Map-only until the final explode; fingerprints are ~1/window of the
    k-gram count, so the shuffled volume is a fraction of the text.
    """
    return (
        docs.select(
            F.col(id_col),
            shingle_hashes(text_col, k).alias("_h"),
        )
        .select(
            id_col,
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, greatest(size(_h) - {window - 1}, 1)),"
                        f" i -> array_min(slice(_h, i, {window})))"
                    )
                )
            ).alias("fingerprint"),
        )
    )
