"""Exact distributed top-k frequency via a mergeable heavy-hitters
candidate pass — the FREQUENCY dual of the HLL distinct sketch
(`hll_weekly_rollup`) and the scale-correct form of "top tokens" when
the dictionary itself is too large to aggregate exactly first.

The classic 2-pass heavy-hitters scheme (Misra-Gries guarantee):

  1. **Candidate pass (map-only)**: each PARTITION counts its own
     items (a partition-local dict — bounded by partition size, never
     the global dictionary) and emits only its top-``capacity`` items.
     Pigeonhole guarantee: an item with global frequency > n/capacity
     has partition frequency > n_p/capacity in at least one partition,
     and fewer than ``capacity`` items can exceed that bound there, so
     EVERY global heavy hitter survives into the candidate union.
  2. **Exact recount**: the distinct candidate set (≤ capacity ×
     n_partitions rows) broadcast-semi-joins the item stream; exact
     counts aggregate map-side; TakeOrdered picks the top k.

The result is EXACT top-k (not approximate) whenever the k-th item's
true frequency exceeds n/capacity — and the operator REFUSES (raises)
instead of silently returning a possibly-wrong answer when that
soundness condition fails, so a flat distribution produces a loud
error, never a hash mismatch. Shuffle volume: candidates only; the
full dictionary never aggregates globally.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters_topk(
    items: DataFrame,
    item_col: str,
    k: int = 50,
    capacity: int = 4096,
) -> DataFrame:
    """Exact global top-k of ``items[item_col]`` (ties broken by item
    value ascending), via the 2-pass candidate scheme above.

    Raises ``ValueError`` if the soundness condition (k-th count >
    n_items/capacity) does not hold — raise ``capacity`` in that case.
    ``capacity >= k`` is required up front: with a smaller capacity the
    candidate union can hold fewer than k items while the dictionary
    holds more, which the post-hoc check cannot detect (fewer than k
    result rows then only implies a complete dictionary when no
    partition truncated).
    """
    import pandas as pd  # noqa: PLC0415

    if capacity < k:
        raise ValueError(f"capacity ({capacity}) must be >= k ({k})")

    # Pin the item stream: the source is often expensive to produce
    # (e.g. a regexp-tokenize explode), and three passes read it — the
    # candidate pass, the exact recount, and the soundness-check count
    # (ADVICE r6). One materialization, three cheap re-reads.
    src = (
        items.select(F.col(item_col).alias("item"))
        .where(F.col("item").isNotNull())
        .localCheckpoint(eager=False)
    )

    def partition_top(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c: Counter = Counter()
        for pdf in batches:
            c.update(pdf["item"])
        if c:
            top = c.most_common(capacity)
            yield pd.DataFrame({"item": [t for t, _ in top]})

    candidates = (
        src.mapInPandas(partition_top, schema=f"item {src.schema['item'].dataType.simpleString()}")
        .distinct()
    )
    counted = (
        src.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("item"))
        .limit(k)
    )
    rows = counted.collect()
    n_total = src.count()
    if rows and len(rows) >= k and rows[-1]["n"] * capacity <= n_total:
        raise ValueError(
            f"heavy_hitters_topk unsound: k-th count {rows[-1]['n']} <= "
            f"n/capacity = {n_total}/{capacity}; raise capacity"
        )
    spark = items.sparkSession
    return spark.createDataFrame(
        [(r["item"], r["n"]) for r in rows],
        f"item {src.schema['item'].dataType.simpleString()}, n long",
    )
