"""Skew mitigation (SURVEY.md §4 partitioning/shuffle row; the driver's
"skewed keys -> salting or AQE" directive).

AQE's skew-join splitting already handles most skewed SORT-MERGE joins
at runtime. The two cases it cannot fix, provided here:

  - a skewed key on the BUILD side of a planned join where the runtime
    split never triggers (e.g. the skew is in a broadcast-ineligible
    dimension): ``salted_join`` pre-splits each hot key into
    ``n_salts`` sub-keys and replicates the small side to match — the
    hot partition becomes n_salts average ones, deterministically.
  - COUNT(DISTINCT x) GROUP BY k with a hot k: the distinct shuffle
    sends every (k, x) to one reducer per k. ``salted_count_distinct``
    two-phases it: phase 1 counts distincts inside (k, hash(x) % n)
    sub-groups (each value lands in exactly one sub-group, so the
    counts are disjoint), phase 2 sums — the hot key's work is spread
    over n reducers with no approximation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys pre-split ``n_salts`` ways.

    The big side gets a deterministic per-row salt (hash of the whole
    row), the small side is replicated once per salt value, and the join
    key becomes (keys..., salt). Output equals ``big.join(small, on,
    how)`` exactly for the supported join types; the cost is
    |small| * n_salts build rows — cheap when small is dimension-sized,
    which is exactly the skewed-fact x dimension shape this exists for.

    Only big-side-preserving joins are supported (inner/left/semi/anti):
    a right or full outer join would emit every UNMATCHED small-side row
    once per salt replica, so the replication trick changes the result.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi",
               "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "outer joins would duplicate unmatched replicated small-side rows"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn(_SALT, salt)
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return big_s.join(small_s, [*keys, _SALT], how).drop(_SALT)


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) GROUP BY keys, skew-proofed.

    Each distinct value belongs to exactly one (keys, hash(value) % n)
    sub-group, so summing the sub-group distinct counts is exact — no
    sketch, no approximation — while the per-key reducer work drops by
    n_salts.
    """
    salt: Column = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    return (
        df.groupBy(*keys, salt.alias(_SALT))
        .agg(F.count_distinct(F.col(value_col)).alias("_partial"))
        .groupBy(*keys)
        .agg(F.sum("_partial").alias(out_col))
    )
