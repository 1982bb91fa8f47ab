"""Distributed EXACT quantiles without a per-group single-reducer
buffer (SURVEY.md §2 A7/A8 at corpus grain).

``F.percentile`` / ``F.median`` are exact but their aggregation buffer
gathers every value of a group onto one task — the right trade at
per-key grain (groups of ~60 rows), a scale wall at corpus grain
(3 groups x 10^11 rows at 100 TB; measured 15x wall at 10x data on the
sf1 fixture). ``approx_percentile`` is the sketch path when error is
acceptable; this module is the EXACT corpus-grain path, the classic
two-pass distributed order statistic:

  1. range-repartition (group, value) and pin the layout
     (lazy ``localCheckpoint``, the same device ``connected_components``
     uses) so partition ids are stable across passes;
  2. count rows per (partition, group) — a scalar-sized driver
     exchange (n_partitions x n_groups), from which the driver computes
     each target rank's (partition, local_rank) address;
  3. one hash-partitioned window by (partition, group) assigns local
     ranks — each window cell is bounded by PARTITION size, never group
     size — and a broadcast join picks the addressed rows;
  4. linear interpolation between the two bracketing ranks, exactly
     pandas/DuckDB ``quantile_cont`` semantics: v_lo + frac*(v_hi-v_lo)
     at rank q*(n-1).

Every stage is bounded by partition size or by the scalar counts
matrix; nothing anywhere holds a whole group.
"""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_ztbus_python_processor_spark.functions.stats import f32


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact per-group quantiles (plus ``n``), distributed.

    Output: one row per group — ``<group_col>, n, p<q*100>...`` with
    float32-cast quantile values (hash-stable across engines). NULL
    values are excluded, matching SQL ``quantile_cont`` /
    ``F.percentile``. Group column may be any atomic type (its DDL
    type is propagated into the driver-built target/total frames).
    """
    spark = df.sparkSession
    g_type = df.schema[group_col].dataType.simpleString()
    src = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).cast("double").alias("v"))
        .where(F.col("v").isNotNull())
    )
    nparts = max(spark.sparkContext.defaultParallelism, 2)
    s = src.repartitionByRange(nparts, "g", "v").localCheckpoint(eager=False)
    s = s.withColumn("pid", F.spark_partition_id())

    # Pass 1: per-(partition, group) counts — n_partitions x n_groups
    # scalars, the only driver traffic in the operator.
    cells = s.groupBy("pid", "g").count().collect()
    per_g: dict = defaultdict(list)
    for r in cells:
        per_g[r["g"]].append((r["pid"], r["count"]))

    targets, totals = [], []
    for g, gcells in per_g.items():
        gcells.sort()  # pid order == ascending (g, v) range order
        n = sum(c for _, c in gcells)
        totals.append((g, n))
        offs, off = [], 0
        for pid, c in gcells:
            offs.append((pid, off, c))
            off += c
        for q in qs:
            r = q * (n - 1)
            lo, hi = math.floor(r), math.ceil(r)
            frac = r - lo
            picks = [(lo, 1.0 - frac)] + ([(hi, frac)] if hi != lo else [])
            for rank, wgt in picks:
                for pid, start, c in offs:
                    if start <= rank < start + c:
                        targets.append((pid, g, rank - start, float(q), wgt))
                        break

    tdf = F.broadcast(
        spark.createDataFrame(
            targets, f"pid int, g {g_type}, lr long, q double, w double"
        )
    )
    ndf = F.broadcast(spark.createDataFrame(totals, f"g {g_type}, n long"))

    # Pass 2: local rank within each (partition, group) cell — the
    # window cell is bounded by partition size, not group size — then
    # pick the addressed rows and interpolate.
    lr = F.row_number().over(W.partitionBy("pid", "g").orderBy("v")) - 1
    picked = s.withColumn("lr", lr.cast("long")).join(tdf, ["pid", "g", "lr"])
    agg = [
        f32(F.sum(F.when(F.col("q") == qv, F.col("w") * F.col("v")))).alias(
            f"p{int(round(qv * 100))}"
        )
        for qv in qs
    ]
    return (
        picked.groupBy("g")
        .agg(*agg)
        .join(ndf, "g")
        .select(F.col("g").alias(group_col), "n", *[f"p{int(round(q * 100))}" for q in qs])
    )


def exact_weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """Exact WEIGHTED quantiles, distributed — the weighted dual of
    ``exact_group_quantiles``: quantile q is the smallest value whose
    cumulative weight reaches ``q * total_weight`` (the lower weighted
    quantile — the definition both engines can state identically, so
    results hash-match; with integer-valued weights every cumulative
    sum is exact in doubles regardless of summation order).

    Same addressing scheme as the unweighted form: range-repartition on
    the value, per-partition WEIGHT sums to the driver (n_partitions
    scalars), broadcast prefix offsets, one pid-partitioned window for
    the local cumulative weight (RANGE frame — tied values share their
    cumulative weight in both engines, which cannot change the min-v
    selection). Targets enter as a broadcast ~|qs|-row frame; the
    selection is a map-side partial min per target.

    Output: ``q (double), wq (float32 value), total_weight (double)``.
    """
    spark = df.sparkSession
    src = (
        df.select(
            F.col(value_col).cast("double").alias("v"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .where(F.col("v").isNotNull() & F.col("w").isNotNull() & (F.col("w") > 0))
    )
    nparts = max(spark.sparkContext.defaultParallelism, 2)
    s = src.repartitionByRange(nparts, "v").localCheckpoint(eager=False)
    s = s.withColumn("pid", F.spark_partition_id())

    part_stats = s.groupBy("pid").agg(
        F.sum("w").alias("sw"),
        F.count("*").alias("n"),
        F.max(F.abs(F.col("w") - F.round(F.col("w")))).alias("frac"),
    ).collect()
    cells = sorted((r["pid"], r["sw"]) for r in part_stats)
    n_rows = int(sum(r["n"] for r in part_stats))
    integral_w = all(float(r["frac"] or 0.0) == 0.0 for r in part_stats)
    total_w = float(sum(c for _, c in cells))
    offs, off = [], 0.0
    for pid, c in cells:
        offs.append((pid, off))
        off += float(c)
    odf = F.broadcast(
        spark.createDataFrame(offs or [(0, 0.0)], "pid int, off double")
    )
    # Address each target to the FIRST partition whose cumulative
    # weight reaches it (the driver already holds the prefix sums):
    # the min-v row for a target always lives in that partition, so the
    # selection join probes ~|qs| partitions instead of cross-joining
    # every row against every target.
    targets = []
    w_of = dict(cells)
    for q in qs:
        t = float(q) * total_w
        # Fall back to the LAST partition when float rounding with
        # non-integer weights leaves every prefix sum just short of
        # the target (ADVICE r6): the max-cumulative-weight partition
        # still holds the answer row, so the quantile cannot silently
        # vanish from the output.
        holder = offs[-1][0] if offs else 0
        for pid, start in offs:
            if start + float(w_of.get(pid, 0.0)) >= t:
                holder = pid
                break
        targets.append((holder, float(q), t))
    tdf = F.broadcast(
        spark.createDataFrame(targets or [(0, 0.0, 0.0)], "pid int, q double, target double")
    )
    cw_local = F.sum("w").over(W.partitionBy("pid").orderBy("v"))
    cw = s.join(odf, "pid").withColumn("cw", F.col("off") + cw_local)
    # Selection tolerance (ADVICE r6, second half): with fractional
    # weights the window-accumulated cw can round a few ulps below a
    # target computed from differently-ordered driver sums, and an
    # exact `cw >= target` would then drop the quantile row entirely.
    # ADVICE r7 refinement: a FLAT 1e-9 fraction of total weight can
    # exceed a legitimate weight gap once total_w is large, selecting
    # the preceding value. So: integer-valued weights (cumulative sums
    # exact in doubles up to 2^53) get eps = 0 — exact selection; and
    # fractional weights get an epsilon scaled to the worst-case
    # ACCUMULATED summation error, n_rows additions each off by at
    # most one ulp of the running total (<= ulp(total_w)). ADVICE r8:
    # the target side (q * total_w, where total_w comes from driver
    # partial sums added in a different order) carries its own
    # comparable accumulation error, so cover BOTH sides of the
    # comparison with 2x — still orders of magnitude below any
    # legitimate weight gap.
    eps = 0.0 if integral_w else 2.0 * n_rows * math.ulp(max(total_w, 1.0))
    return (
        cw.join(tdf, "pid")
        .where(F.col("cw") >= F.col("target") - F.lit(eps))
        .groupBy("q")
        .agg(
            f32(F.min("v")).alias("wq"),
            F.first(F.lit(total_w)).alias("total_weight"),
        )
    )
