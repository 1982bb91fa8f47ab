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

Round-12 optimization (guide §1.2/§5): ``repartitionByRange`` executes
TWO full evaluations of its child — the RangePartitioner's
reservoir-sampling job scans every child row to draw bounds, then the
shuffle itself evaluates the child again. Every operator here therefore
pins the narrow ``(group, value)`` projection ONCE with a lazy
``localCheckpoint`` before range-partitioning (the sampling job is the
first action, so it is also the job that materializes the blocks): the caller's upstream
(scan + joins + filters) runs exactly once, and both the sampling pass
and the shuffle read the pinned narrow blocks. The price is one extra
materialization of a 2-3-column frame (the same row volume the shuffle
already moves); the win is never paying the upstream subtree twice —
at 100 TB the upstream is a parquet scan + joins, strictly more
expensive than re-reading narrow local blocks.
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
        # pin the narrow projection so the range sampler and the shuffle
        # don't each re-run the caller's upstream (module docstring);
        # lazy: the sampling job itself materializes the blocks
        .localCheckpoint(eager=False)
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


def exact_group_rank_values(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ranks_of_n,
) -> DataFrame:
    """Exact per-group ORDER-STATISTIC values, distributed — the
    explicit-rank sibling of ``exact_group_quantiles`` (no
    interpolation): ``ranks_of_n(n)`` maps a group's non-NULL count to
    ``{label: 1-indexed rank}``; the output carries, per group, the
    value at each labeled rank under the ascending value order. The
    value at a rank of a sorted multiset is deterministic regardless of
    tie order, so no tiebreak column is needed even when values repeat.
    A rank outside [1, n] (or None) yields NULL for that label — the
    same corner semantics as a SQL ``max(CASE WHEN rn = k ...)`` whose
    k exceeds n (conformal's k > n corner).

    Same two-pass addressing scheme and scale posture as
    ``exact_group_quantiles`` (VERDICT r11 #1 — this replaces the
    ``Window.partitionBy(low-cardinality-key)`` full-group sort shape):
    range-repartition (group, value) with a pinned layout, per-cell
    counts to the driver (n_partitions x n_groups scalars), one window
    bounded by PARTITION size for local ranks, broadcast target join.
    Nothing anywhere holds a whole group.

    Output: one row per group — ``<group_col>, n, <label>...`` with
    raw double values (callers cast at their own f32 boundary). Label
    order follows the first group's dict; every group must yield the
    same label set.
    """
    spark = df.sparkSession
    g_type = df.schema[group_col].dataType.simpleString()
    src = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).cast("double").alias("v"))
        .where(F.col("v").isNotNull())
        # pin the narrow projection so the range sampler and the shuffle
        # don't each re-run the caller's upstream (module docstring);
        # lazy: the sampling job itself materializes the blocks
        .localCheckpoint(eager=False)
    )
    nparts = max(spark.sparkContext.defaultParallelism, 2)
    s = src.repartitionByRange(nparts, "g", "v").localCheckpoint(eager=False)
    s = s.withColumn("pid", F.spark_partition_id())

    # Pass 1: per-(partition, group) counts — the only driver traffic.
    cells = s.groupBy("pid", "g").count().collect()
    per_g: dict = defaultdict(list)
    for r in cells:
        per_g[r["g"]].append((r["pid"], r["count"]))

    targets, totals, labels = [], [], None
    for g, gcells in per_g.items():
        gcells.sort()  # pid order == ascending (g, v) range order
        n = sum(c for _, c in gcells)
        totals.append((g, n))
        rmap = ranks_of_n(n)
        if labels is None:
            labels = list(rmap)
        elif list(rmap) != labels:
            raise ValueError(f"inconsistent rank labels: {list(rmap)} vs {labels}")
        for label, rank in rmap.items():
            if rank is None or not (1 <= int(rank) <= n):
                continue  # out-of-range rank -> NULL output for label
            rank0 = int(rank) - 1
            start = 0
            for pid, c in gcells:
                if start <= rank0 < start + c:
                    targets.append((pid, g, rank0 - start, label))
                    break
                start += c

    tdf = F.broadcast(
        spark.createDataFrame(targets, f"pid int, g {g_type}, lr long, lbl string")
    )
    # ndf is the left side of a LEFT join (all groups survive, labels
    # with no in-range rank stay NULL), so the broadcast hint goes on
    # the n_groups-row aggregated right side.
    ndf = spark.createDataFrame(totals, f"g {g_type}, n long")

    # Pass 2: local rank within each (partition, group) cell — bounded
    # by partition size, never group size — then pick the addressed
    # rows (several labels may address one row; the join fans out).
    lr = F.row_number().over(W.partitionBy("pid", "g").orderBy("v")) - 1
    picked = s.withColumn("lr", lr.cast("long")).join(tdf, ["pid", "g", "lr"])
    agg = [
        F.min(F.when(F.col("lbl") == label, F.col("v"))).alias(label)
        for label in (labels or [])
    ]
    return (
        ndf.join(F.broadcast(picked.groupBy("g").agg(*agg)), "g", "left")
        .select(F.col("g").alias(group_col), "n", *(labels or []))
    )


def exact_group_rank_value(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rank_of_n,
    out_col: str = "v_at_rank",
) -> DataFrame:
    """Single-rank convenience wrapper over ``exact_group_rank_values``:
    output ``<group_col>, n, <out_col>``."""
    return exact_group_rank_values(
        df, group_col, value_col, lambda n: {out_col: rank_of_n(n)}
    )


def group_prefix_sum(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "prefix_sum",
) -> DataFrame:
    """EXCLUSIVE per-group running sum of an INTEGER-valued column in
    ``order_col`` order, distributed — the prefix-sum sibling of
    ``exact_group_rank_values`` for corpus-grain cumulative layouts
    (sequence packing, offset assignment) keyed by a low-cardinality
    group: a ``Window.partitionBy(group)`` cumsum funnels each group
    through one task; this range-partitions (group, order), sends
    per-(partition, group) SUMS to the driver (n_partitions x n_groups
    integers — exact, order-independent), broadcasts the prefix
    offsets back, and finishes with one window bounded by PARTITION
    size. Integer sums make every partial exact, so the result is
    bit-identical to the single-task form.

    Output: the input columns plus ``<out_col>`` (long). ``order_col``
    must be unique within each group (a doc/event id), so the layout
    is total and engine-portable.
    """
    spark = df.sparkSession
    g_type = df.schema[group_col].dataType.simpleString()
    nparts = max(spark.sparkContext.defaultParallelism, 2)
    s = (
        # pin the input so the range sampler and the shuffle don't each
        # re-run the caller's upstream (module docstring); lazy: the
        # sampling job itself materializes the blocks
        df.localCheckpoint(eager=False)
        .repartitionByRange(nparts, group_col, order_col)
        .localCheckpoint(eager=False)
        .withColumn("_pid", F.spark_partition_id())
    )

    # Pass 1: per-(partition, group) sums — the only driver traffic.
    cells = s.groupBy("_pid", group_col).agg(
        F.sum(F.col(value_col).cast("long")).alias("_sw")
    ).collect()
    per_g: dict = defaultdict(list)
    for r in cells:
        per_g[r[group_col]].append((r["_pid"], int(r["_sw"] or 0)))
    offs = []
    for g, gcells in per_g.items():
        gcells.sort()  # pid order == ascending (g, order) range order
        off = 0
        for pid, sw in gcells:
            offs.append((pid, g, off))
            off += sw
    odf = F.broadcast(
        spark.createDataFrame(offs, f"_pid int, {group_col} {g_type}, _off long")
    )

    # Pass 2: local exclusive cumsum within each (partition, group)
    # cell — bounded by partition size — plus the broadcast offset.
    w = W.partitionBy("_pid", group_col).orderBy(order_col).rowsBetween(
        W.unboundedPreceding, 0
    )
    local = F.sum(F.col(value_col).cast("long")).over(w) - F.col(value_col)
    return (
        s.join(odf, ["_pid", group_col])
        .withColumn(out_col, F.col("_off") + local)
        .drop("_pid", "_off")
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
        # pin the narrow projection so the range sampler and the shuffle
        # don't each re-run the caller's upstream (module docstring);
        # lazy: the sampling job itself materializes the blocks
        .localCheckpoint(eager=False)
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
