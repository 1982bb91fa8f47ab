"""Algorithm registry → fused-plan compiler.

The reference binds named, versioned algorithms to window types with a
decorator (``processor/main.py:342-343,449-450``) and executes them one
gRPC callback at a time, each re-reading its window's rows from
Postgres (SURVEY.md §3 EP2/EP3). This registry keeps the same
surface — ``@proc.algorithm(name, version, window_type)`` — but
*compiles* every algorithm bound to a window type into ONE fused
``groupBy(window(time), *keys).agg(...)`` plan, so N algorithms × M
derived windows cost a single pass over the data instead of N×M
rescans.

Execution model:
  - an algorithm contributes (a) optional ``prepare`` — row-level /
    window-function derived columns (e.g. the accel/jerk lag-diffs);
    a prepare that needs the window bucket partitions by the
    compiler-provided ``_time_from`` column so its shuffle is reused
    by the final aggregation — and (b) a dict of named aggregate
    Columns (StructResult) or a single Column (ValueResult).
  - ``compile_window_type`` applies every prepare once, then fuses all
    aggregates into one agg, output columns named
    ``<algorithm>__<field>``.
  - ``melt_results`` reshapes the wide frame into the reference's
    result-row shape (FIXTURES.md A5: window struct, algorithm,
    version, value, payload).

Scale: one shuffle per window type (on window start + keys), partial
aggregation map-side. Prepares that need ordering (lag) sort within
the (key, window) partition only — at 100 TB that partitioning matches
the storage layout (date-partitioned, key-bucketed), so the sort is
local.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from orca_ztbus_python_processor_spark.plans.windows import WindowType

PrepareFn = Callable[[DataFrame, str, tuple[str, ...]], DataFrame]
AggsFn = Callable[[], "dict[str, Column] | Column"]


@dataclass(frozen=True)
class Algorithm:
    name: str
    version: str
    window_type: WindowType
    aggs: AggsFn
    prepare: PrepareFn | None = None

    @property
    def is_value_result(self) -> bool:
        return not isinstance(self.aggs(), dict)


class Processor:
    """Named algorithm registry (reference ``Processor("analyser")``,
    ``processor/main.py:26``)."""

    def __init__(self, name: str) -> None:
        self.name = name
        self._algorithms: list[Algorithm] = []

    # -- registration ------------------------------------------------------
    def algorithm(
        self,
        name: str,
        version: str,
        window_type: WindowType,
        prepare: PrepareFn | None = None,
    ) -> Callable[[AggsFn], AggsFn]:
        """Decorator mirroring ``@proc.algorithm(...)``
        (reference ``processor/main.py:342,449,474,518,547,577``).

        The decorated fn returns the algorithm's aggregate expressions
        instead of eagerly computing over a pandas frame.
        """

        def deco(fn: AggsFn) -> AggsFn:
            self._algorithms.append(Algorithm(name, version, window_type, fn, prepare))
            return fn

        return deco

    def algorithms_for(self, window_type: WindowType) -> list[Algorithm]:
        return [a for a in self._algorithms if a.window_type.name == window_type.name]

    # -- compilation -------------------------------------------------------
    @staticmethod
    def _duration_us(duration: str) -> int:
        qty, unit = duration.split()
        scale = {
            "second": 1_000_000,
            "seconds": 1_000_000,
            "minute": 60_000_000,
            "minutes": 60_000_000,
            "hour": 3_600_000_000,
            "hours": 3_600_000_000,
        }[unit]
        return int(qty) * scale

    def compile_window_type(
        self,
        df: DataFrame,
        window_type: WindowType,
        time_col: str = "time",
        duration: str = "60 seconds",
    ) -> DataFrame:
        """Fuse every algorithm bound to ``window_type`` into one plan.

        Output: one row per (window, *keys); columns
        ``time_from, time_to, <keys...>, <alg>__<field>...``.

        The tumbling-window bucket is materialized ONCE as ``_time_from``
        (integer floor of epoch-micros — equivalent to
        ``F.window(time_col, duration).start``) and shared between the
        prepare window-functions and the final groupBy. Sharing the
        exact expression lets Catalyst satisfy the aggregation's
        distribution requirement with the prepare's shuffle — one
        Exchange total instead of two, which at 100 TB halves the
        shuffled volume of the fact table.
        """
        algs = self.algorithms_for(window_type)
        if not algs:
            raise ValueError(f"no algorithms registered for {window_type.name}")

        keys = list(window_type.keys)
        dur_us = self._duration_us(duration)
        prepared = df.withColumn(
            "_time_from",
            F.expr(f"timestamp_micros((unix_micros({time_col}) div {dur_us}) * {dur_us})"),
        )
        seen: set[int] = set()
        for a in algs:
            if a.prepare is not None and id(a.prepare) not in seen:
                prepared = a.prepare(prepared, time_col, tuple(keys))
                seen.add(id(a.prepare))

        agg_cols: list[Column] = []
        for a in algs:
            spec = a.aggs()
            if isinstance(spec, dict):
                for field_name, col in spec.items():
                    agg_cols.append(col.alias(f"{a.name}__{field_name}"))
            else:
                agg_cols.append(spec.alias(f"{a.name}__value"))

        return (
            prepared.groupBy("_time_from", *keys)
            .agg(*agg_cols)
            .select(
                F.col("_time_from").alias("time_from"),
                (F.col("_time_from") + F.expr(f"INTERVAL {dur_us} MICROSECONDS")).alias(
                    "time_to"
                ),
                *keys,
                *[c for a in algs for c in self._out_cols(a)],
            )
        )

    @staticmethod
    def _out_cols(a: Algorithm) -> list[Column]:
        spec = a.aggs()
        if isinstance(spec, dict):
            return [F.col(f"{a.name}__{k}") for k in spec]
        return [F.col(f"{a.name}__value")]

    def melt_results(self, fused: DataFrame, window_type: WindowType) -> DataFrame:
        """Wide fused frame → reference result rows (FIXTURES.md A5):
        ``window struct, algorithm, version, value, payload``."""
        algs = self.algorithms_for(window_type)
        keys = list(window_type.keys)
        window_struct = F.struct(
            F.col("time_from"),
            F.col("time_to"),
            F.lit(window_type.name).alias("name"),
            F.lit(window_type.version).alias("version"),
            F.lit(self.name).alias("origin"),
            F.create_map(
                *[x for k in keys for x in (F.lit(k), F.col(k).cast("long"))]
            ).alias("metadata"),
        )

        per_alg = []
        for a in algs:
            spec = a.aggs()
            if isinstance(spec, dict):
                payload = F.create_map(
                    *[
                        x
                        for k in spec
                        for x in (F.lit(k), F.col(f"{a.name}__{k}").cast("double"))
                    ]
                )
                value = F.lit(None).cast("double")
            else:
                payload = F.lit(None).cast("map<string,double>")
                value = F.col(f"{a.name}__value").cast("double")
            per_alg.append(
                F.struct(
                    F.lit(a.name).alias("algorithm"),
                    F.lit(a.version).alias("version"),
                    value.alias("value"),
                    payload.alias("payload"),
                )
            )

        return fused.select(
            window_struct.alias("window"), F.explode(F.array(*per_alg)).alias("r")
        ).select("window", "r.algorithm", "r.version", "r.value", "r.payload")
