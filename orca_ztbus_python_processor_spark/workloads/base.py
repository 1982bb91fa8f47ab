from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


class Catalog:
    """Registry of named queries with optional DuckDB oracle SQL."""

    def __init__(self) -> None:
        self.queries: dict[str, QueryFn] = {}
        self.oracles: dict[str, str] = {}

    def query(self, name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
        def deco(fn: QueryFn) -> QueryFn:
            if name in self.queries:
                raise ValueError(f"duplicate query name: {name}")
            self.queries[name] = fn
            if oracle is not None:
                self.oracles[name] = oracle
            return fn

        return deco


def merged_catalog() -> Catalog:
    """Merge every workload module's catalog into one."""
    from orca_ztbus_python_processor_spark.workloads import (  # noqa: PLC0415
        pipelineops,
        registrations,
        relational,
        streamqueries,
        subqueries,
        textops,
        timeseries,
        tpchplus,
        vectors,
    )

    merged = Catalog()
    for mod in (
        relational,
        subqueries,
        tpchplus,
        timeseries,
        textops,
        vectors,
        registrations,
        streamqueries,
        pipelineops,
    ):
        cat = mod.CATALOG
        for name, fn in cat.queries.items():
            if name in merged.queries:
                raise ValueError(f"duplicate query name across modules: {name}")
            merged.queries[name] = fn
        merged.oracles.update(cat.oracles)
    return merged
