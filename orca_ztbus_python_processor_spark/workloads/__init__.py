"""Named query catalog consumed by ``__spark_entry__`` and ``bench.py``.

Each workload module registers queries into a :class:`Catalog`:
a named PySpark callable ``(spark, sf_dir) -> DataFrame`` plus, where
the semantics are ANSI-SQL-expressible, the equivalent DuckDB oracle
SQL the driver uses for the correctness gate.
"""

from orca_ztbus_python_processor_spark.workloads.base import Catalog, merged_catalog

__all__ = ["Catalog", "merged_catalog"]
