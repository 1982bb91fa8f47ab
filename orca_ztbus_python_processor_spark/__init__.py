"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference stream processor
(orc-analytics/Orca-ztbus-python-processor).

The reference delegates storage + relational execution to Postgres and
does per-window pandas aggregation (reference ``processor/main.py``).
This engine is Spark-first: logical plans are declared with the
DataFrame/SQL API and Catalyst/Tungsten pick the physical strategy;
Structured Streaming replaces the gRPC window-event plumbing.

Layout:
  session     - tuned SparkSession factory
  schemas     - explicit StructType constants (never inferSchema)
  sources/    - batch parquet catalog + streaming sources
  functions/  - scalar/aggregate column-expression builders
  operators/  - composite operators (sessionize, dedup, similarity, ...)
  plans/      - window-type + algorithm registry -> fused agg plans
  streaming/  - simulator, windowed streaming pipelines
  workloads/  - named query catalog consumed by __spark_entry__ / bench
"""

from orca_ztbus_python_processor_spark.session import get_spark
from orca_ztbus_python_processor_spark.sources.parquet import load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]
