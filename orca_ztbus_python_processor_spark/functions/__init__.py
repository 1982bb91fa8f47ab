from orca_ztbus_python_processor_spark.functions.stats import (
    column_stats,
    f32,
    guarded_div,
)

__all__ = ["column_stats", "f32", "guarded_div"]
