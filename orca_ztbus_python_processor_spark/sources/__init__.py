from orca_ztbus_python_processor_spark.sources.parquet import load_tables, register_views

__all__ = ["load_tables", "register_views"]
