"""Custom operators Spark lacks natively, built as compositions of
DataFrame primitives (SURVEY.md §2.2 extension rows)."""

from hdfs_parquet_importer_spark.operators.asof import asof_join

__all__ = ["asof_join"]
