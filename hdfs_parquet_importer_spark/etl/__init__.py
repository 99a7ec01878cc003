"""Reference-parity ETL core (SURVEY.md §2.1 O1-O10).

Composable, individually-testable stages of the reference's single
pipeline: CSV scan -> [cleanse] -> [date-enrich] -> [sort] ->
[repartition] -> parquet write (reference package.scala:108-164).
"""

from hdfs_parquet_importer_spark.etl.csv_source import read_csv
from hdfs_parquet_importer_spark.etl.cleanse import (
    cleanse_suspect_rows,
    cleanse_suspect_rows_not_in,
)
from hdfs_parquet_importer_spark.etl.enrich import date_enrich
from hdfs_parquet_importer_spark.etl.arrays import parse_array_col
from hdfs_parquet_importer_spark.etl.pipeline import PipelineOptions, run_pipeline

__all__ = [
    "read_csv",
    "cleanse_suspect_rows",
    "cleanse_suspect_rows_not_in",
    "date_enrich",
    "parse_array_col",
    "PipelineOptions",
    "run_pipeline",
]
