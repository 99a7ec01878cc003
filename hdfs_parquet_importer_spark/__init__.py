"""PySpark-native analytics engine with the capabilities of
nwrs/hdfs-parquet-importer, rebuilt Spark-first.

The reference (/root/reference, Scala/Spark 2.3.2) is a CSV->Parquet ETL
pipeline (read, schema-apply, cleanse, date-enrich, sort, repartition,
partitioned write; see SURVEY.md §2.1 O1-O10). This package re-expresses
that surface with the modern PySpark DataFrame API plus a relational
operator library and large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns), all
designed for multi-executor execution: no unbounded collect(), native
Catalyst expressions over Python UDFs, broadcast hints for dimension
joins, and partition-aware writes.
"""

from hdfs_parquet_importer_spark.session import build_session
from hdfs_parquet_importer_spark.schema import parse_schema_file, parse_schema_text
from hdfs_parquet_importer_spark.tables import load_tables, register_views

__all__ = [
    "build_session",
    "parse_schema_file",
    "parse_schema_text",
    "load_tables",
    "register_views",
]

__version__ = "0.1.0"
