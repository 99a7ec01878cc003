"""Sources & sinks beyond the reference's CSV->Parquet pair.

The reference supports exactly one source (CSV, reference
package.scala:110-115,127) and one sink (Parquet, plain or
Hive-partitioned, package.scala:157,161). This package widens the
matrix to what a 100 TB lakehouse pipeline needs — JSONL, ORC,
partitioned layouts with pruned read-back, and bucketed tables for
shuffle-free repeated joins — all through the native DataFrameReader/
Writer so every format gets vectorization, pushdown, and AQE for free.
"""

from hdfs_parquet_importer_spark.sources.io import (  # noqa: F401
    read_jsonl,
    read_orc,
    read_partitioned_parquet,
    write_bucketed_table,
    write_jsonl,
    write_orc,
    write_partitioned_parquet,
)
