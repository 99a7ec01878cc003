"""Testdata table loading (TESTDATA.md star schema).

Parquet scans get vectorized reads, predicate pushdown and column
pruning from Spark for free — queries should filter/select early so
Catalyst pushes them into the scan (check ``PushedFilters`` /
``ReadSchema`` in ``.explain``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor:
# bounded by the world (5 regions, 25 nations), they never grow with
# sf. Joins against these may use an explicit F.broadcast hint.
#
# customer/supplier/part deliberately EXCLUDED: they grow linearly
# with sf, so a forced broadcast that is fine at sf0.1 OOMs executors
# at 100x. Joins against them stay unhinted — AQE converts them to
# broadcast joins at runtime whenever the post-filter size is under
# spark.sql.autoBroadcastJoinThreshold, and falls back to a shuffle
# join (with skew splitting) when it isn't. That decision must stay
# with the runtime, not the query author.
BROADCAST_TABLES = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # The DuckDB oracle reads parquet timestamps as naive wall-clock
    # values; a session in any other zone would shift every formatted
    # timestamp string. Runtime-settable, so this also protects when
    # queries run under the DRIVER's own session (which doesn't go
    # through our session factory).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts has shipped as two physical layouts across
        # testdata generations: parquet TIMESTAMP(NANOS) — which
        # Spark rejects (PARQUET_TYPE_ILLEGAL) unless read as long —
        # and plain timestamp[us]. Adapt to whichever is on disk so a
        # regenerated dataset never breaks every event query at once.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type in ("long", "bigint"):
            # Nanos read as long: truncate to micros, Spark's native
            # precision. Integer division: ns values (~1.7e18)
            # overflow double's 53 bits, so `div`, never `/`.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Align with the instant-typed TIMESTAMP the rest of the
            # code expects; wall-clock identical under the UTC session
            # zone pinned above.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table lazily (no jobs run until an action)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for spark.sql use."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
