"""SparkSession factory.

Mirrors the reference's session wiring (reference App.scala:17-28):
``--sparkOpt k=v`` passthrough -> ``builder.config(k, v)``;
``--threads n`` -> ``master("local[n]")``; plus
``spark.debug.maxToStringFields=100`` (App.scala:19).

Defaults are chosen for large-scale execution: AQE on (runtime
coalescing + skew-join splitting), UTC session timezone (deterministic
timestamp semantics across engines), Arrow enabled for the few
Pandas-UDF-backed operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_SCALE_DEFAULTS = {
    # AQE re-plans at runtime: coalesces tiny shuffle partitions and
    # splits skewed ones — both essential at 100 TB where static
    # shuffle.partitions can't fit every stage.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic cross-engine timestamp semantics (DuckDB oracle
    # reads parquet timestamps as naive; UTC makes Spark agree).
    "spark.sql.session.timeZone": "UTC",
    # Arrow batch transfer for pandas_udf / mapInPandas operators.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Reference sets this exact key (App.scala:19).
    "spark.debug.maxToStringFields": "100",
    # Testdata events.parquet carries TIMESTAMP(NANOS); read as long
    # (tables.load_table converts to microsecond timestamps).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def build_session(
    app_name: str = "hdfs-parquet-importer-spark",
    master: str | None = None,
    threads: int | str | None = None,
    conf: dict[str, str] | None = None,
    shuffle_partitions: int | None = None,
    log_level: str = "WARN",
) -> SparkSession:
    """Build a SparkSession with conf passthrough.

    ``threads`` mirrors the reference's ``--threads`` (Config.scala:19,
    default ``*``); an explicit ``master`` wins over ``threads``. On a
    real cluster both are left unset and the cluster manager decides.
    ``log_level`` is the runtime equivalent of the reference's bundled
    log4j quieting config (src/main/resources/log4j.xml:10-21, which
    silences Spark/Hadoop chatter to WARN) — wired to ``--logLevel``
    on the CLI.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        n = threads if threads is not None else os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{n}]"
    builder = builder.master(master)
    for k, v in _SCALE_DEFAULTS.items():
        builder = builder.config(k, v)
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    # User conf last: ``--sparkOpt`` passthrough overrides defaults,
    # matching the reference where every builder.config call came from
    # the CLI (App.scala:21-26).
    for k, v in (conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel(log_level)
    return spark
