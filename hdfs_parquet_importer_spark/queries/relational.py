"""Relational operator library queries (SURVEY.md §2.2 extensions).

Joins, aggregations, windows, sorts/limits, set ops, scalar functions —
each a Catalyst-native DataFrame plan (no Python UDFs) with a DuckDB
oracle twin. Scale notes accompany each query: what shuffles, what
broadcasts, and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.queries import register
from hdfs_parquet_importer_spark.tables import load_table


# --------------------------------------------------------------------------
# Flagship: TPC-H-Q1-style pricing summary.
# Scan -> filter -> project -> hash-agg -> sort. At scale: the filter and
# the 7-column projection push into the parquet scan (PushedFilters /
# ReadSchema); aggregation is a partial (map-side) + final hash agg over
# only 6 groups, so the shuffle moves a few KB regardless of input size.
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
  ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
  ROUND(AVG(l_discount), 4)                                        AS avg_disc,
  COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1: pricing summary report (filter + hash agg + sort).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
