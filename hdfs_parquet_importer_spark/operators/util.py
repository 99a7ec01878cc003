"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the input is narrower than the cluster.

    CPU-heavy per-row operators (fingerprinting, minhashing, byte
    decoding) are compute-bound, not IO-bound. On a large cluster the
    parquet scan already yields thousands of input splits, so this is a
    no-op (no shuffle added); but a small input — one file, one row
    group — arrives as a single partition and would pin the entire
    projection to one core. One cheap shuffle of the small input
    unlocks every core for the expensive downstream projection.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
