"""Upsert / CDC-compaction unit tests: MERGE semantics row-by-row and
determinism of version tiebreaks."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.operators.upsert import latest_per_key, upsert


def test_upsert_update_insert_keep(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    got = {r.k: (r.s, r.v) for r in upsert(target, updates, ["k"]).collect()}
    assert got == {
        1: ("a", 10.0),   # kept
        2: ("B", 99.0),   # updated
        3: ("c", 30.0),   # kept
        4: ("d", 40.0),   # inserted
    }


def test_upsert_composite_key(spark):
    target = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "k long, sub string, v double"
    )
    updates = spark.createDataFrame([(1, "y", 9.0)], "k long, sub string, v double")
    got = {(r.k, r.sub): r.v for r in upsert(target, updates, ["k", "sub"]).collect()}
    assert got == {(1, "x"): 1.0, (1, "y"): 9.0}


def test_latest_per_key_with_tiebreak(spark):
    df = spark.createDataFrame(
        [
            (1, 100, 1, "old"),
            (1, 200, 2, "new"),
            (1, 200, 3, "newer-same-ts"),  # same version, higher id wins
            (2, 50, 4, "only"),
        ],
        "k long, ver long, id long, payload string",
    )
    got = {
        r.k: (r.id, r.payload)
        for r in latest_per_key(df, ["k"], "ver", tiebreak_cols=["id"]).collect()
    }
    assert got == {1: (3, "newer-same-ts"), 2: (4, "only")}


def test_latest_per_key_is_deterministic(spark):
    rows = [(i % 7, i % 3, i, f"p{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "k long, ver long, id long, payload string")
    a = sorted(
        map(tuple, latest_per_key(df, ["k"], "ver", ["id"]).collect())
    )
    b = sorted(
        map(tuple, latest_per_key(df.repartition(7), ["k"], "ver", ["id"]).collect())
    )
    assert a == b
