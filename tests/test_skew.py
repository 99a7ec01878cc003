"""Salted join / salted aggregation: result parity with the unsalted
plan, determinism, and the expected plan shape (replication is an
explode, not a shuffle)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.operators.skew import salted_agg, salted_join
from hdfs_parquet_importer_spark.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    plain = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    salted = (
        salted_join(li, part, "l_partkey", "p_partkey", n_salts=8)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_left_outer_preserves_unmatched(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    plain = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    # Salting a LEFT join: big side = left side; unmatched left rows
    # must survive exactly once (their salt matches no replica... but
    # every salt value exists on the replicated right side, so the
    # no-match case still yields exactly one null-extended row).
    salted = salted_join(cust, orders, "c_custkey", "o_custkey", n_salts=8, how="left")
    assert salted.count() == plain.count()
    plain_null = plain.filter(F.col("o_custkey").isNull()).count()
    salted_null = salted.filter(F.col("o_custkey").isNull()).count()
    assert plain_null == salted_null


def test_salt_is_deterministic(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    a = salted_join(li, part, "l_partkey", "p_partkey", n_salts=8).count()
    b = salted_join(li, part, "l_partkey", "p_partkey", n_salts=8).count()
    assert a == b


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag): (r.n, r.q)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("q"),
        )
        .collect()
    }
    salted_df = salted_agg(
        li,
        "l_returnflag",
        {"n": F.count(F.lit(1)), "q": F.sum("l_quantity")},
        n_salts=8,
    ).select(
        "l_returnflag", "n", F.round("q", 2).alias("q")
    )
    salted = {(r.l_returnflag): (r.n, r.q) for r in salted_df.collect()}
    assert plain == salted


def test_replication_is_explode_not_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    df = salted_join(li, part, "l_partkey", "p_partkey", n_salts=8)
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert re.search(r"\(\d+\) Generate", plan), plan  # explode of salt range
    assert "CartesianProduct" not in plan

def test_interval_join_no_nested_loop(spark, sf_dir):
    """The banded interval join must plan as an equi-join on the
    bucket id — no BroadcastNestedLoopJoin / CartesianProduct."""
    from hdfs_parquet_importer_spark.operators.rangejoin import interval_point_join

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    iv = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_retailprice") - 50).alias("lo"),
        (F.col("p_retailprice") + 50).alias("hi"),
    )
    df = interval_point_join(orders, iv, "o_totalprice", "lo", "hi", 100.0)
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    # Parity with the naive theta join.
    naive = orders.join(
        iv,
        (F.col("o_totalprice") >= F.col("lo"))
        & (F.col("o_totalprice") <= F.col("hi")),
    )
    assert df.count() == naive.count()


def test_interval_join_boundary_inclusive(spark):
    points = spark.createDataFrame([(1, 100.0), (2, 199.99), (3, 200.0)], "id long, v double")
    iv = spark.createDataFrame([(7, 100.0, 200.0)], "ivid long, lo double, hi double")
    from hdfs_parquet_importer_spark.operators.rangejoin import interval_point_join

    got = {r.id for r in interval_point_join(points, iv, "v", "lo", "hi", 50.0).collect()}
    assert got == {1, 2, 3}  # both endpoints inclusive


def test_salted_join_rejects_right_and_full(spark, sf_dir):
    """right/full would emit each unmatched small-side row once per
    salt replica — the operator must refuse rather than silently
    duplicate (VERDICT r2 'What's wrong' #1)."""
    import pytest

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    for how in ("right", "rightouter", "right_outer", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(li, part, "l_partkey", "p_partkey", n_salts=4, how=how)


def test_salted_join_accepts_safe_hows(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey").limit(100)
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    for how in ("inner", "left", "left_semi", "left_anti", "semi", "anti"):
        # must not raise; count forces execution
        salted_join(li, part, "l_partkey", "p_partkey", n_salts=4, how=how).count()


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling, demonstrated end to end: a join where
    one key owns ~90% of rows is re-planned at runtime with the hot
    partition SPLIT (the sort-merge join's scan marked skew=true).
    Thresholds are lowered so the test-sized data trips the same
    machinery production trips at 256 MB partitions."""
    conf = spark.conf
    old = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # Force a sort-merge join (broadcast would dodge the skew path).
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        left = spark.range(0, 200_000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 0 ELSE id END AS k",
            "id AS payload",
        )
        right = spark.range(0, 2_000).selectExpr("id AS k", "id AS r")
        joined = left.join(right, "k")
        # Execute THIS DataFrame (a separate .count() plan would leave
        # joined's own AQE plan unfinalized).
        rows = joined.collect()
        assert len(rows) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "skew=true" in plan, "AQE did not mark the skewed side"
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_salted_agg_min_max_partials(spark, sf_dir):
    """min/max partials merge with min/max (not sum) in phase 2."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r.l_returnflag: (r.lo, r.hi)
        for r in salted_agg(
            li,
            "l_returnflag",
            {"lo": F.min("l_quantity"), "hi": F.max("l_quantity")},
            n_salts=8,
        ).collect()
    }
    want = {
        r.l_returnflag: (r.lo, r.hi)
        for r in li.groupBy("l_returnflag")
        .agg(F.min("l_quantity").alias("lo"), F.max("l_quantity").alias("hi"))
        .collect()
    }
    assert got == want


def test_salted_agg_rejects_non_mergeable(spark, sf_dir):
    """avg / count(DISTINCT) partials are rejected loudly instead of
    silently merging wrong (ADVICE r8 item 4)."""
    import pytest
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with pytest.raises(ValueError, match="merge-associative"):
        salted_agg(li, "l_returnflag", {"a": F.avg("l_quantity")})
    with pytest.raises(ValueError, match="merge-associative"):
        salted_agg(
            li, "l_returnflag", {"d": F.count_distinct(F.col("l_partkey"))}
        )


def test_interval_point_join_rejects_outer(spark):
    """how != 'inner' would mislabel the inner result as outer (the
    exact range re-check is a post-join filter that deletes unmatched
    all-null rows) — raise by name instead (r12 review)."""
    import pytest
    from pyspark.sql import functions as F

    from hdfs_parquet_importer_spark.operators.rangejoin import (
        interval_point_join,
    )

    pts = spark.range(3).select(F.col("id"), (F.col("id") * 10.0).alias("v"))
    iv = spark.range(2).select(
        (F.col("id") * 100.0).alias("lo"), (F.col("id") * 100.0 + 5).alias("hi")
    )
    with pytest.raises(NotImplementedError, match="inner"):
        interval_point_join(pts, iv, "v", "lo", "hi", 50.0, how="left")
