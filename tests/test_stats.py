"""Semantic invariants of the statistics / sketch operators — the
guarantees the value-parity oracle can't express (bounds that must
hold on ANY data, frame-leakage, sketch overestimate property)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.queries import registry


def test_corr_matrix_within_bounds(spark, sf_dir):
    [row] = registry()["stat_corr_matrix"].fn(spark, sf_dir).collect()
    for name, v in row.asDict().items():
        assert v is not None, name
        assert -1.0 <= v <= 1.0, (name, v)


def test_chi2_nonnegative_and_dof(spark, sf_dir):
    [row] = (
        registry()["stat_chi2_independence"].fn(spark, sf_dir).collect()
    )
    assert row.chi2 >= 0.0
    # 5 event types x 7 days in the generated data.
    assert row.dof == (5 - 1) * (7 - 1)


def test_entropy_bounded_by_log_cardinality(spark, sf_dir):
    rows = registry()["stat_entropy_by_source"].fn(spark, sf_dir).collect()
    assert rows, "no sources"
    for r in rows:
        assert 0.0 <= r.lang_entropy <= math.log(r.n_langs) + 1e-9, r


def test_rolling_zscore_excludes_current_row(spark):
    # 11 identical values then one spike: the spike's frame holds only
    # the 11 priors (mean 10, sd 0 would reject; add tiny jitter so
    # sd > 0). If the current row leaked into its own frame, the
    # z-score would shrink below the threshold used here.
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, "t", 10.0 + (i % 2) * 0.1)
        for i in range(11)
    ]
    rows.append((11, base + dt.timedelta(minutes=11), 1, "t", 1000.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, -1)
    )
    scored = df.select(
        "event_id",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_prior"),
        "value",
    ).collect()
    spike = next(r for r in scored if r.event_id == 11)
    assert spike.n_prior == 11
    # Frame mean is the 11 priors' mean (~10.05), NOT dragged toward
    # 1000 — proof the current row is excluded.
    assert abs(spike.mu - 10.05) < 0.01
    assert (spike.value - spike.mu) / spike.sd > 100


def test_countmin_never_underestimates(spark, sf_dir):
    rows = registry()["sketch_countmin_heavy"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cms_estimate >= r.exact_n, r


def test_partial_reaggregate_equals_direct(spark, sf_dir):
    # The merge law: re-aggregated daily partials == one direct pass.
    from hdfs_parquet_importer_spark.tables import load_table

    merged = registry()["agg_partial_reaggregate"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    direct = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("bigint")
            .alias("sum_cents"),
            F.round(F.min("value"), 2).alias("min_v"),
            F.round(F.max("value"), 2).alias("max_v"),
        )
        .withColumn(
            "avg_value",
            F.round(F.col("sum_cents") / 100.0 / F.col("n"), 6),
        )
        .orderBy("event_type")
    )
    assert [tuple(r) for r in merged.collect()] == [
        tuple(r) for r in direct.collect()
    ]


def test_sample_k_per_group_plans_group_limit(spark, sf_dir):
    df = registry()["sample_k_per_group"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    # Exactly 3 per source, deterministic across runs.
    rows1 = df.collect()
    rows2 = registry()["sample_k_per_group"].fn(spark, sf_dir).collect()
    assert rows1 == rows2
    from collections import Counter

    per_src = Counter(r.source for r in rows1)
    assert all(v == 3 for v in per_src.values())


def test_countmin_sketch_merges_by_addition(spark, sf_dir):
    """The mergeability claim, executed: cells built on two disjoint
    halves of events and SUMMED per (row, bucket) must equal the
    cells built over the full table in one pass — the property that
    lets per-day/per-source sketches roll up without rescanning."""
    from hdfs_parquet_importer_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"), "event_id"
    )
    depth, width = 4, 64

    def cells_of(df):
        def bucket(i):
            return F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{i}:"), F.col("t"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(width),
            )

        hashed = df.select(
            "t",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).alias("i"), bucket(i).alias("b"))
                        for i in range(depth)
                    ]
                )
            ).alias("ib"),
        ).select(F.col("ib.i").alias("i"), F.col("ib.b").alias("b"))
        return hashed.groupBy("i", "b").agg(F.count(F.lit(1)).alias("c"))

    full = {(r.i, r.b): r.c for r in cells_of(ev).collect()}
    h1 = cells_of(ev.filter(F.col("event_id") % 2 == 0))
    h2 = cells_of(ev.filter(F.col("event_id") % 2 == 1))
    merged = {
        (r.i, r.b): r.c
        for r in h1.unionByName(h2)
        .groupBy("i", "b")
        .agg(F.sum("c").alias("c"))
        .collect()
    }
    assert merged == full
