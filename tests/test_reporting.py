"""Semantic invariants for the reporting/data-quality/ts module —
what the value-parity oracle can't state: blocking losslessness,
interpolation exactness on constructed series, rule accounting."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.queries import registry
from hdfs_parquet_importer_spark.tables import load_table


def test_dq_rules_cover_and_count(spark, sf_dir):
    rows = registry()["dq_expectations"].fn(spark, sf_dir).collect()
    rules = {r.rule for r in rows}
    assert rules == {
        "custkey_fk_exists",
        "custkey_not_null",
        "orderdate_in_range",
        "status_in_domain",
        "totalprice_positive",
    }
    n_orders = load_table(spark, sf_dir, "orders").count()
    for r in rows:
        assert r.n_checked == n_orders
        assert 0 <= r.n_violations <= n_orders


def test_fuzzy_length_banding_is_lossless(spark, sf_dir):
    # The shipped plan blocks by length band {L-1, L, L+1}; a brute
    # all-pairs join over the same distinct names must find exactly
    # the same dist<=1 pairs — one edit can't change length by 2.
    names = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
    )
    a = names.select(F.col("name").alias("name_a"))
    b = names.select(F.col("name").alias("name_b"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.levenshtein("name_a", "name_b") <= 1)
        .select("name_a", "name_b")
    )
    shipped = (
        registry()["fuzzy_name_pairs"].fn(spark, sf_dir).select("name_a", "name_b")
    )
    assert {tuple(r) for r in brute.collect()} == {
        tuple(r) for r in shipped.collect()
    }


def test_interpolation_exact_on_constructed_series(spark):
    # Observations at 00:00 (v=10) and 02:00 (v=30): the 01:00 grid
    # point must be exactly 20; the 02:00 grid point must reproduce
    # the observation (tie rule: obs sorts before grid); 03:00 is
    # LOCF of the last obs.
    from pyspark.sql import Window

    base = dt.datetime(2024, 1, 8)
    obs = spark.createDataFrame(
        [
            (1, base, 10.0, 1),
            (1, base + dt.timedelta(hours=2), 30.0, 1),
        ],
        "user_id long, ts timestamp, value double, is_obs int",
    )
    grid = spark.createDataFrame(
        [
            (1, base + dt.timedelta(hours=h), None, 0)
            for h in range(4)
        ],
        "user_id long, ts timestamp, value double, is_obs int",
    )
    u = grid.unionByName(obs)
    wp = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_obs").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_obs").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_us = F.when(F.col("value").isNotNull(), F.unix_micros("ts"))
    f = u.select(
        "ts",
        "is_obs",
        F.last("value", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_us, ignorenulls=True).over(wp).alias("pt"),
        F.first("value", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_us, ignorenulls=True).over(wn).alias("nt"),
    )
    interp = F.when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull(),
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (F.unix_micros("ts") - F.col("pt"))
        / (F.col("nt") - F.col("pt")),
    ).otherwise(F.col("pv"))
    got = {
        r.ts.hour: r.v
        for r in f.filter(F.col("is_obs") == 0)
        .select("ts", interp.alias("v"))
        .collect()
    }
    assert got[0] == 10.0
    assert got[1] == 20.0
    assert got[2] == 30.0
    assert got[3] == 30.0  # LOCF past the last observation


def test_mom_yoy_first_periods_null(spark, sf_dir):
    rows = registry()["report_mom_yoy"].fn(spark, sf_dir).collect()
    assert rows[0].mom_pct is None
    for r in rows[:12]:
        assert r.yoy_pct is None
    assert rows[12].yoy_pct is not None
    # Spot-check one MoM value against its neighbors.
    r1, r2 = rows[1], rows[2]
    expect = round((r2.rev_cents - r1.rev_cents) / r1.rev_cents * 100, 4)
    assert abs(r2.mom_pct - expect) < 1e-9
