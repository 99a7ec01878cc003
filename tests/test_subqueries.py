"""Unit tests for the subquery / pivot / percentile / sampling /
map-function / pandas-UDF query batch (queries/subqueries.py,
queries/pandas_surface.py). Semantic spot checks at sf0.001 — the
full cross-engine value check is tools/check_oracle.py at sf0.01."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.queries import registry
from hdfs_parquet_importer_spark.tables import load_table

NEW_QUERIES = [
    "subq_exists_priority",
    "subq_scalar_avg_qty",
    "subq_in_heavy_orders",
    "subq_global_avg_anti",
    "pivot_status_by_year",
    "unpivot_brand_metrics",
    "agg_percentiles",
    "agg_approx_percentile",
    "sample_systematic",
    "sample_bernoulli",
    "func_map_props",
    "window_distribution",
    "events_hourly_rollup",
    "pandas_udf_log_price",
    "pandas_grouped_regression",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_runs_and_has_rows(spark, sf_dir, name):
    q = registry()[name]
    df = q.fn(spark, sf_dir)
    # subq_global_avg_anti may legitimately be empty at tiny sf; the
    # rest must produce rows.
    n = df.count()
    if name != "subq_global_avg_anti":
        assert n > 0, name


def test_pivot_counts_sum_to_total(spark, sf_dir):
    df = registry()["pivot_status_by_year"].fn(spark, sf_dir)
    rows = df.collect()
    pivot_total = sum((r["F"] or 0) + (r["O"] or 0) + (r["P"] or 0) for r in rows)
    assert pivot_total == load_table(spark, sf_dir, "orders").count()


def test_unpivot_is_long_form(spark, sf_dir):
    df = registry()["unpivot_brand_metrics"].fn(spark, sf_dir)
    rows = df.collect()
    brands = {r.p_brand for r in rows}
    assert len(rows) == 2 * len(brands)
    assert {r.metric for r in rows} == {"revenue", "quantity"}


def test_percentiles_monotone(spark, sf_dir):
    for r in registry()["agg_percentiles"].fn(spark, sf_dir).collect():
        assert r.p25 <= r.p50 <= r.p75 <= r.p99


def test_systematic_sample_keys(spark, sf_dir):
    rows = registry()["sample_systematic"].fn(spark, sf_dir).collect()
    assert rows and all(r.o_orderkey % 20 == 7 for r in rows)


def test_exists_semi_join_never_multiplies(spark, sf_dir):
    df = registry()["subq_exists_priority"].fn(spark, sf_dir)
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in df.collect()) <= n_orders


def test_regression_covers_all_lineitems(spark, sf_dir):
    df = registry()["pandas_grouped_regression"].fn(spark, sf_dir)
    rows = df.collect()
    total = sum(r.n_points for r in rows)
    assert total == load_table(spark, sf_dir, "lineitem").count()
    for r in rows:
        assert r.slope is not None and r.intercept is not None


def test_map_props_parse(spark, sf_dir):
    rows = registry()["func_map_props"].fn(spark, sf_dir).collect()
    assert all(r.max_n_keys >= 1 for r in rows)
    assert all(r.sum_k is not None for r in rows)


def test_rollup_grand_total(spark, sf_dir):
    rows = registry()["events_hourly_rollup"].fn(spark, sf_dir).collect()
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1
    assert grand[0].n == load_table(spark, sf_dir, "events").count()


def test_arrow_grouped_stats_exact_fractions(spark, sf_dir):
    """The integer-cents claim, checked in exact rational arithmetic:
    each returned double must equal the correctly-rounded value of the
    true rational mean / mean-absolute-deviation (one IEEE division of
    exact integers), and counts must cover the whole table."""
    from fractions import Fraction

    rows = registry()["arrow_grouped_stats"].fn(spark, sf_dir).collect()
    part = load_table(spark, sf_dir, "part").select(
        "p_brand", "p_retailprice"
    ).collect()
    cents: dict[str, list[int]] = {}
    for r in part:
        cents.setdefault(r.p_brand, []).append(round(r.p_retailprice * 100))
    assert sum(r.n_parts for r in rows) == len(part)
    for r in rows:
        c = cents[r.p_brand]
        n, sc = len(c), sum(c)
        assert r.n_parts == n
        assert r.avg_price == sc / (100.0 * n)
        assert float(Fraction(sc, 100 * n)) == r.avg_price
        sdev = sum(abs(x * n - sc) for x in c)
        assert r.mean_abs_dev == sdev / (100.0 * n * n)


def test_approx_top_k_counts_are_exact(spark, sf_dir):
    """At cardinality (5) << maxItemsTracked the sketch degenerates to
    exact counting — every (item, count) must equal the exact GROUP BY
    and the union of counts must cover every order."""
    rows = registry()["agg_approx_top_k"].fn(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.priority: r.n for r in rows} == exact
    assert sum(r.n for r in rows) == orders.count()
