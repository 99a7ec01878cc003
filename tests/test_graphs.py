"""Unit tests for the graph-analytics operators on graphs with
KNOWN closed-form answers — the oracle gate checks the co-activity
queries end-to-end; these pin the triangle machinery itself
(orientation totality, wedge dedup, closure) where the right answer
is provable by hand.
"""

from __future__ import annotations

import pytest

from hdfs_parquet_importer_spark.operators.graph import triangles


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "u long, v long"
    )


def _k_n(n):
    return [(a, b) for a in range(n) for b in range(a + 1, n)]


@pytest.mark.parametrize(
    "name,pairs,expected",
    [
        # C(n,3) triangles in a complete graph — equal degrees force
        # every orientation decision through the node-id tiebreak.
        ("K4", _k_n(4), 4),
        ("K6", _k_n(6), 20),
        # A path has wedges but no closures.
        ("path5", [(0, 1), (1, 2), (2, 3), (3, 4)], 0),
        # A star has all its wedges at the hub; orientation must count
        # ZERO wedges there (hub is the pi-largest endpoint of every
        # edge) — the celebrity-node property the operator exists for.
        ("star6", [(0, i) for i in range(1, 7)], 0),
        # Two triangles sharing one edge; endpoints given in MIXED
        # order to prove input orientation-insensitivity.
        ("bowtie", [(0, 1), (2, 0), (1, 2), (3, 1), (2, 3)], 2),
        ("empty", [], 0),
    ],
)
def test_triangle_count_known_graphs(spark, name, pairs, expected):
    if not pairs:
        edges = spark.createDataFrame([], "u long, v long")
    else:
        edges = _edges(spark, pairs)
    assert triangles(edges).count() == expected, name


def test_triangles_rows_are_distinct_vertex_sets(spark):
    """Each triangle appears exactly once, as one (a,b,c) row —
    no {b,c}/{c,b} double count (K5 stresses the tie-heavy case:
    every vertex has degree 4)."""
    tri = triangles(_edges(spark, _k_n(5))).collect()
    assert len(tri) == 10
    keys = {frozenset((r.a, r.b, r.c)) for r in tri}
    assert len(keys) == 10
    assert all(len(k) == 3 for k in keys)


def test_mutual_knn_degree_is_capped(spark, sf_dir):
    """The co-activity construction's whole point: degree <= _KNN at
    any scale. Checked on the real edge builder over testdata."""
    from hdfs_parquet_importer_spark.queries.graphs import (
        _KNN,
        _co_activity_edges,
        _degrees,
    )
    from hdfs_parquet_importer_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    deg = _degrees(_co_activity_edges(ev))
    row = deg.agg({"deg": "max"}).collect()[0]
    assert row[0] is not None and row[0] <= _KNN
