"""Connected-components tests: known topologies, fixpoint behavior,
and a union-find cross-check over the real MinHash pair graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.operators import dedup as D
from hdfs_parquet_importer_spark.operators.graph import connected_components
from hdfs_parquet_importer_spark.tables import load_table


def _components(spark, pairs):
    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        r.node: r.component
        for r in connected_components(edges, "id_a", "id_b").collect()
    }


def test_two_triangles(spark):
    got = _components(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_long_chain_needs_propagation(spark):
    # A path 0-1-2-...-9: min label must travel the full diameter.
    got = _components(spark, [(i, i + 1) for i in range(9)])
    assert set(got.values()) == {0}
    assert len(got) == 10


def test_star_graph(spark):
    got = _components(spark, [(5, i) for i in range(6, 12)])
    assert set(got.values()) == {5}


def test_matches_union_find_on_minhash_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = [
        (r.id_a, r.id_b)
        for r in D.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.8)
        .select("id_a", "id_b")
        .collect()
    ]
    if not pairs:
        return  # nothing to cluster at this sf
    # Driver-side union-find ground truth.
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    expect = {n: find(n) for n in parent}
    got = _components(spark, pairs)
    assert got == expect
