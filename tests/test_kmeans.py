"""k-means tests: determinism, label-structure recovery on the
synthetic embeddings (which carry a ground-truth `label`), and inertia
improvement over the initial assignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.operators.kmeans import kmeans_assign
from hdfs_parquet_importer_spark.tables import load_table


def test_kmeans_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, kmeans_assign(emb, k=4, max_iter=3).collect()))
    b = sorted(map(tuple, kmeans_assign(emb, k=4, max_iter=3).collect()))
    assert a == b


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = kmeans_assign(emb, k=4, max_iter=3)
    assert out.count() == emb.count()
    clusters = {r.cluster for r in out.select("cluster").distinct().collect()}
    assert clusters <= set(range(4))
    assert len(clusters) >= 2  # data is not one blob


def test_kmeans_improves_over_iterations(spark, sf_dir):
    """More Lloyd iterations must not increase within-cluster scatter
    (measured via mean distance of members to their cluster mean)."""
    emb = load_table(spark, sf_dir, "embeddings")

    def scatter(max_iter):
        assigned = kmeans_assign(emb, k=4, max_iter=max_iter)
        j = emb.join(assigned, "vec_id")
        d = j.select(
            "cluster", F.posexplode("embedding").alias("dim", "val")
        )
        per_dim = d.groupBy("cluster", "dim").agg(
            F.var_pop(F.col("val").cast("double")).alias("v")
        )
        return per_dim.agg(F.sum("v")).first()[0]

    assert scatter(5) <= scatter(1) + 1e-9
