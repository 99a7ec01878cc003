"""Deterministic mini-batch-free k-means over an embedding column.

The canonical Spark iterative algorithm, shaped for scale:

* centroids live in a ~k x dim driver-side list — genuinely tiny state,
  the ONE place driver-side data is acceptable (k centroids, not data);
* assignment is a broadcast of the centroids into a per-row argmin
  projection (zero shuffle over the vectors);
* the update step is one partial-aggregated groupBy per iteration
  (long form (cluster, dim) like embedding_centroids, so dimension
  never limits the reducer);
* initialization is the first-k-by-id rule — deterministic, so
  cross-run results and tests are stable (k-means++ would add RNG for
  quality; at 100 TB use a deterministic hash-sample for seeding).

Distance is squared-Euclidean; convergence by centroid movement or
``max_iter``. Everything but the k-row centroid collect is a Catalyst
plan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_expr(centroids: list[list[float]]) -> F.Column:
    """argmin_c ||vec - centroid_c||^2 as a pure column expression."""
    best_d, best_c = None, None
    for ci, cent in enumerate(centroids):
        cent_col = F.array(*[F.lit(float(v)) for v in cent])
        d = F.aggregate(
            F.zip_with(
                F.col("embedding"), cent_col,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        if best_d is None:
            best_d, best_c = d, F.lit(0)
        else:
            best_c = F.when(d < best_d, F.lit(ci)).otherwise(best_c)
            best_d = F.least(d, best_d)
    return best_c.alias("cluster")


def kmeans_assign(
    vectors: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) after Lloyd iterations with deterministic init.

    ``vectors[vec_col]`` must be a fixed-dimension float array.
    """
    vecs = vectors.select(
        F.col(id_col), F.col(vec_col).alias("embedding")
    ).cache()
    init = vecs.orderBy(id_col).limit(k).collect()
    centroids = [[float(v) for v in r.embedding] for r in init]

    for _ in range(max_iter):
        assigned = vecs.select(id_col, "embedding", _assign_expr(centroids))
        new_rows = (
            assigned.select("cluster", F.posexplode("embedding").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("mean"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]
        by_cluster: dict[int, dict[int, float]] = {}
        for r in new_rows:
            by_cluster.setdefault(r.cluster, {})[r.dim] = r.mean
        for ci, dims in by_cluster.items():
            for d, m in dims.items():
                new_centroids[ci][d] = m
        shift = max(
            math.sqrt(sum((a - b) ** 2 for a, b in zip(old, new)))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if shift < tol:
            break

    out = vecs.select(id_col, "embedding", _assign_expr(centroids)).select(
        id_col, "cluster"
    )
    return out


def inertia(
    vectors: DataFrame,
    assignments: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Sum of squared distances to assigned centroids (quality metric)."""
    joined = vectors.join(assignments, id_col).select(
        F.col(vec_col).alias("embedding"), "cluster"
    )
    total = 0.0
    for ci, cent in enumerate(centroids):
        cent_col = F.array(*[F.lit(float(v)) for v in cent])
        d = F.aggregate(
            F.zip_with(
                F.col("embedding"), cent_col,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        row = joined.filter(F.col("cluster") == ci).agg(F.sum(d)).first()
        total += row[0] or 0.0
    return total
