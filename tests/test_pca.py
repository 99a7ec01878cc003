"""Distributed PCA: covariance cells match numpy exactly, and the
DataFrame-only power iteration converges to numpy's top eigenpair."""

from __future__ import annotations

import numpy as np

from hdfs_parquet_importer_spark.operators.pca import (
    covariance_long,
    top_eigenvector,
)
from hdfs_parquet_importer_spark.tables import load_table


def _np_embeddings(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("embedding")
        .collect()
    )
    return np.array([r.embedding for r in rows], dtype=np.float64)


def test_covariance_matches_numpy(spark, sf_dir):
    X = _np_embeddings(spark, sf_dir)
    want = np.cov(X, rowvar=False, bias=True)  # population covariance
    got = covariance_long(
        load_table(spark, sf_dir, "embeddings")
    ).collect()
    assert len(got) == X.shape[1] ** 2
    for r in got:
        assert abs(r.cov - want[r.i][r.j]) < 1e-9, (r.i, r.j)


def test_power_iteration_matches_numpy_eigh(spark, sf_dir):
    """Real embeddings are near-isotropic (tiny eigengap), so power
    iteration is gap-limited there: assert the Rayleigh quotient is
    within 0.1% of the true top eigenvalue. Exactness is asserted on
    planted-spike data below."""
    X = _np_embeddings(spark, sf_dir)
    C = np.cov(X, rowvar=False, bias=True)
    w = np.linalg.eigvalsh(C)
    lam_np = w[-1]

    cells = covariance_long(load_table(spark, sf_dir, "embeddings"))
    got = top_eigenvector(cells, dim=C.shape[0], n_iter=30).collect()
    lam = got[0].eigenvalue
    # Rayleigh quotient can never exceed the true top eigenvalue.
    assert lam <= lam_np + 1e-12
    assert abs(lam - lam_np) / lam_np < 1e-3


def test_power_iteration_exact_on_planted_spike(spark):
    """Data with a dominant planted direction: the eigengap is large,
    so 30 iterations recover the numpy eigenpair to float precision."""
    rng = np.random.default_rng(7)
    d, n = 16, 400
    direction = rng.standard_normal(d)
    direction /= np.linalg.norm(direction)
    X = rng.standard_normal((n, d)) * 0.05 + np.outer(
        rng.standard_normal(n) * 3.0, direction
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    C = np.cov(X, rowvar=False, bias=True)
    w, V = np.linalg.eigh(C)
    lam_np, vec_np = w[-1], V[:, -1]
    if vec_np[np.argmax(np.abs(vec_np))] < 0:
        vec_np = -vec_np

    cells = covariance_long(df)
    got = top_eigenvector(cells, dim=d, n_iter=30).collect()
    lam = got[0].eigenvalue
    vec = np.zeros(d)
    for r in got:
        vec[r.i] = r.v
    assert abs(lam - lam_np) / lam_np < 1e-9
    assert np.linalg.norm(vec - vec_np) < 1e-7
