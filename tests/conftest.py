"""Shared pytest fixtures: one session-scoped SparkSession."""

from __future__ import annotations

import pytest

from hdfs_parquet_importer_spark.session import build_session

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_session("pytest", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
