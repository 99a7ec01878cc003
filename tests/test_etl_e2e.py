"""End-to-end pipeline test — pytest port of the reference's six
assertions (ImportTest.scala:38-77) on a content-corrupt fixture."""

from __future__ import annotations

import os

import pytest

from hdfs_parquet_importer_spark.etl.pipeline import PipelineOptions, run_pipeline
from tests.tweets_fixture import (
    EXPECTED_PARTITIONS,
    N_COLUMNS,
    N_VALID,
    write_fixture,
)


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    src_dir = tmp_path_factory.mktemp("tweets_src")
    dest = str(tmp_path_factory.mktemp("tweets_out") / "tweets.parquet")
    csv_path, schema_path = write_fixture(str(src_dir))
    opts = PipelineOptions(
        src_file=csv_path,
        dest_file=dest,
        schema_file=schema_path,
        date_enrich="tweet_time",
        partition_cols=["year", "month"],
        sort_cols=["tweet_time"],
        twitter_cleanse=True,
    )
    df = run_pipeline(spark, opts)
    return df, dest


def test_output_exists(pipeline_out):
    _, dest = pipeline_out  # ImportTest.scala:38-42
    assert os.path.exists(dest)
    assert os.path.exists(os.path.join(dest, "_SUCCESS"))


def test_row_count_corrupt_dropped(spark, pipeline_out):
    _, dest = pipeline_out  # ImportTest.scala:44-46 (content-corrupt form)
    assert spark.read.parquet(dest).count() == N_VALID


def test_schema_width(spark, pipeline_out):
    _, dest = pipeline_out  # ImportTest.scala:48-50: 31 + date/year/month
    assert len(spark.read.parquet(dest).schema) == N_COLUMNS + 3


def test_enrichment_columns_resolvable(spark, pipeline_out):
    _, dest = pipeline_out  # ImportTest.scala:52-56
    df = spark.read.parquet(dest)
    for c in ("date", "year", "month"):
        assert c in df.columns
        df.select(c)  # resolution must not raise


def test_no_null_tweetid(spark, pipeline_out):
    _, dest = pipeline_out  # ImportTest.scala:58-60
    assert spark.read.parquet(dest).filter("tweetid IS NULL").count() == 0


def test_partition_tree(pipeline_out):
    _, dest = pipeline_out  # ImportTest.scala:62-77 golden layout check
    found = set()
    for ydir in os.listdir(dest):
        if not ydir.startswith("year="):
            continue
        year = ydir.split("=", 1)[1]
        for mdir in os.listdir(os.path.join(dest, ydir)):
            if mdir.startswith("month="):
                found.add((year, mdir.split("=", 1)[1]))
    assert found == EXPECTED_PARTITIONS


def test_types_applied_from_schema_file(spark, pipeline_out):
    df, _ = pipeline_out
    dt = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)
    assert dt["tweetid"] == "bigint"
    assert dt["follower_count"] == "bigint"
    assert dt["latitude"] == "double"
    assert dt["is_retweet"] == "boolean"
    assert dt["tweet_time"] == "string"
