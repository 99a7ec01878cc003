"""End-to-end CLI test: the full reference flag set drives the
pipeline through argparse + main(), mirroring the reference's example
invocation (reference README.md:21-38)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.etl.cli import build_parser, main
from tests.tweets_fixture import N_COLUMNS, N_VALID, write_fixture


def test_cli_full_flagset(spark, tmp_path, capsys):
    csv_path, schema_path = write_fixture(str(tmp_path / "src"))
    dest = str(tmp_path / "out.parquet")
    rc = main(
        [
            "--srcFile", csv_path,
            "--destFile", dest,
            "--schemaFile", schema_path,
            "--dateEnrich", "tweet_time",
            "--partitionCols", "year,month",
            "--sortCols", "tweetid",
            "--twitterCleanse",
            "--sparkOpt", "spark.sql.shuffle.partitions=4",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Completed in" in out           # reference App.scala:30-33
    assert "tweet_time: string" in out     # schema treeString printed
    back = spark.read.parquet(dest)
    assert back.count() == N_VALID         # corrupt rows cleansed
    assert len(back.columns) == N_COLUMNS + 3  # +date/year/month
    # Hive layout implies year/month come back as partition columns
    # (type-inferred from the directory names, so not '' / not null).
    assert back.filter(F.col("year").isNull()).count() == 0
    assert back.select("year").distinct().count() >= 1


def test_cli_rejects_bad_sparkopt(tmp_path):
    rc = main(
        [
            "--srcFile", "x.csv",
            "--destFile", str(tmp_path / "o"),
            "--sparkOpt", "not-a-pair",
        ]
    )
    assert rc == 2


def test_cli_delimiter_spellings():
    p = build_parser()
    # The reference's misspelled --delimeter (Config.scala:18) and the
    # corrected spelling are both accepted.
    a = p.parse_args(["--srcFile", "a", "--destFile", "b", "--delimeter", ";"])
    b = p.parse_args(["--srcFile", "a", "--destFile", "b", "--delimiter", ";"])
    assert a.delimiter == b.delimiter == ";"


def test_cli_log_level_flag():
    p = build_parser()
    a = p.parse_args(["--srcFile", "a", "--destFile", "b"])
    assert a.logLevel == "WARN"  # default = reference log4j.xml quieting
    b = p.parse_args(["--srcFile", "a", "--destFile", "b", "--logLevel", "ERROR"])
    assert b.logLevel == "ERROR"
