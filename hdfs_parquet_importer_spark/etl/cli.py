"""CLI — argparse mirror of the reference's 11 options
(Config.scala:11-21, README.md:49-62).

Flag names match the reference verbatim, including the ``--delimeter``
[sic] misspelling (Config.scala:18); a corrected ``--delimiter`` alias
is accepted too. Run:

    python -m hdfs_parquet_importer_spark.etl.cli \
        --srcFile /tmp/tweets.csv --destFile /tmp/out.parquet \
        --schemaFile tweets.schema --dateEnrich tweet_time \
        --partitionCols year,month --twitterCleanse
"""

from __future__ import annotations

import argparse
import sys
import time

from hdfs_parquet_importer_spark.etl.pipeline import PipelineOptions, run_pipeline
from hdfs_parquet_importer_spark.session import build_session


def _csv_list(s: str) -> list[str]:
    return [c.strip() for c in s.split(",") if c.strip()]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hdfs-parquet-importer-spark",
        description="CSV -> Parquet importer (PySpark rebuild of nwrs/hdfs-parquet-importer)",
    )
    p.add_argument("--srcFile", required=True, help="source CSV file/glob (local or HDFS)")
    p.add_argument("--destFile", required=True, help="destination parquet path")
    p.add_argument("--schemaFile", help="name=Type schema file (6 types; # comments)")
    p.add_argument("--dateEnrich", metavar="COL",
                   help="append date/year/month parsed from a 'yyyy-MM-dd HH:mm' string column")
    p.add_argument("--partitionCols", type=_csv_list, default=[],
                   help="comma-separated Hive partition columns")
    p.add_argument("--sortCols", type=_csv_list, default=[],
                   help="comma-separated ascending sort columns")
    p.add_argument("--slashEscapes", action="store_true",
                   help="use \\ as the quote-escape character instead of \"")
    # Reference spelling (Config.scala:18) + corrected alias.
    p.add_argument("--delimeter", "--delimiter", dest="delimiter", default=",",
                   help="CSV delimiter (default ,)")
    p.add_argument("--threads", default=None,
                   help="local worker thread count (default: all cores)")
    p.add_argument("--twitterCleanse", action="store_true",
                   help="drop rows with null/malformed tweet_time (needs tweetid/tweet_time cols)")
    p.add_argument("--sparkOpt", action="append", default=[], metavar="K=V",
                   help="extra spark conf, repeatable")
    # Extensions beyond the reference CLI
    p.add_argument("--arrayParseCols", type=_csv_list, default=[],
                   help="string-encoded-array columns to parse into <col>_array")
    p.add_argument("--strictNotInCleanse", action="store_true",
                   help="reference-shaped two-pass collect+NOT-IN cleanse (parity mode)")
    p.add_argument("--sortWithinPartitions", action="store_true",
                   help="sort within hash partitions instead of a global pre-shuffle sort")
    p.add_argument("--inferSchema", action="store_true",
                   help="real type inference (the reference documents but never enables this)")
    p.add_argument("--logLevel", default="WARN",
                   choices=["ALL", "DEBUG", "INFO", "WARN", "ERROR", "OFF"],
                   help="Spark log level (runtime twin of the reference's "
                        "bundled log4j.xml quieting; default WARN)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    conf = {}
    for kv in args.sparkOpt:
        if "=" not in kv:
            print(f"--sparkOpt expects k=v, got {kv!r}", file=sys.stderr)
            return 2
        k, _, v = kv.partition("=")
        conf[k.strip()] = v.strip()
    spark = build_session(threads=args.threads, conf=conf, log_level=args.logLevel)
    opts = PipelineOptions(
        src_file=args.srcFile,
        dest_file=args.destFile,
        schema_file=args.schemaFile,
        date_enrich=args.dateEnrich,
        partition_cols=args.partitionCols,
        sort_cols=args.sortCols,
        slash_escapes=args.slashEscapes,
        delimiter=args.delimiter,
        twitter_cleanse=args.twitterCleanse,
        array_parse_cols=args.arrayParseCols,
        strict_not_in_cleanse=args.strictNotInCleanse,
        sort_within_partitions=args.sortWithinPartitions,
        infer_schema=args.inferSchema,
    )
    t0 = time.time()
    df = run_pipeline(spark, opts)
    elapsed = time.time() - t0
    # Reference logs elapsed seconds + schema tree (App.scala:30-34).
    print(f"Completed in {elapsed:.1f}s")
    # Public API, not the private _jdf JVM handle — Spark Connect
    # sessions have no _jdf and would crash AFTER a successful write.
    print(df.schema.treeString())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
