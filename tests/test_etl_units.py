"""Per-operator unit tests for the ETL stages, pinning the reference's
edge semantics (SURVEY §7.3 risk 1: empty-string-vs-null rules)."""

from pyspark.sql import Row

from hdfs_parquet_importer_spark.etl import (
    cleanse_suspect_rows,
    cleanse_suspect_rows_not_in,
    date_enrich,
    parse_array_col,
)


def _times_df(spark):
    rows = [
        Row(tweetid=1, tweet_time="2017-03-08 08:08"),
        Row(tweetid=2, tweet_time="not a time"),
        Row(tweetid=3, tweet_time=None),
        Row(tweetid=4, tweet_time="2016-04-01 00:00:00"),  # seconds -> invalid
        Row(tweetid=None, tweet_time="2017-03-08 08:08"),  # null id -> dropped
        Row(tweetid=6, tweet_time="2014-07-12 09:15"),
    ]
    return spark.createDataFrame(rows)


def test_cleanse_single_pass(spark):
    out = cleanse_suspect_rows(_times_df(spark)).collect()
    assert sorted(r.tweetid for r in out) == [1, 6]


def test_cleanse_not_in_parity_variant(spark):
    # The reference-shaped two-pass variant must agree with the
    # single-pass filter on content-corrupt data.
    df = _times_df(spark)
    a = sorted(r.tweetid for r in cleanse_suspect_rows(df).collect())
    b = sorted(r.tweetid for r in cleanse_suspect_rows_not_in(df).collect())
    assert a == b == [1, 6]


def test_date_enrich_semantics(spark):
    df = spark.createDataFrame(
        [
            Row(t="2017-03-08 08:08"),
            Row(t="garbage with space"),
            Row(t="nospace"),
            Row(t=None),
        ]
    )
    out = {r.t: r for r in date_enrich(df, "t").collect()}
    # valid: full extraction
    assert (out["2017-03-08 08:08"].date, out["2017-03-08 08:08"].year,
            out["2017-03-08 08:08"].month) == ("2017-03-08", "2017", "03")
    # date is split-on-space with NO validation (reference asymmetry);
    # year/month are '' on regex miss — empty string, never null.
    assert out["garbage with space"].date == "garbage"
    assert out["garbage with space"].year == ""
    assert out["garbage with space"].month == ""
    assert out["nospace"].date == "nospace"
    assert out[None].date == ""
    assert out[None].year == ""
    assert out[None].month == ""


def test_array_parse_edges(spark):
    df = spark.createDataFrame(
        [Row(id=1, s="[a, b, c]"), Row(id=2, s="[]"), Row(id=3, s=""),
         Row(id=4, s=None), Row(id=5, s="[one]")]
    )
    out = {r.id: r.s_array for r in parse_array_col(df, "s").collect()}
    assert out[1] == ["a", "b", "c"]
    assert out[2] == [""]  # "[]" -> [""] — reference quirk preserved
    assert out[3] == []
    assert out[4] == []
    assert out[5] == ["one"]


def test_array_parse_remove_src(spark):
    df = spark.createDataFrame([Row(s="[x]")])
    kept = parse_array_col(df, "s")
    assert set(kept.columns) == {"s", "s_array"}
    dropped = parse_array_col(df, "s", remove_src=True)
    assert set(dropped.columns) == {"s_array"}
