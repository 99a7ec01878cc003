"""URL canonicalization (operators/urls.py) — rule-by-rule edge cases
plus Spark↔DuckDB twin parity on adversarial inputs."""

import duckdb
import pytest
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.operators.urls import (
    canonicalize_url,
    canonicalize_url_sql,
)

CASES = [
    # (raw, canonical)
    ("HTTPS://Example.COM/a", "https://example.com/a"),  # case
    ("https://example.com:443/a", "https://example.com/a"),  # default port
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:80/a", "https://example.com:80/a"),  # NOT default
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com//a///b", "https://example.com/a/b"),  # slashes
    ("https://example.com/a/", "https://example.com/a"),  # trailing
    ("https://example.com/", "https://example.com/"),  # root kept
    ("https://example.com", "https://example.com/"),  # empty path
    ("https://example.com/a#frag", "https://example.com/a"),  # fragment
    (
        "https://example.com/a?utm_source=x&b=2&utm_campaign=y",
        "https://example.com/a?b=2",
    ),
    (
        "https://example.com/a?x=1&b=2",
        "https://example.com/a?b=2&x=1",
    ),  # param sort
    ("https://example.com/a?ref=tw&fbclid=1&gclid=2", "https://example.com/a"),
    ("https://example.com/a?utm_source=x", "https://example.com/a"),
    ("https://example.com/a?", "https://example.com/a"),  # empty query
    ("https://example.com/a?b=2&&x=1", "https://example.com/a?b=2&x=1"),
    # refx is NOT the tracking param 'ref=' — must survive
    ("https://example.com/a?refx=1", "https://example.com/a?refx=1"),
    ("ftp://Files.Example.com/pub/", "ftp://files.example.com/pub"),
]


def test_canonicalize_rules(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["raw"])
    got = [
        r.canon
        for r in df.select(canonicalize_url(F.col("raw")).alias("canon"))
        .collect()
    ]
    assert got == [c for _, c in CASES]


def test_sql_twin_matches_spark(spark):
    """The DuckDB expression replays every rule bit-identically."""
    con = duckdb.connect()
    expr = canonicalize_url_sql("raw")
    for raw, want in CASES:
        [(got,)] = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS raw)", [raw]
        ).fetchall()
        assert got == want, raw


def test_idempotent(spark):
    """Canonicalizing a canonical URL is a no-op (fixpoint)."""
    df = spark.createDataFrame([(c,) for _, c in CASES], ["raw"])
    got = [
        r.canon
        for r in df.select(canonicalize_url(F.col("raw")).alias("canon"))
        .collect()
    ]
    assert got == [c for _, c in CASES]


def test_plan_is_scan_side(spark):
    """Zero exchanges: the canonical form is a pure projection."""
    df = spark.range(10).select(
        F.concat(F.lit("HTTPS://X"), F.col("id").cast("string"), F.lit(".COM/p/"))
        .alias("raw")
    )
    plan = (
        df.select(canonicalize_url(F.col("raw")).alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_canonicalize_idempotent_on_generated_urls(spark):
    """Property: canon(canon(u)) == canon(u) for adversarial
    generated URLs. All examples ride ONE DataFrame pass (hypothesis'
    per-example style would launch minutes of Spark jobs); the
    example set is drawn once with a fixed seed for determinism."""
    import random

    rnd = random.Random(42)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp"]
    hosts = [
        "Example.COM", "a.b.c", "X--Y.net", "localhost",
        # userinfo authorities: passthrough (ADVICE r9), and
        # passthrough is trivially idempotent — but keep them in the
        # generator so a future host-split change can't regress it.
        "alice:pw@Site.COM", "bob@h.net",
    ]
    ports = ["", ":80", ":443", ":8080", ":0", ":65535"]
    paths = ["", "/", "//", "/a", "/a/", "/a//b///c/", "/%20x", "/a.b,c"]
    queries = [
        "", "?", "?a=1", "?b=2&a=1", "?a=1&&b=2", "?utm_source=z&a=1",
        "?ref=x", "?refx=1&fbclid=2", "?a=b=c&d", "?=empty&a=1",
    ]
    frags = ["", "#", "#f", "#a?b=1"]
    urls = [
        rnd.choice(schemes) + "://" + rnd.choice(hosts) + rnd.choice(ports)
        + rnd.choice(paths) + rnd.choice(queries) + rnd.choice(frags)
        for _ in range(300)
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["raw"])
    once = canonicalize_url(F.col("raw")).alias("c1")
    rows = (
        df.select(F.col("raw"), once)
        .select("raw", "c1", canonicalize_url(F.col("c1")).alias("c2"))
        .collect()
    )
    bad = [(r.raw, r.c1, r.c2) for r in rows if r.c1 != r.c2]
    assert not bad, bad[:5]


REVIEW_CASES = [
    # r9 review findings: fragment-'?' leak, schemeless collapse,
    # IPv6 bracket truncation, bare tracking params.
    ("https://example.com/a#a?b=1", "https://example.com/a"),
    ("example.com/a?x=1", "example.com/a?x=1"),  # non-absolute: passthrough
    ("//cdn.example.com/x", "//cdn.example.com/x"),  # scheme-relative
    ("https://[::1]:443/a", "https://[::1]/a"),
    ("https://[::1]:8443/a", "https://[::1]:8443/a"),
    ("https://[2001:db8::1]/a", "https://[2001:db8::1]/a"),
    ("https://example.com/a?ref", "https://example.com/a"),
    ("https://example.com/a?fbclid", "https://example.com/a"),
    ("https://example.com/a?refx=1", "https://example.com/a?refx=1"),
    # ADVICE r9 (medium): userinfo authorities pass through — the host
    # split would otherwise collapse DIFFERENT hosts behind one
    # username ('alice@site1.com' and 'alice@site2.com' → 'alice').
    ("https://alice:pw@site1.com/p", "https://alice:pw@site1.com/p"),
    ("https://alice:pw@site2.com/p", "https://alice:pw@site2.com/p"),
    ("http://bob@example.com:80/a/", "http://bob@example.com:80/a/"),
    ("ftp://u@h/x//y?utm_source=1", "ftp://u@h/x//y?utm_source=1"),
]


def test_review_edge_cases_spark_and_sql(spark):
    df = spark.createDataFrame([(r,) for r, _ in REVIEW_CASES], ["raw"])
    got = [
        r.canon
        for r in df.select(canonicalize_url(F.col("raw")).alias("canon"))
        .collect()
    ]
    assert got == [c for _, c in REVIEW_CASES]
    con = duckdb.connect()
    expr = canonicalize_url_sql("raw")
    for raw, want in REVIEW_CASES:
        [(g,)] = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS raw)", [raw]
        ).fetchall()
        assert g == want, raw
