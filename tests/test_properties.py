"""Property-based tests (hypothesis) for the reference-parity edge
semantics — the pieces SURVEY §7.3 flags as easiest to get subtly
wrong. Each Spark property batches all generated examples into ONE
DataFrame so hypothesis shrinks over Python data, not Spark jobs."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.etl.arrays import parse_string_array
from hdfs_parquet_importer_spark.etl.enrich import (
    DATE_TIME_REGEX,
    extract_date,
    extract_month,
    extract_year,
)
from hdfs_parquet_importer_spark.schema import parse_schema_text

_TYPES = ["String", "Long", "Int", "Double", "Float", "Boolean"]

_name = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_"),
    min_size=1,
    max_size=20,
)


@given(
    st.lists(st.tuples(_name, st.sampled_from(_TYPES)), min_size=1, max_size=30),
    st.sampled_from(["", " ", "\t", "  "]),
)
@settings(max_examples=200, deadline=None)
def test_schema_parser_roundtrip(pairs, pad):
    """Rendering (name, type) pairs with arbitrary padding + comments
    and parsing back preserves names, order, and types."""
    lines = ["# header comment", ""]
    for n, t in pairs:
        lines.append(f"{pad}{n}{pad}={pad}{t}{pad}")
    schema = parse_schema_text("\n".join(lines))
    assert [f.name for f in schema.fields] == [n for n, _ in pairs]
    assert [f.dataType.simpleString() for f in schema.fields] == [
        {"String": "string", "Long": "bigint", "Int": "int",
         "Double": "double", "Float": "float", "Boolean": "boolean"}[t]
        for _, t in pairs
    ]
    assert all(f.nullable for f in schema.fields)


def _ref_array_parse(s):
    """Driver-side reference semantics of O5 (SURVEY §2.1):
    null/'' -> []; else strip first+last char, Java-split on ',', trim.

    Java String.split(sep) (limit 0): a zero-length input yields [""];
    otherwise trailing EMPTY strings (pre-trim) are removed — possibly
    all of them ("," -> [])."""
    if s is None or s == "":
        return []
    inner = s[1:-1] if len(s) >= 2 else ""
    if inner == "":
        return [""]
    parts = inner.split(",")
    while parts and parts[-1] == "":
        parts.pop()
    return [p.strip() for p in parts]


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.just(""),
            st.just("[]"),
            st.builds(
                lambda els: "[" + ", ".join(els) + "]",
                st.lists(st.text(alphabet="abcxyz 1", max_size=5), max_size=5),
            ),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=20, deadline=None)
def test_array_parse_matches_reference_model(spark, vals):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, s string")
    got = {
        r.i: r.a
        for r in df.select("i", parse_string_array(F.col("s")).alias("a")).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == _ref_array_parse(v), (v, got[i])


_datetime_like = st.one_of(
    st.none(),
    st.just(""),
    # valid shape
    st.builds(
        lambda y, mo, d, h, mi: f"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}",
        st.integers(0, 9999), st.integers(0, 99), st.integers(0, 99),
        st.integers(0, 99), st.integers(0, 99),
    ),
    # junk
    st.text(alphabet="0123456789-: x", max_size=20),
)


@given(st.lists(_datetime_like, min_size=1, max_size=50))
@settings(max_examples=20, deadline=None)
def test_date_enrich_matches_reference_model(spark, vals):
    # Java's \z (absolute end of input) is Python's \Z — translate so
    # the Python reference model replays the module's Matcher.matches
    # anchoring exactly (r11: the regex grew \A/\z so a trailing
    # newline no longer sneaks past rlike/regexp_extract's find()).
    rx = re.compile(DATE_TIME_REGEX.replace("\\z", "\\Z"))
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, s string")
    got = {
        r.i: (r.d, r.y, r.m)
        for r in df.select(
            "i",
            extract_date(F.col("s")).alias("d"),
            extract_year(F.col("s")).alias("y"),
            extract_month(F.col("s")).alias("m"),
        ).collect()
    }
    for i, v in enumerate(vals):
        if v is None:
            assert got[i] == ("", "", "")
            continue
        m = rx.match(v)
        exp_date = v.split(" ")[0] if v else ""
        exp_year = m.group(1) if m else ""
        exp_month = m.group(2) if m else ""
        assert got[i] == (exp_date, exp_year, exp_month), (v, got[i])


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, seed):
    """Arbitrary pixel content round-trips bit-exactly through the
    real PNG encoder/decoder (pure Python — no Spark job per example)."""
    from hdfs_parquet_importer_spark.operators import multimodal as M

    rnd = seed
    px = bytearray()
    for _ in range(w * h):
        rnd = (1103515245 * rnd + 12345) % (1 << 31)
        px.append(rnd & 0xFF)
    data = M.encode_png_gray(bytes(px), w, h)
    gw, gh, got = M.decode_png_gray(data)
    assert (gw, gh, got) == (w, h, bytes(px))


@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=200),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(samples, rate):
    from hdfs_parquet_importer_spark.operators import multimodal as M

    got_rate, got = M.decode_wav_pcm16(M.encode_wav_pcm16(samples, rate))
    assert got_rate == rate and got == samples


def test_prefix_sum_property(spark):
    """One batched Spark check over many generated cases: exclusive
    prefix sums from the two-phase operator equal the naive running
    sum for gappy, duplicated-value, single-bucket and cross-bucket
    shapes."""
    import itertools

    from hdfs_parquet_importer_spark.operators.prefix import prefix_sum

    cases = []
    for width, n in itertools.product((1, 3, 16, 1000), (1, 2, 17, 100)):
        keys = sorted({(i * 7919) % (n * 5) for i in range(n)})
        vals = [(k * 13) % 29 for k in keys]
        cases.append((width, keys, vals))
    for width, keys, vals in cases:
        df = spark.createDataFrame(list(zip(keys, vals)), "k long, v long")
        got = {
            r.k: r.offset
            for r in prefix_sum(
                df.repartition(5), "k", "v", bucket=F.expr(f"k div {width}")
            ).collect()
        }
        run = 0
        for k, v in zip(keys, vals):
            assert got[k] == run, (width, k)
            run += v


def test_dist_rank_property(spark):
    """Distributed ranks equal row_number over (v, id) for shapes
    with heavy ties, bucket-border values, negatives and single
    rows — across several bucket widths."""
    import itertools

    from hdfs_parquet_importer_spark.operators.prefix import dist_rank

    for width, n, mod in itertools.product((1, 2, 16), (1, 3, 50), (1, 7)):
        rows = [(i, ((i * 31) % mod) - mod // 2) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v long").repartition(4)
        got = {
            r.id: r.rk
            for r in dist_rank(
                df, ["v", "id"], bucket=F.expr(f"v div {width}"), out_col="rk"
            ).collect()
        }
        want = {
            i: rank + 1
            for rank, (i, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
        }
        assert got == want, (width, n, mod)


def test_banded_range_agg_property(spark):
    """Banded trailing-range count/sum equal the naive global RANGE
    window across widths, tie densities and negative values."""
    import itertools

    from pyspark.sql import Window

    from hdfs_parquet_importer_spark.operators.prefix import banded_range_agg

    for width, n, mod in itertools.product((1, 5, 100), (1, 4, 60), (3, 23)):
        rows = [(i, float(((i * 37) % mod) - mod // 2)) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v double").repartition(5)
        got = {
            r.id: (r.n_in, r.s_in)
            for r in banded_range_agg(
                df,
                "v",
                float(width),
                lambda w: [
                    F.count(F.lit(1)).over(w).alias("n_in"),
                    F.sum("v").over(w).alias("s_in"),
                ],
            ).collect()
        }
        w = Window.orderBy("v").rangeBetween(-width, Window.currentRow)
        want = {
            r.id: (r.n_in, r.s_in)
            for r in df.select(
                "id",
                F.count(F.lit(1)).over(w).alias("n_in"),
                F.sum("v").over(w).alias("s_in"),
            ).collect()
        }
        assert got == want, (width, n, mod)


@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=500),
            min_size=2,
            max_size=40,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=60, deadline=None)
def test_cusum_reflection_identity(serieses):
    """stat_cusum_drift's window formulation rests on the reflection
    identity S_t = C_t - min(0, min_{j<=t} C_j) for the recursion
    S_t = max(0, S_{t-1} + y_t). Prove equivalence against the
    literal sequential fold on arbitrary integer series (pure-Python:
    the identity is algebra, not Spark; the query's oracle parity
    covers the engine side). The min must INCLUDE the current prefix:
    the first draft used min_{j<t} and this test's shrunk
    counterexample ([0, 1] -> S_1 = C_1 = -0.75 instead of 0) is why
    the query's frame says CURRENT ROW."""
    for xs in serieses:
        mu = sum(xs) / len(xs)
        var = sum((x - mu) ** 2 for x in xs) / len(xs)
        k = 0.5 * var**0.5
        ys = [x - mu - k for x in xs]

        # Literal recursion.
        s_seq = []
        s = 0.0
        for y in ys:
            s = max(0.0, s + y)
            s_seq.append(s)

        # Reflection identity (the two-window form the query plans):
        # running sum minus min(0, running min INCLUDING current row).
        s_win = []
        c = 0.0
        min_prefix = 0.0
        for y in ys:
            c += y
            min_prefix = min(min_prefix, c)
            s_win.append(c - min(0.0, min_prefix))

        for a, b in zip(s_seq, s_win):
            assert abs(a - b) < 1e-9, (xs, s_seq, s_win)


@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=100, deadline=None)
def test_gini_rank_formula_matches_pairwise_definition(xs):
    """stat_gini_coefficient uses the rank formulation
    G = 2*sum(i * x_(i)) / (n * sum(x)) - (n + 1)/n. Prove it equals
    the definitional mean-absolute-difference form
    G = sum_ij |x_i - x_j| / (2 n^2 mu) on arbitrary nonnegative
    samples (pure algebra — the engine side is oracle-gated)."""
    if sum(xs) == 0:
        return  # G undefined at zero total (no revenue): query N/A
    n = len(xs)
    srt = sorted(xs)
    total = sum(xs)
    g_rank = 2 * sum((i + 1) * x for i, x in enumerate(srt)) / (
        n * total
    ) - (n + 1) / n
    mu = total / n
    g_pair = sum(abs(a - b) for a in xs for b in xs) / (2 * n * n * mu)
    assert abs(g_rank - g_pair) < 1e-9


@given(
    st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=40),
)
@settings(max_examples=100, deadline=None)
def test_mann_whitney_midrank_u_matches_pair_counting(sa, sb):
    """stat_mann_whitney folds U from distinct-value midranks:
    U_a = sum(ca * midrank) - na(na+1)/2. Prove it equals the
    definitional pair count #{a>b} + 0.5*#{a==b} on small integer
    samples — the tie-heavy regime is exactly what midranks exist
    for."""
    na, nb = len(sa), len(sb)
    # Midrank formulation over distinct values (the query's shape).
    vals = sorted(set(sa + sb))
    before = 0
    ra = 0.0
    for x in vals:
        ca = sa.count(x)
        cb = sb.count(x)
        c = ca + cb
        ra += ca * (before + (c + 1) / 2)
        before += c
    u_midrank = ra - na * (na + 1) / 2
    # Definitional pair counting.
    u_pairs = sum(
        1.0 if a > b else (0.5 if a == b else 0.0)
        for a in sa
        for b in sb
    )
    assert abs(u_midrank - u_pairs) < 1e-9
