"""Unit tests for operators/bpe.py — encode semantics on closed-form
words where greedy BPE has a hand-derivable answer."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hdfs_parquet_importer_spark.operators import bpe


def _encode(spark, word: str, merges: list[str]) -> list[str]:
    df = spark.createDataFrame([(word,)], "w string").select(
        bpe.encode_tokens(
            F.col("w"), F.array(*[F.lit(m) for m in merges])
        ).alias("t")
    )
    return df.collect()[0].t


@pytest.mark.parametrize(
    ("word", "merges", "want"),
    [
        # No rules: pure character split.
        ("abc", [], ["a", "b", "c"]),
        # One rule, one site.
        ("abc", ["ab"], ["ab", "c"]),
        # Greedy left-to-right, non-overlapping: aaa -> [aa, a].
        ("aaa", ["aa"], ["aa", "a"]),
        ("aaaa", ["aa"], ["aa", "aa"]),
        # A merged token blocks later rules over its interior chars:
        # ab fires first, so bc never sees the b.
        ("abc", ["ab", "bc"], ["ab", "c"]),
        # Priority order decides: same word, rules swapped.
        ("abc", ["bc", "ab"], ["a", "bc"]),
        # The closing separator of one merge opens the next candidate
        # in the SAME pass (replace resumes after the substitution).
        ("abab", ["ab"], ["ab", "ab"]),
        ("aabb", ["ab"], ["a", "ab", "b"]),
        # A later rule cannot re-match inside an earlier merge, but
        # still fires elsewhere.
        ("abba", ["ab", "ba"], ["ab", "ba"]),
        # Single char / rule that never fires.
        ("a", ["ab"], ["a"]),
        ("zzz", ["ab"], ["z", "z", "z"]),
    ],
)
def test_encode_closed_forms(spark, word, merges, want):
    assert _encode(spark, word, merges) == want


def test_token_count_matches_encode_tokens(spark):
    words = ["banana", "aaaaaa", "mississippi", "x", "queue"]
    merges = ["an", "ss", "aa", "ue"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    arr = F.array(*[F.lit(m) for m in merges])
    got = df.select(
        "w",
        F.size(bpe.encode_tokens(F.col("w"), arr)).alias("via_split"),
        bpe.token_count(F.col("w"), arr).alias("via_seps"),
    ).collect()
    for r in got:
        assert r.via_split == r.via_seps, r


def test_learn_merges_priority_order(spark):
    # 3x "ab" pairs from 'abab'-ish words, 2x "cd": ab outranks cd;
    # ties break pair-ascending.
    docs = spark.createDataFrame(
        [(1, "abq abq abq"), (2, "cdq cdq")], "doc_id long, text string"
    )
    # Counts: ab=3, bq=3, cd=2, dq=2 -> (count DESC, pair ASC).
    merges = bpe.learn_merges(docs, "text", k=3).collect()[0].merges
    assert merges == ["ab", "bq", "cd"]
    # Deterministic overall: re-learning yields the identical list.
    again = bpe.learn_merges(docs, "text", k=3).collect()[0].merges
    assert merges == again


def test_doc_token_counts_totals(spark):
    # 'aaaa bb' with rule aa: words [aaaa, bb] -> [aa,aa] + [b,b]
    # (bb not a rule) = 4 tokens, 6 chars, 2 words.
    docs = spark.createDataFrame([(7, "aaaa bb")], "doc_id long, text string")
    merges = spark.createDataFrame([(["aa"],)], "merges array<string>")
    row = bpe.doc_token_counts(docs, ["doc_id"], "text", merges).collect()[0]
    assert (row.doc_id, row.n_words, row.n_chars, row.n_tokens_bpe) == (
        7,
        2,
        6,
        4,
    )


def _ref_encode(word: str, merges: list[str]) -> list[str]:
    """Pure-Python canonical greedy BPE: one left-to-right pass per
    rule in priority order, merge when the previous token is exactly
    L and the incoming one exactly R."""
    toks = list(word)
    for rule in merges:
        left, right = rule[0], rule[1]
        out: list[str] = []
        for t in toks:
            if out and out[-1] == left and t == right:
                out[-1] = left + right
            else:
                out.append(t)
        toks = out
    return toks


def test_encode_exhaustive_small_words(spark):
    """Every word of length 1..6 over {a,b} against three rule sets
    (incl. the chain-heavy self-pair and the order-flip), checked in
    ONE Spark job against the Python reference — the overlap/chain
    edge cases live entirely inside this space."""
    import itertools

    words = [
        "".join(p)
        for n in range(1, 7)
        for p in itertools.product("ab", repeat=n)
    ]
    rule_sets = [["aa", "ab"], ["ab", "ba"], ["ba", "bb", "aa"]]
    rows = [(w, rs) for w in words for rs in rule_sets]
    df = spark.createDataFrame(
        rows, "w string, merges array<string>"
    ).select(
        "w",
        "merges",
        bpe.encode_tokens(F.col("w"), F.col("merges")).alias("got"),
    )
    for r in df.collect():
        want = _ref_encode(r.w, r.merges)
        assert r.got == want, (r.w, r.merges, r.got, want)
