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
        ("abc", ["a b"], ["ab", "c"]),
        # Greedy left-to-right, non-overlapping: aaa -> [aa, a].
        ("aaa", ["a a"], ["aa", "a"]),
        ("aaaa", ["a a"], ["aa", "aa"]),
        # A merged token blocks later rules over its interior chars:
        # ab fires first, so bc never sees the b.
        ("abc", ["a b", "b c"], ["ab", "c"]),
        # Priority order decides: same word, rules swapped.
        ("abc", ["b c", "a b"], ["a", "bc"]),
        # The closing separator of one merge opens the next candidate
        # in the SAME pass (replace resumes after the substitution).
        ("abab", ["a b"], ["ab", "ab"]),
        ("aabb", ["a b"], ["a", "ab", "b"]),
        # A later rule cannot re-match inside an earlier merge, but
        # still fires elsewhere.
        ("abba", ["a b", "b a"], ["ab", "ba"]),
        # Single char / rule that never fires.
        ("a", ["a b"], ["a"]),
        ("zzz", ["a b"], ["z", "z", "z"]),
    ],
)
def test_encode_closed_forms(spark, word, merges, want):
    assert _encode(spark, word, merges) == want


def test_token_count_matches_encode_tokens(spark):
    words = ["banana", "aaaaaa", "mississippi", "x", "queue"]
    merges = ["a n", "s s", "a a", "u e"]
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
    assert merges == ["a b", "b q", "c d"]
    # Deterministic overall: re-learning yields the identical list.
    again = bpe.learn_merges(docs, "text", k=3).collect()[0].merges
    assert merges == again


def test_doc_token_counts_totals(spark):
    # 'aaaa bb' with rule aa: words [aaaa, bb] -> [aa,aa] + [b,b]
    # (bb not a rule) = 4 tokens, 6 chars, 2 words.
    docs = spark.createDataFrame([(7, "aaaa bb")], "doc_id long, text string")
    merges = spark.createDataFrame([(["a a"],)], "merges array<string>")
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
        left, right = rule.split(" ")
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
    rule_sets = [["a a", "a b"], ["a b", "b a"], ["b a", "b b", "a a"]]
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


def test_encode_multichar_rules(spark):
    # Whole-token sides (ADVICE r7): later rules consume earlier
    # rules' outputs — "abab" under [a+b, ab+ab] -> one token.
    assert _encode(spark, "abab", ["a b", "ab ab"]) == ["abab"]
    # Frame dots pin whole tokens: rule (b, a) must NOT fire inside
    # the merged token "ab|ab"; rule (ab, a) fires on a real boundary.
    assert _encode(spark, "abaaba", ["a b", "ab a"]) == ["aba", "aba"]


def test_encode_exhaustive_multichar(spark):
    """Exhaustive {a,b} words <=6 against rule sets with multi-char
    sides, vs the Python reference (which splits rules on the space
    and compares whole tokens)."""
    import itertools

    words = [
        "".join(p)
        for n in range(1, 7)
        for p in itertools.product("ab", repeat=n)
    ]
    rule_sets = [
        ["a b", "ab ab"],
        ["a a", "aa b", "b aab"],
        ["b b", "a bb", "abb a"],
    ]
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


def test_malformed_rule_raises(spark):
    # A rule without the 'L R' shape must raise, never silently
    # misapply (ADVICE r7).
    with pytest.raises(Exception, match="BPE merge rule"):
        _encode(spark, "abc", ["ab"])


def test_adjacent_pairs(spark):
    df = spark.createDataFrame(
        [(".a.bc.d.",), (".x.",), (".",)], "f string"
    ).select(bpe.adjacent_pairs(F.col("f")).alias("p"))
    assert [r.p for r in df.collect()] == [["a bc", "bc d"], [], []]


def _ref_learn(word_counts: dict[str, int], rounds: int) -> list[str]:
    """Pure-Python Sennrich trainer: re-encode vocab under rules so
    far, recount weighted adjacent token pairs, adopt the top pair
    (count DESC, pair ASC)."""
    from collections import Counter

    merges: list[str] = []
    for _ in range(rounds):
        cnt: Counter[str] = Counter()
        for w, n in word_counts.items():
            toks = _ref_encode(w, merges)
            for a, b in zip(toks, toks[1:]):
                cnt[f"{a} {b}"] += n
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
    return merges


def test_learn_merges_iterative_matches_reference(spark):
    # Repetitive corpus where multi-round learning MUST produce
    # multi-char-side rules (round 2+ merges ride round 1's output).
    texts = [
        "banana bandana banana",
        "ban ban banana cabana",
        "anna anna banana",
    ]
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want = _ref_learn(wc, rounds=6)
    assert any(" " in r and max(len(s) for s in r.split(" ")) > 1 for r in want)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe.learn_merges_iterative(docs, "text", rounds=6).collect()[0].merges
    assert got == want

    # Round 1 of the iterative trainer == the one-shot counter's top-1.
    one = bpe.learn_merges(docs, "text", k=1).collect()[0].merges
    assert got[:1] == one


def test_learn_merges_iterative_exhausts_safely(spark):
    # A corpus whose every word is a single char has no pairs at all:
    # overshooting rounds must carry the empty table, not die or
    # fabricate rules.
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    got = bpe.learn_merges_iterative(docs, "text", rounds=3).collect()[0].merges
    assert got == []


@pytest.mark.parametrize(
    "bad", ["ab", "a b c", " a", "a ", "a. b", "a .b"]
)
def test_malformed_rule_variants_all_raise(spark, bad):
    # Exactly-one-space alone is not enough: empty sides (' a', 'a ')
    # would silently no-op, and a SEP inside a side ('a. b') would let
    # the probe match ACROSS token boundaries and apply a different
    # rule than written. All must raise.
    with pytest.raises(Exception, match="BPE merge rule"):
        _encode(spark, "abc", [bad])


def test_encode_tokens_empty_word_agrees_with_token_count(spark):
    from pyspark.sql import functions as F

    from hdfs_parquet_importer_spark.operators import bpe

    df = spark.createDataFrame([("",), ("ab",)], ["w"]).withColumn(
        "m", F.array(F.lit("a b"))
    )
    out = df.select(
        F.size(bpe.encode_tokens(F.col("w"), F.col("m"))).alias("sz"),
        bpe.token_count(F.col("w"), F.col("m")).alias("tc"),
    ).collect()
    assert all(r.sz == r.tc for r in out)
