"""Unit tests for dedup operators: known-answer fixtures plus
recall-vs-brute-force checks at sf0.001 for the sketch-based paths
(MinHash-LSH, SimHash) that have no DuckDB oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.operators import dedup as D
from hdfs_parquet_importer_spark.tables import load_table


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog today"),
            (2, "the QUICK brown fox — jumps over the lazy dog today!"),  # = 1 normalized
            (3, "The quick brown fox jumps over the lazy cat today"),  # near-dup of 1
            (4, "Completely different content about spark partitions and shuffles"),
            (5, ""),
        ],
        ["doc_id", "text"],
    )


def test_normalize_text(spark):
    df = spark.createDataFrame([("  Héllo,   World! 42  ",)], ["t"])
    out = df.select(D.normalize_text(F.col("t")).alias("n")).first()["n"]
    # non [a-z0-9] chars (including accented letters) -> space, collapsed
    assert out == "h llo world 42"


def test_exact_dedup_groups(spark, docs):
    out = D.exact_dedup(
        docs, F.md5(D.normalize_text(F.col("text"))), "doc_id"
    ).collect()
    groups = {r["keep_id"]: r["n_copies"] for r in out}
    assert groups[1] == 2  # docs 1 and 2 collapse
    assert groups[3] == 1
    assert groups[4] == 1
    assert groups[5] == 1
    assert len(out) == 4


def test_shingles_and_jaccard(spark):
    df = spark.createDataFrame([("a b c d",)], ["t"])
    sh = df.select(D.shingles(F.col("t"), 3).alias("s")).first()["s"]
    assert sorted(sh) == ["a b c", "b c d"]
    pair = spark.createDataFrame(
        [(["a", "b", "c"], ["b", "c", "d"])], ["x", "y"]
    ).select(D.jaccard(F.col("x"), F.col("y")).alias("j"))
    assert pair.first()["j"] == pytest.approx(2 / 4)


def test_empty_text_shingles(spark):
    df = spark.createDataFrame([("",), ("ab",)], ["t"])
    rows = df.select(D.shingles(F.col("t"), 3).alias("s")).collect()
    # '' normalizes to '' -> tokens [''] -> fewer than 3 tokens -> []
    assert rows[0]["s"] == []
    assert rows[1]["s"] == []


def test_minhash_zero_shingle_docs_never_pair(spark):
    """The r14 one-scan rewrite derives signatures from the SAME
    checkpointed shingle-set table as the verify join; the subtle
    contract it must preserve is that zero-shingle docs (< shingle_n
    tokens) are ABSENT from the signature table (the explode drops
    them) and therefore never become candidates — even verbatim
    duplicates (the operator's documented SCOPE)."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta"),  # 2 tokens < shingle_n=3 -> no shingles
            (2, "alpha beta"),  # verbatim dup of 1, still no shingles
            (3, "one two three four five"),
            (4, "one two three four five"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_dedup_pairs(
            df, "doc_id", "text", threshold=0.8
        ).collect()
    }
    assert pairs == {(3, 4)}


def test_minhash_finds_planted_near_dup(spark, docs):
    pairs = D.minhash_dedup_pairs(
        docs, "doc_id", "text", threshold=0.5, shingle_n=2
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found  # exact dup after normalization, jaccard 1.0
    assert (1, 3) in found or (3, 1) in found  # one-word edit near-dup


def test_minhash_lsh_recall_vs_brute_force(spark, sf_dir):
    """Every true Jaccard>=0.8 pair in the real corpus must be found
    (detection prob at s>=0.8 with 8x4 banding is ~0.97 per pair at
    s=0.8 and ~1.0 at s~1; the planted dups sit at s~1)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", D.shingles(F.col("text"), 3).alias("s"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    truth = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", D.jaccard(F.col("sa"), F.col("sb")).alias("j"))
        .filter(F.col("j") >= 0.8)
        .collect()
    }
    found = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_dedup_pairs(docs, "doc_id", "text", 0.8).collect()
    }
    assert truth, "testdata should contain planted near-dups"
    # exact-Jaccard verification makes found ⊆ truth; banding makes
    # recall ~1 at s~1
    assert found == truth


def test_simhash_identical_token_sets_collide(spark, docs):
    fps = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", D.simhash64(F.col("text")).alias("fp")
        ).collect()
    }
    assert fps[1] == fps[2]  # same token set -> same fingerprint
    assert fps[1] != fps[4]


def test_simhash_banding_guarantee_vs_brute_force(spark, sf_dir):
    """Pigeonhole guarantee: chunk banding must find EVERY pair with
    Hamming <= 3 (4 chunks, <= 3 differing bits -> >= 1 equal chunk).
    Brute-force all-pairs Hamming on the real corpus is the truth."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        F.col("doc_id").alias("id"), D.simhash64(F.col("text")).alias("fp")
    )
    a = fp.select(F.col("id").alias("id_a"), F.col("fp").alias("fp_a"))
    b = fp.select(F.col("id").alias("id_b"), F.col("fp").alias("fp_b"))
    truth = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    found = {
        (r["id_a"], r["id_b"])
        for r in D.simhash_candidate_pairs(
            docs, "doc_id", "text", max_hamming=3
        ).collect()
    }
    assert truth, "corpus should contain simhash-close pairs"
    assert found == truth


def test_simhash_hamming_zero_for_dups(spark, docs):
    out = D.simhash_candidate_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    ham = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert ham.get((1, 2)) == 0


# ---------------------------------------------------------------------------
# SemDeDup (cluster-scoped embedding dedup)
# ---------------------------------------------------------------------------
def test_semdedup_matches_numpy_ground_truth(spark, sf_dir):
    """Full driver-side replay: numpy buckets + cosines + union-find
    must reproduce the distributed query's (canonical, removed) output
    exactly — an independent third implementation next to the Spark
    fixpoint and the DuckDB recursive-CTE oracle."""
    import numpy as np

    from hdfs_parquet_importer_spark.queries.llm import dedup_semdedup

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    bucket = {
        i: 4 * int(v[0] > 0) + 2 * int(v[1] > 0) + int(v[2] > 0)
        for i, v in vecs.items()
    }
    ids = sorted(vecs)
    # Same algebraic form as the query AND its oracle: normalize each
    # vector first, then dot — dot/(|a||b|) rounds differently and
    # could flip a threshold-boundary edge.
    normed = {i: v / np.sqrt(float(v @ v)) for i, v in vecs.items()}
    edges = []
    for ai, a in enumerate(ids):
        va = normed[a]
        for b in ids[ai + 1 :]:
            if bucket[a] != bucket[b]:
                continue
            if float(va @ normed[b]) >= 0.35:
                edges.append((a, b))

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}

    got = {
        r.vec_id: (r.canonical_id, r.is_removed)
        for r in dedup_semdedup(spark, sf_dir).collect()
    }
    assert got == {n: (c, n != c) for n, c in expect.items()}
    assert edges, "corpus should contain within-bucket near-dups"


def test_eval_simhash_recall_bounds(spark, sf_dir):
    """Structural invariants of the r12 simhash eval: planted pairs
    exist, hits bounded by truth, identical-token-set pairs (hamming
    0) stay detected, and the short-doc boundary the query documents
    (avg flip count well above the banding threshold) holds at every
    SF of this corpus family."""
    from hdfs_parquet_importer_spark.queries import registry

    row = registry()["eval_simhash_recall"].fn(spark, sf_dir).collect()[0]
    assert row.n_truth > 0
    assert 0 <= row.n_hit <= row.n_truth
    assert 0.0 <= row.recall <= 1.0
    assert row.avg_hamming > 3  # the documented short-doc boundary
    assert row.max_hamming <= 63


def test_span_removal_reconstruction_invariants(spark, sf_dir):
    """Structural invariants of dedup_span_removal: counts add up,
    removals agree with dedup_substring_span's coverage statistic on
    the docs both report, and a planted-dup source (whose whole text
    recurs inside its ' dup' copy) cleans to the EMPTY stream with
    the md5('') sentinel rather than vanishing."""
    from hdfs_parquet_importer_spark.queries import registry

    reg = registry()
    rows = reg["dedup_span_removal"].fn(spark, sf_dir).collect()
    assert rows, "non-empty corpus must produce rows"
    by_id = {}
    for r in rows:
        assert 0 <= r.kept_tokens <= r.n_tokens
        assert r.removed_tokens == r.n_tokens - r.kept_tokens
        assert len(r.kept_md5) == 32
        by_id[r.doc_id] = r

    # Same coverage machinery as dedup_substring_span: its dup_tokens
    # must equal our removed_tokens on every doc it reports.
    for s in reg["dedup_substring_span"].fn(spark, sf_dir).collect():
        assert by_id[s.doc_id].removed_tokens == s.dup_tokens

    empty_md5 = "d41d8cd98f00b204e9800998ecf8427e"
    fully = [r for r in rows if r.kept_tokens == 0]
    assert fully, "planted full-duplicates must clean to empty"
    assert all(r.kept_md5 == empty_md5 for r in fully)
    # And every doc keeping tokens must NOT carry the empty sentinel.
    assert all(
        r.kept_md5 != empty_md5 for r in rows if r.kept_tokens > 0
    )


def test_contamination_recall_is_total(spark, sf_dir):
    """Structural invariants of eval_contamination_recall: planted
    truth exists, the exact n-gram detector finds EVERY planted doc
    (a ' dup' copy is a gram superset of its source — recall below
    1.0 is a pipeline bug, not a tuning trade), the margin respects
    the 3-gram floor (shortest doc = 10 tokens), and the full
    detection set is at least as large as the truth."""
    from hdfs_parquet_importer_spark.queries import registry

    row = registry()["eval_contamination_recall"].fn(spark, sf_dir).collect()[0]
    assert row.n_truth > 0
    assert row.n_hit == row.n_truth
    assert row.recall == 1.0
    assert row.min_truth_shared >= 3
    assert row.n_flagged >= row.n_hit
