"""TF-IDF sparse cosine similarity: numpy cross-check, posting-cap
bounds, df pruning, and the equi-join plan pin."""

from __future__ import annotations

import math

from hdfs_parquet_importer_spark.operators.tfidf import (
    cap_postings,
    cosine_pairs,
    tfidf_topk_pairs,
    tfidf_weights,
)

CORPUS = [
    (1, "apple banana apple cherry"),
    (2, "apple banana banana date"),
    (3, "cherry date elder fig"),
    (4, "apple apple apple banana"),
    (5, "grape"),
]


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _reference_pairs(max_df_frac=1.0):
    """Driver-side tf-idf cosine over CORPUS."""
    toks = {i: t.split() for i, t in CORPUS}
    n = len(toks)
    df: dict[str, int] = {}
    for ts in toks.values():
        for term in set(ts):
            df[term] = df.get(term, 0) + 1
    vecs = {}
    for i, ts in toks.items():
        v = {}
        for term in ts:
            if df[term] <= max_df_frac * n:
                v[term] = v.get(term, 0) + 1
        vecs[i] = {t: c * math.log(n / df[t]) for t, c in v.items()}
    out = {}
    ids = sorted(vecs)
    for x in ids:
        for y in ids:
            if x >= y:
                continue
            shared = set(vecs[x]) & set(vecs[y])
            if not shared:
                continue
            dot = sum(vecs[x][t] * vecs[y][t] for t in shared)
            na = math.sqrt(sum(w * w for w in vecs[x].values()))
            nb = math.sqrt(sum(w * w for w in vecs[y].values()))
            out[(x, y)] = round(dot / (na * nb), 6)
    return out


def test_cosine_matches_driver_reference(spark):
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_pairs(
            tfidf_weights(_docs(spark), "doc_id", "text", max_df_frac=1.0)
        ).collect()
    }
    want = _reference_pairs(max_df_frac=1.0)
    assert got == want


def test_df_pruning_drops_stopword_grade_terms(spark):
    # 'apple' and 'banana' are in 3/5 docs; at max_df_frac=0.5 both
    # prune (df=3 > 2.5), so doc 4 (apple+banana only) loses its
    # entire vector and every pair involving it disappears.
    w = tfidf_weights(_docs(spark), "doc_id", "text", max_df_frac=0.5)
    terms = {r.term for r in w.select("term").distinct().collect()}
    assert "apple" not in terms and "banana" not in terms
    got = {(r.id_a, r.id_b) for r in cosine_pairs(w).collect()}
    assert all(4 not in p for p in got)


def test_cap_postings_bounds_fanout(spark):
    w = tfidf_weights(_docs(spark), "doc_id", "text", max_df_frac=1.0)
    capped = cap_postings(w, per_term_cap=2)
    counts = {
        r.term: r.n
        for r in capped.groupBy("term").count().withColumnRenamed("count", "n").collect()
    }
    assert counts and all(n <= 2 for n in counts.values())
    # Deterministic: highest-weight docs survive; 'apple' weight is
    # largest in doc 4 (tf=3), so doc 4 must be among its survivors.
    apple_ids = {r.id for r in capped.filter("term = 'apple'").collect()}
    assert 4 in apple_ids


def test_topk_limit_and_order(spark):
    top = tfidf_topk_pairs(
        _docs(spark), "doc_id", "text", k=3, max_df_frac=1.0
    ).collect()
    assert len(top) == 3
    cosines = [r.cosine for r in top]
    assert cosines == sorted(cosines, reverse=True)


def test_tfidf_pair_join_is_term_equi_join(spark):
    """The registered query sits in BRUTE_FORCE_OK for its 1-row
    corpus-size broadcast; pin the pair join itself to the term
    equi-join so a cartesian can't hide behind the allowlist."""
    from tests.test_plans import plan_of

    w = tfidf_weights(_docs(spark), "doc_id", "text", max_df_frac=1.0)
    plan = plan_of(cosine_pairs(w))
    assert "CartesianProduct" not in plan
