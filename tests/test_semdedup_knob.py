"""The SemDeDup cluster-count knob (operators/semdedup.py, VERDICT r9
item 4): value-level correctness at TWO knob settings against the
parameterized DuckDB oracle, the nested-refinement property, and the
predicted pair-space reduction.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.operators.semdedup import (
    semdedup,
    semdedup_oracle_sql,
    srp_bucket,
)


def _spark_result(spark, sf_dir, bits):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = semdedup(emb, bits=bits).collect()
    return sorted((r.vec_id, r.canonical_id, r.is_removed) for r in rows)


def _oracle_result(sf_dir, bits):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    return sorted(
        tuple(t) for t in con.execute(semdedup_oracle_sql(bits=bits)).fetchall()
    )


@pytest.mark.parametrize("bits", [3, 6])
def test_semdedup_matches_oracle_at_both_knob_settings(spark, sf_dir, bits):
    """Correctness is knob-independent: at every ``bits`` the oracle
    replays the same buckets, so Spark and DuckDB must agree exactly
    — not just at the registered query's pinned bits=3."""
    assert _spark_result(spark, sf_dir, bits) == _oracle_result(sf_dir, bits)


def test_semdedup_finer_buckets_refine_components(spark, sf_dir):
    """The b-bit SRP bucket is a strict PREFIX of the (b+k)-bit bucket
    (srp_bucket is MSB-first on fixed axes), so raising the knob only
    REMOVES candidate pairs: every 6-bit component must sit inside one
    3-bit component, and the 6-bit dedup can only remove fewer."""
    coarse = dict(
        (v, c) for v, c, _ in _spark_result(spark, sf_dir, 3)
    )
    fine = _spark_result(spark, sf_dir, 6)
    for vec_id, canonical_id, _ in fine:
        # Same 6-bit component -> same 3-bit component (edges at 6
        # bits are a subset of edges at 3 bits, so the coarse labels
        # of a fine component's members all coincide).
        assert coarse[vec_id] == coarse[canonical_id], (vec_id, canonical_id)
    removed_fine = sum(1 for _, _, r in fine if r)
    removed_coarse = sum(1 for v, c in coarse.items() if v != c)
    assert removed_fine <= removed_coarse


def test_srp_bucket_raises_past_vector_dim(spark, sf_dir):
    """bits beyond the embedding dimension must raise loudly (r10
    review): under non-ANSI semantics vec[i] past the end is NULL,
    every bucket goes NULL, the pair equi-join silently emits zero
    edges, and the DuckDB twin diverges with its own out-of-range
    rules — a raise is the only cross-engine-safe behavior."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # bits within the long-shift range but past the (sliced) vector
    # dimension — the per-row guard must fire.
    short = emb.select(F.slice(F.col("embedding"), 1, 4).alias("v"))
    bad = short.select(srp_bucket(F.col("v"), 6).alias("b"))
    with pytest.raises(Exception, match="non-null leading dims"):
        bad.collect()
    # NULL vectors and NULL leading elements must raise too, not fall
    # through to a silent NULL bucket (size(NULL) < bits is NULL, so
    # a bare comparison would skip the guard).
    nullvec = spark.createDataFrame(
        [([0.1, -0.2, 0.3],), (None,)], "v: array<double>"
    )
    with pytest.raises(Exception, match="non-null leading dims"):
        nullvec.select(srp_bucket(F.col("v"), 3).alias("b")).collect()
    nullelem = spark.createDataFrame(
        [([0.1, None, 0.3],)], "v: array<double>"
    )
    with pytest.raises(Exception, match="non-null leading dims"):
        nullelem.select(srp_bucket(F.col("v"), 3).alias("b")).collect()
    # bits past the long bucket id raises at build time with the
    # real reason, not a literal-overflow NumberFormatException.
    with pytest.raises(ValueError, match="<= 63"):
        srp_bucket(F.col("embedding"), 64 + 1)


def test_semdedup_pair_space_drops_as_knob_predicts(spark, sf_dir):
    """Candidate-pair count = sum_b C(n_b, 2). For ~balanced buckets
    doubling 2^bits halves it; 3 -> 6 bits predicts ~8x. Assert the
    measured reduction is at least 4x (skew slack) — the knob must
    BUY pair-space, not just relabel."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def pairs(bits):
        return (
            emb.select(srp_bucket(F.col("embedding"), bits).alias("b"))
            .groupBy("b")
            .count()
            .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p"))
            .collect()[0]["p"]
        )

    p3, p6 = pairs(3), pairs(6)
    assert p6 * 4 <= p3, (p3, p6)


def test_eval_semdedup_recall_nested_prefix(spark, sf_dir):
    """srp buckets nest (6-bit bucket equality implies 3-bit), so the
    planted-pair hit count can only shrink as bits grow; planted
    cosines must sit far above the 0.35 edge threshold."""
    from hdfs_parquet_importer_spark.queries import registry

    row = registry()["eval_semdedup_recall"].fn(spark, sf_dir).collect()[0]
    assert row.n_truth > 0
    assert row.hit_6 <= row.hit_3 <= row.n_truth
    assert row.min_pair_cosine > 0.99
    assert 0.0 <= row.recall_6 <= row.recall_3 <= 1.0
