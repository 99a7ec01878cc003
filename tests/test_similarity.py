"""Unit tests for similarity search: exact cosine math, two-phase
top-k correctness vs a single-phase reference, and LSH recall."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.operators import similarity as S
from hdfs_parquet_importer_spark.tables import load_table


def test_cosine_known_values(spark):
    df = spark.createDataFrame(
        [
            ([1.0, 0.0], [1.0, 0.0], 1.0),
            ([1.0, 0.0], [0.0, 1.0], 0.0),
            ([1.0, 0.0], [-1.0, 0.0], -1.0),
            ([1.0, 1.0], [1.0, 0.0], 1 / math.sqrt(2)),
        ],
        ["a", "b", "want"],
    )
    rows = df.select(S.cosine(F.col("a"), F.col("b")).alias("c"), "want").collect()
    for r in rows:
        assert r["c"] == pytest.approx(r["want"], abs=1e-12)


def test_cosine_zero_norm_is_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 2.0])], ["a", "b"])
    assert df.select(S.cosine(F.col("a"), F.col("b")).alias("c")).first()["c"] is None


def test_brute_force_topk_matches_single_phase(spark, sf_dir):
    """Two-phase (salted) top-k must equal the naive single-window
    top-k — the salt is an execution detail, not a semantics change."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in S.brute_force_topk(emb, q, k=5).collect()
    }
    naive = (
        emb.join(F.broadcast(q))
        .select(
            "query_id",
            "vec_id",
            S.cosine(F.col("query_vec"), F.col("embedding")).alias("cos"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
            ),
        )
        .filter(F.col("rank") <= 5)
    )
    want = {(r["query_id"], r["rank"]): r["vec_id"] for r in naive.collect()}
    assert got == want


def test_lsh_topk_recall(spark, sf_dir):
    """Multiprobe hyperplane LSH should recover most of the true
    top-10 (random hyperplanes on clustered data; recall >= 0.5 is a
    loose floor — brute force is the correctness path, LSH the scale
    path)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    truth = {
        (r["query_id"], r["vec_id"])
        for r in S.brute_force_topk(emb, q, k=10).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in S.lsh_topk(emb, q, k=10, n_planes=6, multiprobe=True).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"LSH recall too low: {recall:.2f}"


def test_ivf_topk_recall_and_probe_restriction(spark, sf_dir):
    """IVF with data-adaptive k-means lists should beat the loose LSH
    floor on clustered data (recall >= 0.7 at 3/8 lists probed), and
    every returned neighbor must rank by exact cosine within the
    probed candidate set (monotone cos per query rank)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    truth = {
        (r["query_id"], r["vec_id"])
        for r in S.brute_force_topk(emb, q, k=10).collect()
    }
    got = S.ivf_topk(emb, q, k=10, n_lists=8, n_probe=3).collect()
    approx = {(r["query_id"], r["vec_id"]) for r in got}
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.7, f"IVF recall too low: {recall:.2f}"
    by_query: dict[int, list] = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append((r["rank"], r["cos"]))
    for ranked in by_query.values():
        ranked.sort()
        cosines = [c for _, c in ranked]
        assert cosines == sorted(cosines, reverse=True)


def test_ivf_topk_deterministic(spark, sf_dir):
    """Deterministic Lloyd init + driver-side probe selection: two
    runs return identical (query, rank) -> id mappings."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    run = lambda: {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in S.ivf_topk(emb, q, k=5, n_lists=8, n_probe=3).collect()
    }
    assert run() == run()


def test_lsh_bucket_is_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    planes = S.hyperplanes(64, 6, seed=42)
    b1 = emb.select(S.lsh_bucket(F.col("embedding"), planes).alias("b")).collect()
    b2 = emb.select(S.lsh_bucket(F.col("embedding"), planes).alias("b")).collect()
    assert [r["b"] for r in b1] == [r["b"] for r in b2]
    assert all(0 <= r["b"] < 64 for r in b1)


def test_persisted_lsh_index_matches_inmemory_lsh(spark, sf_dir, tmp_path):
    """Index-once/query-many: the persisted (tbl, bucket)-partitioned
    index returns the same top-k as the in-memory lsh_topk, and the
    probe filter prunes partitions at planning time."""
    import re

    from hdfs_parquet_importer_spark.operators.similarity import (
        build_lsh_index,
        query_lsh_index,
        lsh_topk,
    )
    from hdfs_parquet_importer_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx_path = str(tmp_path / "lsh_index")
    build_lsh_index(emb, idx_path)

    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vec"),
    )
    from_index = query_lsh_index(spark, idx_path, q, k=5)
    in_memory = lsh_topk(
        emb,
        emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ),
        k=5,
    )
    a = {(r.query_id, r.vec_id, r.rank) for r in from_index.collect()}
    b = {(r.query_id, r.vec_id, r.rank) for r in in_memory.collect()}
    assert a == b

    plan = from_index._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), plan  # probes prune directories


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------
def test_pq_encode_shape_and_code_range(spark, sf_dir):
    from hdfs_parquet_importer_spark.operators.similarity import pq_train_encode
    from hdfs_parquet_importer_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    enc, codebooks = pq_train_encode(emb, m=4, codebook_k=16)
    assert len(codebooks) == 4
    assert all(len(cb) == 16 for cb in codebooks)
    assert all(len(c) == 16 for cb in codebooks for c in cb)  # 64/4 dims
    rows = enc.collect()
    assert len(rows) == n * 4  # m codes per vector
    assert all(0 <= r.code < 16 and 0 <= r.sub < 4 for r in rows)


def test_pq_topk_recall_vs_brute_force(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hdfs_parquet_importer_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )
    from hdfs_parquet_importer_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    def top10(df):
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
        return (
            df.filter(F.col("vec_id") != F.col("query_id"))
            .withColumn("_r", F.row_number().over(w))
            .filter("_r <= 10")
            .select("query_id", "vec_id")
        )

    exact = top10(brute_force_topk(emb, q, k=11))
    approx = top10(pq_topk(emb, q, k=11, m=4, codebook_k=16, refine=150))
    hits = {
        r.query_id: r.n
        for r in exact.join(approx, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(hits) == 5
    assert all(n >= 7 for n in hits.values()), hits


def test_pq_adc_join_is_equi_join(spark, sf_dir):
    """ann_pq_adc sits in BRUTE_FORCE_OK for its embedded exact
    reference; pin the PQ OPERATOR itself to the (sub, code)
    equi-join so a cartesian can't regress behind the allowlist."""
    from pyspark.sql import functions as F

    from hdfs_parquet_importer_spark.operators.similarity import pq_topk
    from hdfs_parquet_importer_spark.tables import load_table
    from tests.test_plans import plan_of

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = plan_of(pq_topk(emb, q, k=5, refine=20))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mips_differs_from_cosine_and_reduction_agrees(spark, tmp_path):
    """MIPS semantics: with query [1,0], candidate [3,3] (dot 3,
    cos .707) must outrank [2,0] (dot 2, cos 1.0) — the case where
    inner-product and cosine retrieval genuinely disagree — and the
    in-plan augmented-cosine ranking must agree with the dot ranking
    (reduction_agrees all true)."""
    from hdfs_parquet_importer_spark.queries.llm import ann_mips_topk

    rows = [
        (0, [1.0, 0.0], 0),   # the query (vec_id < 5)
        (5, [2.0, 0.0], 0),   # cos 1.0, dot 2
        (6, [3.0, 3.0], 0),   # cos .707, dot 3  -> MIPS winner
        (7, [0.1, 0.9], 0),   # dot 0.1
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.parquet(str(tmp_path / "embeddings.parquet"))
    got = ann_mips_topk(spark, str(tmp_path)).orderBy("rank").collect()
    assert [r.vec_id for r in got] == [6, 5, 7]
    assert [r.dot for r in got] == [3.0, 2.0, 0.1]
    assert all(r.reduction_agrees for r in got)


def test_query_lsh_index_on_empty_index_returns_empty(spark, tmp_path):
    """An empty persisted index stays queryable: probing returns an
    empty top-k with the normal schema instead of the opaque 'cannot
    infer vector dim' raise (r10 ADVICE — the dim-mismatch guard must
    not break the zero-rows edge)."""
    from hdfs_parquet_importer_spark.operators.similarity import (
        query_lsh_index,
    )

    # build_lsh_index itself refuses empty input (indexing nothing is
    # a writer bug); an index can still BECOME empty — e.g. rewritten
    # after a full-corpus retention purge — so write the empty index
    # layout directly.
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, tbl int, bucket int"
    )
    idx_path = str(tmp_path / "empty_index")
    empty.write.parquet(idx_path)

    q = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])],
        "query_id long, query_vec array<double>",
    )
    got = query_lsh_index(spark, idx_path, q, k=5)
    assert got.count() == 0
    assert {"query_id", "vec_id", "rank"} <= set(got.columns)


def test_query_lsh_index_null_first_row_keeps_dim_guard(spark, tmp_path):
    """A stray NULL vector row that parquet returns first must not
    bypass the encoder dim-mismatch guard (r11 review): dim comes from
    the first NON-NULL vector."""
    from hdfs_parquet_importer_spark.operators.similarity import (
        query_lsh_index,
    )

    rows = [(None, None, 0, 0), (1, [1.0, 0.0, 0.0, 0.0], 0, 1)]
    idx = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, tbl int, bucket int"
    ).coalesce(1)
    idx_path = str(tmp_path / "nullfirst_index")
    idx.write.parquet(idx_path)

    q = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, query_vec array<double>"
    )
    with pytest.raises(ValueError, match="different encoders"):
        query_lsh_index(spark, idx_path, q, k=5)


def test_dim_truncation_recall_bounds(spark, sf_dir):
    """Structural invariants of eval_dim_truncation_recall: the full
    (dims x queries) grid is emitted, hit counts are bounded by k,
    recall is exactly n_hit/10, and truncation on this non-MRL
    corpus is lossy but not degenerate (some overlap survives at
    each width, none is perfect). Per-query monotonicity in width is
    deliberately NOT asserted — measured false at sf0.001 (query 0:
    1 hit at 16 dims, 0 at 32)."""
    from hdfs_parquet_importer_spark.queries import registry

    rows = registry()["eval_dim_truncation_recall"].fn(spark, sf_dir).collect()
    assert len(rows) == 10  # {16, 32} x 5 queries
    totals = {16: 0, 32: 0}
    for r in rows:
        assert r.n_dims in totals
        assert 0 <= r.n_hit <= 10
        assert abs(r.recall - r.n_hit / 10.0) < 1e-12
        totals[r.n_dims] += r.n_hit
    for d, t in totals.items():
        assert 0 < t < 50, f"truncation to {d} dims should be lossy but not total"
