"""Distributed prefix-sum / sequence-packing tests: parity with the
naive single-reducer window, bucket-boundary correctness, and the plan
property that row-level windows are partitioned."""

from __future__ import annotations

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.operators.prefix import (
    banded_range_agg,
    dist_rank,
    pack_sequences,
    prefix_sum,
    prefix_sums,
)


def _naive_offsets(spark, rows):
    df = spark.createDataFrame(rows, "k long, v long")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return {
        r.k: r.off
        for r in df.withColumn("off", F.sum("v").over(w) - F.col("v")).collect()
    }


def test_prefix_sum_matches_naive_window(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(0, 200, 2)]  # gappy keys
    df = spark.createDataFrame(rows, "k long, v long").repartition(8)
    got = {
        r.k: r.offset
        for r in prefix_sum(df, "k", "v", bucket=F.expr("k div 16")).collect()
    }
    assert got == _naive_offsets(spark, rows)


def test_prefix_sum_single_bucket_and_single_rows(spark):
    rows = [(1, 10)]
    df = spark.createDataFrame(rows, "k long, v long")
    assert prefix_sum(df, "k", "v", bucket=F.lit(0)).first().offset == 0


def test_pack_sequences_bins(spark):
    # 5 docs x 100 tokens, budget 250: offsets 0,100,...,400 ->
    # bins 0,0,0(200//250),1(300//250),1.
    rows = [(i, 100) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r.doc_id: (r.offset, r.bin_id)
        for r in pack_sequences(
            df, "doc_id", "n_tok", budget=250, bucket=F.expr("doc_id div 2")
        ).collect()
    }
    assert got == {0: (0, 0), 1: (100, 0), 2: (200, 0), 3: (300, 1), 4: (400, 1)}


def test_dist_rank_matches_row_number(spark):
    """dist_rank == row_number over the same composite order,
    including ties on the primary column (broken by the tiebreak) and
    values that straddle bucket borders."""
    rows = [(i, (i * 3) % 7) for i in range(60)]  # heavy ties in v
    df = spark.createDataFrame(rows, "id long, v long").repartition(6)
    got = {
        r.id: r.rank
        for r in dist_rank(
            df, ["v", "id"], bucket=F.expr("v div 2"), out_col="rank"
        ).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r.id: r.rank
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == {k: int(v) for k, v in want.items()}


def test_prefix_sum_composite_order_tiebreak(spark):
    """With ties on the order column the composite tiebreak pins the
    exclusive prefix deterministically."""
    rows = [(0, 5, 1), (1, 5, 2), (2, 5, 4), (3, 6, 8)]
    df = spark.createDataFrame(rows, "id long, k long, v long")
    got = {
        r.id: r.offset
        for r in prefix_sum(
            df, ["k", "id"], "v", bucket=F.expr("k div 2")
        ).collect()
    }
    assert got == {0: 0, 1: 1, 2: 3, 3: 7}


def test_banded_range_agg_matches_global_window(spark):
    """Banded trailing-range aggregates == the naive unpartitioned
    RANGE window, including ties, cell-border values, and sums."""
    vals = [float((i * 37) % 100) for i in range(80)] + [10.0, 10.0, 30.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    ).repartition(7)
    got = {
        (r.id): (r.n_in, r.s_in)
        for r in banded_range_agg(
            df,
            "v",
            10.0,
            lambda w: [
                F.count(F.lit(1)).over(w).alias("n_in"),
                F.sum("v").over(w).alias("s_in"),
            ],
        ).collect()
    }
    w = Window.orderBy("v").rangeBetween(-10, Window.currentRow)
    want = {
        r.id: (r.n_in, r.s_in)
        for r in df.select(
            "id",
            F.count(F.lit(1)).over(w).alias("n_in"),
            F.sum("v").over(w).alias("s_in"),
        ).collect()
    }
    assert got == want


def test_banded_range_agg_windows_are_partitioned(spark):
    """Every Window node in the banded plan carries a partition spec
    — the whole point of the operator."""
    df = spark.createDataFrame([(i, float(i)) for i in range(20)], "id long, v double")
    out = banded_range_agg(
        df, "v", 5.0, lambda w: [F.count(F.lit(1)).over(w).alias("n")]
    )
    plan = out._jdf.queryExecution().optimizedPlan()

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    wins = [n for n in walk(plan) if n.nodeName() == "Window"]
    assert wins and all(not n.partitionSpec().isEmpty() for n in wins)


def test_prefix_sum_row_window_is_partitioned(spark):
    """The row-count-proportional window must be PARTITIONED (by
    bucket); only the bucket-totals window (n_buckets rows) may be
    global. Guard: the physical plan's row-level Window node carries a
    partition spec."""
    df = spark.createDataFrame([(i, 1) for i in range(100)], "k long, v long")
    out = prefix_sum(df, "k", "v", bucket=F.expr("k div 10"))
    jvm = spark._jvm
    plan = out._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    wins = re.findall(r"Arguments: \[sum\(v[^\]]*\], (\[[^\]]*\])", plan)
    # Two Window nodes: the per-bucket cumsum must have a non-empty
    # partition spec; the totals window is allowed an empty one.
    assert any("__psbucket" in w for w in wins), plan


def test_prefix_sums_multi_value_single_pass(spark):
    """prefix_sums (r6): N value columns in ONE bucketed pass must
    each equal their own single-value prefix_sum."""
    from hdfs_parquet_importer_spark.operators.prefix import prefix_sums

    rows = [(i, (i * 7) % 13 + 1, (i * 3) % 5 + 1) for i in range(0, 150, 3)]
    df = spark.createDataFrame(rows, "k long, v long, w long").repartition(7)
    got = {
        r.k: (r.ov, r.ow)
        for r in prefix_sums(
            df, "k", ["v", "w"], bucket=F.expr("k div 20"), out_cols=["ov", "ow"]
        ).collect()
    }
    exp_v = _naive_offsets(spark, [(k, v) for k, v, _ in rows])
    exp_w = _naive_offsets(spark, [(k, w) for k, _, w in rows])
    assert got == {k: (exp_v[k], exp_w[k]) for k, *_ in rows}


def test_ntile_from_rank_matches_window_ntile_exhaustively(spark):
    """ntile_from_rank (r6) must be bit-identical to ntile(k) OVER
    (ORDER BY ...) for EVERY (n, k) in a dense grid — including
    n < k, n == k, and non-divisible remainders. One DataFrame, one
    partitioned window per (n, k) cell, so the whole grid is a single
    Spark job."""
    from hdfs_parquet_importer_spark.operators.prefix import ntile_from_rank

    cells = [(n, k) for n in range(1, 41) for k in range(1, 8)]
    rows = [(n, k, r) for n, k in cells for r in range(1, n + 1)]
    df = spark.createDataFrame(rows, "n int, k int, r int")
    w = Window.partitionBy("n", "k").orderBy("r")
    ref = {}
    for kk in range(1, 8):
        part = (
            df.filter(F.col("k") == kk)
            .withColumn("nt", F.ntile(kk).over(w))
            .collect()
        )
        ref.update({(x.n, x.k, x.r): x.nt for x in part})
    got = {
        (x.n, x.k, x.r): x.f
        for x in df.withColumn(
            "f", ntile_from_rank(F.col("r"), F.col("n"), 5)
        ).filter(F.col("k") == 5).collect()
    }
    for key, v in got.items():
        assert v == ref[key], key
    # And the full grid for every k via per-k formula columns.
    for kk in range(1, 8):
        gotk = {
            (x.n, x.k, x.r): x.f
            for x in df.filter(F.col("k") == kk)
            .withColumn("f", ntile_from_rank(F.col("r"), F.col("n"), kk))
            .collect()
        }
        for key, v in gotk.items():
            assert v == ref[key], key


def test_grouped_prefix_sums_match_per_group_window(spark):
    """group_cols (VERDICT r7 item 4): the grouped two-phase prefix
    sum must equal SUM(v) OVER (PARTITION BY g ORDER BY k) - v for
    every row, including groups smaller than one bucket and order
    keys colliding across groups."""
    rows = [
        (f"g{i % 5}", (i * 13) % 47, i, 1 + (i * 3) % 9)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, k long, id long, v long").repartition(8)
    got = {
        (r.g, r.id): r.off
        for r in prefix_sums(
            df,
            ["k", "id"],
            ["v"],
            bucket=F.expr("k div 8"),
            out_cols=["off"],
            group_cols=["g"],
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("k", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.g, r.id): r.cum - r.v
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_grouped_prefix_sums_windows_are_group_partitioned(spark):
    """Grouped form: BOTH window nodes (local cumsum and bucket-total
    bases) must carry a partition spec — no single-task pass at all."""
    df = spark.createDataFrame(
        [(f"g{i % 3}", i, 1) for i in range(90)], "g string, k long, v long"
    )
    out = prefix_sums(
        df, "k", ["v"], bucket=F.expr("k div 10"), out_cols=["off"],
        group_cols=["g"],
    )
    jvm = spark._jvm
    plan = out._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    import re as _re

    specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for s in specs:
        assert "g#" in s, (s, plan)


def test_prefix_sums_null_keys_match_naive_nulls_first(spark):
    """NULL order keys / NULL group keys must behave exactly like the
    naive window's ASC NULLS FIRST — not be silently dropped while
    inflating later offsets."""
    from pyspark.sql import Window

    rows = [
        (None, None, 5),
        ("a", 1, 10),
        ("a", 2, 20),
        ("a", None, 7),
        ("b", 3, 30),
        (None, 4, 2),
    ]
    df = spark.createDataFrame(rows, "g string, k int, v int")
    for gcols in ([], ["g"]):
        got = prefix_sums(
            df,
            ["k"],
            ["v"],
            bucket=F.floor(F.col("k") / 2),
            out_cols=["off"],
            group_cols=gcols,
        )
        w = (
            Window.partitionBy(*gcols)
            .orderBy("k")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        naive = df.withColumn(
            "off", F.coalesce(F.sum("v").over(w), F.lit(0))
        )
        key = lambda r: (r.g or "", r.k if r.k is not None else -1, r.v, r.off)
        assert sorted(map(key, got.collect())) == sorted(
            map(key, naive.collect())
        )


def test_banded_range_agg_keeps_null_ordered_rows(spark):
    """Rows with a NULL order value are kept with the naive window's
    NULL-group frame (agg over the other NULL rows)."""
    from pyspark.sql import Window

    d = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 12.0), (4, None), (5, 13.0)],
        "id int, v double",
    )

    def aggs(w):
        return [
            F.count(F.lit(1)).over(w).alias("cnt"),
            F.sum("v").over(w).alias("s"),
        ]

    got = banded_range_agg(d, "v", 5, aggs)
    w = Window.orderBy("v").rangeBetween(-5, Window.currentRow)
    naive = d.select("*", *aggs(w))
    key = lambda r: (r.id, r.v, r.cnt, r.s)
    assert sorted(map(key, got.collect())) == sorted(
        map(key, naive.collect())
    )


def test_guards_reject_silent_failure_params(spark):
    """r11 review: parameters that previously produced silently-wrong
    results under non-ANSI null arithmetic now raise."""
    import pytest

    from hdfs_parquet_importer_spark.operators.prefix import (
        banded_range_agg,
        dist_rank,
        ntile_from_rank,
        pack_sequences,
        prefix_sums,
    )

    df = spark.createDataFrame([(1, 2, 3)], ["o", "a", "b"])
    bucket = F.floor(F.col("o") / 10)

    # out_cols colliding with a DIFFERENT value column / duplicates
    with pytest.raises(ValueError, match="collides"):
        prefix_sums(df, "o", ["a", "b"], bucket, ["b", "x"])
    with pytest.raises(ValueError, match="duplicate"):
        prefix_sums(df, "o", ["a", "b"], bucket, ["x", "x"])

    # reserved internal names on the input
    with pytest.raises(ValueError, match="reserved"):
        prefix_sums(
            df.withColumn("__psbucket", F.lit(0)), "o", ["a"], bucket, ["x"]
        )
    with pytest.raises(ValueError, match="reserved"):
        dist_rank(df.withColumn("__psone", F.lit(0)), ["o"], bucket)

    # width=0 / negative width (every row to the sentinel cell)
    with pytest.raises(ValueError, match="positive whole"):
        banded_range_agg(df, "o", 0.0, lambda w: [])
    with pytest.raises(ValueError, match="positive whole"):
        banded_range_agg(df, "o", -10.0, lambda w: [])

    # ntile(0) / budget=0 (NULL buckets / NULL bins)
    with pytest.raises(ValueError, match="ntile"):
        df.select(ntile_from_rank(F.lit(1), F.lit(1), 0))
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "o", "a", 0, bucket)
