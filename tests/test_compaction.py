"""Small-file compaction (operators/compaction.py) + the runtime
bloom-filter join — the two table-maintenance/runtime features that
have no query-registry surface (they act on files and physical plans,
not rows)."""

import glob

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.operators.compaction import (
    compact_parquet,
    plan_compaction,
)


@pytest.fixture(scope="module")
def fragmented(spark, sf_dir, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("frag") / "lineitem")
    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .repartition(48)
        .write.parquet(src)
    )
    return src


def test_plan_counts_files_and_debt(spark, fragmented):
    plan = plan_compaction(spark, fragmented, target_bytes=1 << 30)
    assert plan.n_files == 48
    assert plan.small_files == 48          # every shard is tiny vs 1 GiB
    assert plan.n_output_files == 1
    assert plan.total_bytes > 0


def test_compact_preserves_rows_and_hits_target_count(
    spark, fragmented, tmp_path
):
    dest = str(tmp_path / "compacted")
    plan = plan_compaction(spark, fragmented, target_bytes=1 << 30)
    # Pick a target that asks for ~4 output files.
    target = max(1, plan.total_bytes // 4)
    out_plan = compact_parquet(spark, fragmented, dest, target_bytes=target)
    assert out_plan.n_output_files in (4, 5)

    files = glob.glob(f"{dest}/*.parquet")
    assert len(files) == out_plan.n_output_files

    src_df = spark.read.parquet(fragmented)
    dst_df = spark.read.parquet(dest)

    def fingerprint(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_orderkey").alias("k"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "cents"
            ),
        ).collect()[0]

    assert fingerprint(src_df) == fingerprint(dst_df)


def test_sort_within_restores_pruning_locality(spark, fragmented, tmp_path):
    """sortWithinPartitions re-sorts inside each output file without an
    extra shuffle, so per-file l_shipdate ranges tighten vs round-robin
    row order (min/max pruning works again after compaction)."""
    dest = str(tmp_path / "sorted")
    compact_parquet(
        spark,
        fragmented,
        dest,
        target_bytes=1 << 30,
        sort_within=["l_shipdate"],
    )
    w = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.monotonically_increasing_id()
    )
    [row] = (
        spark.read.parquet(dest)
        .select(
            (F.lag("l_shipdate").over(w) > F.col("l_shipdate"))
            .cast("int")
            .alias("desc_step")
        )
        .agg(F.sum("desc_step").alias("n_desc"))
        .collect()
    )
    assert (row.n_desc or 0) == 0  # physically sorted within the file


def test_compact_preserves_hive_layout_without_file_explosion(
    spark, sf_dir, tmp_path
):
    """ADVICE r8 items 1+2: a Hive-partitioned source must keep its
    layout (partition cols inferred by schema diff, immune to a
    _SUCCESS file leading the listing) and must NOT fan every
    partition value across all shuffle tasks (round-robin before
    partitionBy emitted up to N x |values| files)."""
    src = str(tmp_path / "part_src")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("year", F.year("o_orderdate"))
        .repartition(24)
        .write.partitionBy("year")
        .parquet(src)
    )
    # _SUCCESS exists at the root — the old first-listing-entry parse
    # would have seen it and flattened the layout.
    assert glob.glob(f"{src}/_SUCCESS")
    n_years = len(glob.glob(f"{src}/year=*"))
    assert n_years >= 3

    dest = str(tmp_path / "part_dest")
    compact_parquet(spark, src, dest, target_bytes=1 << 30)

    # Layout preserved ...
    out_dirs = glob.glob(f"{dest}/year=*")
    assert len(out_dirs) == n_years
    # ... and each partition directory compacted to ~1 file (1 GiB
    # target vs KB inputs), not one per shuffle task.
    for d in out_dirs:
        assert len(glob.glob(f"{d}/*.parquet")) == 1

    src_df = spark.read.parquet(src)
    dst_df = spark.read.parquet(dest)
    assert src_df.count() == dst_df.count()
    assert set(src_df.columns) == set(dst_df.columns)
    a = src_df.groupBy("year").count().collect()
    b = dst_df.groupBy("year").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_runtime_bloom_filter_injected(spark, sf_dir):
    """Spark's runtime-filter optimizer turns a selective dim filter
    into a bloom_filter_agg pushed to the fact side of a shuffle join —
    the 100 TB path where most fact rows die before the exchange. The
    size thresholds are lowered because the test tables are KBs; on a
    real cluster the 10 GiB application-side default does the gating."""
    tweaks = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in tweaks}
    try:
        for k, v in tweaks.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        dim = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            fact.join(dim, fact.l_orderkey == dim.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan.lower()
        # And the filtered join still returns correct results.
        rows = {r.o_orderpriority: r["count"] for r in j.collect()}
        assert set(rows) == {"1-URGENT"}
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_partitioned_compaction_splits_large_partitions(spark, sf_dir, tmp_path):
    """r9 review: the per-directory sizing must actually resolve —
    Path.toString() ('file:/...') and input_file_name()
    ('file:///...') spell the same dir differently, and an unmatched
    lookup silently fell back to ONE file per partition directory.
    With a target far below a directory's bytes, each directory must
    split into multiple output files."""
    src = str(tmp_path / "bigpart_src")
    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .withColumn("bucket", (F.col("l_orderkey") % 2).cast("int"))
        .repartition(8)
        .write.partitionBy("bucket")
        .parquet(src)
    )
    per_dir_bytes = {}
    import os

    for d in glob.glob(f"{src}/bucket=*"):
        per_dir_bytes[d] = sum(
            os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet")
        )
    target = min(per_dir_bytes.values()) // 3  # demand >=3 files per dir
    dest = str(tmp_path / "bigpart_dest")
    compact_parquet(spark, src, dest, target_bytes=target)
    import math

    for d in glob.glob(f"{dest}/bucket=*"):
        n = len(glob.glob(f"{d}/*.parquet"))
        # ADVICE r9: hash-repartitioning K keys into K partitions
        # merged ~1/e of them, so this used to assert only >=2 where
        # >=3 were requested. With repartitionByRange at 2x headroom
        # each (dir, salt) key lands in its own partition unless the
        # range sampler misreads a key's share by 2x (many sigma out
        # for these well-populated keys), so the count must now hit
        # the plan exactly.
        expected = math.ceil(
            per_dir_bytes[str(tmp_path / "bigpart_src") + "/" + d.split("/")[-1]]
            / target
        )
        # ADVICE r10: range boundaries come from a probabilistic
        # sampler, so a same-directory salt merge is unlikely at 2x
        # headroom but not impossible — tolerate exactly one merged
        # pair per directory instead of asserting the plan exactly.
        assert expected - 1 <= n <= expected, (
            f"{d} got {n} files, planned {expected} — per-dir sizing "
            "did not resolve or range partitioning merged keys"
        )
    assert (
        spark.read.parquet(dest).count()
        == spark.read.parquet(src).count()
    )
