"""Source/sink connector tests: JSONL and ORC round-trips, partitioned
Parquet with partition-pruned read-back, bucketed tables joining with
zero exchanges. Plan assertions included — the point of these
connectors is the plan shape they buy, not just the bytes."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.sources import (
    read_jsonl,
    read_orc,
    read_partitioned_parquet,
    write_bucketed_table,
    write_jsonl,
    write_orc,
    write_partitioned_parquet,
)
from hdfs_parquet_importer_spark.tables import load_table


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


def test_jsonl_roundtrip(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("jsonl") / "orders.jsonl")
    src = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    write_jsonl(src, path)
    back = read_jsonl(
        spark, path,
        schema="o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    assert back.count() == src.count()
    assert dict(back.dtypes) == dict(src.dtypes)
    a = src.agg(F.sum("o_totalprice")).first()[0]
    b = back.agg(F.sum("o_totalprice")).first()[0]
    assert abs(a - b) < 1e-6


def test_jsonl_schema_avoids_inference_scan(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("jsonl2") / "o.jsonl")
    write_jsonl(orders.select("o_orderkey"), path)
    df = read_jsonl(spark, path, schema="o_orderkey long")
    assert df.schema.fieldNames() == ["o_orderkey"]


def test_orc_roundtrip_with_pushdown(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("orc") / "orders.orc")
    write_orc(orders, path)
    back = read_orc(spark, path).filter(F.col("o_totalprice") > 100000)
    plan = formatted_plan(back)
    assert "Scan orc" in plan
    assert re.search(r"PushedFilters: \[[^\]]*o_totalprice", plan)
    expected = orders.filter(F.col("o_totalprice") > 100000).count()
    assert back.count() == expected


def test_partitioned_write_prunes_on_read(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "orders_by_status")
    write_partitioned_parquet(
        orders, path, partition_cols=["o_orderstatus"], sort_cols=["o_orderdate"]
    )
    back = read_partitioned_parquet(spark, path).filter(
        F.col("o_orderstatus") == "F"
    )
    plan = formatted_plan(back)
    # The status filter must appear as a PartitionFilter (directory
    # skip), NOT a data filter evaluated per row.
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderstatus" in m.group(1), plan
    assert back.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_partitioned_layout_is_hive_style(spark, orders, tmp_path_factory):
    base = tmp_path_factory.mktemp("part2") / "layout"
    write_partitioned_parquet(orders, str(base), partition_cols=["o_orderstatus"])
    dirs = {p.name for p in base.iterdir() if p.is_dir()}
    statuses = {r[0] for r in orders.select("o_orderstatus").distinct().collect()}
    assert dirs == {f"o_orderstatus={s}" for s in statuses}
    # One task per partition dir -> exactly one data file inside each.
    for d in base.iterdir():
        if d.is_dir():
            n_files = len([f for f in d.iterdir() if f.name.endswith(".parquet")])
            assert n_files == 1, (d.name, n_files)


def test_bucketed_join_has_no_exchange(spark, sf_dir, orders):
    # Managed tables land in the session's default warehouse dir
    # (spark.sql.warehouse.dir is static config); DROP TABLE in the
    # finally block removes the data.
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(
        orders.select("o_orderkey", "o_totalprice"),
        "orders_b", ["o_orderkey"], 4, sort_cols=["o_orderkey"],
    )
    write_bucketed_table(
        li.select("l_orderkey", "l_quantity"),
        "lineitem_b", ["l_orderkey"], 4, sort_cols=["l_orderkey"],
    )
    # Disable auto-broadcast: at test scale the planner would broadcast
    # the tiny table and skip the bucketed path entirely (at real scale
    # two fact tables exceed any broadcast threshold).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("orders_b")
        b = spark.table("lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # Same join on the raw (unbucketed) parquet shuffles both sides.
        raw = orders.join(li, orders.o_orderkey == li.l_orderkey)
        assert "Exchange" in formatted_plan(raw)
        # And the answer matches the unbucketed join.
        assert joined.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_dynamic_partition_overwrite_touches_only_written_partition(
    spark, sf_dir, tmp_path
):
    """partitionOverwriteMode=dynamic: rewriting one partition's data
    must leave sibling partitions intact (static mode would truncate
    the whole table root) — the incremental-backfill write pattern."""
    from hdfs_parquet_importer_spark.tables import load_table

    dest = str(tmp_path / "dyn_part")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    orders.write.partitionBy("o_orderstatus").parquet(dest)
    before = {
        r.o_orderstatus: r.n
        for r in spark.read.parquet(dest)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(before) == {"F", "O", "P"}

    # Backfill ONLY status P with a single sentinel row.
    patch = spark.createDataFrame(
        [(999_999_999, "P", 1.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    (
        patch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderstatus")
        .parquet(dest)
    )
    after = {
        r.o_orderstatus: r.n
        for r in spark.read.parquet(dest)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert after["P"] == 1  # replaced
    assert after["F"] == before["F"] and after["O"] == before["O"]  # intact


def test_parquet_merge_schema_reads_evolved_files(spark, tmp_path):
    """Schema evolution on READ: two parquet files with different
    column sets merge under mergeSchema=true; the missing column
    null-fills for old files. Without the option the scan keeps only
    the first-listed footer's schema."""
    d = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, payload string"
    ).write.parquet(d + "/gen=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, payload string, score double"
    ).write.parquet(d + "/gen=2")

    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"id", "payload", "score", "gen"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_python_datasource_parallelism_and_determinism(spark):
    from hdfs_parquet_importer_spark.sources.pydatasource import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", "1000")
        .option("partitions", "7")
        .load()
    )
    # Partition planning: 7 InputPartitions -> 7 scan tasks.
    assert df.toDF(*df.columns).select(F.spark_partition_id()).distinct().count() == 7
    rows = df.collect()
    assert len(rows) == 1000
    assert len({r.event_id for r in rows}) == 1000  # disjoint slices
    # Deterministic replay: same options -> identical rows.
    again = (
        spark.read.format("synthetic_events")
        .option("rows", "1000")
        .option("partitions", "3")  # different sharding, same data
        .load()
        .collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_cached_tmp_dataset_content_addressing(tmp_path):
    """The cache key must change when the SOURCE file changes (stale
    caches are never read), stay stable when it doesn't (build runs
    once), and survive losing a build race (winner's copy kept)."""
    import os

    from hdfs_parquet_importer_spark.sources.io import cached_tmp_dataset

    src = tmp_path / "src.txt"
    src.write_text("v1")
    builds = []

    def build(staging: str) -> None:
        builds.append(staging)
        os.makedirs(staging, exist_ok=True)
        with open(os.path.join(staging, "data"), "w") as fh:
            fh.write("built")

    d1 = cached_tmp_dataset("t_cache_test", [str(src)], build)
    d2 = cached_tmp_dataset("t_cache_test", [str(src)], build)
    assert d1 == d2 and len(builds) == 1  # second call = cache hit

    # Change the source (content + mtime) -> new key, rebuild.
    src.write_text("v2-longer")
    d3 = cached_tmp_dataset("t_cache_test", [str(src)], build)
    assert d3 != d1 and len(builds) == 2

    # Rebuild after eviction: same key -> same final path, data back.
    import shutil

    shutil.rmtree(d3)
    d4 = cached_tmp_dataset("t_cache_test", [str(src)], build)
    assert d4 == d3 and os.path.exists(os.path.join(d4, "data"))


@pytest.mark.parametrize("part_type", ["bigint", "string"])
def test_write_partitioned_parquet_files_are_sorted(
    spark, tmp_path, part_type
):
    """The partitioned writer requires ordering by the partition
    columns and injects a NON-STABLE Sort when unsatisfied — which
    silently destroyed the sort_cols order until r11 (verified
    empirically: every output file came back unsorted). The fix leads
    the in-partition sort with the partition columns; this pins the
    actual on-disk file order. Parametrized over a STRING partition
    column too (r11 ADVICE): for strings V1Writes' required ordering
    is on empty2null(col), not the raw column — the ETL pipeline
    partitions on string year/month, and only this variant pins that
    alias-aware ordering-satisfaction path against a Spark upgrade
    regression."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from hdfs_parquet_importer_spark.sources.io import (
        write_partitioned_parquet,
    )

    df = spark.range(1000).select(
        (F.col("id") % 3).cast(part_type).alias("year"),
        F.xxhash64("id").alias("s"),
    )
    dest = str(tmp_path / "sorted_out")
    write_partitioned_parquet(df, dest, ["year"], sort_cols=["s"])
    files = glob.glob(dest + "/year=*/*.parquet")
    assert files
    for f in files:
        vals = pq.read_table(f).column("s").to_pylist()
        assert vals == sorted(vals), f"{f} is not sorted by s"
