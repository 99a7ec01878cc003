"""Advanced streaming tests: stream-static enrichment, foreachBatch
parquet sink, and real late-data semantics (a row behind the watermark
is dropped; a window is finalized exactly once)."""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark import streaming as ST
from hdfs_parquet_importer_spark.tables import load_table


def _drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def _ns(hour: int, minute: int) -> int:
    """Nanosecond timestamp on 2024-01-01 at the given time (UTC)."""
    base = 1704067200  # 2024-01-01 00:00:00 UTC
    return (base + hour * 3600 + minute * 60) * 1_000_000_000


def _write_events_file(path, rows):
    """Write one parquet file matching EVENTS_SCHEMA (ts = int64 ns)."""
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, path)


def test_stream_static_enrich_matches_batch(spark, sf_dir):
    events = ST.read_events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    enriched = ST.stream_static_enrich(events, cust, "user_id", "c_custkey")
    q = ST.run_to_memory(
        enriched.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")),
        "enrich_counts",
        output_mode="complete",
    )
    _drain(q)
    got = {
        r.c_mktsegment: r.n for r in spark.table("enrich_counts").collect()
    }
    batch = load_table(spark, sf_dir, "events").join(
        F.broadcast(cust), F.col("user_id") == F.col("c_custkey")
    )
    expect = {
        r.c_mktsegment: r.n
        for r in batch.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect


def test_foreachbatch_parquet_sink(spark, sf_dir, tmp_path):
    events = ST.read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = ST.write_stream_parquet(
        events.select("event_id", "event_type", "value"), out, ckpt
    )
    _drain(q)
    back = spark.read.parquet(out)
    assert back.count() == load_table(spark, sf_dir, "events").count()
    assert "_batch_id" in back.columns
    # Restarting the drained stream from the checkpoint must be a
    # no-op (no duplicate rows) — the batch id bookkeeping survives.
    q2 = ST.write_stream_parquet(
        ST.read_events_stream(spark, sf_dir, max_files_per_trigger=1).select(
            "event_id", "event_type", "value"
        ),
        out,
        ckpt,
    )
    _drain(q2)
    assert spark.read.parquet(out).count() == back.count()


def test_foreachbatch_parquet_sink_redelivery_is_idempotent(
    spark, sf_dir, tmp_path
):
    """Checkpoint LOSS (fresh checkpoint, same source, same target)
    redelivers every micro-batch. The per-batch dynamic partition
    overwrite must land each redelivered batch in its own _batch_id
    partition — replacing, not appending — so the target holds each
    source row exactly once. Under the old mode("append") write this
    exact scenario doubled every row."""
    events = ST.read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    out = str(tmp_path / "out")
    q = ST.write_stream_parquet(
        events.select("event_id", "event_type", "value"),
        out,
        str(tmp_path / "ckpt1"),
    )
    _drain(q)
    n_src = load_table(spark, sf_dir, "events").count()
    assert spark.read.parquet(out).count() == n_src

    # Full redelivery with a FRESH checkpoint.
    q2 = ST.write_stream_parquet(
        ST.read_events_stream(spark, sf_dir, max_files_per_trigger=1).select(
            "event_id", "event_type", "value"
        ),
        out,
        str(tmp_path / "ckpt2"),
    )
    _drain(q2)
    back = spark.read.parquet(out)
    assert back.count() == n_src
    assert back.select("event_id").distinct().count() == n_src


def test_watermark_drops_late_rows(spark, tmp_path):
    """Run 1 drains a file whose max event time is 13:00, committing a
    watermark of 11:00 (2h delay) into the checkpoint. Run 2 — same
    checkpoint — receives a 10:30 straggler: it is behind the
    watermark, so it must be dropped, while the checkpointed 10:00
    window state is finalized with its 3 on-time rows only."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run(name: str) -> tuple[dict, int]:
        # foreachBatch sink: the memory sink cannot recover from a
        # checkpoint, and checkpointed watermark recovery is exactly
        # what this test exercises.
        out = str(tmp_path / name)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        stream = (
            spark.readStream.schema(ST.pipeline.EVENTS_SCHEMA)
            .parquet(str(src))
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
        counts = ST.tumbling_counts(stream, window="1 hour", watermark="2 hours")
        q = (
            counts.writeStream.foreachBatch(
                lambda batch_df, _id: batch_df.write.mode("append").parquet(out)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        # Exact drop accounting from the state-store metrics: every
        # input row behind the watermark increments
        # numRowsDroppedByWatermark in some micro-batch's progress.
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p["stateOperators"]
        )
        try:
            rows = spark.read.parquet(out).collect()
        except Exception:  # no batch produced rows -> no dir written
            return {}, dropped
        return {
            (r.window_start, r.event_type): r.n_events for r in rows
        }, dropped

    # Run 1: three on-time rows in [10:00, 11:00) + one at 13:00. The
    # watermark during this run is 0, so nothing is emitted yet; at
    # commit the checkpoint records watermark = 13:00 - 2h = 11:00.
    _write_events_file(
        str(src / "batch-0001.parquet"),
        [
            (1, _ns(10, 5), 1, "click", 1.0),
            (2, _ns(10, 20), 1, "click", 1.0),
            (3, _ns(10, 40), 1, "click", 1.0),
            (4, _ns(13, 0), 1, "click", 1.0),
        ],
    )
    rows1, dropped1 = run("late_run1")
    # The trailing no-data batch advances the watermark to 11:00 and
    # finalizes the 10:00 window with its 3 on-time rows. Nothing was
    # behind the watermark in run 1 — exactly 0 drops.
    assert rows1.get(("2024-01-01 10:00:00", "click")) == 3
    assert ("2024-01-01 13:00:00", "click") not in rows1  # still open
    assert dropped1 == 0

    # Run 2 (same checkpoint): a straggler behind the watermark.
    time.sleep(1.1)
    _write_events_file(
        str(src / "batch-0002.parquet"), [(5, _ns(10, 30), 1, "late", 9.0)]
    )
    rows2, dropped2 = run("late_run2")
    # Behind-the-watermark straggler dropped: no 'late' row is ever
    # emitted, and the finalized 10:00 window is NOT re-emitted or
    # amended (append-mode emit-once). The state store counted EXACTLY
    # the one straggler as dropped-by-watermark.
    assert not any(et == "late" for (_, et) in rows2)
    assert ("2024-01-01 10:00:00", "click") not in rows2
    assert dropped2 == 1


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    ev = ST.read_events_stream(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view")
    joined = ST.stream_stream_interval_join(purchases, views, "2 hours")
    q = ST.run_to_memory(joined, "ss_join", output_mode="append")
    _drain(q)
    got = {
        (r.purchase_id, r.view_id, r.gap_s)
        for r in spark.table("ss_join").collect()
    }
    # Batch twin: the oracle-checked events_interval_join query.
    from hdfs_parquet_importer_spark.queries import registry

    batch = registry()["events_interval_join"].fn(spark, sf_dir)
    expect = {(r.purchase_id, r.view_id, r.gap_s) for r in batch.collect()}
    assert got == expect


def test_dedup_stream_across_microbatches(spark, tmp_path):
    """Exactly-once ingest dedup: a key redelivered in a LATER
    micro-batch (same checkpoint, within the watermark horizon) must
    be dropped; a genuinely new key passes. State lives in the
    checkpoint, so this survives restarts too."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run():
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        stream = (
            spark.readStream.schema(ST.pipeline.EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
        deduped = ST.dedup_stream(stream, ["event_id"], "ts", "2 hours")
        q = (
            deduped.writeStream.foreachBatch(
                lambda b, _id: b.write.mode("append").parquet(out)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)

    # Batch 1: two events, one internal duplicate of event_id 1.
    _write_events_file(
        str(src / "b1.parquet"),
        [
            (1, _ns(10, 0), 1, "click", 1.0),
            (1, _ns(10, 1), 1, "click-redelivered", 1.0),
            (2, _ns(10, 2), 1, "view", 2.0),
        ],
    )
    run()
    first = spark.read.parquet(out).collect()
    assert sorted(r.event_id for r in first) == [1, 2]

    # Batch 2 (new run, same checkpoint): event 1 redelivered AGAIN
    # within the watermark + a new event 3.
    time.sleep(1.1)
    _write_events_file(
        str(src / "b2.parquet"),
        [
            (1, _ns(10, 30), 1, "click-redelivered-2", 1.0),
            (3, _ns(10, 31), 1, "purchase", 3.0),
        ],
    )
    run()
    rows = spark.read.parquet(out).collect()
    assert sorted(r.event_id for r in rows) == [1, 2, 3]
    # The survivor for key 1 is the FIRST delivery, not a redelivery.
    kept1 = [r for r in rows if r.event_id == 1]
    assert len(kept1) == 1 and kept1[0].event_type == "click"


def test_streaming_ewma_folds_state_across_microbatches(spark, tmp_path):
    """Two files -> two micro-batches: the second batch's fold must
    SEED from the first batch's persisted state, and the final value
    must equal the single-pass fold over the full ordered history."""
    src = tmp_path / "ewma_src"
    src.mkdir()
    f1 = [(1, _ns(0, 0), 7, "view", 10.0), (2, _ns(0, 1), 7, "view", 20.0)]
    f2 = [(3, _ns(0, 2), 7, "view", 30.0), (4, _ns(0, 3), 7, "view", 40.0)]
    _write_events_file(str(src / "a_events.parquet"), f1)
    import time as _t

    _t.sleep(1.1)  # distinct mtimes -> deterministic file order
    _write_events_file(str(src / "b_events.parquet"), f2)

    stream = (
        spark.readStream.schema(ST.pipeline.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    q = ST.run_to_memory(
        ST.pipeline.streaming_ewma(stream, alpha=0.5), "t_ewma", output_mode="update"
    )
    q.awaitTermination(120)
    assert not q.isActive

    rows = spark.sql("SELECT * FROM t_ewma ORDER BY n_events").collect()
    # batch 1: 10 -> .5*20+.5*10 = 15 ; batch 2 seeds from 15:
    # .5*30+.5*15 = 22.5 -> .5*40+.5*22.5 = 31.25
    assert [(r["n_events"], r["ewma"]) for r in rows] == [(2, 15.0), (4, 31.25)]


def test_streaming_rolling_zscore_matches_batch_frame(spark, tmp_path):
    """Two micro-batches of one user's series; the streamed anomaly
    set must equal the batch rows(-19,-1) window computation over the
    full history — including events whose FRAME spans the batch
    boundary (state carry), and the spike must not shrink its own
    score (self-exclusion)."""
    import math

    vals1 = [10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 10.3, 9.7, 10.1, 9.9, 10.0, 10.2]
    vals2 = [9.8, 100.0, 10.1, 9.9, 10.0, 10.1]  # spike mid-second-batch
    src = tmp_path / "z_src"
    src.mkdir()
    f1 = [(i, _ns(0, i), 5, "view", v) for i, v in enumerate(vals1)]
    f2 = [
        (len(vals1) + i, _ns(0, len(vals1) + i), 5, "view", v)
        for i, v in enumerate(vals2)
    ]
    _write_events_file(str(src / "a_events.parquet"), f1)
    time.sleep(1.1)
    _write_events_file(str(src / "b_events.parquet"), f2)

    stream = (
        spark.readStream.schema(ST.pipeline.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    q = ST.run_to_memory(
        ST.pipeline.streaming_rolling_zscore(stream), "t_zscore"
    )
    _drain(q)
    got = {
        (r.event_id, r.zscore)
        for r in spark.sql("SELECT * FROM t_zscore").collect()
    }

    # Reference: python replay of the batch frame semantics.
    hist = vals1 + vals2
    want = set()
    for i, v in enumerate(hist):
        prior = hist[max(0, i - 19) : i]
        if len(prior) >= 10:
            mu = sum(prior) / len(prior)
            sd = math.sqrt(
                sum((x - mu) ** 2 for x in prior) / (len(prior) - 1)
            )
            if sd > 1e-9 and abs((v - mu) / sd) > 2.5:
                want.add((i, round((v - mu) / sd, 6)))
    assert want, "test data must contain at least one anomaly"
    assert got == want
    # The spike itself is the anomaly; the value after it must score
    # against a frame CONTAINING the spike (state carried across the
    # batch boundary) and not be flagged with these thresholds.
    assert 13 in {e for e, _ in got}


def test_streaming_upsert_sink_keeps_latest_per_key(spark, tmp_path):
    """Two micro-batches with overlapping keys: the parquet target
    must hold exactly one row per key, the newest by (ts, event_id),
    surviving the cross-batch merge — and an OLDER update arriving in
    a later batch must NOT regress the key (argmax idempotence)."""
    src = tmp_path / "upsert_src"
    src.mkdir()
    # Batch 1: users 1, 2.
    f1 = [(1, _ns(1, 0), 1, "view", 10.0), (2, _ns(1, 5), 2, "view", 20.0)]
    # Batch 2: user 2 newer (overrides), user 1 OLDER (must lose),
    # user 3 new.
    f2 = [
        (3, _ns(2, 0), 2, "purchase", 99.0),
        (4, _ns(0, 30), 1, "click", 7.0),
        (5, _ns(1, 30), 3, "signup", 1.0),
    ]
    _write_events_file(str(src / "a_events.parquet"), f1)
    time.sleep(1.1)
    _write_events_file(str(src / "b_events.parquet"), f2)

    stream = (
        spark.readStream.schema(ST.pipeline.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    target = str(tmp_path / "upsert_target")
    q = ST.pipeline.write_stream_upsert(
        stream,
        target,
        str(tmp_path / "ckpt"),
        keys=["user_id"],
        ts_col="ts",
        tiebreak_cols=["event_id"],
    )
    _drain(q)

    rows = {
        r.user_id: (r.event_id, r.event_type)
        for r in spark.read.parquet(target).collect()
    }
    assert rows == {
        1: (1, "view"),       # batch-2 older row did not regress it
        2: (3, "purchase"),   # batch-2 newer row overrode batch 1
        3: (5, "signup"),     # new key inserted
    }


def test_streaming_upsert_checkpoint_prevents_reprocessing(spark, tmp_path):
    """Running the same availableNow stream twice against the SAME
    checkpoint must be a no-op the second time (offsets committed);
    replaying with a FRESH checkpoint (redelivery after checkpoint
    loss) must converge to the identical final state — the argmax
    merge is idempotent."""
    src = tmp_path / "ck_src"
    src.mkdir()
    rows = [(1, _ns(1, 0), 1, "view", 10.0), (2, _ns(2, 0), 1, "click", 20.0)]
    _write_events_file(str(src / "a_events.parquet"), rows)

    def run(ckpt: str, target: str):
        stream = (
            spark.readStream.schema(ST.pipeline.EVENTS_SCHEMA)
            .parquet(str(src))
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
        q = ST.pipeline.write_stream_upsert(
            stream, target, ckpt,
            keys=["user_id"], ts_col="ts", tiebreak_cols=["event_id"],
        )
        _drain(q)

    target = str(tmp_path / "ck_target")
    ckpt = str(tmp_path / "ckpt1")
    run(ckpt, target)
    first = sorted(map(tuple, spark.read.parquet(target).collect()))

    # Same checkpoint: no new offsets -> no merge -> identical files.
    run(ckpt, target)
    second = sorted(map(tuple, spark.read.parquet(target).collect()))
    assert second == first

    # Fresh checkpoint (full redelivery): merge re-applies every row
    # onto the existing target; argmax idempotence keeps state equal.
    run(str(tmp_path / "ckpt2"), target)
    third = sorted(map(tuple, spark.read.parquet(target).collect()))
    assert third == first


def test_streaming_upsert_recovers_mid_swap_crash(spark, tmp_path):
    """Crash-safety of the three-step swap (ADVICE r5): simulate a
    death BETWEEN the rename-aside and the rename-into-place — the
    live dir is gone, the complete pre-crash table sits at
    ``<target>__old`` and a half-written staging dir lingers. A
    redelivered batch (fresh checkpoint) must first RESTORE the aside
    copy and merge against it, so keys absent from the replayed batch
    survive. Under the old rmtree+move swap this state lost every
    previously-upserted key not in the batch."""
    import os
    import shutil

    src = tmp_path / "crash_src"
    src.mkdir()
    _write_events_file(
        str(src / "a_events.parquet"),
        [(1, _ns(1, 0), 1, "view", 10.0), (2, _ns(1, 5), 2, "view", 20.0)],
    )

    def run(ckpt: str, target: str):
        stream = (
            spark.readStream.schema(ST.pipeline.EVENTS_SCHEMA)
            .parquet(str(src))
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
        q = ST.pipeline.write_stream_upsert(
            stream, target, ckpt,
            keys=["user_id"], ts_col="ts", tiebreak_cols=["event_id"],
        )
        _drain(q)

    target = str(tmp_path / "crash_target")
    run(str(tmp_path / "ckpt1"), target)
    assert {r.user_id for r in spark.read.parquet(target).collect()} == {1, 2}

    # Forge the mid-swap crash state.
    shutil.move(target, target + "__old")
    os.makedirs(target + "__staging_99")
    with open(target + "__staging_99/part-00000.parquet.tmp", "w") as fh:
        fh.write("half-written")
    assert not os.path.isdir(target)

    # Redeliver only user 3 (fresh source file + fresh checkpoint):
    # users 1 and 2 exist only in the aside copy.
    _write_events_file(
        str(src / "b_events.parquet"), [(5, _ns(2, 0), 3, "signup", 1.0)]
    )
    run(str(tmp_path / "ckpt2"), target)

    got = {r.user_id for r in spark.read.parquet(target).collect()}
    assert got == {1, 2, 3}, got
    assert not os.path.isdir(target + "__old")
    assert not os.path.isdir(target + "__staging_99")


def test_foreachbatch_parquet_sink_refuses_unpartitioned_target(
    spark, sf_dir, tmp_path
):
    """Pointing the partition-overwrite sink at a directory holding
    unpartitioned parquet would silently mix layouts; the first batch
    must fail fast instead."""
    import pyspark.errors

    out = str(tmp_path / "out")
    spark.range(5).write.parquet(out)  # old flat layout
    q = ST.write_stream_parquet(
        ST.read_events_stream(spark, sf_dir, max_files_per_trigger=1).select(
            "event_id", "event_type", "value"
        ),
        out,
        str(tmp_path / "ckpt"),
    )
    with pytest.raises(
        pyspark.errors.exceptions.base.PySparkException,
        match="unpartitioned parquet",
    ):
        q.awaitTermination()
    # Flat layout untouched.
    assert spark.read.parquet(out).count() == 5


def test_recover_upsert_target_sweeps_glob_metachar_path(spark, tmp_path):
    """The recovery sweep matches staging names LITERALLY (parent
    listing + prefix, no glob at all): a path containing '[' must
    still sweep its own leftovers (a naive glob treats '[..]' as a
    character class and matches nothing), and must never sweep a
    look-alike neighbor a glob pattern would match."""
    import os

    from hdfs_parquet_importer_spark.streaming.pipeline import (
        recover_upsert_target,
    )

    out = str(tmp_path / "tbl[v2]")
    stale = f"{out}__staging_7"
    os.makedirs(stale)
    # Neighbor an UNescaped glob 'tbl[v2]__staging_*' would match
    # ('[v2]' as a character class matches the single char 'v').
    lookalike = str(tmp_path / "tblv__staging_1")
    os.makedirs(lookalike)
    os.makedirs(out)
    recover_upsert_target(out, spark)
    assert not os.path.isdir(stale), "own stale staging dir not swept"
    assert os.path.isdir(lookalike), "look-alike neighbor wrongly swept"
    assert os.path.isdir(out)


def test_recover_upsert_target_restores_aside_copy(spark, tmp_path):
    """Crash between rename-aside and rename-into-place leaves only
    the __old copy; recovery must restore it as the live target —
    exercised through a file:// URI so the restore takes the same
    Hadoop FileSystem code path a remote target would (r8 port)."""
    import os

    from hdfs_parquet_importer_spark.streaming.pipeline import (
        recover_upsert_target,
    )

    out = str(tmp_path / "tbl")
    aside = f"{out}__old"
    os.makedirs(aside)
    with open(os.path.join(aside, "part-0.parquet"), "w") as fh:
        fh.write("x")
    recover_upsert_target(f"file://{out}", spark)
    assert os.path.isdir(out) and not os.path.isdir(aside)
    assert os.path.exists(os.path.join(out, "part-0.parquet"))


def test_check_partition_layout_file_uri(spark, tmp_path):
    """The mixed-layout guard goes through the Hadoop FileSystem API
    (VERDICT r7 item 8), so a URI target takes the SAME code path a
    remote hdfs:// / s3a:// target would — exercised here with
    file:// (the only remote-style scheme the sandbox can serve):
    flat parquet refuses, a missing dir passes, a _batch_id=
    partitioned layout passes."""
    from hdfs_parquet_importer_spark.streaming.pipeline import (
        check_partition_layout,
    )

    flat = tmp_path / "flat"
    spark.range(5).write.parquet(str(flat))
    with pytest.raises(ValueError, match="unpartitioned parquet"):
        check_partition_layout(spark, f"file://{flat}")

    check_partition_layout(spark, f"file://{tmp_path / 'missing'}")

    part = tmp_path / "part"
    (
        spark.range(5)
        .withColumn("_batch_id", F.lit(0))
        .write.partitionBy("_batch_id")
        .parquet(str(part))
    )
    check_partition_layout(spark, f"file://{part}")


def test_streaming_url_canonical_dedup(spark, tmp_path):
    """The crawl ingest stage end-to-end on a STREAM (r10): canonicalize
    URLs scan-side, then exactly-once dedup on the CANONICAL key.
    Two raw-distinct spellings of the same resource (case/default-port/
    trailing-slash/utm noise) must collapse across micro-batches —
    raw-key dedup would pass both, so this exercises the composition,
    not just dropDuplicatesWithinWatermark."""
    import pyspark.sql.types as T

    from hdfs_parquet_importer_spark.operators.urls import canonicalize_url

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )

    def run():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(src))
        canon = stream.withColumn("canonical", canonicalize_url(F.col("url")))
        deduped = ST.dedup_stream(canon, ["canonical"], "ts", "2 hours")
        q = (
            deduped.writeStream.foreachBatch(
                lambda b, _id: b.write.mode("append").parquet(out)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0)

    def write(path, rows):
        # One real parquet FILE (not a Spark output directory — the
        # file stream source does not recurse into nested dirs).
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([r[0] for r in rows], pa.string()),
                    "ts": pa.array(
                        [r[1] for r in rows], pa.timestamp("us")
                    ),
                }
            ),
            path,
        )

    # Batch 1: one resource under two raw spellings + one distinct.
    write(
        str(src / "b1.parquet"),
        [
            ("https://Example.COM:443/a/?utm_source=x", t0),
            ("https://example.com/a/", t0 + dt.timedelta(minutes=1)),
            ("https://other.net/b", t0 + dt.timedelta(minutes=2)),
        ],
    )
    run()
    first = sorted(r.canonical for r in spark.read.parquet(out).collect())
    assert first == ["https://example.com/a", "https://other.net/b"]

    # Batch 2 (same checkpoint): a THIRD spelling of the same resource
    # within the watermark is dropped by checkpoint state; a new
    # resource passes.
    write(
        str(src / "b2.parquet"),
        [
            ("HTTPS://EXAMPLE.com/a/?fbclid", t0 + dt.timedelta(minutes=3)),
            ("https://new.org/c", t0 + dt.timedelta(minutes=4)),
        ],
    )
    run()
    final = sorted(r.canonical for r in spark.read.parquet(out).collect())
    assert final == [
        "https://example.com/a",
        "https://new.org/c",
        "https://other.net/b",
    ]
