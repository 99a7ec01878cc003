"""Unit tests for the as-of join custom operator (operators/asof.py)."""

import datetime as dt

from pyspark.sql import Row

from hdfs_parquet_importer_spark.operators import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic_latest_prior(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01T10:00:00"), lid=100),
            Row(k=1, ts=_ts("2024-01-01T09:00:00"), lid=101),
            Row(k=2, ts=_ts("2024-01-01T10:00:00"), lid=102),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01T09:30:00"), rid=7),
            Row(k=1, ts=_ts("2024-01-01T08:00:00"), rid=6),
        ]
    )
    out = {
        r.lid: r
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", right_payload=["rid"]
        ).collect()
    }
    assert out[100].asof_rid == 7  # latest of the two prior rights
    assert out[101].asof_rid == 6  # only 08:00 precedes 09:00
    assert out[102].asof_rid is None  # no right rows for k=2
    assert out[102].asof_ts is None


def test_asof_inclusive_equal_ts(spark):
    # right_ts == left_ts must match (>= semantics, like DuckDB ASOF).
    left = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01T10:00:00"), lid=1)])
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01T10:00:00"), rid=9),
            Row(k=1, ts=_ts("2024-01-01T09:00:00"), rid=8),
        ]
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", right_payload=["rid"]
    ).collect()
    assert out[0].asof_rid == 9


def test_asof_preserves_left_rowcount(spark):
    left = spark.createDataFrame(
        [Row(k=i % 3, ts=_ts(f"2024-01-01T{10 + i % 10}:00:00"), lid=i) for i in range(30)]
    )
    right = spark.createDataFrame(
        [Row(k=0, ts=_ts("2024-01-01T00:00:00"), rid=1)]
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", right_payload=["rid"]
    )
    assert out.count() == 30


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 50), (2, 10)], ["k", "t"]
    )
    right = spark.createDataFrame(
        [(1, 5, "early"), (1, 20, "mid"), (1, 50, "exact")], ["k", "t", "tag"]
    )
    out = {
        (r["k"], r["t"]): r["asof_tag"]
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t",
            right_payload=["tag"], direction="forward",
        ).collect()
    }
    # earliest right with right_t >= left_t; ties inclusive; no match -> null
    assert out == {(1, 10): "mid", (1, 50): "exact", (2, 10): None}


def test_tolerance_nulls_out_of_window_matches(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from hdfs_parquet_importer_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    left = spark.createDataFrame(
        [(1, 10, ts(0)), (2, 10, ts(90)), (3, 20, ts(30))],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, ts(-10)), (200, 20, ts(29))],
        "rid long, k long, ts timestamp",
    )
    got = {
        r.lid: r.asof_rid
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_payload=["rid"], tolerance_sec=3600,
        ).collect()
    }
    assert got[1] == 100      # 10 min gap, in tolerance
    assert got[2] is None     # closest prior is 100 min back: expired
    assert got[3] == 200      # 1 min gap

    # Without tolerance the expired match comes back.
    got_all = {
        r.lid: r.asof_rid
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_payload=["rid"],
        ).collect()
    }
    assert got_all[2] == 100


def test_tolerance_forward_direction(spark):
    import datetime as dt

    from hdfs_parquet_importer_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    left = spark.createDataFrame(
        [(1, 1, ts(0)), (2, 1, ts(50))], "lid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(9, 1, ts(20))], "rid long, k long, ts timestamp"
    )
    got = {
        r.lid: r.asof_rid
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_payload=["rid"], direction="forward", tolerance_sec=600,
        ).collect()
    }
    assert got[1] is None  # next match 20 min ahead > 10 min tolerance
    assert got[2] is None  # no future right row at all


def test_nearest_direction_picks_closer_side(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01T10:00:00"), lid=1),  # fwd closer
            Row(k=1, ts=_ts("2024-01-01T11:59:00"), lid=2),  # bwd closer
            Row(k=2, ts=_ts("2024-01-01T10:00:00"), lid=3),  # no rights
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01T09:00:00"), rid=6),
            Row(k=1, ts=_ts("2024-01-01T10:30:00"), rid=7),
        ]
    )
    out = {
        r.lid: r
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_payload=["rid"], direction="nearest",
        ).collect()
    }
    assert out[1].asof_rid == 7  # 30 min forward beats 60 min back
    assert out[2].asof_rid == 7  # both behind: 89 min beats 179 min
    assert out[3].asof_rid is None


def test_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01T10:00:00"), lid=1)])
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01T09:30:00"), rid=1),  # 30 min back
            Row(k=1, ts=_ts("2024-01-01T10:30:00"), rid=2),  # 30 min fwd
        ]
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        right_payload=["rid"], direction="nearest",
    ).collect()
    assert out[0].asof_rid == 1


def test_nearest_tolerance(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01T10:00:00"), lid=1),  # 30m -> in
            Row(k=1, ts=_ts("2024-01-01T23:00:00"), lid=2),  # 12.5h -> out
        ]
    )
    right = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01T10:30:00"), rid=9)])
    out = {
        r.lid: r
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_payload=["rid"], direction="nearest", tolerance_sec=3600,
        ).collect()
    }
    assert out[1].asof_rid == 9
    assert out[2].asof_rid is None


def test_null_right_ts_never_matches(spark):
    left = spark.createDataFrame(
        [Row(k=1, ts=_ts("2024-01-01T08:00:00"), lid=1)]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=None, rid=99),
            Row(k=1, ts=_ts("2024-01-01T09:00:00"), rid=7),
        ],
        "k int, ts timestamp, rid int",
    )
    # backward: no right row at or before 08:00 -> no match (the
    # null-ts row must NOT be carried in).
    out = asof_join(left, right, "k", "ts", "ts", ["rid"]).collect()
    assert out[0].asof_rid is None
    # forward: 09:00 matches; the null row is still invisible.
    out_f = asof_join(
        left, right, "k", "ts", "ts", ["rid"], direction="forward"
    ).collect()
    assert out_f[0].asof_rid == 7


def test_null_left_ts_matches_nothing_both_directions(spark):
    left = spark.createDataFrame(
        [Row(k=1, ts=None, lid=1)], "k int, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [Row(k=1, ts=_ts("2024-01-01T09:00:00"), rid=7)]
    )
    for d in ("backward", "forward", "nearest"):
        out = asof_join(
            left, right, "k", "ts", "ts", ["rid"], direction=d
        ).collect()
        assert len(out) == 1 and out[0].asof_rid is None, d


def test_duplicate_right_ts_deterministic_winner(spark):
    left = spark.createDataFrame(
        [Row(k=1, ts=_ts("2024-01-01T10:00:00"), lid=1)]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01T09:00:00"), rid=7),
            Row(k=1, ts=_ts("2024-01-01T09:00:00"), rid=8),
        ]
    ).repartition(8)
    # Greatest payload struct wins, identically on every run.
    for _ in range(3):
        out = asof_join(left, right, "k", "ts", "ts", ["rid"]).collect()
        assert out[0].asof_rid == 8


def test_nearest_subsecond_gaps(spark):
    # true gaps: backward 0.9s, forward 0.1s — a whole-second cast
    # would compute 0 vs 1 and pick the WRONG (backward) side.
    left = spark.createDataFrame(
        [Row(k=1, ts=_ts("2024-01-01T10:00:10.900000"), lid=1)]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01T10:00:10.000000"), rid=7),
            Row(k=1, ts=_ts("2024-01-01T10:00:11.000000"), rid=8),
        ]
    )
    out = asof_join(
        left, right, "k", "ts", "ts", ["rid"], direction="nearest"
    ).collect()
    assert out[0].asof_rid == 8


def test_right_ts_in_payload_rejected(spark):
    import pytest as _pytest

    left = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01T10:00:00"))])
    right = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01T09:00:00"))])
    with _pytest.raises(ValueError, match="must not repeat"):
        asof_join(left, right, "k", "ts", "ts", ["ts"])
