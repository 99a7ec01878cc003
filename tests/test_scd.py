"""SCD Type-2 history build + time-travel snapshot (operators/scd.py)."""

import datetime as dt

from hdfs_parquet_importer_spark.operators.scd import scd2_build, snapshot_as_of


def _ts(mins):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=mins)


def _log(spark):
    # key 1: gold -> gold (no-op, collapses) -> silver -> gold
    # key 2: single observation, stays current
    rows = [
        (10, 1, _ts(0), "gold"),
        (11, 1, _ts(5), "gold"),
        (12, 1, _ts(10), "silver"),
        (13, 1, _ts(20), "gold"),
        (14, 2, _ts(3), "bronze"),
    ]
    return spark.createDataFrame(
        rows, "seq long, k long, ts timestamp, tier string"
    )


def test_scd2_collapses_and_versions(spark):
    out = scd2_build(
        _log(spark), key="k", ts="ts", attrs=["tier"], tiebreak="seq"
    )
    rows = {(r.k, r.version): r for r in out.collect()}
    assert len(rows) == 4  # the minute-5 no-op observation collapsed

    v1, v2, v3 = rows[(1, 1)], rows[(1, 2)], rows[(1, 3)]
    assert [v1.tier, v2.tier, v3.tier] == ["gold", "silver", "gold"]
    # Half-open chain: each valid_to equals the next valid_from.
    assert v1.valid_to == v2.valid_from == _ts(10)
    assert v2.valid_to == v3.valid_from == _ts(20)
    assert v3.valid_to is None and v3.is_current
    assert not v1.is_current and not v2.is_current
    assert rows[(2, 1)].is_current


def test_scd2_nullsafe_change_detection(spark):
    rows = [
        (1, 1, _ts(0), None),
        (2, 1, _ts(1), None),      # null -> null: no change
        (3, 1, _ts(2), "x"),       # null -> x: change
        (4, 1, _ts(3), None),      # x -> null: change
    ]
    log = spark.createDataFrame(
        rows, "seq long, k long, ts timestamp, tier string"
    )
    out = scd2_build(log, key="k", ts="ts", attrs=["tier"], tiebreak="seq")
    tiers = [r.tier for r in out.orderBy("version").collect()]
    assert tiers == [None, "x", None]


def test_snapshot_as_of_picks_latest_at_cutoff(spark):
    snap = snapshot_as_of(
        _log(spark),
        key="k",
        ts="ts",
        cutoff="2024-01-01 00:10:00",
        tiebreak="seq",
    )
    got = {r.k: (r.tier, r.ts) for r in snap.collect()}
    # Inclusive cutoff: the minute-10 silver row is visible.
    assert got[1] == ("silver", _ts(10))
    assert got[2] == ("bronze", _ts(3))


def test_snapshot_tiebreak_on_equal_timestamps(spark):
    rows = [(1, 1, _ts(0), "a"), (2, 1, _ts(0), "b")]
    log = spark.createDataFrame(
        rows, "seq long, k long, ts timestamp, tier string"
    )
    snap = snapshot_as_of(
        log, key="k", ts="ts", cutoff="2024-01-02 00:00:00", tiebreak="seq"
    )
    [r] = snap.collect()
    assert (r.tier, r.seq) == ("b", 2)  # highest (ts, seq) wins


def test_temporal_join_covers_each_probe_exactly_once(spark, sf_dir):
    """Interval-partition property: every (user, probe-day) with the
    user's history open at that instant matches EXACTLY one SCD2
    version — no gaps, no overlaps — and the matched version's
    interval really covers the day."""
    import datetime as dt

    from hdfs_parquet_importer_spark.queries import registry

    rows = registry()["scd2_temporal_join"].fn(spark, sf_dir).collect()
    seen = {}
    for r in rows:
        key = (r.user_id, r.day)
        assert key not in seen, f"duplicate match {key}"
        seen[key] = r.version
    # Each user's matched days must be contiguous from their first
    # covered day through Jan 30 (versions chain with no gaps).
    by_user = {}
    for u, day in seen:
        by_user.setdefault(u, []).append(day)
    for u, days in by_user.items():
        days.sort()
        d0 = dt.date.fromisoformat(days[0])
        expect = [
            (d0 + dt.timedelta(days=i)).isoformat()
            for i in range(len(days))
        ]
        assert days == expect, f"gap in user {u} coverage"
        assert days[-1] == "2024-01-30"
