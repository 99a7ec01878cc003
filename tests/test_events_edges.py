"""Edge-case tests for queries/events.py beyond the oracle gate's
fixed testdata (r11 review): negative monetary totals (refund-heavy
users) must not vanish from the RFM segmentation."""

from __future__ import annotations

import datetime as dt

from hdfs_parquet_importer_spark.queries.events import (
    events_rfm_segmentation,
)


def test_rfm_keeps_negative_monetary_users(spark, tmp_path):
    """A user whose purchase total is NEGATIVE (refunds) must stay in
    the RFM cube with the naive ntile(5) bucket boundaries (r11
    review: the old two-way monetary split silently dropped such
    users and shifted every bucket).

    10 users: ids 0-7 purchase increasing positive totals, 8 never
    purchases (zero), 9 refunds (negative total). Monetary DESC order
    is 7,6,...,0,8,9 so ntile(5) pairs them down the buckets with
    (8, 9) sharing m_score 5."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in range(8):
        for j in range(uid + 1):
            rows.append(
                (eid, base + dt.timedelta(hours=uid, minutes=j), uid,
                 "purchase", 10.0 * (uid + 1), "{}")
            )
            eid += 1
    rows.append((eid, base + dt.timedelta(days=2), 8, "view", 1.0, "{}"))
    eid += 1
    rows.append(
        (eid, base + dt.timedelta(days=3), 9, "purchase", -50.0, "{}")
    )
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))

    cube = events_rfm_segmentation(spark, str(tmp_path)).collect()
    assert sum(r.n_users for r in cube) == 10, "users dropped from RFM"
    per_m = {}
    for r in cube:
        per_m[r.m_score] = per_m.get(r.m_score, 0) + r.n_users
    assert per_m == {1: 2, 2: 2, 3: 2, 4: 2, 5: 2}
    # The zero and refund users share the bottom monetary bucket.
    bottom = [r for r in cube if r.m_score == 5]
    assert sum(r.n_users for r in bottom) == 2
    assert min(r.example_user for r in bottom) == 8
