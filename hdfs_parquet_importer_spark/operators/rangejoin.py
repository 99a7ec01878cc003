"""Bucketed point-in-interval join.

A point-in-range predicate (``lo <= v AND v <= hi``) has no equi key,
so Spark plans it as a broadcast-nested-loop join — O(|points| x
|intervals|) comparisons, the first thing that dies when neither side
broadcasts. The standard fix is **banding**: pick a bucket width W,
explode each interval to the buckets it overlaps (ceil((hi-lo)/W)+1
rows — bounded when interval lengths are bounded), map each point to
its single bucket, equi-join on the bucket id, and re-check the exact
range predicate on the survivors. The shuffle key becomes the bucket
id: hash-partitioned, AQE-splittable, no cross product anywhere.

Choose W on the order of the typical interval length: too small
multiplies the interval side, too large degrades pruning (each bucket
pairs every point with every interval overlapping it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing it.

    Both inputs keep all their columns; the helper bucket column is
    dropped from the output. Intervals must satisfy ``lo <= hi``.
    """
    if how != "inner":
        # The exact range check runs as a post-join FILTER, which
        # silently deletes an outer join's unmatched (all-null) rows —
        # the survivors would be exactly the inner result mislabeled
        # as outer. Raise rather than shift semantics (the repo-wide
        # knob convention); an outer variant needs the range predicate
        # inside the join condition.
        raise NotImplementedError(
            f"interval_point_join supports how='inner' only, got {how!r}"
        )
    w = float(bucket_width)
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / F.lit(w)).cast("long")
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, "__bucket", how)
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bucket")
    )
