"""As-of join — for each left row, the most recent right row with
``right_ts <= left_ts`` within the same key (inclusive, like DuckDB's
``ASOF JOIN`` / kdb's ``aj``).

Spark has no native as-of join; a naive implementation is a key-equi
join plus ``right_ts <= left_ts`` filter plus a per-left-row max — an
O(n*m) explosion within each key. This implementation uses the
**union-marker** technique instead:

1. tag both sides and union them (no join!);
2. one window pass per key ordered by (ts, right-before-left) carrying
   the last-seen right payload forward (``last(..., ignorenulls)``
   over an unbounded-preceding frame);
3. keep the left rows.

Cost at scale: a single hash shuffle on the key + an in-partition
sort — the same price as one shuffle join, with no row explosion and
no skew amplification from popular keys. This is the canonical
streaming-friendly shape (the same pass works under
``applyInPandasWithState`` for true streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the payload columns of the
    nearest right row on the chosen side and the same ``on`` key (null
    payload when no such row exists).

    ``direction="backward"`` (default) matches the LATEST right row
    with ``right_ts <= left_ts`` (pandas merge_asof semantics);
    ``"forward"`` matches the EARLIEST right row with
    ``right_ts >= left_ts`` — the same union + ordered-window carry,
    just scanned from the other end, so both directions cost one
    key-partitioned window pass (no range self-join).
    ``"nearest"`` matches whichever of those two candidates minimizes
    ``|right_ts - left_ts|``, preferring the BACKWARD row on an exact
    distance tie (deterministic; pandas leaves the tie unspecified) —
    computed as both carries over the SAME union, so it still costs
    one shuffle (two in-partition sorts, one per scan direction).

    ``tolerance_sec`` (pandas merge_asof's ``tolerance``): a match
    further than this many seconds from the left timestamp is
    discarded (payload nulls, as if no match existed). Because the
    as-of match is the CLOSEST right row on the chosen side, "closest
    is out of tolerance" implies no right row is in tolerance — the
    post-carry filter is exact, not an approximation.

    Payload columns appear as ``{prefix}{col}``; ``{prefix}ts`` carries
    the matched right timestamp.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if right_ts in right_payload:
        # Would create a second struct field named "ts" and make
        # `_match.ts` ambiguous — the matched timestamp is already
        # emitted as {prefix}ts.
        raise ValueError(
            f"right_ts {right_ts!r} must not repeat in right_payload "
            f"(the matched timestamp is emitted as {prefix}ts)"
        )
    payload = F.struct(
        F.col(right_ts).alias("ts"), *[F.col(c).alias(c) for c in right_payload]
    )
    # A right row with a NULL timestamp can never legitimately match
    # (every comparison against it is undefined); unfiltered it would
    # sort to one end of the scan and its payload would be carried
    # into real rows.
    right_tagged = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(on).alias(on),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        payload.alias("_payload"),
    )
    left_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(right_tagged.schema["_payload"].dataType).alias("_payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
    )
    right_tagged = right_tagged.withColumn(
        "_left", F.lit(None).cast(left_tagged.schema["_left"].dataType)
    )
    unioned = left_tagged.unionByName(right_tagged)

    # Right rows sort BEFORE left rows at equal ts so the match is
    # inclusive (right_ts == left_ts counts) in either direction.
    # Forward = the same carry scanned from the high end: descending
    # timestamp order turns last-non-null-before into
    # first-non-null-after. NULL left timestamps sort FIRST in BOTH
    # scans (nulls_first on the desc scan too) so they precede every
    # right row and correctly match nothing. Among right rows tied on
    # (key, ts), the greatest payload struct wins in both directions —
    # an arbitrary but DETERMINISTIC rule (shuffle order must never
    # pick the winner: the oracle replay would flake); payload columns
    # must therefore be orderable types (no maps).
    def carry(d: str):
        ts_order = (
            F.col("_ts").asc_nulls_first()
            if d == "backward"
            else F.col("_ts").desc_nulls_first()
        )
        w = (
            Window.partitionBy(on)
            .orderBy(ts_order, F.col("_is_right").desc(), F.col("_payload").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("_payload", ignorenulls=True).over(w)

    if direction == "nearest":
        # Both carries ride ONE hash exchange on the key (two window
        # sort passes); the nearer candidate wins, backward on ties.
        carried = unioned.withColumn("_mb", carry("backward")).withColumn(
            "_mf", carry("forward")
        )
        # cast("double") = epoch seconds WITH fraction: a long cast
        # truncates to whole seconds, which can pick the wrong side on
        # sub-second data (gap 0.9s rounds to 0, gap 0.1s rounds to 1).
        gap_b = F.col("_ts").cast("double") - F.col("_mb.ts").cast("double")
        gap_f = F.col("_mf.ts").cast("double") - F.col("_ts").cast("double")
        carried = carried.withColumn(
            "_match",
            F.when(F.col("_mb").isNull(), F.col("_mf"))
            .when(F.col("_mf").isNull(), F.col("_mb"))
            .when(gap_f < gap_b, F.col("_mf"))
            .otherwise(F.col("_mb")),
        ).drop("_mb", "_mf")
        if tolerance_sec is not None:
            # The chosen match is the global nearest: out-of-tolerance
            # here implies no right row is in tolerance.
            adist = F.abs(
                F.col("_ts").cast("double") - F.col("_match.ts").cast("double")
            )
            carried = carried.withColumn(
                "_match",
                F.when(adist <= int(tolerance_sec), F.col("_match")),
            )
    else:
        carried = unioned.withColumn("_match", carry(direction))
        if tolerance_sec is not None:
            gap = F.col("_ts").cast("double") - F.col("_match.ts").cast("double")
            if direction == "forward":
                gap = -gap
            carried = carried.withColumn(
                "_match", F.when(gap <= int(tolerance_sec), F.col("_match"))
            )
    out = carried.filter(F.col("_is_right") == 0).select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        F.col("_match.ts").alias(f"{prefix}ts"),
        *[F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_payload],
    )
    return out
