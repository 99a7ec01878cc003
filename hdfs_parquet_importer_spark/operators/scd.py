"""Slowly-changing-dimension (Type 2) history build and time-travel
snapshots over an append-only change log.

The reference has no dimension-management surface at all (SURVEY.md
§2.2 — its only lakehouse-ish artifact is the partitioned parquet
sink, ``package.scala:157``); these are the extension operators a
warehouse ETL built on the same engine would need next, and they pair
with ``operators/upsert.py`` (MERGE) and ``cdc_latest_per_key``
(compaction): upsert folds a batch INTO current state, SCD2 keeps
EVERY state with its validity interval, and a snapshot reads the state
AS OF any past timestamp.

Scale shape: everything here is key-partitioned windows and
aggregations — the log shuffles once on the dimension key and each
key's history is processed inside its own partition. No global
windows, no driver-side state; skew is bounded by the hottest single
key's change count (a dimension key with 10^6 changes is a data-model
bug, not an engine case).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    log: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse an append-only change log into SCD Type-2 history.

    ``log`` rows are observations of a key's attributes at time
    ``ts``.  Consecutive observations with identical ``attrs`` are
    collapsed (an observation that changes nothing extends the current
    version instead of opening a new one); each surviving change opens
    a version row carrying:

    * ``valid_from``  — the change's own timestamp,
    * ``valid_to``    — the NEXT change's timestamp (null = current),
    * ``version``     — 1-based per-key change ordinal,
    * ``is_current``  — ``valid_to IS NULL``.

    Intervals are half-open ``[valid_from, valid_to)`` so a probe
    timestamp matches exactly one version.  ``tiebreak`` (a unique
    column, e.g. the log sequence number) makes simultaneous
    observations deterministic.

    Two key-partitioned window passes (change detect, then interval
    assignment) over the same partitioning — one shuffle total, and
    Catalyst collapses the two sorts into one.
    """
    order = [F.col(ts).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)

    changed: Column | None = None
    for a in attrs:
        neq = ~F.col(a).eqNullSafe(F.lag(a).over(w))
        changed = neq if changed is None else (changed | neq)
    # First row = position 1, NOT lag(ts).isNull(): a predecessor with
    # a NULL timestamp (bad/late data sorts first under asc) would
    # make its successor look like a first row too, disabling change
    # collapse and minting spurious null-valid_from versions.
    first = F.row_number().over(w) == 1

    kept = log.withColumn("_chg", first | changed).filter(F.col("_chg"))

    # Same partitioning, same order: no second shuffle.
    out = (
        kept.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead(ts).over(w))
        .withColumn("version", F.row_number().over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    cols = [key, *attrs, "valid_from", "valid_to", "version", "is_current"]
    return out.select(*cols)


def snapshot_as_of(
    log: DataFrame,
    key: str,
    ts: str,
    cutoff: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Reconstruct per-key state as of ``cutoff`` (time travel).

    Returns, for every key observed at or before ``cutoff``
    (inclusive), the full row of its latest observation — the state a
    reader at ``cutoff`` would have seen.

    Implemented as filter + ``max(struct(ts [, tiebreak], *row))``
    per key: a plain hash aggregation with map-side partial combine —
    each executor reduces its slice to one candidate row per key
    before the single shuffle, so the reduce side sees at most
    ``n_partitions`` rows per key regardless of log depth.  This
    deliberately beats the window/row_number formulation, which must
    shuffle and sort EVERY log row.  Struct comparison is
    lexicographic by field, so ordering is (ts, tiebreak) and the
    remaining fields are tiebreak weight that comparison never reaches
    when ``tiebreak`` is unique — but analysis-time orderability IS
    required of every packed field, so a log with map-typed attribute
    columns cannot ride this path (project maps out, or fall back to
    the window formulation).
    """
    others = [c for c in log.columns if c not in (key, ts)]
    if tiebreak:
        others = [tiebreak] + [c for c in others if c != tiebreak]
    packed = F.max(
        F.struct(F.col(ts).alias("_ts"), *[F.col(c).alias(c) for c in others])
    ).alias("_m")
    snap = (
        log.filter(F.col(ts) <= F.lit(cutoff).cast("timestamp"))
        .groupBy(key)
        .agg(packed)
    )
    return snap.select(
        key,
        F.col("_m._ts").alias(ts),
        *[F.col(f"_m.{c}").alias(c) for c in others],
    )
