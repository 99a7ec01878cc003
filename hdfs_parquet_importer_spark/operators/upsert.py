"""Upsert (MERGE) and CDC compaction as batch DataFrame transforms.

Without a table format that supports row-level MERGE, the lakehouse
upsert is a transformation + partition overwrite: compute the merged
table, write it back (the `sources.write_partitioned_parquet` sink
overwrites per partition). These two operators provide the compute
side:

* ``upsert`` — updates win over target on key collision, inserts pass
  through. Implemented as union + per-key priority argmax: ONE shuffle
  (on the key) regardless of how many sides; the full-outer-join
  formulation shuffles both sides too but also pays join + coalesce of
  every column.
* ``latest_per_key`` — CDC-log compaction: keep the newest version of
  each key by a version/timestamp column (deterministic tiebreak).
  This is the read-side "merge-on-read" of every CDC pipeline.

Both are pure Catalyst plans: at 100 TB the shuffle is hash(key) and
map-side nothing explodes; a hot key degrades to AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PRIO = "__prio"
_RN = "__rn"


def upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """MERGE semantics: rows from ``updates`` replace same-key rows in
    ``target``; unmatched update rows are inserted; unmatched target
    rows survive. Schemas must be union-compatible by name.

    When ``updates`` itself contains duplicate keys, the winner is
    chosen by ``tiebreak_cols`` (descending — e.g. a version/timestamp
    column, mirroring ``latest_per_key``). Default: every non-key
    column, descending — arbitrary but DETERMINISTIC, so repeated runs
    and retried tasks produce identical output; a row_number over a
    window ordered only by priority would pick whichever duplicate a
    given shuffle happened to order first. The default therefore
    requires every non-key column to be ORDERABLE (no maps) and makes
    the full row width the shuffle's sort key — pass an explicit
    narrow ``tiebreak_cols`` for wide or map-bearing schemas.
    """
    tagged = target.withColumn(_PRIO, F.lit(0)).unionByName(
        updates.withColumn(_PRIO, F.lit(1))
    )
    if tiebreak_cols is None:
        tiebreak_cols = [c for c in target.columns if c not in set(key_cols)]
    order = [F.desc(_PRIO)] + [F.desc(c) for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        tagged.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_PRIO, _RN)
    )


def latest_per_key(
    df: DataFrame, key_cols: list[str], version_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Compact to the newest row per key by ``version_col`` (descending),
    with a deterministic tiebreak column list (required when versions
    can collide — nondeterministic compaction corrupts CDC replays)."""
    order = [F.desc(version_col)] + [F.desc(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )
