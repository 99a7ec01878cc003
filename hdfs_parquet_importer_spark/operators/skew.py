"""Skew-mitigation primitives for hot-key joins and aggregations.

Two layers of defense at 100 TB:

1. **AQE skew-join splitting** (on by default in the session factory,
   ``spark.sql.adaptive.skewJoin.enabled``): splits oversized shuffle
   partitions at runtime. Handles moderate skew with zero code.
2. **Explicit salting** (this module): for pathological hot keys that
   a single reducer could never hold even after AQE splitting. The
   big side spreads each key over ``n_salts`` sub-keys; the small
   side replicates each row ``n_salts`` times (explode of a literal
   range — map-side only, no shuffle to build). The join key becomes
   (key, salt), so a hot key's rows land on ``n_salts`` reducers
   instead of one. Cost: small side grows n_salts-fold — keep
   ``n_salts`` modest (8-64) and the small side genuinely small.

Two-phase aggregation (``salted_agg``) is the same idea for
``groupBy``: partial aggregate on (key, salt), final aggregate on key
— the classic combiner pattern made explicit when the aggregate is
algebraic (sum/count/min/max) but the default partial aggregation is
defeated (e.g. after an explode that re-expands rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

# Join types for which replicating the small side is semantics-preserving.
# right/full (and right_semi/right_anti-style variants) are NOT: every
# small-side row that matches nothing on the big side would be emitted
# once per salt replica — n_salts silent duplicates.
_SAFE_SALTED_HOWS = frozenset({
    "inner", "cross", "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
})


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Deterministic salt: hash of the full row spread via pmod — no
    rand(), so retried tasks (speculative execution, stage retry)
    produce identical output; nondeterministic salting breaks
    exactly-once file commit at scale.

    Only join types where small-side replication preserves semantics
    are accepted (``_SAFE_SALTED_HOWS``). ``right``/``full`` would
    duplicate each unmatched small-side row n_salts times; for those,
    salt the other side or rely on AQE skew-join splitting.
    """
    normalized = how.lower().replace("_", "")
    if normalized not in {h.replace("_", "") for h in _SAFE_SALTED_HOWS}:
        raise ValueError(
            f"salted_join does not support how={how!r}: replicating the "
            "small side duplicates its unmatched rows under right/full "
            "joins. Use inner/left/semi/anti, swap the sides, or rely on "
            "AQE skew-join splitting."
        )
    # Salt from a per-row counter, NOT a hash of the row's columns: a
    # hot key whose rows are IDENTICAL (duplicate log/CDC records —
    # the common skew case) hashes every copy to the same salt, which
    # re-serializes the hot key through one reducer while still paying
    # the n_salts-fold small-side replication. The counter spreads
    # duplicates round-robin; routing nondeterminism across retries is
    # harmless (join output is salt-independent). Also avoids
    # xxhash64's MapType restriction.
    big_salted = big.withColumn(
        _SALT,
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias(_SALT)
    small_replicated = small.select("*", salts)
    joined = big_salted.join(
        small_replicated,
        (big_salted[big_key] == small_replicated[small_key])
        & (big_salted[_SALT] == small_replicated[_SALT]),
        how,
    )
    return joined.drop(_SALT)


def salted_agg(
    df: DataFrame,
    group_col: str,
    agg_cols: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation via explicit salting.

    ``agg_cols`` maps output name -> SUM-mergeable partial expression
    (counts and sums; express avg as sum/count at the call site).
    Phase 1 aggregates on (key, salt) — a hot key's input spreads over
    ``n_salts`` reducers; phase 2 merges the n_salts partials per key,
    touching only |keys| x n_salts rows.
    """
    partial = (
        # Counter salt, not row-hash: see salted_join — duplicate rows
        # of a hot key must spread, and partials are SUM-mergeable so
        # routing may be nondeterministic.
        df.withColumn(
            _SALT,
            F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast(
                "int"
            ),
        )
        .groupBy(group_col, _SALT)
        .agg(*[expr.alias(name) for name, expr in agg_cols.items()])
    )
    return partial.groupBy(group_col).agg(
        *[F.sum(name).alias(name) for name in agg_cols]
    )
