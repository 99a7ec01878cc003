"""Distributed prefix sums — the building block for sequence packing.

LLM pretraining packs documents into fixed-size token windows by
concatenating the token stream and chunking at ``budget`` boundaries
("concat-then-chunk"). The stream offset of every document is a
prefix sum of token counts in stream order — which naively is a
global-order window (``Window.orderBy(...)`` with no partition), i.e.
every row through ONE reducer. Death at 100 TB, and our own plan gate
flags it.

``prefix_sum`` is the classic two-phase scalable form:

1. bucket rows by contiguous ranges of the order key; a per-bucket
   cumulative sum is a PARTITIONED window (parallel, bounded state);
2. bucket totals (one row per bucket) get their own exclusive prefix
   sum — a single-partition window over only ``n_buckets`` rows —
   and are broadcast back.

offset(row) = bucket_base + local_cumsum - value: exclusive prefix.
The only serialized work is over bucket count, not row count; at
1000 executors pick buckets >> executors and << rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "__psbucket"
_LOCAL = "__pslocal"
_BASE = "__psbase"


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket: Column,
    out_col: str = "offset",
) -> DataFrame:
    """Append the EXCLUSIVE prefix sum of ``value_col`` in
    ``order_col`` order as ``out_col``.

    ``bucket`` must be a monotone function of ``order_col`` (bucket
    ids ascend with the order key and group contiguous ranges) — e.g.
    ``F.col("doc_id") % ... no; use floor(doc_id / K)``. Monotonicity
    is what lets per-bucket sums compose into a global prefix.
    """
    b = df.withColumn(_BUCKET, bucket.cast("long"))
    local_w = (
        Window.partitionBy(_BUCKET)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = b.withColumn(_LOCAL, F.sum(value_col).over(local_w))

    totals = b.groupBy(_BUCKET).agg(F.sum(value_col).alias("_tot"))
    # Exclusive running total over bucket ids: tiny (n_buckets rows),
    # the ONLY single-partition window in the plan.
    tot_w = (
        Window.orderBy(_BUCKET)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bases = totals.withColumn(
        _BASE, F.sum("_tot").over(tot_w) - F.col("_tot")
    ).select(_BUCKET, _BASE)

    return (
        b.join(F.broadcast(bases), _BUCKET)
        .withColumn(out_col, F.col(_BASE) + F.col(_LOCAL) - F.col(value_col))
        .drop(_BUCKET, _LOCAL, _BASE)
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    tokens_col: str,
    budget: int,
    bucket: Column,
) -> DataFrame:
    """Concat-then-chunk sequence packing: assign each document its
    stream ``offset`` and the ``bin_id`` of the ``budget``-token chunk
    its first token lands in (documents may straddle chunk borders —
    exactly how pretraining packing treats the token stream).
    """
    with_off = prefix_sum(df, order_col, tokens_col, bucket, out_col="offset")
    return with_off.withColumn(
        "bin_id", F.expr(f"offset div {int(budget)}")
    )
