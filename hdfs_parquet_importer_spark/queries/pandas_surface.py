"""Pandas-UDF surface demonstrations (SURVEY.md §2.2 UDF row).

The reference registers four Scala scalar UDFs (reference
package.scala:48-66,104); this engine replaces all of them with native
Catalyst expressions (queries/etl_parity.py) because Python row UDFs
serialize per row. The two queries here demonstrate the *sanctioned*
Python escape hatches for logic Catalyst genuinely cannot express —
Arrow-batched so the Python boundary costs one (de)serialization per
~10k-row batch, not per row:

* a vectorized scalar ``pandas_udf`` (Series -> Series);
* a grouped ``applyInPandas`` (per-group closed-form OLS regression —
  stand-in for any per-group model fit / sklearn-style step).

Both are checked against exact DuckDB twins (log1p and regr_slope /
regr_intercept respectively), so the Arrow plumbing is verified
end-to-end, not just plan-shaped.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from hdfs_parquet_importer_spark.queries import register
from hdfs_parquet_importer_spark.tables import load_table


def _log1p_price_udf():
    # Built lazily: decorating at import time would parse the DDL
    # return type, which requires an active SparkContext (the registry
    # imports this module before any session exists).
    @pandas_udf("double")
    def _log1p_price(price: pd.Series) -> pd.Series:
        import numpy as np

        return np.log1p(price)

    return _log1p_price


@register(
    "pandas_udf_log_price",
    oracle="""
SELECT o_orderkey, ROUND(ln(1 + o_totalprice), 6) AS log_price
FROM orders ORDER BY o_orderkey
""",
    doc="Vectorized scalar pandas_udf (Arrow batches, numpy log1p). "
    "~10-100x faster than a row-at-a-time Python UDF; still slower "
    "than the equivalent F.log1p — use only when no builtin exists.",
)
def pandas_udf_log_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    log1p_price = _log1p_price_udf()
    return orders.select(
        "o_orderkey", F.round(log1p_price("o_totalprice"), 6).alias("log_price")
    ).orderBy("o_orderkey")


def _fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Closed-form OLS of extendedprice on quantity for one group."""
    import numpy as np

    x = pdf["l_quantity"].to_numpy(dtype="float64")
    y = pdf["l_extendedprice"].to_numpy(dtype="float64")
    n = len(x)
    sx, sy = x.sum(), y.sum()
    sxx, sxy = (x * x).sum(), (x * y).sum()
    denom = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "slope": [np.round(slope, 4)],
            "intercept": [np.round(intercept, 4)],
            "n_points": [n],
        }
    )


@register(
    "pandas_grouped_regression",
    oracle="""
SELECT l_returnflag,
       ROUND(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       COUNT(*) AS n_points
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    doc="applyInPandas per-group model fit (closed-form OLS), the "
    "template for any per-group sklearn/numpy step. One shuffle on "
    "the group key; each group must fit in one executor's memory — "
    "at 100 TB group by a finer key or pre-aggregate sufficient "
    "statistics with native sums (which is what the oracle does).",
)
def pandas_grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    out_schema = (
        "l_returnflag string, slope double, intercept double, n_points long"
    )
    return (
        li.groupBy("l_returnflag")
        .applyInPandas(_fit_group, schema=out_schema)
        .orderBy("l_returnflag")
    )


@register(
    "udtf_text_chunks",
    oracle="""
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       CAST(least(100, length(text) - i*100) AS INT) AS chunk_len
FROM documents,
     unnest(range(CAST(ceil(length(text)/100.0) AS BIGINT))) AS t(i)
WHERE doc_id < 20 ORDER BY doc_id, chunk_idx
""",
    doc="Python UDTF surface (Spark 3.5+): a table function LATERAL-"
    "joined per input row — here fixed-size char chunking of "
    "documents (the row-explosion shape behind context-window "
    "splitting). One input row fans out to ceil(len/100) output "
    "rows; the lateral join keeps the expansion partition-local (no "
    "shuffle). UDTFs are the row-at-a-time slow path — this demo "
    "completes the UDF/UDAF/UDTF API surface (SURVEY §2.2); the "
    "production chunker for a hot path is the equivalent Catalyst "
    "sequence()+explode() projection.",
)
def udtf_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_len int")
    class Chunker:
        def eval(self, text: str):
            if not text:
                return
            n = len(text)
            for i in range((n + 99) // 100):
                yield i, min(100, n - i * 100)

    spark.udtf.register("chunker", Chunker)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.chunk_len
        FROM __udtf_docs, LATERAL chunker(text) AS c
        WHERE doc_id < 20 ORDER BY doc_id, chunk_idx
        """
    )


def _brand_stats_arrow(t):
    """Arrow-native per-group stats for one p_brand group.

    Takes and returns a ``pyarrow.Table`` — no pandas materialization;
    every reduction is a vectorized Arrow compute kernel. Prices carry
    exactly 2 decimals, so all accumulation runs in integer cents
    (exact) and each output is ONE IEEE double division of identical
    integers on both engines — bit-exact with no rounding step (the
    group mean CAN land exactly on a 4-dp halfway point, where Python
    half-even and DuckDB half-up disagree).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    cents = pc.cast(
        pc.round(pc.multiply(t.column("p_retailprice"), 100.0)), pa.int64()
    )
    n = t.num_rows
    sc = pc.sum(cents).as_py()
    # mean(|x - mu|) == sum(|n*cents_i - sum_cents|) / (100 * n^2),
    # exact integers inside the abs.
    sdev = pc.sum(
        pc.abs_checked(pc.subtract(pc.multiply(cents, n), sc))
    ).as_py()
    return pa.table(
        {
            "p_brand": [t.column("p_brand")[0].as_py()],
            "n_parts": pa.array([n], pa.int64()),
            "avg_price": [sc / (100.0 * n)],
            "mean_abs_dev": [sdev / (100.0 * n * n)],
        }
    )


@register(
    "arrow_grouped_stats",
    oracle="""
WITH c AS (
  SELECT p_brand, CAST(ROUND(p_retailprice*100) AS BIGINT) AS cents
  FROM part),
m AS (
  SELECT p_brand, SUM(cents) AS sc, COUNT(*) AS n
  FROM c GROUP BY p_brand)
SELECT m.p_brand, m.n AS n_parts,
       m.sc / (100.0 * m.n) AS avg_price,
       SUM(ABS(c.cents * m.n - m.sc)) / (100.0 * m.n * m.n)
         AS mean_abs_dev
FROM c JOIN m USING (p_brand)
GROUP BY m.p_brand, m.n, m.sc ORDER BY m.p_brand
""",
    doc="applyInArrow grouped map (Spark 4 API surface): like "
    "applyInPandas but the group arrives as a pyarrow.Table and the "
    "UDF composes Arrow compute kernels directly — zero "
    "Arrow->pandas->Arrow conversion, no index/dtype coercion "
    "overhead, the cheapest Python escape hatch per batch. Computes "
    "per-brand price mean and mean absolute deviation (the "
    "two-pass-in-SQL shape that is one pass per group here). Same "
    "scale contract as applyInPandas: one shuffle on the group key, "
    "each group must fit in one task; completes the Arrow-UDF "
    "surface next to mapInPandas/applyInPandas/pandas_udf/UDTF.",
)
def arrow_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_brand", "p_retailprice")
    out_schema = (
        "p_brand string, n_parts long, avg_price double, mean_abs_dev double"
    )
    return (
        part.groupBy("p_brand")
        .applyInArrow(_brand_stats_arrow, schema=out_schema)
        .orderBy("p_brand")
    )


def _norm_batches(batches):
    """mapInArrow body: per-batch L2 norms via Arrow kernels only."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        t = pa.Table.from_batches([batch])
        flat = t.column("embedding").combine_chunks()
        sq = pc.list_flatten(
            flat
        )  # all elements, row order preserved
        sq = pc.multiply(
            pc.cast(sq, pa.float64()), pc.cast(sq, pa.float64())
        )
        # Re-window the flat squares back to per-row lists using the
        # original offsets, then sum each list.
        offsets = flat.offsets
        sums = []
        raw = sq.to_numpy(zero_copy_only=False)
        off = offsets.to_numpy(zero_copy_only=False)
        for i in range(len(off) - 1):
            sums.append(float(raw[off[i]:off[i + 1]].sum()))
        out = pa.table(
            {
                "vec_id": t.column("vec_id"),
                "l2_norm": pa.array(
                    [s ** 0.5 for s in sums], pa.float64()
                ),
            }
        )
        yield from out.to_batches()


@register(
    "arrow_map_norms",
    oracle="""
SELECT vec_id,
       ROUND(sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])), 6) AS l2_norm
FROM embeddings ORDER BY vec_id
""",
    doc="mapInArrow surface (the Arrow-native twin of mapInPandas, "
    "completing the UDF matrix: scalar pandas_udf / grouped "
    "applyInPandas / grouped applyInArrow / mapInPandas / mapInArrow "
    "/ UDTF / SQL UDF / applyInPandasWithState): a partition-local "
    "batch iterator — RecordBatch in, RecordBatch out, zero shuffle, "
    "zero pandas conversion — computing per-row embedding L2 norms "
    "over the Arrow list offsets. numpy's pairwise summation and "
    "DuckDB's sequential list_dot_product accumulate in different "
    "orders (~1e-15 relative), so the continuous value is ROUND(6)-ed "
    "on both sides — the registry's standard continuous-value "
    "discipline. Scale: embarrassingly parallel scan-side projection; "
    "the Python boundary costs one Arrow batch (de)serialization per "
    "~10k rows.",
)
def arrow_map_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    out = emb.mapInArrow(
        _norm_batches, schema="vec_id long, l2_norm double"
    )
    return out.select(
        "vec_id", F.round("l2_norm", 6).alias("l2_norm")
    ).orderBy("vec_id")
