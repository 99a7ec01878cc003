"""Materialize a synthetic sf0.5 dataset under /tmp for the scaling
study's fourth decade (VERDICT r6 item 5).

The driver ships sf{0.001,0.01,0.1} only and /root/testdata is
read-only, so the extra point is built from sf0.1 by 5x key-shifted
replication: each fact table is unioned 5 times with every
PRIMARY/FOREIGN key column offset by copy * 1e9, so join cardinalities
scale linearly (naive replication WITHOUT key shifts would multiply
join fan-out 25x — a superlinear artifact of the construction, not of
any plan). The tiny dimension tables (region, nation) keep their 25/5
rows, matching how real TPC-H dims grow sublinearly.

Payload variation (VERDICT r7 item 9 — v1 copied text/embedding
payloads VERBATIM, giving every document 4 exact twins and inflating
duplicate density far above a real sf0.5): each copy now re-keys its
payloads deterministically —

* documents.text: per-copy alphabet rotation (Caesar over [a-z] and
  [0-9] by 5*k / 3*k via ``translate``). Word boundaries, every
  length statistic, n_chars, and the Zipf shape survive exactly, but
  cross-copy token overlap drops to ~0 — so exact/near-duplicate
  density equals sf0.1's WITHIN-copy density, i.e. representative;
* embeddings.embedding: per-copy circular rotation of the dimension
  axis (shift 7*k). Norms and within-copy pairwise geometry are
  preserved; cross-copy vectors decorrelate instead of arriving as
  cosine-1.0 twins.

Remaining caveat: TPC-H fact VALUES (prices, dates) still repeat 5x,
which is representative for scan/join/agg/window and only understates
distinct-value growth. Keys shifted per table: customer.c_custkey,
supplier.s_suppkey, part.p_partkey, orders.o_{order,cust}key,
lineitem.l_{order,part,supp}key, events.{event_id,user_id},
documents.doc_id, embeddings.vec_id.

Usage: python tools/make_sf05.py   (idempotent; ~1 min; writes
       /tmp/spark_graft_sf0.5/{table}.parquet)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

OUT_DIR = "/tmp/spark_graft_sf0.5"
SRC_DIR = "/root/testdata/sf0.1"
COPIES = 5
OFFSET = 1_000_000_000

SHIFT_COLS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


_LOWER = "abcdefghijklmnopqrstuvwxyz"
_DIGIT = "0123456789"


def _vary_payload(c, table: str, k: int):
    """Deterministic per-copy payload re-keying (copy 0 is verbatim
    sf0.1), so replicas are DISTINCT content, not exact twins."""
    if k == 0:
        return c
    if table == "documents":
        rot = _LOWER[5 * k % 26 :] + _LOWER[: 5 * k % 26]
        dig = _DIGIT[3 * k % 10 :] + _DIGIT[: 3 * k % 10]
        return c.withColumn(
            "text",
            F.translate("text", _LOWER + _DIGIT, rot + dig),
        )
    if table == "embeddings":
        shift = 7 * k
        n = F.size("embedding")
        return c.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda _x, i: F.element_at(
                    "embedding", ((i + F.lit(shift)) % n) + 1
                ),
            ),
        )
    return c


def generate(spark) -> str:
    # Versioned marker: v2 = per-copy payload re-keying (documents
    # alphabet rotation / embeddings dimension rotation). A v1 build
    # (unversioned marker) holds verbatim payload twins — exactly the
    # duplicate-density caveat the re-keying removes — so it must NOT
    # satisfy this check; regenerate over it.
    marker = os.path.join(OUT_DIR, "_COMPLETE_v2")
    if os.path.exists(marker):
        return OUT_DIR
    for table, keys in SHIFT_COLS.items():
        src = spark.read.parquet(os.path.join(SRC_DIR, f"{table}.parquet"))
        if not keys:
            out = src  # dims stay at their sublinear real-world size
        else:
            parts = []
            for k in range(COPIES):
                c = src
                for col in keys:
                    c = c.withColumn(col, F.col(col) + F.lit(k * OFFSET))
                parts.append(_vary_payload(c, table, k))
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(
            os.path.join(OUT_DIR, f"{table}.parquet")
        )
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return OUT_DIR


if __name__ == "__main__":
    from hdfs_parquet_importer_spark.session import build_session

    spark = build_session("make-sf05", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    print(generate(spark))
