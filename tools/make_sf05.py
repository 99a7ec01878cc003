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

Honest caveats, documented in SCALING.md: text/embedding payloads are
verbatim copies, so every document gains 4 exact twins — duplicate
density is far ABOVE a real sf0.5, making dedup/LSH queries strictly
harder (bucket depth 5x); and value distributions repeat rather than
extend. Ratios from this point are therefore an upper bound for
near-dup operators and representative for scan/join/agg/window
operators. Keys shifted per table: customer.c_custkey,
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


def generate(spark) -> str:
    marker = os.path.join(OUT_DIR, "_COMPLETE")
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
                parts.append(c)
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
