#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints
exactly ONE JSON line:

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Timing methodology: one untimed warmup execution of EACH query first
(JIT + whole-stage-codegen compile + parquet footer cache are one-time
costs a long-lived job amortizes away), then each query is timed over
a full plan-build + execute + collect cycle and the best of two timed
runs is reported — standard steady-state benchmarking, which also
damps the ±15% run-to-run noise of a shared machine. The headline
metric is the sum of per-query times — a throughput proxy that rewards
minimizing shuffles and keeping work JVM-side, matching how the driver
compares rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hdfs_parquet_importer_spark.queries import registry
from hdfs_parquet_importer_spark.session import build_session

# Diverse operator coverage: scan+agg, broadcast join, fact-fact join,
# window, rollup, as-of join, dedup, similarity, text analysis. Names
# absent from the registry are skipped, so this list can lead the
# implementation slightly.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "join_broadcast_dim",
    "agg_rollup",
    "window_topk_per_group",
    "asof_join_purchase_view",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "ann_cosine_topk",
    "events_tumbling_window",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = build_session("bench", shuffle_partitions=32)

    reg = registry()
    names = [n for n in HEADLINE if n in reg]

    # Warmup: every query once, untimed (JIT + codegen compile).
    for name in names:
        reg[name].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            reg[name].fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
