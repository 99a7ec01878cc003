"""Targeted SCALING re-measure: same protocol as tools/scaling.py
(warmup + min-of-RUNS split into two temporally separated passes,
32g driver heap) but over an explicit query subset, for adjudicating
individual cells of a full-table run suspected of ambient-burst
corruption without paying the full 58-query x 5-SF cost.

Usage: python tools/remeasure.py q1 q2 ...   (prints one row per query)
       SPARK_GRAFT_REMEASURE_SFS=0.1,0.5,1 python tools/remeasure.py ...
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from hdfs_parquet_importer_spark.queries import registry  # noqa: E402
from hdfs_parquet_importer_spark.session import build_session  # noqa: E402


def main(names: list[str]) -> int:
    reg = registry()
    unknown = [n for n in names if n not in reg]
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")
    spark = build_session(
        "remeasure",
        shuffle_partitions=32,
        conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "32g",  # scaling.py protocol heap
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    runs = max(3, bench.RUNS)
    root = os.environ.get("SPARK_GRAFT_TESTDATA_ROOT", "/root/testdata")
    want = os.environ.get("SPARK_GRAFT_REMEASURE_SFS", "0.001,0.01,0.1,0.5,1")
    sfs: list[tuple[str, str]] = []
    for sf in want.split(","):
        sf = sf.strip()
        if sf in ("0.001", "0.01", "0.1"):
            sfs.append((sf, os.path.join(root, f"sf{sf}")))
        else:
            from tools.make_sf05 import generate

            sfs.append((sf, generate(spark, scale=float(sf))))

    med: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf, sf_dir in sfs:
        gc.collect()
        spark.catalog.clearCache()
        for n in names:
            reg[n].fn(spark, sf_dir).collect()  # warmup
            bench._release_persisted(spark)
        samples: dict[str, list[float]] = {n: [] for n in names}
        for pass_runs in (range(runs - 1), range(1)):
            for n in names:
                for _ in pass_runs:
                    t0 = time.perf_counter()
                    reg[n].fn(spark, sf_dir).collect()
                    samples[n].append(time.perf_counter() - t0)
                    # Same per-execution unpersist as bench.py /
                    # tools/scaling.py (r13): checkpoint blocks from
                    # a prior query must not tax this cell.
                    bench._release_persisted(spark)
        for n in names:
            med[n][sf] = round(min(samples[n]), 3)
        print(f"sf{sf} block done", flush=True)

    labels = [s for s, _ in sfs]
    print("| query | " + " | ".join(f"sf{s} s" for s in labels) + " |")
    for n in names:
        print("| " + n + " | " + " | ".join(str(med[n][s]) for s in labels) + " |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
