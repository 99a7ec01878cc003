"""Optimization-round harness (r13/r14): time query subsets under the
bench.py methodology (1 untimed warmup, then median of RUNS timed
full plan-build+execute+collect cycles, per-execution unpersist) and
optionally dump each query's ``explain("formatted")`` to
``plans/<dir>/<name>_<tag>.txt`` (default r14) so plan claims in OPTIMIZATION_r13.md
are checkable without running Spark.

Usage:
    python tools/optbench.py [--plans TAG] [--sf-dir DIR] name ...
    python tools/optbench.py --all            # every headline query
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from hdfs_parquet_importer_spark.queries import registry  # noqa: E402
from hdfs_parquet_importer_spark.session import build_session  # noqa: E402


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--plans", default=None, help="dump plans with this tag")
    ap.add_argument("--plans-dir", default="r14", help="plans/<dir>/ to write into")
    ap.add_argument("--runs", type=int, default=max(3, bench.RUNS))
    ap.add_argument("--all", action="store_true", help="every headline query")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    reg = registry()
    names = args.names
    if args.all:
        names = [n for n in bench.HEADLINE if n in reg]
    unknown = [n for n in names if n not in reg]
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")

    spark = build_session(
        "optbench",
        shuffle_partitions=32,
        conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "32g",  # bench.py protocol heap
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.plans_dir,
    )
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        reg[name].fn(spark, args.sf_dir).collect()  # warmup
        bench._release_persisted(spark)

    out: dict[str, dict[str, float]] = {}
    for name in names:
        samples: list[float] = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            reg[name].fn(spark, args.sf_dir).collect()
            samples.append(time.perf_counter() - t0)
            bench._release_persisted(spark)
        out[name] = {
            "median": round(statistics.median(samples), 3),
            "min": round(min(samples), 3),
            "stdev": round(statistics.stdev(samples), 3) if len(samples) > 1 else 0.0,
        }
        print(
            f"{name:42s} median={out[name]['median']:8.3f} "
            f"min={out[name]['min']:8.3f} stdev={out[name]['stdev']:.3f}",
            flush=True,
        )
        if args.plans:
            df = reg[name].fn(spark, args.sf_dir)
            with open(
                os.path.join(plans_dir, f"{name}_{args.plans}.txt"), "w"
            ) as fh:
                fh.write(formatted_plan(df))
            bench._release_persisted(spark)

    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
