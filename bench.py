#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints
exactly ONE JSON line:

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1, ...}

Timing methodology (round 3, after the round-2 +19% drift proved the
old best-of-2 harness could not tell environment noise from plan
regressions): one untimed warmup execution of EACH query first (JIT +
whole-stage-codegen compile + parquet footer cache are one-time costs
a long-lived job amortizes away), then each query is timed over
``RUNS`` (>=3) full plan-build + execute + collect cycles. The
reported per-query number is the MEDIAN; per-query spread (stdev and
min) ships alongside under "stdev"/"min" so a round-over-round delta
can be judged against the measured noise floor instead of guessed.
The headline metric is the sum of per-query medians — a throughput
proxy that rewards minimizing shuffles and keeping work JVM-side.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hdfs_parquet_importer_spark.queries import registry
from hdfs_parquet_importer_spark.session import build_session

# Diverse operator coverage: scan+agg, dim join, fact-fact join,
# subquery, set-op, window, rollup, as-of join, dedup, similarity,
# text analysis, multimodal codec, event windows. Names absent from
# the registry are skipped, so this list can lead the implementation.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "join_broadcast_dim",
    "subq_in_heavy_orders",
    "setop_union_by_name",
    "agg_rollup",
    "window_topk_per_group",
    "asof_join_purchase_view",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "ann_cosine_topk",
    "events_tumbling_window",
    "mix_domain_quota",
    "corpus_source_overlap",
    "pipeline_corpus_prep",
    "zorder_curve",
    "events_funnel",
    # r5: the two r4 perf-weak queries after their single-task-window
    # -> distributed rewrite, plus the banded range-frame — benched so
    # the scale fixes show up as measured deltas.
    "stat_spearman_rank",
    "vocab_coverage",
    "window_range_frame",
    # r5 second batch: the new graph / sparse-similarity / curation
    # operators — benched from birth so regressions have a baseline.
    "graph_pagerank",
    "doc_tfidf_cosine_topk",
    "text_boilerplate_blocks",
    "dedup_incremental_batch",
    # r5 third batch: one representative per new family (statistics,
    # sketches, data quality, time-series, lakehouse temporal) —
    # benched from birth.
    "stat_corr_matrix",
    "sketch_countmin_heavy",
    "dq_expectations",
    "ts_linear_interpolate",
    "agg_activity_bitmap",
    "scd2_temporal_join",
    # r5 fourth batch: ranked retrieval + the bitmap dashboard.
    "text_bm25_search",
    "events_dau_wau_mtd",
    # r6: the new distributed-statistics operator, benched from birth.
    "stat_bootstrap_ci",
    # r6 second batch: one representative per new family — graph
    # analytics (mutual-kNN triangles) and full-corpus quality
    # partitioning (perplexity terciles) — benched from birth.
    "graph_triangle_count",
    "quality_ccnet_buckets",
    # r7: one representative per new family — the BPE encode fold
    # (tokenizer loop closed) and INT8 scalar quantization — benched
    # from birth.
    "tokenize_bpe_encode",
    "embedding_quantize_int8",
    # r8: one representative per new family — LPA communities (the
    # iterate-join-reaggregate shape), the quality-greedy quota on
    # the grouped prefix sum, and runtime dynamic partition pruning
    # — benched from birth.
    "graph_label_propagation",
    "mix_quota_by_quality",
    "join_dpp_prune",
    # r8 second batch: SemDeDup (cluster-scoped embedding dedup +
    # recursive-closure-oracled CC) — benched from birth.
    "dedup_semdedup",
    # r9: the crawl URL-canonicalization pre-dedup stage (pure
    # scan-side Catalyst canonical form + one hash-groupBy exchange)
    # — benched from birth.
    "dedup_url_canonical",
    # r10: the model-scored quality filter (broadcast linear
    # classifier over hashed features) — benched from birth.
    "quality_classifier_score",
    # r11: the real baseline-JPEG codec round-trip (per-row
    # encode+decode+error inside one mapInPandas stage — the
    # Python-UDF-heavy representative) — benched from birth.
    "multimodal_jpeg_roundtrip",
    # r12: the classifier-quality eval against planted spam (NB
    # retrain on the augmented corpus + precision/recall rollup) —
    # benched from birth.
    "eval_classifier_quality",
    # r12: the 4:4:4 color JPEG round-trip (3 interleaved components,
    # chroma tables, YCbCr conversion — ~3x the gray codec's per-row
    # Python work) — benched from birth.
    "multimodal_jpeg_color_roundtrip",
    # r12: SemDeDup true-near-dup recall eval (planted perturbation
    # pairs, dual-bits bucket collision) — benched from birth.
    "eval_semdedup_recall",
    # r12: split-leakage audit (truth-pair CC + dual-keyed 90/5/5
    # splits) — benched from birth.
    "split_leakage_audit",
    # r12: SimHash single-edit sensitivity eval (planted pairs,
    # semi-joined fingerprints) — benched from birth.
    "eval_simhash_recall",
    # r12 second pass: duplicated-span REMOVAL (the Lee et al.
    # transformation behind dedup_substring_span's statistic — 8-gram
    # coverage sets + per-doc index-filter reconstruction) — benched
    # from birth.
    "dedup_span_removal",
    # r12 second pass: dimension-truncation retrieval eval (three
    # salted brute-force top-k passes, 16/32-dim scan-side slices) —
    # benched from birth.
    "eval_dim_truncation_recall",
    # r12 second pass: decontamination recall eval against planted
    # truth (md5 truth join + the shipped gram-equi-join detector) —
    # benched from birth.
    "eval_contamination_recall",
    # r12 second pass: progressive (SOF2) JPEG roundtrip — four codec
    # passes per row (progressive + baseline encode/decode) in one
    # mapInPandas stage; the heaviest per-row-Python cell by design —
    # benched from birth.
    "multimodal_jpeg_progressive_roundtrip",
    # r13: DSIR selection-recall eval (planted cross-source dups of
    # the curated domain; shared weight table + bucketed dist_rank
    # top-k) — benched from birth.
    "eval_dsir_recall",
    # r13: the REAL AVI/MJPEG frame-sample replaced the synthetic
    # container (encode + parse + per-frame JPEG decode per row) —
    # re-benched as effectively a new query.
    "multimodal_video_framesample",
]

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = build_session(
        "bench",
        shuffle_partitions=32,
        conf={
            # No interactive console here: stage progress bars are
            # pure stderr noise in a harness capture.
            "spark.ui.showConsoleProgress": "false",
            # The measured-protocol heap (SCALING.md r12 addendum:
            # 32g clears the localCheckpoint OOM wall AND avoids the
            # 64g G1 regime that degraded checkpoint-heavy queries
            # 5-25x; the pre-r13 default was 1g — see _release_
            # persisted for what that did to the session tail).
            "spark.driver.memory": "32g",
        },
    )
    # Quiet the JVM log stream (VERDICT r6 item 3): the *bounded*
    # single-partition windows (bucket-total passes over ~n_buckets
    # rows, post-LIMIT cumsums) each emit a benign WindowExec WARN
    # that drowned the 2000-byte stdout tail the driver keeps.
    # Real unpartitioned-window regressions are enforced at the PLAN
    # layer (tests/test_plans.py's global-window gate + allowlist),
    # which is strictly stronger than grepping warnings.
    spark.sparkContext.setLogLevel("ERROR")

    reg = registry()
    names = [n for n in HEADLINE if n in reg]

    # Warmup: every query once, untimed (JIT + codegen compile).
    for name in names:
        reg[name].fn(spark, sf_dir).collect()
        _release_persisted(spark)

    medians: dict[str, float] = {}
    stdevs: dict[str, float] = {}
    mins: dict[str, float] = {}
    for name in names:
        samples: list[float] = []
        for _ in range(max(3, RUNS)):
            t0 = time.perf_counter()
            reg[name].fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
            # OUTSIDE the timer: each execution's own checkpoint
            # creation is charged to it above; dropping the blocks it
            # left behind is harness bookkeeping, and doing it after
            # EVERY execution means each timed run starts from the
            # same storage state (lower variance, no session-position
            # bias).
            _release_persisted(spark)
        medians[name] = round(statistics.median(samples), 3)
        stdevs[name] = round(statistics.stdev(samples), 3)
        mins[name] = round(min(samples), 3)

    total = round(sum(medians.values()), 3)

    # Drift flags (VERDICT r7 item 7): compare each median against the
    # COMMITTED drift baseline (BENCH_BASELINE.json, promoted from the
    # final quiet-window run at round close — see _load_prev_table;
    # r10, VERDICT r9 item 5). The r7->r8
    # adjudication of text_bm25_search showed WHY raw deltas mislead:
    # the shared host drifts wholesale (r8 measured q1 +52%, simhash
    # +6%, triangles +11%, bm25 +11% in one window — every unchanged
    # query moved together), so the detector first estimates a global
    # SPEED FACTOR (median of per-query new/old ratios — robust to a
    # few real regressions) and then flags only queries that moved
    # >2x the larger run's stdev (floored at 20 ms) RELATIVE to that
    # factor. A structural regression flags 1-2 names; an ambient
    # slowdown moves the factor and flags none.
    prev = _load_prev_table(sf)
    shared = [n for n in medians if n in prev.get("medians", {})]
    ratios = sorted(
        medians[n] / prev["medians"][n] for n in shared if prev["medians"][n]
    )
    speed_factor = round(ratios[len(ratios) // 2], 3) if ratios else 1.0
    drift: dict[str, float] = {}
    for name in shared:
        expected = prev["medians"][name] * speed_factor
        sigma = max(stdevs[name], prev.get("stdevs", {}).get(name, 0.0), 0.02)
        if abs(medians[name] - expected) > 2 * sigma:
            # Record the FACTOR-RELATIVE ratio (new / ambient-adjusted
            # expectation), not the raw ratio — the flag criterion is
            # factor-relative, so the reported magnitude must be the
            # structural part, not structural + ambient.
            drift[name] = round(medians[name] / expected, 2)

    # Full per-query table (median/stdev/min) persists in-repo: the
    # driver's tail capture keeps only the LAST 2000 stdout bytes, and
    # the 35-query r5 line overflowed it — BENCH_r05.json lost the
    # headline total and every median (VERDICT r5 "What's missing" 2).
    try:
        _write_full_table(sf, total, medians, stdevs, mins, prev, drift, speed_factor)
    except OSError:
        pass  # bench must still report when the repo dir is read-only

    # The one stdout line stays compact (headline + medians only;
    # spread lives in BENCH_LOCAL.md) and is size-guarded against the
    # 2000-byte tail window.
    payload = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": medians,
        "runs": max(3, RUNS),
        "sf": sf,
        # Global machine-speed ratio vs the previous run (median of
        # per-query ratios) and the >2-sigma RELATIVE movers after
        # normalizing by it; drift == {} means nothing moved beyond
        # noise once ambient host drift is factored out.
        "speed_factor": speed_factor,
        "drift": drift,
    }
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1900:
        slowest = dict(
            sorted(medians.items(), key=lambda kv: -kv[1])[:30]
        )
        payload["queries"] = slowest
        payload["queries_omitted"] = len(medians) - len(slowest)
        line = json.dumps(payload, separators=(",", ":"))
    print(line)
    return 0


def _release_persisted(spark) -> None:
    """Unpersist every persisted RDD the last execution left behind.

    83 sites across the package ``localCheckpoint`` small shared
    intermediates; each bench execution rebuilds its plan from
    scratch, so a FINISHED execution's blocks are dead weight — but
    localCheckpoint pins them for the session lifetime and, before
    r13, nothing ever dropped them. Over the 56-query session
    (1 warmup + 3 timed runs each) that accumulated every query's
    blocks in the storage region of what was then a 1g default
    driver heap, and the measured effect was POSITION-dependent
    degradation: the r13 control run (BENCH_NOTES) clocked the LAST
    ~8 headline queries at 4-11x their ambient-adjusted baselines
    (mix_quota_by_quality 11.3x, dedup_semdedup 10.1x,
    eval_classifier_quality 5.5x ...) while early-session queries
    sat at ambient — and the r12 DRIVER run's 17.5x
    quality_ccnet_buckets cell was the same mechanism landing on a
    different victim. Blocking unpersist so every run starts from
    a deterministic storage state; the ~ms py4j sweep runs outside
    the timer."""
    jsc = spark.sparkContext._jsc
    for rdd in jsc.getPersistentRDDs().values():
        rdd.unpersist(True)


def _load_prev_table(sf) -> dict:
    """Committed drift baseline (same sf) for drift comparison; {} if
    absent/unreadable/different-sf.

    r10 (VERDICT r9 item 5): the baseline is BENCH_BASELINE.json — a
    COMMITTED file updated deliberately at round close — not
    BENCH_LOCAL.json, which every run (including the driver's
    post-commit run) overwrites and which is therefore untracked now.
    Splitting the two makes "previous run" unambiguous for the
    speed-factor normalizer and lets rounds close with a clean tree.
    Falls back to BENCH_LOCAL.json only when no baseline exists yet
    (fresh clone mid-round). A readable baseline with a DIFFERENT sf
    means this run is off the committed scale — return {} (no drift
    comparison) rather than normalizing against an arbitrary stale
    scratch run (r10 ADVICE)."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_BASELINE.json")) as fh:
            prev = json.load(fh)
    except (OSError, ValueError):
        prev = None
    if prev is not None:
        return prev if prev.get("sf") == sf else {}
    try:
        with open(os.path.join(here, "BENCH_LOCAL.json")) as fh:
            prev = json.load(fh)
        if prev.get("sf") == sf:
            return prev
    except (OSError, ValueError):
        pass
    return {}


def _write_full_table(sf, total, medians, stdevs, mins, prev, drift, speed_factor) -> None:
    here = os.path.dirname(os.path.abspath(__file__))

    def _drift_cell(n: str) -> str:
        if n in drift:
            # drift[n] is already factor-relative (structural part
            # only); print that, not the raw ratio that conflates
            # ambient host movement with the regression being flagged.
            return f"{drift[n] - 1.0:+.0%} rel>2σ"
        return ""

    rows = "\n".join(
        f"| {n} | {medians[n]:.3f} | {stdevs[n]:.3f} | {mins[n]:.3f} "
        f"| {_drift_cell(n)} |"
        for n in medians
    )
    with open(os.path.join(here, "BENCH_LOCAL.md"), "w") as fh:
        fh.write(
            f"# Local bench — last run\n\n"
            f"sf={sf}, runs={max(3, RUNS)}, "
            f"headline_total_sec={total}\n\n"
            f"(Written by bench.py on every run; medians are the "
            f"headline numbers, stdev/min give the noise floor, and "
            f"drift flags medians that moved more than 2x the larger "
            f"run's stdev vs the committed BENCH_BASELINE.json "
            f"AFTER normalizing by the global speed factor "
            f"{speed_factor} (median per-query ratio vs the baseline "
            f"— ambient host drift moves the factor, a structural "
            f"regression flags its name) — automated per VERDICT r7 "
            f"item 7. The driver's "
            f"BENCH_r*.json keeps only a 2000-byte stdout tail, so "
            f"this file is the durable full table.)\n\n"
            f"| query | median_s | stdev_s | min_s | drift |\n"
            f"|---|---|---|---|---|\n{rows}\n"
        )
    with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as fh:
        json.dump(
            {"sf": sf, "total": total, "medians": medians,
             "stdevs": stdevs, "mins": mins},
            fh,
            indent=1,
        )


if __name__ == "__main__":
    raise SystemExit(main())
