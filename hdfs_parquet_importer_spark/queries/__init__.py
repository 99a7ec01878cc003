"""Query registry — the driver-facing catalog of every implemented
operator (SURVEY.md §2), each paired with a DuckDB oracle SQL twin.

Contract (/root/repo/__spark_entry__.py): the driver runs each Spark
callable and its oracle side-by-side at sf0.01 and compares row count,
schema, and an order-insensitive value hash. Consequences honored here:

* every computed column is aliased identically in Spark and SQL;
* floating-point aggregates are ROUND()-ed the same way on both sides
  (accumulation order differs between engines; rounding makes the
  doubles bit-identical);
* raw timestamps are avoided in outputs — formatted strings or
  year/month ints travel across the engine boundary instead;
* a rounded column that can hit zero gets ``+ 0.0`` on BOTH sides:
  DuckDB's ROUND preserves IEEE -0.0 on negative underflow, Spark's
  drops the sign, and the driver's hasher distinguishes them
  (discovered live on embedding_covariance: 2 of 4096 cells);
* queries without a SQL-expressible oracle set ``oracle=None`` and get
  the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    """One registered operator demonstration."""

    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


# ROTATION CONTRACT (stated as policy per ADVICE r5 item 4, no more
# per-round ad-hoc argument):
#
# The external driver records a correctness row for only the FIRST 50
# registrations each round (CORRECTNESS_r01.json stopped at exactly 50
# entries, in registration order). This tuple pins that window; driver
# coverage is CUMULATIVE across rounds. Slot priority, highest first:
#
#   P1. Any query whose Spark code OR oracle SQL changed this round
#       (a changed query may never ship on a stale green).
#   P2. Any query red in the previous round's CORRECTNESS file.
#   P3. Queries that have NEVER held a driver row (registration
#       backlog), oldest registration first.
#   P4. Value-neutral-change cohorts (e.g. a shared plan-heuristic
#       tweak) and stale greens, oldest driver round first.
#   P5. Per-module family representatives if a required module would
#       otherwise have no row this round
#       (tests/test_smoke.py::test_driver_window_covers_every_family).
#
# New registrations land AFTER the window (registry() emits window
# first) and queue at P3 for the NEXT round — so each round may add at
# most ~50 queries without outrunning driver verification. Amendment
# (r8): a new registration MAY take a leftover slot in its own round
# once P1/P2 and the committed queue are seated (the invariant is
# never-outrun-verification, not the delay itself). Everything
# outside the window holds its green from the round its code last
# changed, and the FULL registry is re-gated locally every pytest run
# (tests/test_oracle_gate.py / tools/check_oracle.py, driver-parity
# pandas fetch), so rotation never leaves an edited query unverified.
_DRIVER_WINDOW: tuple[str, ...] = (
    # -- Round 9 rotation (executes the committed r9 QUEUE: all 26
    # never-windowed r8 registrations, then the 17 remaining r3
    # greens — after this round no driver row anywhere predates r4 —
    # plus the round's P1 changed-code cohort and the two r9
    # registrations in leftover slots per the r8 amendment).
    #
    # (P1) Changed in r9 (ADVICE r8 fixes touch shared operators):
    #   mix_domain_quota — scale-aware bucket count in the grouped
    #       prefix sum (VERDICT r8 item 5), value-identical;
    #   agg_salted_two_phase — salted_agg now ENFORCES the
    #       merge-associative-partial contract (ADVICE item 4; the
    #       counter salt stays retry-nondeterministic, which the
    #       enforced contract makes provably harmless), min/max
    #       partials merge with min/max; value-identical;
    #   dedup_clusters / dedup_cluster_canonical /
    #   fuzzy_name_clusters — connected_components convergence-on-
    #       final-round fix (ADVICE item 5), value-identical on these
    #       convergent graphs.
    "mix_domain_quota",
    "agg_salted_two_phase",
    "dedup_clusters",
    "dedup_cluster_canonical",
    "fuzzy_name_clusters",
    # (P3) All 26 never-windowed r8 registrations, registration order
    # (queue item a).
    "join_dpp_prune",
    "join_skew_aqe",
    "etl_schema_evolution",
    "agg_approx_top_k",
    "sql_recursive_cte",
    "func_parameterized_sql",
    "dedup_semdedup",
    "ann_mips_topk",
    "vocab_growth_heaps",
    "dedup_substring_span",
    "multimodal_video_framesample",
    "embedding_hard_negatives",
    "mix_quota_by_quality",
    "pack_sorted_stream",
    "text_kneser_ney_bigram",
    "quality_dsir_weights",
    "arrow_grouped_stats",
    "arrow_map_norms",
    "stat_theil_sen_slope",
    "dq_psi_drift",
    "dq_observe_metrics",
    "ts_ewma",
    "report_data_card",
    "graph_label_propagation",
    "graph_jaccard_neighbors",
    "graph_k_core",
    # (P4) The 17 remaining r3 greens (queue item b) — after these,
    # the whole registry's driver rows are r4+.
    "agg_approx_percentile",
    "join_salted_skew",
    "pack_sequences",
    "q14_promo_effect",
    "q19_disjunctive_pred",
    "q3_shipping_priority",
    "q5_local_supplier",
    "sample_bernoulli",
    "setop_except",
    "setop_union_by_name",
    "subq_in_heavy_orders",
    "subq_scalar_avg_qty",
    "text_pii_scan",
    "text_repetition",
    "topk_orders",
    "unpivot_brand_metrics",
    "window_running_sum",
    # (P5) Module representatives: no P1-P4 entry above lands in the
    # tpch or events modules this round, and the family-coverage gate
    # (tests/test_smoke.py::test_driver_window_covers_every_family)
    # requires one row per module — P5 outranks the r8 leftover-slot
    # amendment, so the two r9 URL registrations queue for r10
    # instead of seating in-round. Oldest (r4) rows of each module,
    # family-spread:
    "q2_min_cost_supplier",
    "events_session_window",
)
# r10 QUEUE (committed now so the next rotation is mechanical):
# (a) the r9 registrations (P3, registration order):
#     url_canonicalize, dedup_url_canonical;
# (b) the 34 remaining r4 greens (P4, oldest-first — this drains r4;
#     q2_min_cost_supplier and events_session_window are windowed in
#     r9 as the P5 reps above):
#     agg_having, agg_histogram, agg_mode_per_group,
#     asof_join_next_purchase, asof_join_purchase_view,
#     cdc_latest_per_key, corpus_train_eval_split,
#     events_hourly_rollup, events_interval_join,
#     events_longest_streak, events_retention,
#     events_sliding_window, events_tumbling_window,
#     events_user_activity, func_array, func_date, func_explode,
#     func_json, func_map_props, func_map_transform, func_math,
#     join_anti, join_full_outer, join_range, join_semi,
#     q11_important_value, q12_priority_shipping, q20_excess_quantity,
#     sample_stratified, sample_weighted,
#     setop_intersect, window_forward_fill, window_lag_lead,
#     window_share_of_total;
# (c) then oldest r5 greens, family-spread, to fill the window.


def registry() -> dict[str, Query]:
    """Import all query modules and return the full registry.

    Ordered so the driver's 50-entry correctness window
    (`_DRIVER_WINDOW`) comes first; the remaining queries follow in
    module registration order.
    """
    # Imports are deferred so `import hdfs_parquet_importer_spark`
    # stays cheap; each module registers at import time.
    from hdfs_parquet_importer_spark.queries import (  # noqa: F401
        relational,
        tpch,
        etl_parity,
        functions,
        windows,
        events,
        llm,
        mixing,
        subqueries,
        pandas_surface,
        stats,
        reporting,
        graphs,
    )

    missing = [n for n in _DRIVER_WINDOW if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"_DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


def spark_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in registry().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
