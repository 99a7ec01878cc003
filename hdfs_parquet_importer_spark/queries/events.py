"""Time-window queries over the ``events`` table (driver north_star
streaming-shaped extensions; the reference is strictly batch ETL —
SURVEY.md §2.2 "Streaming: none").

Each query is computed in BATCH with the same ``F.window`` /
``F.session_window`` operators Structured Streaming uses, so (a) the
DuckDB oracle applies, and (b) the identical plan runs under
``readStream`` (demonstrated in ``streaming/``).

Oracle alignment notes:

* ``F.window`` aligns buckets to the unix epoch; DuckDB
  ``time_bucket`` aligns to 2000-01-03 00:00:00, which sits on a whole
  day — identical grids for any bucket width dividing 24 h.
* Spark ``session_window`` merges [ts, ts+gap) intervals, so an event
  arriving exactly ``gap`` after the previous one starts a NEW session
  — the SQL gaps-and-islands condition is ``diff >= gap``, not ``>``.
* Window starts travel as formatted strings (UTC session timezone on
  the Spark side, naive timestamps on the DuckDB side — same wall
  time, no tz ambiguity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.queries import register
from hdfs_parquet_importer_spark.tables import load_table

_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "events_tumbling_window",
    oracle="""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
""",
    doc="Tumbling 1-hour window x event_type aggregation via F.window. "
    "Partial (map-side) aggregation bounds the shuffle at "
    "O(windows x types) per partition regardless of event volume; "
    "the identical plan runs under readStream with a watermark.",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_sliding_window",
    oracle="""
SELECT strftime(time_bucket(INTERVAL '30 minutes', ts)
                  - k * INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S')
         AS window_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value,
       MAX(value) AS max_value
FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
GROUP BY 1
""",
    doc="Sliding window (1 h size, 30 min slide): every event lands in "
    "exactly 2 windows. F.window expands rows by size/slide before the "
    "partial agg — shuffle stays O(windows), not O(events).",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "n_events",
            "sum_value",
            "max_value",
        )
    )


@register(
    "events_session_window",
    oracle="""
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '2 hours'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT *, SUM(new_s) OVER
    (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM o)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM s GROUP BY user_id, sid
""",
    doc="Session windows (2 h inactivity gap) per user via "
    "F.session_window; the oracle is the classic gaps-and-islands "
    "rewrite. Shuffle key is user_id; Spark merges candidate sessions "
    "after the partial agg, so state is O(sessions) not O(events).",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "2 hours").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", _FMT).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_user_activity",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2)
         AS purchase_value,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
FROM events GROUP BY user_id
""",
    doc="Per-user activity profile: conditional aggregation + distinct "
    "count + temporal extent. Single hash-agg shuffle on user_id.",
)
def events_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)),
            2,
        ).alias("purchase_value"),
        F.date_format(F.min("ts"), _FMT).alias("first_seen"),
        F.date_format(F.max("ts"), _FMT).alias("last_seen"),
    )


@register(
    "events_interval_join",
    oracle="""
SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
       CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS gap_s
FROM events p JOIN events v
  ON p.user_id = v.user_id
 AND p.event_type = 'purchase' AND v.event_type = 'view'
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL 2 HOUR
ORDER BY purchase_id, view_id
""",
    doc="Interval join: every view within 2h before a purchase by the "
    "same user — the batch twin of the stream-stream interval join in "
    "streaming/pipeline.py (same plan, plus watermarks to bound state "
    "when both sides are unbounded). Equi-key on user_id carries the "
    "shuffle; the time bound prunes within each key.",
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    joined = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 2 HOURS")),
    )
    return joined.select(
        "purchase_id",
        "view_id",
        "user_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")).alias("gap_s"),
    ).orderBy("purchase_id", "view_id")
