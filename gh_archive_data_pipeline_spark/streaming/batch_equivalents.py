"""Event-time windowing operators (SURVEY.md §2.11 T5/T6), batch-checkable.

These are the same window expressions Structured Streaming executes per
micro-batch; running them in batch mode lets the DuckDB oracle pin their
semantics exactly (streaming execution of the same plans lives in
streaming.pipeline and is exercised by the streaming unit tests).

Alignment note: Spark tumbling windows align to the Unix epoch; DuckDB
time_bucket aligns to 2000-01-01 — identical boundaries for divisor-of-a-day
widths (1 hour, 1 day), which is what we use for oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from ..plans.registry import register


@register(
    "q50_tumbling_window",
    sql="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def q50_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 tumbling window: hourly counts per event type. Same expression
    works under readStream + watermark (see streaming.pipeline)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type", "n_events", "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "q51_sliding_window",
    sql="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) - INTERVAL '1 hour' AS lo, max(ts) AS hi
      FROM events
    ),
    buckets AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS window_start
      FROM bounds
    )
    SELECT b.window_start, count(*) AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM buckets b
    JOIN events e
      ON e.ts >= b.window_start AND e.ts < b.window_start + INTERVAL '2 hours'
    GROUP BY b.window_start
    ORDER BY b.window_start
    """,
)
def q51_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 sliding window (2h width, 1h slide): each event lands in 2 windows.
    Spark's window() generator expands rows ×(width/slide) then aggregates —
    partial agg keeps the shuffle proportional to |windows|, not |events|."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n_events", "total_value",
        )
        .orderBy("window_start")
    )


@register(
    "q52_session_windows",
    sql="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id, min(ts) AS session_start,
           count(*) AS n_events, round(sum(value), 4) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def q52_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 session windows (30 min gap) per user via session_window() — the
    oracle reproduces the semantics with the classic gaps-and-islands SQL.
    In streaming the identical expression runs with a watermark and merging
    session state."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            "n_events", "session_value",
        )
        .orderBy("user_id", "session_start")
    )
