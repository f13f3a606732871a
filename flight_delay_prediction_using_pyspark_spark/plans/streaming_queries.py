"""Catalog entries for the streaming-shaped window operators, run in
batch mode (Spark's unified API: the exact same expressions power
streaming/ops.py on readStream inputs — batch/stream symmetry is
tested in tests/test_streaming.py).

Oracles: session windows via the classic gaps-and-islands SQL
(lag → break flag → running sum → group); sliding windows via the
k-shifted tumbling-bucket union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.operators import aggregates as A
from flight_delay_prediction_using_pyspark_spark.plans.queries import query
from flight_delay_prediction_using_pyspark_spark.session import ensure_utc
from flight_delay_prediction_using_pyspark_spark.sources.readers import load_table


@query(
    "events_session_windows",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    g AS (
      SELECT user_id, ts, value,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM d
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 5 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM g
    GROUP BY user_id, grp
    """,
)
def q_events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (5-min inactivity gap) per user via
    built-in `session_window` — the stateful streaming operator
    (streaming/ops.session_window_agg) in its batch form, verified
    against a gaps-and-islands oracle. Shuffles once on user_id."""
    ensure_utc(spark)
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            A.exact_decimal_sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_sliding_windows",
    oracle="""
    WITH shifted AS (
      SELECT date_trunc('hour', ts) AS w_start, event_type, value FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type, value FROM events
    )
    SELECT w_start AS window_start,
           w_start + INTERVAL 2 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM shifted
    GROUP BY w_start, event_type
    """,
)
def q_events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h length, 1h slide) per event_type: each
    event lands in 2 windows. Same expression Structured Streaming
    plans for sliding windowed aggs; oracle is the k-shifted
    tumbling-bucket union."""
    ensure_utc(spark)
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            A.exact_decimal_sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
