"""Batch twins of the streaming-tier transformations.

Spark's unified model means the functions in streaming/windows.py run
unchanged on batch DataFrames — these registry entries execute them in
batch mode so the driver's DuckDB differential gate covers the
windowing semantics (tumbling/sliding/session). True streaming
execution (file source → memory sink, watermark eviction) is
asserted in tests/test_streaming.py via stream-vs-batch equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hivetomysql_spark.queries import register
from hivetomysql_spark.streaming.windows import (
    session_windows,
    sliding_user_activity,
    tumbling_counts,
)
from hivetomysql_spark.tables import load_table


@register(
    "stream_tumbling_batch",
    oracle="""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events)
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM e
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows (batch twin of the streaming
    aggregation)."""
    return tumbling_counts(load_table(spark, sf_dir, "events"))


@register(
    "stream_sliding_batch",
    oracle="""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id FROM events),
    fanout AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) - k * INTERVAL '1 hour'
               AS window_start,
             user_id
      FROM e, UNNEST([0, 1]) AS t(k)
    )
    SELECT window_start, user_id, COUNT(*) AS n_events
    FROM fanout
    GROUP BY 1, 2
    """,
)
def stream_sliding_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour/1-hour windows — every event fans out to 2
    windows (the window÷slide cost factor)."""
    return sliding_user_activity(load_table(spark, sf_dir, "events"))


@register(
    "stream_session_batch",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    marked AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS session_value
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def stream_session_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap (batch twin; oracle is the
    classic gaps-and-islands formulation)."""
    return session_windows(load_table(spark, sf_dir, "events")).select(
        "user_id",
        "session_start",
        "n_events",
        "session_value",
    )


@register(
    "stream_stateful_totals_batch",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS total_value,
           CAST(COUNT(DISTINCT event_type) AS INT) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_totals_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/stateful.py's applyInPandasWithState
    running accumulator: per-user cumulative (count, value sum,
    distinct types). The stateful streaming execution — cross-batch
    state, update-mode emission — is asserted batch-split-invariant
    in tests/test_streaming.py."""
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.count_distinct("event_type").cast("int").alias("n_types"),
    )
