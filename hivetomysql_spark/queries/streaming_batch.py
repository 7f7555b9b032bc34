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
    click_purchase_join,
    click_purchase_join_outer,
    enrich_with_dimension,
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


@register(
    "stream_gap_sessions_batch",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                       > 1800 * 1000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM seq
    ),
    per AS (
      SELECT user_id, session_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(value) AS sv,
             epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us,
             epoch_us(MAX(ts)) AS end_us
      FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS INTEGER) AS n_sessions,
           CAST(SUM(n) AS BIGINT) AS total_events,
           ROUND(SUM(sv), 2) AS total_value,
           CAST(MAX(dur_us) AS BIGINT) AS longest_us,
           CAST(MAX(end_us) AS BIGINT) AS latest_end_us
    FROM per GROUP BY user_id
    """,
)
def stream_gap_sessions_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/sessions.py's stateful gap-sessionizer:
    per-user session summary (count, events, value, longest duration,
    latest end) from 30-min-gap sessions. In batch the sessions come
    from the lag/cumsum construction on one user-keyed window; the
    streaming operator must converge to exactly this state from ANY
    micro-batch slicing (tests/test_streaming.py asserts it)."""
    from pyspark.sql.window import Window
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
            > 1800 * 1_000_000,
            1,
        )
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0)
        .alias("new_s"),
    )
    sess = seq.withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("sv"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
        F.unix_micros(F.max("ts")).alias("end_us"),
    )
    return per.groupBy("user_id").agg(
        F.count("*").cast("int").alias("n_sessions"),
        F.sum("n").alias("total_events"),
        F.round(F.sum("sv"), 2).alias("total_value"),
        F.max("dur_us").alias("longest_us"),
        F.max("end_us").alias("latest_end_us"),
    )


@register(
    "stream_enrich_batch",
    oracle="""
    SELECT CAST(DATE_TRUNC('day', e.ts) AS TIMESTAMP) AS day,
           c.c_nationkey,
           COUNT(*) AS n_events,
           ROUND(SUM(e.value), 2) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_enrich_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join
    (streaming/windows.py:enrich_with_dimension) — identical code
    path; the tumbling 1-day window is epoch-aligned so it equals
    DATE_TRUNC('day'). Stream-vs-batch equivalence is pinned in
    tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return enrich_with_dimension(ev, c)


@register(
    "stream_join_batch",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def stream_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream click→purchase attribution
    join (streaming/windows.py:click_purchase_join). The event-time
    bounds that make streaming state evictable are the same interval
    predicate the batch range join uses."""
    ev = load_table(spark, sf_dir, "events")
    return click_purchase_join(ev)


@register(
    "stream_join_left_batch",
    oracle="""
    WITH c AS (
      SELECT event_id AS click_id, ts AS click_ts, user_id
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT event_id AS purchase_id, ts AS purchase_ts,
             user_id AS p_user_id
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.click_id, c.user_id, p.purchase_id,
           epoch_us(p.purchase_ts) - epoch_us(c.click_ts) AS lag_us,
           p.purchase_id IS NOT NULL AS converted
    FROM c LEFT JOIN p
      ON c.user_id = p.p_user_id
     AND p.purchase_ts >= c.click_ts
     AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
    """,
)
def stream_join_left_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the LEFT OUTER stream-stream attribution join
    (streaming/windows.py:click_purchase_join_outer): every click
    with its in-window purchases OR an explicit unconverted row —
    the attribution denominator an inner join silently drops. In
    streaming, emitting the unmatched side is watermark-governed
    (state eviction IS result emission); stream-vs-batch agreement
    on the watermark-closed region is pinned in
    tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events")
    return click_purchase_join_outer(ev)


@register(
    "stream_type_counts_batch",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def stream_type_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic contract of the transformWithStateInPandas processor
    (streaming/typed_state.py:EventTypeCounter): the converged
    per-user MapState equals this declarative aggregate. The typed
    processor runs in-sandbox (tws_available() discovers the
    gcloud-SDK-bundled protobuf — see session.ensure_protobuf) and is
    equivalence-tested against this twin in tests/test_streaming.py."""
    from hivetomysql_spark.streaming.typed_state import type_counts_batch

    return type_counts_batch(load_table(spark, sf_dir, "events"))


@register(
    "stream_recent_batch",
    oracle="""
    WITH ranked AS (
      SELECT user_id, value, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_recent,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS recent_sum_cents,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_ts_us
    FROM ranked WHERE rn <= 5
    GROUP BY user_id
    """,
)
def stream_recent_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic contract of the ListState last-N tracker
    (streaming/typed_state.py:RecentEventsTracker): each user's
    converged feature row — top-5 events by time, integer-cents sum,
    freshness timestamp — equals this declarative top-N aggregate.
    The streaming path is exercised end-to-end in
    tests/test_streaming.py::test_recent_events_liststate_matches_batch_twin;
    this row makes the contract itself driver-oracled."""
    from hivetomysql_spark.streaming.typed_state import recent_events_batch

    return recent_events_batch(load_table(spark, sf_dir, "events"))
