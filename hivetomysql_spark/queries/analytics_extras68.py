"""Analytics extras, batch 68: the bucketed range join.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); SURVEY.md §2.2 extension-tier entry:

* bucketed range join — point-in-interval matching rewritten from a
  theta join (which Spark can only plan as a nested-loop — the
  classic range-join scale killer) into an equi join on time
  buckets plus an exact residual filter. The technique behind every
  production range/interval join at scale; the plan is asserted
  nested-loop-free in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_RB_N_WINDOWS = 40
_RB_BUCKET_S = 3600  # 1-hour buckets


def _windows_sql() -> str:
    # 40 deterministic maintenance windows over the events month:
    # start = Jan 1 2024 + (md5 % (28 days)) seconds, length 2-6 h
    return f"""
    windows AS (
      SELECT w.w AS window_id,
             TIMESTAMP '2024-01-01'
               + INTERVAL (('0x' || substr(md5('win:' || w.w), 1, 8))::BIGINT
                           % 2419200) SECOND AS ws,
             TIMESTAMP '2024-01-01'
               + INTERVAL (('0x' || substr(md5('win:' || w.w), 1, 8))::BIGINT
                           % 2419200
                           + 7200
                           + ('0x' || substr(md5('len:' || w.w), 1, 8))::BIGINT
                             % 14400) SECOND AS we
      FROM UNNEST(range(0, {_RB_N_WINDOWS})) AS w(w)
    )"""


@register(
    "join_range_bucketed",
    oracle=f"""
    WITH {_windows_sql()}
    SELECT w.window_id,
           CAST(w.ws AS TIMESTAMP) AS window_start,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_events,
           ROUND(COALESCE(SUM(e.value), 0.0), 2) AS total_value
    FROM windows w
    LEFT JOIN events e ON e.ts >= w.ws AND e.ts < w.we
    GROUP BY w.window_id, w.ws
    """,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join, bucketed: events against 40
    deterministic maintenance windows. The naive formulation
    (e.ts BETWEEN w.start AND w.end) has no equi key, so Spark plans
    a nested-loop join — O(|events| x |windows|) compared pairs, the
    range-join scale killer. Here each window EXPLODES to the hour
    buckets it covers (bounded fan-out: <= 7 per window) and each
    event carries its single hour bucket, so the match becomes an
    equi join on the bucket plus an exact residual filter — hash
    join, shuffle on an 8-byte key, linear cost. An event's bucket
    is unique, so no dedup is needed after the residual filter. The
    oracle is the naive theta join; results are provably identical.
    The plan is asserted BroadcastNestedLoopJoin-free in
    tests/test_plans.py.

    At 100 TB this is exactly how as-of/interval/IP-range joins
    ship; bucket width trades fan-out against residual selectivity."""
    ev = load_table(spark, sf_dir, "events")
    base = F.lit("2024-01-01").cast("timestamp")
    w = spark.range(_RB_N_WINDOWS).select(F.col("id").alias("window_id"))
    start_off = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("win:"), F.col("window_id"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 2419200
    )
    len_off = (
        F.lit(7200)
        + F.conv(
            F.substring(
                F.md5(F.concat(F.lit("len:"), F.col("window_id"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 14400
    )
    windows = w.select(
        "window_id",
        F.timestamp_seconds(F.unix_timestamp(base) + start_off).alias("ws"),
        F.timestamp_seconds(
            F.unix_timestamp(base) + start_off + len_off
        ).alias("we"),
    )
    # explode each window to its covered hour buckets (bounded <= 7)
    wb = windows.select(
        "window_id",
        "ws",
        "we",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("ws") / _RB_BUCKET_S).cast("long"),
                F.floor(
                    (F.unix_timestamp("we") - 1) / _RB_BUCKET_S
                ).cast("long"),
            )
        ).alias("bucket"),
    )
    eb = ev.select(
        "event_id",
        "ts",
        "value",
        F.floor(F.unix_timestamp("ts") / _RB_BUCKET_S).cast("long").alias(
            "bucket"
        ),
    )
    joined = wb.join(eb, "bucket").where(
        (F.col("ts") >= F.col("ws")) & (F.col("ts") < F.col("we"))
    )
    matched = joined.groupBy("window_id", "ws").agg(
        F.count("event_id").alias("n_events"),
        F.sum("value").alias("sv"),
    )
    # LEFT semantics: windows with no events still appear
    return (
        windows.join(
            matched.select(
                F.col("window_id").alias("mw"),
                "n_events",
                "sv",
            ),
            F.col("window_id") == F.col("mw"),
            "left",
        )
        .select(
            "window_id",
            F.col("ws").alias("window_start"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias(
                "n_events"
            ),
            F.round(F.coalesce(F.col("sv"), F.lit(0.0)), 2).alias(
                "total_value"
            ),
        )
    )
