"""Analytics extras, batch 18: engagement stickiness and bounce rate.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); rounds out SURVEY.md §2.2's product-analytics tier:

* stickiness — avg(DAU)/WAU per week, the engagement-frequency
  ratio every consumer product tracks;
* bounce rate — share of 30-minute-gap sessions containing exactly
  one event, on the same sessionization the streaming tier uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "event_stickiness_dau_mau",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(FLOOR(date_diff('day', DATE '1970-01-01',
                                  CAST(ts AS DATE)) / 7.0) AS BIGINT) AS wk
      FROM events
    ),
    dau AS (
      SELECT wk, day, COUNT(*) AS dau FROM d GROUP BY wk, day
    ),
    wau AS (
      SELECT wk, COUNT(DISTINCT user_id) AS wau FROM d GROUP BY wk
    )
    SELECT CAST(a.wk AS BIGINT) AS week_no,
           CAST(w.wau AS BIGINT) AS wau,
           ROUND(AVG(a.dau), 2) AS avg_dau,
           ROUND(AVG(a.dau) / w.wau, 4) AS stickiness
    FROM dau a JOIN wau w ON w.wk = a.wk
    GROUP BY a.wk, w.wau
    """,
)
def event_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement stickiness per week: avg(DAU)/WAU — 1.0 means every
    weekly user shows up every day, ~0.14 means once a week. The
    frequency ratio (classically DAU/MAU) that separates habitual
    products from occasional ones, over the same weekly grain as
    event_user_lifecycle.

    Shape: distinct (user, day) in one pass, then two tiny
    aggregates; everything after the first distinct is O(users x
    days)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) / 7.0
        )
        .cast("long")
        .alias("wk"),
    ).distinct()
    dau = d.groupBy("wk", "day").agg(F.count(F.lit(1)).alias("dau"))
    wau = d.groupBy("wk").agg(F.countDistinct("user_id").alias("wau"))
    j = dau.join(wau, "wk")
    return j.groupBy("wk", "wau").agg(
        F.round(F.avg("dau"), 2).alias("avg_dau"),
        F.round(F.avg("dau") / F.first("wau"), 4).alias("stickiness"),
    ).select(
        F.col("wk").cast("long").alias("week_no"),
        F.col("wau").cast("long").alias("wau"),
        "avg_dau",
        "stickiness",
    )


@register(
    "event_bounce_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 OR LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    sess AS (
      SELECT user_id,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM seq
    ),
    per AS (
      SELECT user_id, session_id, COUNT(*) AS n FROM sess GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           ROUND(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
             AS bounce_rate,
           ROUND(AVG(n), 2) AS avg_session_events
    FROM per
    """,
)
def event_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate over 30-minute-gap sessions: the share of sessions
    containing exactly one event — the engagement-quality headline
    that pairs with session counts (stream_gap_sessions_batch uses
    the identical sessionization, so streaming and batch report the
    same denominator).

    Shape: the standard lag/cumsum sessionizer (user-keyed windows,
    well-spread shuffle) followed by an O(sessions) rollup to a
    single row."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
                > 1800 * 1_000_000
            )
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = seq.withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per = sess.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n"))
    bounce = F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        bounce.cast("long").alias("n_bounces"),
        F.round(bounce / F.count(F.lit(1)), 4).alias("bounce_rate"),
        F.round(F.avg("n"), 2).alias("avg_session_events"),
    )
