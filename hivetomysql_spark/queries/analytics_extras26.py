"""Analytics extras, batch 26: peak concurrency via sweep line.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); the round's final SURVEY.md §2.2 entry:

* peak concurrency — maximum simultaneous 30-minute-gap sessions by
  the classic sweep-line (+1 at session start, -1 after session end,
  running sum) — the capacity-planning number behind connection
  pools and autoscaling floors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "events_peak_concurrency",
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
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM seq
    ),
    bounds AS (
      SELECT user_id, session_id,
             MIN(ts) AS s, MAX(ts) AS e
      FROM sess GROUP BY user_id, session_id
    ),
    deltas AS (
      SELECT s AS t, 1 AS delta FROM bounds
      UNION ALL
      SELECT e + INTERVAL 1 MICROSECOND AS t, -1 AS delta FROM bounds
    ),
    sweep AS (
      SELECT t,
             SUM(delta) OVER (ORDER BY t, delta
                              ROWS UNBOUNDED PRECEDING) AS concurrent
      FROM deltas
    )
    SELECT CAST((SELECT COUNT(*) FROM bounds) AS BIGINT) AS n_sessions,
           CAST(MAX(concurrent) AS BIGINT) AS peak_concurrency,
           MIN(CASE WHEN concurrent = (SELECT MAX(concurrent) FROM sweep)
                    THEN t END) AS peak_at
    FROM sweep
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous sessions by sweep line: every 30-minute-gap
    session (same sessionizer as the streaming tier) contributes +1
    at its start and -1 just after its end; the running sum over the
    merged, time-ordered delta stream is the concurrency curve, and
    its maximum (with first time it is reached) is the capacity
    number connection pools and autoscaling floors are sized to.
    Tie handling: ends are shifted one microsecond past the last
    event so a session ending exactly when another starts still
    counts as overlapping; at any remaining equal instant the
    ascending delta tie-break applies ends (-1) before starts —
    identical on both engines, which is all a differential gate
    needs.

    Shape: sessionize (user-keyed windows), reduce to O(sessions)
    intervals, explode to 2 deltas each, one global ordered running
    sum over the O(sessions) delta stream — the sweep is tiny relative
    to the event scan; at 100 TB the global sweep becomes
    range-partitioned prefix sums with broadcast offsets."""
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
    bounds = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    deltas = bounds.select(F.col("s").alias("t"), F.lit(1).alias("delta")).union(
        bounds.select(
            (F.timestamp_micros(F.unix_micros("e") + 1)).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    sweep = deltas.select(
        "t",
        F.sum("delta")
        .over(
            Window.orderBy("t", "delta").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("concurrent"),
    )
    n_sessions = bounds.count()
    peak = sweep.agg(F.max("concurrent").alias("p")).collect()[0]["p"]
    return sweep.where(F.col("concurrent") == peak).agg(
        F.lit(n_sessions).cast("long").alias("n_sessions"),
        F.lit(peak).cast("long").alias("peak_concurrency"),
        F.min("t").alias("peak_at"),
    )
