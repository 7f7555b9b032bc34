"""Analytics extras, batch 69: SRM guardrail and timestamp sanity.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* SRM check — sample-ratio-mismatch chi-square per metric slice:
  the first guardrail every experimentation platform runs (a
  biased assignment invalidates every downstream test in this
  registry's A/B family before any effect is read).
* timestamp sanity — future timestamps, implausibly-old rows, and
  id-vs-time ordering inversions: the ingest-time clock audit that
  catches producer clock skew and replayed backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "ml_ab_srm_check",
    oracle="""
    WITH counts AS (
      SELECT event_type,
             SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n_b
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           ROUND(n_a * 1.0 / (n_a + n_b), 6) AS share_a,
           ROUND(POW(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
                 + POW(n_b - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0),
                 4) AS chi_square,
           POW(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
           + POW(n_b - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
             > 3.84 AS srm_flag
    FROM counts
    """,
)
def ml_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: chi-square of observed A/B
    assignment counts against the designed 50/50 split, per metric
    slice — the FIRST check an experimentation platform runs,
    because a biased assignment (broken hash, bot filter applied to
    one arm, logging loss) silently invalidates every Welch/TOST/
    Bayesian readout downstream of it in this registry. Flag at the
    1-df 5% critical value (3.84); on the fixtures' modulo split the
    flags correctly stay false.

    Shape: one conditional-aggregate scan to O(slices), scalar
    math."""
    ev = load_table(spark, sf_dir, "events")
    a = F.col("user_id") % 2 == 0
    counts = ev.groupBy("event_type").agg(
        F.sum(a.cast("long")).alias("n_a"),
        F.sum((~a).cast("long")).alias("n_b"),
    )
    n = F.col("n_a") + F.col("n_b")
    exp = n / 2.0
    chi = (
        F.pow(F.col("n_a") - exp, 2) / exp
        + F.pow(F.col("n_b") - exp, 2) / exp
    )
    return counts.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(F.col("n_a") * 1.0 / n, 6).alias("share_a"),
        F.round(chi, 4).alias("chi_square"),
        (chi > 3.84).alias("srm_flag"),
    )


@register(
    "dq_timestamp_sanity",
    oracle="""
    WITH ordered AS (
      SELECT event_id, ts,
             LAG(event_id) OVER (ORDER BY ts, event_id) AS prev_id
      FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN ts > TIMESTAMP '2025-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_future,
           CAST(SUM(CASE WHEN ts < TIMESTAMP '2020-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_implausibly_old,
           CAST(SUM(CASE WHEN prev_id IS NOT NULL AND prev_id > event_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_id_time_inversions
    FROM ordered
    """,
)
def dq_timestamp_sanity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest clock audit: events stamped in the future (producer
    clock skew), implausibly old (epoch-zero defaults, replayed
    backfills), and id-vs-time ordering inversions (monotone ids
    arriving out of time order — the signal that an 'append-only'
    feed was actually re-emitted). Counts only; on healthy fixtures
    future/old read zero while inversions honestly report the
    feed's real id/time agreement. The check a streaming watermark
    DEPENDS on: skewed producer clocks silently turn watermark lag
    into data loss (cf. `stream_late_data_accounting`).

    Shape: one ordered lag pass over the reduced projection, one
    rollup."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy("ts", "event_id")
    ordered = ev.select(
        "event_id", "ts", F.lag("event_id").over(w).alias("prev_id")
    )
    return ordered.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            (F.col("ts") > F.lit("2025-01-01").cast("timestamp")).cast("long")
        )
        .cast("long")
        .alias("n_future"),
        F.sum(
            (F.col("ts") < F.lit("2020-01-01").cast("timestamp")).cast("long")
        )
        .cast("long")
        .alias("n_implausibly_old"),
        F.sum(
            (
                F.col("prev_id").isNotNull()
                & (F.col("prev_id") > F.col("event_id"))
            ).cast("long")
        )
        .cast("long")
        .alias("n_id_time_inversions"),
    )
