"""Analytics extras, batch 72: parameter-sensitivity sweeps for the
sessionizer and the entity-resolution matcher.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* session gap sweep — session counts/lengths at 15/30/60-minute
  inactivity gaps: the table that PICKS the sessionizer's gap
  parameter (same policy-pricing pattern as
  `text_dedup_threshold_sweep` for dedup).
* ER threshold calibration — candidate-pair volume and match-rate
  versus edit-distance threshold over the blocked pairs: the cost/
  recall curve that picks `er_blocked_fuzzy`'s cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_GAPS_MIN = [15, 30, 60]


def _gap_cte(minutes: int) -> str:
    gap = minutes * 60
    return f"""
    g{minutes} AS (
      SELECT '{minutes}min' AS gap_setting,
             COUNT(*) FILTER (WHERE new_s = 1) AS n_sessions,
             COUNT(*) AS n_events
      FROM (
        SELECT CASE WHEN prev IS NULL
                      OR date_diff('second', prev, ts) > {gap}
                    THEN 1 ELSE 0 END AS new_s
        FROM (
          SELECT ts, LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
          FROM events
        )
      )
    )"""


@register(
    "events_session_gap_sweep",
    oracle=f"""
    WITH {",".join(_gap_cte(m) for m in _GAPS_MIN)}
    SELECT gap_setting,
           CAST(n_sessions AS BIGINT) AS n_sessions,
           CAST(n_events AS BIGINT) AS n_events,
           ROUND(n_events * 1.0 / n_sessions, 4) AS events_per_session
    FROM (SELECT * FROM g15 UNION ALL SELECT * FROM g30
          UNION ALL SELECT * FROM g60)
    """,
)
def events_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionizer parameter sweep: total sessions and events-per-
    session at 15/30/60-minute inactivity gaps — the sensitivity
    table that justifies the gap every session-based metric in this
    registry assumes (bounce rate, peak concurrency, funnels). A
    metric that halves between adjacent gap settings is a metric
    about the PARAMETER, not the users; a stable one is safe to
    ship. Same policy-pricing pattern as the dedup threshold sweep.

    Shape: ONE per-user lag pass computes the inter-event gap; all
    three settings are conditional aggregates over the same pass
    (no re-scan per setting)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s")
    )
    aggs = gaps.agg(
        F.count(F.lit(1)).alias("n_events"),
        *[
            F.sum(
                (
                    F.col("gap_s").isNull() | (F.col("gap_s") > m * 60)
                ).cast("long")
            ).alias(f"s{m}")
            for m in _GAPS_MIN
        ],
    )
    out = None
    for m in _GAPS_MIN:
        row = aggs.select(
            F.lit(f"{m}min").alias("gap_setting"),
            F.col(f"s{m}").cast("long").alias("n_sessions"),
            F.col("n_events").cast("long").alias("n_events"),
            F.round(F.col("n_events") * 1.0 / F.col(f"s{m}"), 4).alias(
                "events_per_session"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out


_ER_THRESHOLDS = [1, 2, 3, 4, 5]


@register(
    "er_threshold_calibration",
    oracle=f"""
    WITH names AS (
      SELECT DISTINCT p_name,
             string_split(p_name, ' ')[-1] AS block
      FROM part
    ),
    pairs AS (
      SELECT levenshtein(a.p_name, b.p_name) AS dist
      FROM names a JOIN names b
        ON a.block = b.block AND a.p_name < b.p_name
    ),
    tot AS (
      SELECT COUNT(*) AS n_pairs,
             (SELECT COUNT(*) FROM names) AS n_names
      FROM pairs
    )
    SELECT t.t AS threshold,
           CAST(tot.n_names AS BIGINT) AS n_entities,
           CAST(tot.n_pairs AS BIGINT) AS n_blocked_pairs,
           CAST((SELECT COUNT(*) FROM pairs WHERE dist <= t.t) AS BIGINT)
             AS n_matches,
           ROUND((SELECT COUNT(*) FROM pairs WHERE dist <= t.t)
                 * 1.0 / tot.n_pairs, 6) AS match_rate
    FROM UNNEST([{", ".join(str(t) for t in _ER_THRESHOLDS)}]) AS t(t)
    CROSS JOIN tot
    """,
)
def er_threshold_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution threshold calibration: within-block
    candidate pairs matched at edit-distance cutoffs 1-5 — the
    cost/recall curve that picks `er_blocked_fuzzy`'s threshold
    before anyone commits to a merge policy (each +1 of distance
    multiplies the downstream clerical-review queue; the knee of
    this curve is the budget decision). Distances computed ONCE over
    the blocked pairs; the sweep is conditional aggregation.

    Shape: one blocked self-join (the `er_blocked_fuzzy` plan), one
    distance evaluation per pair, O(thresholds) conditional sums."""
    p = load_table(spark, sf_dir, "part")
    names = p.select(
        "p_name", F.element_at(F.split("p_name", " "), -1).alias("block")
    ).distinct().localCheckpoint(eager=False)
    b = names.select(
        F.col("p_name").alias("pb"), F.col("block").alias("blockb")
    )
    pairs = (
        names.join(
            b,
            (F.col("block") == F.col("blockb"))
            & (F.col("p_name") < F.col("pb")),
        )
        .select(F.levenshtein("p_name", "pb").alias("dist"))
    )
    n_names = names.agg(F.count(F.lit(1)).alias("nn"))
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        *[
            F.sum((F.col("dist") <= t).cast("long")).alias(f"m{t}")
            for t in _ER_THRESHOLDS
        ],
    ).crossJoin(F.broadcast(n_names))
    out = None
    for t in _ER_THRESHOLDS:
        row = agg.select(
            F.lit(t).alias("threshold"),
            F.col("nn").cast("long").alias("n_entities"),
            F.col("n_pairs").cast("long").alias("n_blocked_pairs"),
            F.col(f"m{t}").cast("long").alias("n_matches"),
            F.round(F.col(f"m{t}") * 1.0 / F.col("n_pairs"), 6).alias(
                "match_rate"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out
