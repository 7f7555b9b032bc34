"""Analytics extras, batch 60: SCD2 change application, the
Mann-Kendall trend test, and bot-regularity screening.

The SCD2 apply is the closest of these to the reference's world:
`HiveToMysql.java` re-imports whole dimension partitions because it
has no notion of history (`270-282` deletes and reloads); an SCD2
dimension with incremental change application is what that pipeline
grows into. The rest extend SURVEY.md §2.2:

* Mann-Kendall — the nonparametric monotone-trend test (pairwise
  sign statistic with tie correction) next to `stats_theil_sen`'s
  slope and `stats_runs_test`'s randomness check.
* bot screen — inter-event gap regularity per user (a near-zero
  coefficient of variation is a metronome, not a human), the
  abuse-detection primitive over the events stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_SCD2_EFF = "2024-01-01"


@register(
    "incremental_scd2_apply",
    oracle=f"""
    WITH affected AS (
      SELECT c_custkey, c_mktsegment
      FROM customer
      WHERE c_custkey % 11 = 0 AND c_custkey < 300
    ),
    closed AS (
      SELECT c_custkey,
             c_mktsegment AS segment,
             TIMESTAMP '1990-01-01' AS valid_from,
             TIMESTAMP '{_SCD2_EFF}' AS valid_to,
             FALSE AS is_current
      FROM affected
    ),
    opened AS (
      SELECT c_custkey,
             'MIGRATED' AS segment,
             TIMESTAMP '{_SCD2_EFF}' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to,
             TRUE AS is_current
      FROM affected
    )
    SELECT * FROM closed UNION ALL SELECT * FROM opened
    """,
)
def incremental_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC change batch to a Type-2 dimension: for each
    changed entity, CLOSE the current row (valid_to = effective
    date, is_current = false) and OPEN a new version — expressed as
    a union of the adjusted old rows and the new rows, the
    merge-free formulation that writes as one dynamic-partition
    overwrite of the affected keys. The change batch here is the
    deterministic 'every 11th customer migrates segment' so the
    oracle can replay it; a real feed plugs into the same shape (cf.
    `incremental_cdc_apply` for the last-writer-wins fact variant,
    `scd2_order_priority` for deriving intervals from history).
    The reference's answer to dimension change was delete-and-reload
    of the whole partition (HiveToMysql.java:270-282); this is the
    incremental answer with history preserved.

    Shape: the change batch joins the dimension on its key (both
    sides bucket on it at scale); everything else is projection."""
    c = load_table(spark, sf_dir, "customer")
    affected = c.where(
        (F.col("c_custkey") % 11 == 0) & (F.col("c_custkey") < 300)
    ).select("c_custkey", "c_mktsegment")
    eff = F.lit(_SCD2_EFF).cast("timestamp")
    closed = affected.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01").cast("timestamp").alias("valid_from"),
        eff.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = affected.select(
        "c_custkey",
        F.lit("MIGRATED").alias("segment"),
        eff.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionByName(opened)


@register(
    "stats_mann_kendall",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN b.y > a.y THEN 1
                  WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn
      FROM monthly a JOIN monthly b ON b.m > a.m
    ),
    s AS (SELECT SUM(sgn) AS s_stat FROM pairs),
    n_ AS (SELECT COUNT(*) AS n FROM monthly),
    ties AS (
      SELECT COALESCE(SUM(t * (t - 1.0) * (2 * t + 5.0)), 0.0) AS tcorr
      FROM (SELECT COUNT(*) AS t FROM monthly GROUP BY y HAVING COUNT(*) > 1)
    )
    SELECT CAST(n_.n AS BIGINT) AS n_months,
           CAST(s.s_stat AS BIGINT) AS s_statistic,
           ROUND((n_.n * (n_.n - 1.0) * (2 * n_.n + 5.0) - ties.tcorr)
                 / 18.0, 4) AS var_s,
           ROUND((s.s_stat - CASE WHEN s.s_stat > 0 THEN 1
                                  WHEN s.s_stat < 0 THEN -1 ELSE 0 END)
                 / SQRT((n_.n * (n_.n - 1.0) * (2 * n_.n + 5.0)
                         - ties.tcorr) / 18.0), 4) AS z
    FROM s CROSS JOIN n_ CROSS JOIN ties
    """,
)
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on the monthly order series:
    S = sum of pairwise sign(y_j - y_i) for i<j, variance with the
    standard tie correction, continuity-corrected z — the
    nonparametric companion of `stats_theil_sen` (which estimates
    the slope MK tests) and the trend complement of
    `stats_runs_test`. Distribution-free: no normality or linearity
    assumed, which is why hydrology/ops monitoring defaults to it.

    Shape: the fact reduces to O(months) FIRST; the pairwise
    self-join is months^2 (~6k pairs), never data-sized — the same
    reduced-table discipline as Theil-Sen."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.count(F.lit(1)).cast("double").alias("y")).localCheckpoint(
        eager=False
    )  # pinned: the pair join, n, and tie scan all reuse it
    b = monthly.select(F.col("m").alias("m2"), F.col("y").alias("y2"))
    pairs = monthly.join(b, F.col("m2") > F.col("m")).select(
        F.when(F.col("y2") > F.col("y"), 1)
        .when(F.col("y2") < F.col("y"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    s = pairs.agg(F.sum("sgn").alias("s_stat"))
    n_ = monthly.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        monthly.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1.0) * (2 * F.col("t") + 5.0)
                ),
                F.lit(0.0),
            ).alias("tcorr")
        )
    )
    j = s.crossJoin(F.broadcast(n_)).crossJoin(F.broadcast(ties))
    var_s = (
        F.col("n") * (F.col("n") - 1.0) * (2 * F.col("n") + 5.0)
        - F.col("tcorr")
    ) / 18.0
    cc = (
        F.when(F.col("s_stat") > 0, 1)
        .when(F.col("s_stat") < 0, -1)
        .otherwise(0)
    )
    return j.select(
        F.col("n").cast("long").alias("n_months"),
        F.col("s_stat").cast("long").alias("s_statistic"),
        F.round(var_s, 4).alias("var_s"),
        F.round((F.col("s_stat") - cc) / F.sqrt(var_s), 4).alias("z"),
    )


@register(
    "dq_bot_regularity_screen",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             date_diff('second',
                       LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id), ts) AS gap
      FROM events
    ),
    per_user AS (
      SELECT user_id,
             COUNT(gap) AS n_gaps,
             AVG(gap) AS mean_gap,
             STDDEV_SAMP(gap) AS sd_gap,
             MIN(gap) AS min_gap
      FROM gaps WHERE gap IS NOT NULL
      GROUP BY user_id HAVING COUNT(gap) >= 10
    ),
    scored AS (
      SELECT user_id, n_gaps,
             ROUND(mean_gap, 2) AS mean_gap_s,
             ROUND(sd_gap / mean_gap, 4) AS gap_cv,
             CAST(min_gap AS BIGINT) AS min_gap_s,
             ROW_NUMBER() OVER (ORDER BY sd_gap / mean_gap, user_id)
               AS regularity_rank
      FROM per_user
    )
    SELECT CAST(regularity_rank AS INT) AS regularity_rank,
           user_id,
           CAST(n_gaps AS BIGINT) AS n_gaps,
           mean_gap_s, gap_cv, min_gap_s,
           gap_cv < 0.1 AS metronomic_flag
    FROM scored WHERE regularity_rank <= 10
    """,
)
def dq_bot_regularity_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation screen from inter-event timing: per user, the
    coefficient of variation of gaps between consecutive events — a
    human's CV is near 1 (bursty, Poisson-ish); a cron job's is near
    0 (metronomic). Reports the 10 most regular users with the
    CV < 0.1 flag and their minimum gap (rate-limit evidence). The
    abuse-detection primitive that runs before any engagement
    metric is trusted; on organic fixtures the flags correctly stay
    false while the ranking still surfaces the most regular actors.

    Shape: one per-user lag window over the partitioned stream, one
    O(users) reduce, a top-10 rank."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap"),
    ).where(F.col("gap").isNotNull())
    per_user = gaps.groupBy("user_id").agg(
        F.count("gap").alias("n_gaps"),
        F.avg("gap").alias("mean_gap"),
        F.stddev_samp("gap").alias("sd_gap"),
        F.min("gap").alias("min_gap"),
    ).where(F.col("n_gaps") >= 10)
    scored = per_user.select(
        "user_id",
        "n_gaps",
        F.round("mean_gap", 2).alias("mean_gap_s"),
        F.round(F.col("sd_gap") / F.col("mean_gap"), 4).alias("gap_cv"),
        F.col("min_gap").cast("long").alias("min_gap_s"),
        F.row_number()
        .over(
            Window.orderBy(F.col("sd_gap") / F.col("mean_gap"), "user_id")
        )
        .alias("regularity_rank"),
    )
    return scored.where(F.col("regularity_rank") <= 10).select(
        F.col("regularity_rank").cast("int").alias("regularity_rank"),
        "user_id",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        "mean_gap_s",
        "gap_cv",
        "min_gap_s",
        (F.col("gap_cv") < 0.1).alias("metronomic_flag"),
    )
