"""Analytics extras, batch 75: time-domain cycle length and the
Pythagorean means.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* peak cycle length — mean spacing between local maxima of the
  daily series: the time-domain cycle estimate that should agree
  with `timeseries_periodogram`'s frequency-domain winner.
* Pythagorean means — arithmetic/geometric/harmonic means of unit
  price per priority class with AM >= GM >= HM certified: harmonic
  for rate-like averages, geometric for growth-like — using the
  wrong one is a classic silent analytics bug, and this query makes
  the three (and their mandatory ordering) visible side by side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "window_peak_cycle_length",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    marked AS (
      SELECT d, y,
             LAG(y) OVER (ORDER BY d) AS pl,
             LEAD(y) OVER (ORDER BY d) AS nl,
             ROW_NUMBER() OVER (ORDER BY d) AS t
      FROM daily
    ),
    peaks AS (
      SELECT t FROM marked
      WHERE pl IS NOT NULL AND nl IS NOT NULL AND y > pl AND y > nl
    ),
    gaps AS (
      SELECT t - LAG(t) OVER (ORDER BY t) AS gap FROM peaks
    )
    SELECT CAST((SELECT COUNT(*) FROM peaks) AS BIGINT) AS n_peaks,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           ROUND(AVG(gap), 4) AS mean_cycle_days,
           CAST(MIN(gap) AS BIGINT) AS min_gap,
           CAST(MAX(gap) AS BIGINT) AS max_gap
    FROM gaps
    """,
)
def window_peak_cycle_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-domain cycle estimation: strict local maxima of the
    daily series (y above both neighbors) and the mean spacing
    between consecutive peaks — the estimate that should agree with
    `timeseries_periodogram`'s frequency-domain winner when a real
    cycle exists, and scatters when the series is noise (the
    cross-check between the two domains IS the diagnostic). Strict
    inequalities make peaks deterministic under ties.

    Shape: one reduce to O(days), two window passes on the reduced
    series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    w = Window.orderBy("d")
    marked = daily.select(
        "y",
        F.lag("y").over(w).alias("pl"),
        F.lead("y").over(w).alias("nl"),
        F.row_number().over(w).alias("t"),
    )
    peaks = marked.where(
        F.col("pl").isNotNull()
        & F.col("nl").isNotNull()
        & (F.col("y") > F.col("pl"))
        & (F.col("y") > F.col("nl"))
    ).select("t")
    gaps = peaks.select(
        (F.col("t") - F.lag("t").over(Window.orderBy("t"))).alias("gap")
    )
    n_peaks = peaks.agg(F.count(F.lit(1)).alias("np"))
    return gaps.agg(
        F.count("gap").alias("n_gaps"),
        F.round(F.avg("gap"), 4).alias("mean_cycle_days"),
        F.min("gap").cast("long").alias("min_gap"),
        F.max("gap").cast("long").alias("max_gap"),
    ).crossJoin(F.broadcast(n_peaks)).select(
        F.col("np").cast("long").alias("n_peaks"),
        F.col("n_gaps").cast("long").alias("n_gaps"),
        "mean_cycle_days",
        "min_gap",
        "max_gap",
    )


@register(
    "agg_pythagorean_means",
    oracle="""
    WITH prices AS (
      SELECT o_orderpriority AS priority, o_totalprice AS x
      FROM orders WHERE o_totalprice > 0
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(x), 4) AS arithmetic_mean,
           ROUND(EXP(AVG(LN(x))), 4) AS geometric_mean,
           ROUND(COUNT(*) / SUM(1.0 / x), 4) AS harmonic_mean,
           AVG(x) >= EXP(AVG(LN(x)))
             AND EXP(AVG(LN(x))) >= COUNT(*) / SUM(1.0 / x)
             AS am_gm_hm_holds
    FROM prices GROUP BY priority
    """,
)
def agg_pythagorean_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three Pythagorean means of order value per priority
    class, side by side with the AM >= GM >= HM inequality
    certified: the arithmetic mean answers 'total / count', the
    geometric mean is the right average for growth factors (it IS
    exp of the log-domain mean, cf. `agg_product_log_domain`), and
    the harmonic mean is the right average for rates (mean price per
    unit across equal-spend buckets) — averaging rates
    arithmetically is the classic silent analytics bug this row
    makes visible. All three are single-pass mergeable aggregates
    (sum, sum-of-logs, sum-of-reciprocals).

    Shape: one conditional scan, O(groups) output."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    am = F.avg("o_totalprice")
    gm = F.exp(F.avg(F.log("o_totalprice")))
    hm = F.count(F.lit(1)) / F.sum(1.0 / F.col("o_totalprice"))
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(am, 4).alias("arithmetic_mean"),
        F.round(gm, 4).alias("geometric_mean"),
        F.round(hm, 4).alias("harmonic_mean"),
        ((am >= gm) & (gm >= hm)).alias("am_gm_hm_holds"),
    )
