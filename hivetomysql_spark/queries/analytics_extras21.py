"""Analytics extras, batch 21: Bollinger-band breakout detection —
the 300th registry operator.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); a final time-series entry for SURVEY.md §2.2:

* Bollinger bands — rolling mean ± 2 sigma envelope over daily
  revenue with breakout-day flags, the mean-reversion monitor that
  complements the CUSUM changepoint and z-score spike detectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "timeseries_bollinger_breakouts",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    bands AS (
      SELECT d, rev,
             AVG(rev) OVER w AS mid,
             STDDEV_SAMP(rev) OVER w AS sd,
             COUNT(*) OVER w AS wn
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    flagged AS (
      SELECT d, rev, mid, sd,
             CASE WHEN rev > mid + 2 * sd THEN 1
                  WHEN rev < mid - 2 * sd THEN -1
                  ELSE 0 END AS breakout
      FROM bands WHERE wn = 20
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN breakout = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_upper_breakouts,
           CAST(SUM(CASE WHEN breakout = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lower_breakouts,
           ROUND(AVG(CASE WHEN breakout <> 0 THEN abs(rev - mid) / sd END), 3)
             AS avg_breakout_sigma,
           ROUND(AVG(2 * 2 * sd / mid), 4) AS avg_bandwidth
    FROM flagged
    """,
)
def timeseries_bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band monitoring of daily revenue: a 20-day rolling
    mean ± 2-sigma envelope, counting upper/lower breakout days,
    their average severity in sigmas, and the average relative band
    width (the volatility gauge). Completes the anomaly family:
    z-score spikes (dq_anomaly_volume_spike) catch level jumps,
    CUSUM catches slow drifts, Bollinger catches volatility-scaled
    excursions in trending series.

    Shape: N orders compress to O(days) first; the rolling window
    and everything after run on the compressed series — same
    sketch-then-finalize split as every series operator here."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(-19, 0)
    bands = daily.select(
        "d",
        "rev",
        F.avg("rev").over(w).alias("mid"),
        F.stddev_samp("rev").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("wn"),
    ).where(F.col("wn") == 20)
    breakout = (
        F.when(F.col("rev") > F.col("mid") + 2 * F.col("sd"), 1)
        .when(F.col("rev") < F.col("mid") - 2 * F.col("sd"), -1)
        .otherwise(0)
    )
    flagged = bands.select("rev", "mid", "sd", breakout.alias("breakout"))
    sigma = F.abs(F.col("rev") - F.col("mid")) / F.col("sd")
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.when(F.col("breakout") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_upper_breakouts"),
        F.sum(F.when(F.col("breakout") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_lower_breakouts"),
        F.round(
            F.avg(F.when(F.col("breakout") != 0, sigma)), 3
        ).alias("avg_breakout_sigma"),
        F.round(F.avg(4 * F.col("sd") / F.col("mid")), 4).alias("avg_bandwidth"),
    )
