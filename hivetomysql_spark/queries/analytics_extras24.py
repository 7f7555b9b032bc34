"""Analytics extras, batch 24: realized volatility and activation
rate.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's finance / product-analytics
tiers:

* realized volatility — rolling 10-day standard deviation of daily
  log revenue returns (annualized), the risk gauge behind
  vol-scaled alerting and position sizing;
* activation rate — share of users reaching >= 3 events in their
  first week, the onboarding funnel's headline number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "finance_realized_volatility",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    rets AS (
      SELECT d,
             ln(rev / LAG(rev) OVER (ORDER BY d)) AS r
      FROM daily
    ),
    vol AS (
      SELECT d, r,
             STDDEV_SAMP(r) OVER (ORDER BY d ROWS BETWEEN 9 PRECEDING
                                  AND CURRENT ROW) AS sd,
             COUNT(r) OVER (ORDER BY d ROWS BETWEEN 9 PRECEDING
                            AND CURRENT ROW) AS wn
      FROM rets WHERE r IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(sd) * sqrt(365.0), 4) AS avg_annualized_vol,
           ROUND(MAX(sd) * sqrt(365.0), 4) AS max_annualized_vol,
           ROUND(MAX(abs(r)), 4) AS max_abs_daily_return
    FROM vol WHERE wn = 10
    """,
)
def finance_realized_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized volatility of daily revenue: log returns
    ln(rev_t/rev_{t-1}), their rolling 10-day sample standard
    deviation annualized by sqrt(365), summarized as average and peak
    vol plus the largest single-day move — the risk lens (is revenue
    merely growing, or growing and destabilizing?) that pairs with
    the Bollinger monitor's level-based read.

    Shape: N orders compress to O(days); returns are one lag window
    and the vol one rolling window over the compressed series."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    wl = Window.orderBy("d")
    rets = daily.select(
        "d", F.log(F.col("rev") / F.lag("rev").over(wl)).alias("r")
    ).where(F.col("r").isNotNull())
    wv = Window.orderBy("d").rowsBetween(-9, 0)
    vol = rets.select(
        "r",
        F.stddev_samp("r").over(wv).alias("sd"),
        F.count("r").over(wv).alias("wn"),
    ).where(F.col("wn") == 10)
    ann = 365.0 ** 0.5
    return vol.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.avg("sd") * ann, 4).alias("avg_annualized_vol"),
        F.round(F.max("sd") * ann, 4).alias("max_annualized_vol"),
        F.round(F.max(F.abs("r")), 4).alias("max_abs_daily_return"),
    )


_ACT_MIN_EVENTS = 3


@register(
    "event_activation_rate",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
    ),
    week1 AS (
      SELECT e.user_id, COUNT(*) AS n_w1
      FROM events e JOIN firsts f ON f.user_id = e.user_id
      WHERE e.ts < f.first_ts + INTERVAL 7 DAY
      GROUP BY e.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN n_w1 >= {_ACT_MIN_EVENTS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_activated,
           ROUND(SUM(CASE WHEN n_w1 >= {_ACT_MIN_EVENTS} THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 4) AS activation_rate,
           ROUND(AVG(n_w1), 2) AS avg_week1_events
    FROM week1
    """,
)
def event_activation_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-1 activation: the share of users who reach >= 3 events
    within 7 days of their first event — the onboarding-funnel
    headline (the 'aha moment' proxy metric) that growth teams pick
    before optimizing anything else.

    Shape: one groupBy for first timestamps, re-joined on user (the
    classic fact-to-firsts join, co-partitioned under bucketing), one
    filtered count, one O(users) rollup to a single row."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    week1 = (
        ev.join(firsts, "user_id")
        .where(F.col("ts") < F.col("first_ts") + F.expr("INTERVAL 7 DAYS"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_w1"))
    )
    act = F.sum(F.when(F.col("n_w1") >= _ACT_MIN_EVENTS, 1).otherwise(0))
    return week1.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        act.cast("long").alias("n_activated"),
        F.round(act / F.count(F.lit(1)), 4).alias("activation_rate"),
        F.round(F.avg("n_w1"), 2).alias("avg_week1_events"),
    )
