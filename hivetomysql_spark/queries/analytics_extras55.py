"""Analytics extras, batch 55: interrupted time-series analysis and
economic order quantity. (The third member of this batch is the LEFT
OUTER stream-stream join registered in queries/streaming_batch.py as
`stream_join_left_batch`, with its watermark-governed equivalence
test in tests/test_streaming.py.)

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* interrupted time series — pre-period OLS trend projected as the
  post-period counterfactual: level shift, slope change, cumulative
  excess (the quasi-experimental design when there is no control
  group, sibling of `event_diff_in_diff` which needs one).
* EOQ — sqrt(2DS/H) economic order quantity per part, completing
  the inventory family (reorder point, ABC/XYZ, Croston,
  newsvendor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_ITS_T0 = "1997-01-01"


@register(
    "events_interrupted_time_series",
    oracle=f"""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE))
                  AS TIMESTAMP) AS m,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1999-01-01'
      GROUP BY 1
    ),
    idx AS (
      SELECT m, y,
             CAST(date_diff('month', TIMESTAMP '1995-01-01', m) AS DOUBLE)
               AS t,
             m >= TIMESTAMP '{_ITS_T0}' AS post
      FROM monthly
    ),
    pre AS (
      SELECT COUNT(*) AS n, AVG(t) AS mt, AVG(y) AS my,
             (SUM(t * y) - COUNT(*) * AVG(t) * AVG(y))
             / (SUM(t * t) - COUNT(*) * AVG(t) * AVG(t)) AS slope
      FROM idx WHERE NOT post
    ),
    prefit AS (
      SELECT slope, my - slope * mt AS intercept FROM pre
    ),
    post_pts AS (
      SELECT i.t, i.y, p.intercept + p.slope * i.t AS yhat
      FROM idx i CROSS JOIN prefit p WHERE i.post
    ),
    post_ols AS (
      SELECT COUNT(*) AS n, AVG(t) AS mt, AVG(y) AS my,
             (SUM(t * y) - COUNT(*) * AVG(t) * AVG(y))
             / (SUM(t * t) - COUNT(*) * AVG(t) * AVG(t)) AS slope
      FROM idx WHERE post
    )
    SELECT CAST((SELECT n FROM pre) AS BIGINT) AS n_pre_months,
           CAST((SELECT n FROM post_ols) AS BIGINT) AS n_post_months,
           ROUND((SELECT slope FROM prefit), 4) AS pre_slope,
           ROUND((SELECT slope FROM post_ols), 4) AS post_slope,
           ROUND((SELECT slope FROM post_ols) - (SELECT slope FROM prefit), 4)
             AS slope_change,
           ROUND(AVG(y - yhat), 4) AS mean_level_shift,
           ROUND(SUM(y - yhat), 4) AS cumulative_excess
    FROM post_pts
    """,
)
def events_interrupted_time_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time-series analysis of the monthly order volume
    around an intervention at 1997-01-01: fit OLS on the PRE period
    only (closed-form slope/intercept from sufficient statistics),
    project it over the post period as the counterfactual, and report
    the mean level shift, the post-vs-pre slope change, and the
    cumulative excess — the quasi-experimental readout when no
    control group exists (`event_diff_in_diff` is the design when one
    does). On these fixtures the series is stable, so the shifts
    correctly read as noise — the A/A property every causal method
    should pass.

    Shape: the fact reduces to O(months) once; both OLS fits are
    single aggregates over the reduced series; the counterfactual is
    a broadcast of two scalars."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    monthly = o.groupBy(
        F.date_trunc("month", F.to_date("o_orderdate")).alias("m")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    idx = monthly.select(
        "m",
        "y",
        F.months_between(
            F.col("m"), F.lit("1995-01-01").cast("timestamp")
        ).cast("double").alias("t"),
        (F.col("m") >= F.lit(_ITS_T0).cast("timestamp")).alias("post"),
    ).localCheckpoint(eager=False)  # pre/post OLS + counterfactual reuse

    def ols(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("t").alias("mt"),
            F.avg("y").alias("my"),
            (
                (
                    F.sum(F.col("t") * F.col("y"))
                    - F.count(F.lit(1)) * F.avg("t") * F.avg("y")
                )
                / (
                    F.sum(F.col("t") * F.col("t"))
                    - F.count(F.lit(1)) * F.avg("t") * F.avg("t")
                )
            ).alias("slope"),
        )

    pre = ols(idx.where(~F.col("post")))
    prefit = pre.select(
        "n",
        "slope",
        (F.col("my") - F.col("slope") * F.col("mt")).alias("intercept"),
    )
    post_ols = ols(idx.where(F.col("post"))).select(
        F.col("n").alias("pn"), F.col("slope").alias("post_slope")
    )
    post_pts = idx.where(F.col("post")).crossJoin(F.broadcast(prefit))
    resid = F.col("y") - (F.col("intercept") + F.col("slope") * F.col("t"))
    return (
        post_pts.agg(
            F.first("n").alias("n_pre"),
            F.first("slope").alias("pre_slope"),
            F.count(F.lit(1)).alias("n_post"),
            F.avg(resid).alias("mls"),
            F.sum(resid).alias("cex"),
        )
        .crossJoin(F.broadcast(post_ols))
        .select(
            F.col("n_pre").cast("long").alias("n_pre_months"),
            F.col("pn").cast("long").alias("n_post_months"),
            F.round("pre_slope", 4).alias("pre_slope"),
            F.round("post_slope", 4).alias("post_slope"),
            F.round(F.col("post_slope") - F.col("pre_slope"), 4).alias(
                "slope_change"
            ),
            F.round("mls", 4).alias("mean_level_shift"),
            F.round("cex", 4).alias("cumulative_excess"),
        )
    )


_EOQ_ORDER_COST = 100.0
_EOQ_HOLD_RATE = 0.2


@register(
    "supply_eoq_quantity",
    oracle=f"""
    WITH demand AS (
      SELECT l.l_partkey AS partkey,
             SUM(l.l_quantity) AS total_qty,
             COUNT(DISTINCT EXTRACT(year FROM l.l_shipdate)) AS n_years,
             AVG(l.l_extendedprice / l.l_quantity) AS unit_price
      FROM lineitem l
      GROUP BY 1
    ),
    calc AS (
      SELECT partkey,
             total_qty / n_years AS annual_d,
             unit_price * {_EOQ_HOLD_RATE} AS h,
             SQRT(2.0 * (total_qty / n_years) * {_EOQ_ORDER_COST}
                  / (unit_price * {_EOQ_HOLD_RATE})) AS eoq
      FROM demand
    ),
    ranked AS (
      SELECT partkey, annual_d, h, eoq,
             ROW_NUMBER() OVER (ORDER BY annual_d DESC, partkey) AS rnk
      FROM calc
    )
    SELECT CAST(rnk AS INT) AS rank,
           CAST(partkey AS BIGINT) AS partkey,
           ROUND(annual_d, 4) AS annual_demand,
           ROUND(h, 4) AS holding_cost,
           ROUND(eoq, 4) AS eoq,
           ROUND(annual_d / eoq, 4) AS orders_per_year
    FROM ranked WHERE rnk <= 15
    """,
)
def supply_eoq_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity per part: EOQ = sqrt(2DS/H) with
    annualized demand D, fixed order cost S=100, holding cost H = 20%
    of unit price — the Wilson lot-size formula that balances
    ordering against carrying cost, reported for the 15
    highest-demand parts with the implied orders/year cadence.
    Completes the inventory-planning family (reorder point, ABC/XYZ,
    Croston, newsvendor).

    Shape: one fact reduce to part grain, scalar math, one top-k
    rank (TakeOrdered shape after the reduce)."""
    li = load_table(spark, sf_dir, "lineitem")
    demand = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum("l_quantity").alias("total_qty"),
        F.countDistinct(F.year("l_shipdate")).alias("n_years"),
        F.avg(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_price"
        ),
    )
    annual_d = F.col("total_qty") / F.col("n_years")
    h = F.col("unit_price") * _EOQ_HOLD_RATE
    eoq = F.sqrt(2.0 * annual_d * _EOQ_ORDER_COST / h)
    from pyspark.sql.window import Window

    ranked = demand.select(
        "partkey",
        annual_d.alias("annual_d"),
        h.alias("h"),
        eoq.alias("eoq"),
        F.row_number()
        .over(Window.orderBy(F.desc(annual_d), "partkey"))
        .alias("rnk"),
    )
    return ranked.where(F.col("rnk") <= 15).select(
        F.col("rnk").cast("int").alias("rank"),
        F.col("partkey").cast("long").alias("partkey"),
        F.round("annual_d", 4).alias("annual_demand"),
        F.round("h", 4).alias("holding_cost"),
        F.round("eoq", 4).alias("eoq"),
        F.round(F.col("annual_d") / F.col("eoq"), 4).alias(
            "orders_per_year"
        ),
    )
