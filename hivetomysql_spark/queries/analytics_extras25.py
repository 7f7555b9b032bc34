"""Analytics extras, batch 25: OTIF logistics rate and unit-price
dispersion.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's operations / pricing-governance
tiers:

* OTIF — on-time (ship within 30 days of order) share per priority
  class, the fulfillment KPI contracts are written against;
* price dispersion — per-part unit-price coefficient of variation,
  the pricing-consistency audit that surfaces negotiated-discount
  leakage and data errors alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_OTIF_DAYS = 30


@register(
    "logistics_otif_rate",
    oracle=f"""
    WITH lagged AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS lag_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN lag_days <= {_OTIF_DAYS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_on_time,
           ROUND(SUM(CASE WHEN lag_days <= {_OTIF_DAYS} THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 4) AS otif_rate,
           ROUND(AVG(lag_days * 1.0), 2) AS avg_lag_days,
           CAST(MAX(lag_days) AS BIGINT) AS worst_lag_days
    FROM lagged GROUP BY priority
    """,
)
def logistics_otif_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-time fulfillment per priority class: the share of lines
    shipped within 30 days of order placement, plus average and worst
    lag — the OTIF KPI that service contracts and carrier scorecards
    are written against. Urgent classes failing to beat low-priority
    ones is the classic broken-SLA smell this surfaces.

    Shape: one fact-to-fact join on orderkey (bucketing removes the
    shuffle at 100 TB) feeding a conditional aggregate to O(classes)
    rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lagged = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "lag_days"
        ),
    )
    on_time = F.sum(F.when(F.col("lag_days") <= _OTIF_DAYS, 1).otherwise(0))
    return lagged.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        on_time.cast("long").alias("n_on_time"),
        F.round(on_time / F.count(F.lit(1)), 4).alias("otif_rate"),
        F.round(F.avg(F.col("lag_days").cast("double")), 2).alias("avg_lag_days"),
        F.max("lag_days").cast("long").alias("worst_lag_days"),
    )


_DISP_TOP = 15


@register(
    "pricing_dispersion_audit",
    oracle=f"""
    WITH unit AS (
      SELECT l_partkey,
             l_extendedprice / l_quantity AS unit_price
      FROM lineitem WHERE l_quantity > 0
    ),
    st AS (
      SELECT l_partkey,
             COUNT(*) AS n,
             AVG(unit_price) AS mu,
             STDDEV_SAMP(unit_price) AS sd
      FROM unit GROUP BY l_partkey
      HAVING COUNT(*) >= 5
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY sd / mu DESC, l_partkey) AS rk
      FROM st
    )
    SELECT l_partkey,
           CAST(n AS BIGINT) AS n_sales,
           ROUND(mu, 2) AS mean_unit_price,
           ROUND(sd / mu, 4) AS price_cv
    FROM ranked WHERE rk <= {_DISP_TOP}
    """,
)
def pricing_dispersion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-price consistency audit: for every part sold at least 5
    times, the coefficient of variation of realized unit price
    (extendedprice/quantity), reporting the 15 most-dispersed parts —
    high CV means inconsistent pricing (negotiated leakage, currency
    mistakes, or unit errors), the audit a pricing desk runs before
    trusting revenue analytics built on 'the' price.

    Shape: one scan to per-part moments (map-side combinable), top-k
    by CV via TakeOrdered on the O(parts) stats table."""
    li = load_table(spark, sf_dir, "lineitem")
    unit = li.where(F.col("l_quantity") > 0).select(
        "l_partkey", (F.col("l_extendedprice") / F.col("l_quantity")).alias("up")
    )
    st = (
        unit.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("up").alias("mu"),
            F.stddev_samp("up").alias("sd"),
        )
        .where(F.col("n") >= 5)
    )
    ranked = st.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc(F.col("sd") / F.col("mu")), "l_partkey"))
        .alias("rk"),
    ).where(F.col("rk") <= _DISP_TOP)
    return ranked.select(
        "l_partkey",
        F.col("n").cast("long").alias("n_sales"),
        F.round("mu", 2).alias("mean_unit_price"),
        F.round(F.col("sd") / F.col("mu"), 4).alias("price_cv"),
    )
