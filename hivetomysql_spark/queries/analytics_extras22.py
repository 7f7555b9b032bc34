"""Analytics extras, batch 22: margin waterfall, error-budget burn,
and discount elasticity.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's finance / SRE / pricing tiers:

* margin waterfall — gross -> discount -> tax -> net monthly bridge,
  the revenue-decomposition view finance closes the month with;
* error-budget burn — SLO error-rate burn multiple per day plus
  days-to-exhaustion, the SRE alerting arithmetic;
* discount elasticity — quantity response across discount bands with
  the overall correlation, the naive pricing-effect read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "orders_margin_waterfall",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS TIMESTAMP)
               AS month,
             -- per-row terms quantized to integer 1e-4 units before
             -- summing: the row products are bit-identical across
             -- engines, and integer partial sums are order-exact, so
             -- no ROUND can land on a float-sum boundary
             SUM(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT))
               AS gross_u,
             SUM(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5)
                 AS BIGINT)) AS disc_u,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * l_tax
                            * 10000 + 0.5) AS BIGINT)) AS tax_u,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                            * 10000 + 0.5) AS BIGINT)) AS inv_u
      FROM lineitem GROUP BY 1
    )
    SELECT month,
           -- cent-rounding in INTEGER space: (u+50)//100 cents — a
           -- float ROUND would hit .xx5 half-cases where Spark
           -- (shortest-repr HALF_UP) and DuckDB (raw-bits) disagree
           CAST(FLOOR((gross_u + 50) / 100.0) AS BIGINT) / 100.0 AS gross,
           CAST(FLOOR((disc_u + 50) / 100.0) AS BIGINT) / 100.0
             AS discount_given,
           CAST(FLOOR((tax_u + 50) / 100.0) AS BIGINT) / 100.0
             AS tax_collected,
           CAST(FLOOR((inv_u + 50) / 100.0) AS BIGINT) / 100.0 AS invoiced,
           ROUND(disc_u * 1.0 / gross_u, 4) AS discount_rate
    FROM m
    """,
)
def orders_margin_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly margin waterfall over shipped lines: gross extended
    price, minus discounts given, plus tax collected, to the invoiced
    total — the bridge a finance close walks to explain why net moved
    (volume? discounting? tax mix?). Each component is a separate
    SUM so the bridge is additive and auditable.

    Shape: one grouped scan; every waterfall component is a parallel
    aggregate over the same rows — no self-joins, no windows."""
    li = load_table(spark, sf_dir, "lineitem")
    month = F.date_trunc("month", F.to_date("l_shipdate"))

    def units(expr):
        # integer 1e-4-unit ledger — order-exact partial sums (see oracle)
        return F.sum(F.floor(expr * 10000 + 0.5).cast("long"))

    gross = units(F.col("l_extendedprice"))
    disc = units(F.col("l_extendedprice") * F.col("l_discount"))
    tax = units(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.col("l_tax")
    )
    inv = units(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    def cents(u):
        # integer-space cent rounding (see oracle comment)
        return F.floor((u + 50) / 100.0).cast("long") / 100.0

    return li.groupBy(month.alias("month")).agg(
        cents(gross).alias("gross"),
        cents(disc).alias("discount_given"),
        cents(tax).alias("tax_collected"),
        cents(inv).alias("invoiced"),
        F.round(disc / gross, 4).alias("discount_rate"),
    )


_SLO_ERROR_RATE = 0.25


@register(
    "sre_error_budget_burn",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
             COUNT(*) AS n,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errs
      FROM events GROUP BY 1
    ),
    burn AS (
      SELECT d, n, errs,
             (errs * 1.0 / n) / {_SLO_ERROR_RATE} AS burn_rate
      FROM daily
    )
    SELECT d AS day,
           CAST(n AS BIGINT) AS n_events,
           CAST(errs AS BIGINT) AS n_errors,
           ROUND(burn_rate, 4) AS burn_rate,
           CAST(CASE WHEN burn_rate > 1 THEN 1 ELSE 0 END AS BIGINT)
             AS budget_violated
    FROM burn
    """,
)
def sre_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-budget burn per day against a 25% error-rate SLO (the
    fixtures' error share sits near 20%, so the budget is realistic):
    burn_rate = observed_error_rate / SLO — burn > 1 means the day
    consumed more than its share of the monthly budget, the
    multi-window burn-rate arithmetic from the Google SRE workbook
    that modern paging policies alert on.

    Shape: one conditional-count grouped scan to O(days); the SLO
    math is scalar on the compressed series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("errs"),
    )
    burn = (F.col("errs") / F.col("n")) / _SLO_ERROR_RATE
    return daily.select(
        "day",
        F.col("n").cast("long").alias("n_events"),
        F.col("errs").cast("long").alias("n_errors"),
        F.round(burn, 4).alias("burn_rate"),
        F.when(burn > 1, 1).otherwise(0).cast("long").alias("budget_violated"),
    )


@register(
    "pricing_discount_elasticity",
    oracle="""
    WITH banded AS (
      SELECT CAST(FLOOR(l_discount * 100 / 2) * 2 AS BIGINT) AS discount_pct_band,
             l_quantity, l_discount
      FROM lineitem
    ),
    corr_all AS (
      SELECT CORR(l_discount, l_quantity) AS c FROM lineitem
    )
    SELECT discount_pct_band,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(AVG(l_quantity), 3) AS avg_quantity,
           ROUND(MIN(c), 4) AS corr_discount_quantity
    FROM banded CROSS JOIN corr_all
    GROUP BY discount_pct_band
    """,
)
def pricing_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-response read: average quantity per 2-percentage-point
    discount band plus the overall discount-quantity correlation —
    the first-pass answer to 'do discounts move volume'. Flat bands
    with near-zero correlation (as in these fixtures, where discount
    is assigned independently) correctly read as NO naive
    elasticity — the guard against a pricing team over-reading
    observational data.

    Shape: one banded grouped scan; the corr is a second tiny
    aggregate broadcast across bands so every row of the report
    carries the headline number."""
    li = load_table(spark, sf_dir, "lineitem")
    banded = li.select(
        (F.floor(F.col("l_discount") * 100 / 2) * 2)
        .cast("long")
        .alias("discount_pct_band"),
        "l_quantity",
    )
    corr_all = li.agg(F.corr("l_discount", "l_quantity").alias("c"))
    return (
        banded.crossJoin(F.broadcast(corr_all))
        .groupBy("discount_pct_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(F.avg("l_quantity"), 3).alias("avg_quantity"),
            F.round(F.min("c"), 4).alias("corr_discount_quantity"),
        )
    )
