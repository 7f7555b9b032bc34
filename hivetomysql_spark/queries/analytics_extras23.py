"""Analytics extras, batch 23: order-value percentile trends and
categorical mix-shift drift.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); closes SURVEY.md §2.2's monitoring tier for this round:

* percentile trend — monthly p50/p90/p99 order value, the tail-aware
  alternative to tracking means;
* mix-shift TVD — month-over-month total-variation distance of the
  order-priority composition, the categorical counterpart of
  drift_psi_value_distribution's numeric PSI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "orders_percentile_trend",
    oracle="""
    WITH ranked AS (
      SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS TIMESTAMP)
               AS month,
             o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY date_trunc('month', CAST(o_orderdate AS DATE))
               ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (
               PARTITION BY date_trunc('month', CAST(o_orderdate AS DATE)))
               AS n
      FROM orders
    ),
    -- DISCRETE percentiles (value at rank ceil(q*n)): interpolated
    -- quantile_cont hits float half-cases where the two engines'
    -- lerp algebra differs in the last ulp; a rank-pick returns an
    -- exact data value, identical everywhere
    m AS (
      SELECT month,
             MIN(n) AS n,
             MIN(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN o_totalprice END) AS p50,
             MIN(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                      THEN o_totalprice END) AS p90,
             MIN(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                      THEN o_totalprice END) AS p99
      FROM ranked GROUP BY month
    )
    SELECT month,
           CAST(n AS BIGINT) AS n_orders,
           ROUND(p50, 2) AS p50,
           ROUND(p90, 2) AS p90,
           ROUND(p99, 2) AS p99,
           ROUND(p99 / p50, 3) AS tail_ratio
    FROM m
    """,
)
def orders_percentile_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order-value percentiles (p50/p90/p99) with the
    p99/p50 tail ratio — the distribution-aware trend line that
    catches 'the median is flat but whales doubled' months that a
    mean series hides.

    Shape: discrete percentiles via one per-month rank window and a
    conditional pick at rank ceil(q*n) — exact data values, engine-
    portable (no interpolation). At 100 TB swap the window for
    approx_percentile's mergeable t-digest; the report shape is
    unchanged."""
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.to_date("o_orderdate"))
    w = Window.partitionBy(month)
    ranked = o.select(
        month.alias("month"),
        "o_totalprice",
        F.row_number().over(w.orderBy("o_totalprice", "o_orderkey")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )

    def disc(q: float):
        # discrete percentile: exact data value at rank ceil(q*n)
        # (see oracle comment on why not interpolated percentiles)
        return F.min(
            F.when(
                F.col("rn") == F.ceil(q * F.col("n")).cast("long"),
                F.col("o_totalprice"),
            )
        )

    g = ranked.groupBy("month").agg(
        F.min("n").alias("n"),
        disc(0.5).alias("p50"),
        disc(0.9).alias("p90"),
        disc(0.99).alias("p99"),
    )
    return g.select(
        "month",
        F.col("n").cast("long").alias("n_orders"),
        F.round("p50", 2).alias("p50"),
        F.round("p90", 2).alias("p90"),
        F.round("p99", 2).alias("p99"),
        F.round(F.col("p99") / F.col("p50"), 3).alias("tail_ratio"),
    )


@register(
    "drift_priority_mix_tvd",
    oracle="""
    WITH mix AS (
      SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS TIMESTAMP)
               AS month,
             o_orderpriority AS cat,
             COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    tot AS (
      SELECT month, SUM(n) AS t FROM mix GROUP BY month
    ),
    shares AS (
      SELECT m.month, m.cat, m.n * 1.0 / tot.t AS share
      FROM mix m JOIN tot ON tot.month = m.month
    ),
    paired AS (
      SELECT a.month, a.cat, a.share AS cur,
             COALESCE(b.share, 0.0) AS prev
      FROM shares a
      LEFT JOIN shares b
        ON b.cat = a.cat
       AND b.month = a.month - INTERVAL 1 MONTH
      WHERE EXISTS (SELECT 1 FROM shares s
                    WHERE s.month = a.month - INTERVAL 1 MONTH)
    )
    SELECT month,
           ROUND(SUM(abs(cur - prev)) / 2.0, 4) AS tvd_vs_prev_month,
           CAST(COUNT(*) AS BIGINT) AS n_categories
    FROM paired GROUP BY month
    """,
)
def drift_priority_mix_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical mix-shift monitor: month-over-month total-variation
    distance (half the L1 gap between consecutive months' priority
    shares) — TVD is the tightest bound on how much ANY downstream
    decision rule's behavior can change from the composition shift,
    making it the principled alert threshold for categorical drift
    (the numeric twin is drift_psi_value_distribution).

    Shape: one grouped pass to O(months x categories) shares, a
    self-join on the shifted month, an O(cells) rollup."""
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.to_date("o_orderdate"))
    mix = o.groupBy(month.alias("month"), F.col("o_orderpriority").alias("cat")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = mix.groupBy("month").agg(F.sum("n").alias("t"))
    shares = mix.join(tot, "month").select(
        "month", "cat", (F.col("n") / F.col("t")).alias("share")
    )
    prev = shares.select(
        F.add_months(F.col("month"), 1).alias("pm"),
        F.col("cat").alias("pcat"),
        F.col("share").alias("prev"),
    )
    months_with_prev = shares.select(
        F.add_months(F.col("month"), 1).alias("m2")
    ).distinct()
    paired = (
        shares.join(
            prev,
            (F.col("pm") == F.col("month")) & (F.col("pcat") == F.col("cat")),
            "left",
        )
        .join(months_with_prev, F.col("m2") == F.col("month"), "left_semi")
        .select(
            "month", "cat", F.col("share").alias("cur"),
            F.coalesce("prev", F.lit(0.0)).alias("prev"),
        )
    )
    return paired.groupBy("month").agg(
        F.round(F.sum(F.abs(F.col("cur") - F.col("prev"))) / 2.0, 4).alias(
            "tvd_vs_prev_month"
        ),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
    )
