"""Analytics extras, batch 64: price indexing and inter-arrival
distribution fitting.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* Laspeyres price index — base-year-basket-weighted price relatives
  per year: the economics-grade inflation measure over the catalog
  (a plain average of prices confounds mix shift with price change;
  Laspeyres holds the basket fixed).
* exponential gap fit — MLE fit of inter-event gaps with a KS
  distance against the fitted exponential: the Poisson-process
  check underlying every rate-based model in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_LP_BASE_YEAR = 1995


@register(
    "finance_price_index_laspeyres",
    oracle=f"""
    WITH pq AS (
      SELECT EXTRACT(year FROM l_shipdate) AS yr, l_partkey,
             SUM(l_quantity) AS q,
             SUM(l_extendedprice) / SUM(l_quantity) AS p
      FROM lineitem
      WHERE EXTRACT(year FROM l_shipdate) BETWEEN {_LP_BASE_YEAR}
            AND {_LP_BASE_YEAR + 3}
      GROUP BY 1, 2
    ),
    base AS (
      SELECT l_partkey, q AS q0, p AS p0
      FROM pq WHERE yr = {_LP_BASE_YEAR}
    ),
    joined AS (
      SELECT pq.yr, pq.p, base.p0, base.q0
      FROM pq JOIN base ON base.l_partkey = pq.l_partkey
    )
    SELECT CAST(yr AS INT) AS year,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(p * q0) / SUM(p0 * q0), 6) AS laspeyres_index
    FROM joined GROUP BY yr
    """,
)
def finance_price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index per year: sum(p_t * q_0) / sum(p_0 *
    q_0) over parts present in the base year (1995), with unit
    prices as revenue/quantity per (year, part). Holding the BASE
    basket fixed isolates price change from mix shift — the error a
    naive average-price trend makes; this is how CPI-style deflators
    are built from transaction data. On independently-priced
    fixtures the index correctly hovers near 1.

    Shape: one fact reduce to (year, part), a broadcast-or-
    copartitioned join against the base-year slice of the same
    reduce, one O(years) rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    pq = (
        li.where(
            F.year("l_shipdate").between(_LP_BASE_YEAR, _LP_BASE_YEAR + 3)
        )
        .groupBy(F.year("l_shipdate").alias("yr"), "l_partkey")
        .agg(
            F.sum("l_quantity").alias("q"),
            (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p"),
        )
        .localCheckpoint(eager=False)  # base slice + all years reuse it
    )
    base = pq.where(F.col("yr") == _LP_BASE_YEAR).select(
        F.col("l_partkey").alias("bpk"),
        F.col("q").alias("q0"),
        F.col("p").alias("p0"),
    )
    joined = pq.join(F.broadcast(base), F.col("l_partkey") == F.col("bpk"))
    return joined.groupBy(F.col("yr").cast("int").alias("year")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(
            F.sum(F.col("p") * F.col("q0"))
            / F.sum(F.col("p0") * F.col("q0")),
            6,
        ).alias("laspeyres_index"),
    )


@register(
    "stats_exponential_gaps_fit",
    oracle="""
    WITH ordered AS (
      SELECT ts, LAG(ts) OVER (ORDER BY ts, event_id) AS prev
      FROM events
    ),
    gaps AS (
      SELECT date_diff('second', prev, ts) AS g
      FROM ordered WHERE prev IS NOT NULL
        AND date_diff('second', prev, ts) > 0
    ),
    lam AS (SELECT COUNT(*) AS n, 1.0 / AVG(g) AS lambda FROM gaps),
    ranked AS (
      SELECT g,
             ROW_NUMBER() OVER (ORDER BY g) AS r,
             COUNT(*) OVER () AS n2
      FROM gaps
    ),
    ks AS (
      SELECT MAX(GREATEST(
               ABS(r * 1.0 / n2 - (1.0 - EXP(-lam.lambda * g))),
               ABS((r - 1.0) / n2 - (1.0 - EXP(-lam.lambda * g)))
             )) AS d
      FROM ranked CROSS JOIN lam
    )
    SELECT CAST(lam.n AS BIGINT) AS n_gaps,
           ROUND(lam.lambda, 6) AS lambda_per_sec,
           ROUND(1.0 / lam.lambda, 4) AS mean_gap_s,
           ROUND(ks.d, 4) AS ks_distance,
           ks.d < 0.05 AS exponential_plausible
    FROM lam CROSS JOIN ks
    """,
)
def stats_exponential_gaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential fit of global inter-event gaps: MLE rate lambda =
    1/mean, then the Kolmogorov-Smirnov distance between the
    empirical gap CDF and the fitted Exp(lambda) — the direct test
    of the Poisson-process assumption that rate tests, M/M/1-style
    capacity math, and the bot screen's 'CV near 1' heuristic all
    lean on. Both CDF step sides enter the KS sup, the textbook
    one-sample form.

    Shape: one ordered lag pass, one O(1) rate aggregate, one rank
    window over the O(gaps) reduced set."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy("ts", "event_id")
    gaps = ev.select(
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("g")
    ).where(F.col("g").isNotNull() & (F.col("g") > 0))
    gaps = gaps.localCheckpoint(eager=False)  # rate + KS reuse it
    lam = gaps.agg(
        F.count(F.lit(1)).alias("n"), (1.0 / F.avg("g")).alias("lambda")
    )
    ranked = gaps.select(
        "g",
        F.row_number().over(Window.orderBy("g")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n2"),
    )
    j = ranked.crossJoin(F.broadcast(lam))
    cdf = 1.0 - F.exp(-F.col("lambda") * F.col("g"))
    ks = j.agg(
        F.max(
            F.greatest(
                F.abs(F.col("r") * 1.0 / F.col("n2") - cdf),
                F.abs((F.col("r") - 1.0) / F.col("n2") - cdf),
            )
        ).alias("d")
    )
    return lam.crossJoin(F.broadcast(ks)).select(
        F.col("n").cast("long").alias("n_gaps"),
        F.round("lambda", 6).alias("lambda_per_sec"),
        F.round(1.0 / F.col("lambda"), 4).alias("mean_gap_s"),
        F.round("d", 4).alias("ks_distance"),
        (F.col("d") < 0.05).alias("exponential_plausible"),
    )
