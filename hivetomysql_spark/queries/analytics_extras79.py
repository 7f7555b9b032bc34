"""Analytics extras, batch 79: the Ljung-Box portmanteau test.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); SURVEY.md §2.2 extension-tier entry:

* Ljung-Box — the JOINT autocorrelation test over lags 1..7:
  Q = n(n+2) sum r_k^2/(n-k), cumulated per lag against the
  chi-square 5% line — the standard 'are these residuals white'
  portmanteau that single-lag ACF (`timeseries_autocorr`), PACF,
  and the runs test each only probe one slice of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_LB_LAGS = 7
_CHI2_05 = [3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067]


def _lb_oracle() -> str:
    lag_sqls = []
    for k in range(1, _LB_LAGS + 1):
        lag_sqls.append(f"""
    r{k} AS (
      SELECT SUM((a.yc) * (b.yc)) / (SELECT SUM(yc * yc) FROM centered)
               AS r
      FROM centered a JOIN centered b ON b.t = a.t + {k}
    )""")
    rows = " UNION ALL ".join(
        f"SELECT {k} AS lag, (SELECT r FROM r{k}) AS rk FROM (SELECT 1)"
        for k in range(1, _LB_LAGS + 1)
    )
    crit = ", ".join(str(c) for c in _CHI2_05)
    return f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    centered AS (
      SELECT y - AVG(y) OVER () AS yc,
             ROW_NUMBER() OVER (ORDER BY d) AS t,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    {",".join(lag_sqls)},
    acfs AS ({rows}),
    n_ AS (SELECT MAX(n) AS n FROM centered),
    terms AS (
      SELECT lag, rk,
             n_.n * (n_.n + 2.0) * rk * rk / (n_.n - lag) AS term
      FROM acfs CROSS JOIN n_
    ),
    cum AS (
      SELECT lag, rk,
             SUM(term) OVER (ORDER BY lag) AS q
      FROM terms
    )
    SELECT CAST(lag AS INT) AS lag,
           ROUND(rk, 6) AS acf,
           ROUND(q, 4) AS ljung_box_q,
           CAST(([{crit}])[lag] AS DOUBLE) AS chi2_crit_05,
           q > ([{crit}])[lag] AS reject_white_05
    FROM cum
    """


@register("stats_ljung_box", oracle=_lb_oracle())
def stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on the daily event counts:
    autocorrelations r_1..r_7 of the mean-centered series, the
    cumulative statistic Q_m = n(n+2) sum_{{k<=m}} r_k^2/(n-k), and
    the chi-square 5% rejection line per degree of freedom — the
    JOINT whiteness test under every 'iid residuals' assumption in
    this registry (control charts, backtests, bootstrap CIs), where
    `timeseries_autocorr` reads one lag and `stats_runs_test` only
    signs. A rejection at m=7 with weekly data is the seasonality
    the decomposition queries then remove.

    Shape: the fact reduces to O(days) once; each r_k is one
    shifted self-join on the reduced series; Q is an O(lags)
    running sum."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    wall = Window.partitionBy()
    centered = daily.select(
        (F.col("y") - F.avg("y").over(wall)).alias("yc"),
        F.row_number().over(Window.orderBy("d")).alias("t"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).localCheckpoint(eager=False)  # 7 shifted joins + denom reuse it
    denom = centered.agg(F.sum(F.col("yc") * F.col("yc")).alias("ss"))
    b = centered.select(F.col("t").alias("tb"), F.col("yc").alias("ycb"))
    acf_rows = []
    for k in range(1, _LB_LAGS + 1):
        rk = (
            centered.join(b, F.col("tb") == F.col("t") + k)
            .agg(F.sum(F.col("yc") * F.col("ycb")).alias("num"))
            .crossJoin(F.broadcast(denom))
            .select(
                F.lit(k).alias("lag"),
                (F.col("num") / F.col("ss")).alias("rk"),
            )
        )
        acf_rows.append(rk)
    acfs = acf_rows[0]
    for df_ in acf_rows[1:]:
        acfs = acfs.unionByName(df_)
    n_ = centered.agg(F.max("n").alias("nn"))
    terms = acfs.crossJoin(F.broadcast(n_)).select(
        "lag",
        "rk",
        (
            F.col("nn")
            * (F.col("nn") + 2.0)
            * F.col("rk")
            * F.col("rk")
            / (F.col("nn") - F.col("lag"))
        ).alias("term"),
    )
    crit = F.array(*[F.lit(c) for c in _CHI2_05])
    cum = terms.select(
        "lag",
        "rk",
        F.sum("term")
        .over(Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0))
        .alias("q"),
    )
    return cum.select(
        F.col("lag").cast("int").alias("lag"),
        F.round("rk", 6).alias("acf"),
        F.round("q", 4).alias("ljung_box_q"),
        F.round(F.element_at(crit, F.col("lag")), 3).alias("chi2_crit_05"),
        (F.col("q") > F.element_at(crit, F.col("lag"))).alias(
            "reject_white_05"
        ),
    )
