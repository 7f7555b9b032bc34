"""Analytics extras, batch 80: degree power-law fit and seasonal
strength.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* degree power-law fit — continuous-MLE exponent of the co-purchase
  degree distribution (alpha = 1 + n / sum ln(d/dmin)): the
  scale-free-or-not verdict on the graph whose hubs the rich-club
  and HITS queries already rank.
* seasonal strength — Hyndman's F_s = max(0, 1 - Var(remainder) /
  Var(detrended)): the single scalar that says HOW seasonal the
  series is, quantifying what the periodogram locates and the DOW
  decomposition removes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_PL_DMIN = 1


@register(
    "graph_degree_powerlaw_fit",
    oracle=f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      FROM lineitem WHERE l_partkey < 200
    ),
    epair AS (
      SELECT a.p AS u, b.p AS v
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT n, COUNT(*) AS d FROM (
        SELECT u AS n FROM epair UNION ALL SELECT v AS n FROM epair
      ) GROUP BY n
    ),
    tail AS (SELECT d FROM deg WHERE d >= {_PL_DMIN})
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST(COUNT(*) AS BIGINT) AS n_tail,
           CAST({_PL_DMIN} AS BIGINT) AS d_min,
           ROUND(1.0 + COUNT(*) / NULLIF(SUM(LN(d * 1.0 / {_PL_DMIN})),
                                         0.0), 4) AS alpha_hat,
           ROUND(AVG(d), 4) AS mean_degree,
           CAST(MAX(d) AS BIGINT) AS max_degree
    FROM tail
    """,
)
def graph_degree_powerlaw_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law exponent of the co-purchase degree distribution by
    continuous MLE (Clauset-Shalizi-Newman's alpha = 1 + n /
    sum ln(d/d_min), d_min = 1 so the whole distribution is the
    tail; NULL when the graph is degree-constant and the exponent is
    undefined) — the scale-free verdict:
    alpha in [2,3] is the hub-dominated regime where the rich-club
    and HITS structure matters and mean-field capacity planning
    fails; larger alpha (or a bounded max degree) means the
    'heavy-tail' intuition does NOT apply and simpler models do. The
    degree sibling of `finance_hill_tail_index` (the Hill estimator
    IS this MLE).

    Shape: pair fan-out reduces once; degrees and the MLE are
    O(nodes) aggregates."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_partkey") < 200
    )
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("o", F.col("p").alias("u"))
    b = op.select("o", F.col("p").alias("v"))
    epair = (
        a.join(b, "o")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("nco"))
        .where(F.col("nco") >= 2)
        .select("u", "v")
    )
    deg = (
        epair.select(F.col("u").alias("n"))
        .unionAll(epair.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=False)  # node count + tail MLE reuse it
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("nn"))
    tail = deg.where(F.col("d") >= _PL_DMIN)
    fit = tail.agg(
        F.count(F.lit(1)).alias("nt"),
        (
            1.0
            + F.count(F.lit(1))
            / F.nullif(
                F.sum(F.log(F.col("d") * 1.0 / _PL_DMIN)), F.lit(0.0)
            )
        ).alias("alpha"),
        F.avg("d").alias("md"),
        F.max("d").alias("mx"),
    )
    return fit.crossJoin(F.broadcast(n_nodes)).select(
        F.col("nn").cast("long").alias("n_nodes"),
        F.col("nt").cast("long").alias("n_tail"),
        F.lit(_PL_DMIN).cast("long").alias("d_min"),
        F.round("alpha", 4).alias("alpha_hat"),
        F.round("md", 4).alias("mean_degree"),
        F.col("mx").cast("long").alias("max_degree"),
    )


@register(
    "timeseries_seasonal_strength",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    trended AS (
      SELECT d, y,
             AVG(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS trend,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                            AND 3 FOLLOWING) AS wn
      FROM daily
    ),
    interior AS (
      SELECT d, y, trend, y - trend AS detrended
      FROM trended WHERE wn = 7
    ),
    seasonal AS (
      SELECT ISODOW(d) AS dow, AVG(detrended) AS s
      FROM interior GROUP BY 1
    ),
    rem AS (
      SELECT i.detrended, i.detrended - s.s AS r
      FROM interior i JOIN seasonal s ON s.dow = ISODOW(i.d)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(VAR_SAMP(detrended), 4) AS var_detrended,
           ROUND(VAR_SAMP(r), 4) AS var_remainder,
           ROUND(GREATEST(0.0, 1.0 - VAR_SAMP(r) / VAR_SAMP(detrended)), 4)
             AS seasonal_strength
    FROM rem
    """,
)
def timeseries_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman's seasonal-strength index: F_s = max(0, 1 -
    Var(remainder)/Var(detrended)) from the centered-MA +
    DOW-seasonal decomposition — the single scalar that says how
    much of the detrended variation the weekly pattern explains
    (near 0: don't bother with seasonal models; near 1: the DOW
    indexes ARE the series). Quantifies what
    `timeseries_periodogram` locates spectrally and what the
    decomposition/anomaly queries assume; the number a forecasting
    pipeline uses to CHOOSE between the snaive and naive baselines
    it backtests.

    Shape: one reduce to O(days); the trend window, seasonal means,
    and both variances run on the reduced series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    wt = Window.orderBy("d").rowsBetween(-3, 3)
    trended = daily.select(
        "d",
        "y",
        F.avg("y").over(wt).alias("trend"),
        F.count(F.lit(1)).over(wt).alias("wn"),
    ).where(F.col("wn") == 7)
    interior = trended.select(
        "d", (F.col("y") - F.col("trend")).alias("detrended")
    )
    iso_dow = ((F.dayofweek("d") + 5) % 7) + 1
    seasonal = interior.groupBy(iso_dow.alias("dow")).agg(
        F.avg("detrended").alias("s")
    )
    rem = interior.join(
        F.broadcast(seasonal), iso_dow == F.col("dow")
    ).select("detrended", (F.col("detrended") - F.col("s")).alias("r"))
    return rem.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.var_samp("detrended"), 4).alias("var_detrended"),
        F.round(F.var_samp("r"), 4).alias("var_remainder"),
        F.round(
            F.greatest(
                F.lit(0.0),
                1.0 - F.var_samp("r") / F.var_samp("detrended"),
            ),
            4,
        ).alias("seasonal_strength"),
    )
