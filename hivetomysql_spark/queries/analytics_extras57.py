"""Analytics extras, batch 57: lag-feature construction, synthetic
independence gap, spectral periodicity, and mergeable variance.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* lag matrix — the supervised feature table for forecasting
  (t-1/t-7 lags, 7-day rolling mean, DOW) built leakage-free from
  strictly-past windows.
* synthetic independence gap — TVD between the real joint
  distribution and the product of its marginals: exactly what a
  marginals-only synthetic data release would lose.
* periodogram — explicit cos/sin power at candidate periods over
  the daily series; finds the weekly cycle spectrally.
* two-level variance merge — Chan's parallel moments merge computed
  EXPLICITLY from per-shard (n, mean, M2) and proven equal to the
  direct variance: the algebra that makes every var/std in this
  registry safe under any partitioning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "feature_lag_matrix",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    feat AS (
      SELECT d, y,
             LAG(y, 1) OVER (ORDER BY d) AS lag_1,
             LAG(y, 7) OVER (ORDER BY d) AS lag_7,
             AVG(y) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING
                          AND 1 PRECEDING) AS roll7_mean,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING
                            AND 1 PRECEDING) AS wn,
             CAST(ISODOW(d) AS INT) AS dow
      FROM daily
    )
    SELECT d AS day, y AS target, lag_1, lag_7,
           ROUND(roll7_mean, 4) AS roll7_mean, dow
    FROM feat
    WHERE lag_7 IS NOT NULL AND wn = 7
    """,
)
def feature_lag_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised lag-feature matrix for daily-demand forecasting:
    target y(t) with strictly-past features — lag-1, lag-7, the
    trailing 7-day mean (window ends at t-1: using ROWS ... AND
    CURRENT ROW here would leak the label into its own feature, the
    classic forecasting bug), and ISO day-of-week. Rows without a
    full history are dropped rather than null-filled, so a model
    trains on honest features only. This is the table every
    `timeseries_*` forecaster in the registry would train against.

    Shape: one reduce to O(days); lags and the trailing mean are
    one window pass over the reduced series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    w = Window.orderBy("d")
    wtrail = Window.orderBy("d").rowsBetween(-7, -1)
    feat = daily.select(
        "d",
        "y",
        F.lag("y", 1).over(w).alias("lag_1"),
        F.lag("y", 7).over(w).alias("lag_7"),
        F.avg("y").over(wtrail).alias("roll7_mean"),
        F.count(F.lit(1)).over(wtrail).alias("wn"),
        (((F.dayofweek("d") + 5) % 7) + 1).alias("dow"),
    )
    return feat.where(
        F.col("lag_7").isNotNull() & (F.col("wn") == 7)
    ).select(
        F.col("d").alias("day"),
        F.col("y").alias("target"),
        "lag_1",
        "lag_7",
        F.round("roll7_mean", 4).alias("roll7_mean"),
        "dow",
    )


@register(
    "privacy_synthetic_independence_gap",
    oracle="""
    WITH joint AS (
      SELECT o_orderpriority AS a, o_orderstatus AS b,
             COUNT(*) * 1.0 / (SELECT COUNT(*) FROM orders) AS p
      FROM orders GROUP BY 1, 2
    ),
    ma AS (
      SELECT o_orderpriority AS a,
             COUNT(*) * 1.0 / (SELECT COUNT(*) FROM orders) AS pa
      FROM orders GROUP BY 1
    ),
    mb AS (
      SELECT o_orderstatus AS b,
             COUNT(*) * 1.0 / (SELECT COUNT(*) FROM orders) AS pb
      FROM orders GROUP BY 1
    ),
    cells AS (
      SELECT ma.a, mb.b,
             COALESCE(j.p, 0.0) AS p_joint,
             ma.pa * mb.pb AS p_indep
      FROM ma CROSS JOIN mb
      LEFT JOIN joint j ON j.a = ma.a AND j.b = mb.b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(SUM(ABS(p_joint - p_indep)) / 2.0, 6) AS tvd,
           ROUND(MAX(ABS(p_joint - p_indep)), 6) AS max_cell_gap
    FROM cells
    """,
)
def privacy_synthetic_independence_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What a marginals-only synthetic release loses: total-variation
    distance between the REAL joint distribution of (priority,
    status) and the product of its one-way marginals — the exact
    utility cost of the simplest synthetic-data generator (sample
    each column independently). TVD bounds the error of ANY analysis
    run on the synthetic table, so this single number prices the
    release; near-zero means marginal synthesis is safe for this
    pair, large means a correlation-aware mechanism is needed.

    Shape: three O(cells/cats) reduces off one fact scan, a tiny
    cross join of the category domains, one rollup."""
    o = load_table(spark, sf_dir, "orders")
    n = o.count()
    joint = o.groupBy(
        F.col("o_orderpriority").alias("a"),
        F.col("o_orderstatus").alias("b"),
    ).agg((F.count(F.lit(1)) * 1.0 / n).alias("p"))
    ma = o.groupBy(F.col("o_orderpriority").alias("a")).agg(
        (F.count(F.lit(1)) * 1.0 / n).alias("pa")
    )
    mb = o.groupBy(F.col("o_orderstatus").alias("b")).agg(
        (F.count(F.lit(1)) * 1.0 / n).alias("pb")
    )
    cells = (
        ma.crossJoin(mb)
        .join(joint, ["a", "b"], "left")
        .select(
            F.coalesce(F.col("p"), F.lit(0.0)).alias("p_joint"),
            (F.col("pa") * F.col("pb")).alias("p_indep"),
        )
    )
    return cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(
            F.sum(F.abs(F.col("p_joint") - F.col("p_indep"))) / 2.0, 6
        ).alias("tvd"),
        F.round(F.max(F.abs(F.col("p_joint") - F.col("p_indep"))), 6).alias(
            "max_cell_gap"
        ),
    )


_PG_PERIODS = list(range(2, 15))


@register(
    "timeseries_periodogram",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT y - AVG(y) OVER () AS yc,
             ROW_NUMBER() OVER (ORDER BY d) - 1 AS t,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    power AS (
      SELECT p.p AS period,
             (POW(SUM(yc * COS(2 * PI() * t / p.p)), 2)
              + POW(SUM(yc * SIN(2 * PI() * t / p.p)), 2))
             / MAX(n) AS pw
      FROM idx, UNNEST([{", ".join(str(p) for p in _PG_PERIODS)}]) AS p(p)
      GROUP BY p.p
    )
    SELECT CAST(period AS INT) AS period_days,
           ROUND(pw, 4) AS power,
           CAST(ROW_NUMBER() OVER (ORDER BY pw DESC, period) AS INT)
             AS power_rank
    FROM power
    """,
)
def timeseries_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram of the daily event series: spectral power
    (cos-sum^2 + sin-sum^2)/n of the mean-centered counts at
    candidate periods 2..14 days — the frequency-domain way to FIND
    the dominant cycle that `timeseries_seasonality_dow` then
    quantifies by assuming week-7 (here the spectrum says whether
    that assumption was right). Same Goertzel-style explicit
    projection as `multimodal_audio_dft_bands`, applied to the
    business series.

    Shape: reduce to O(days), one in-row fan-out over 13 candidate
    periods, one O(periods) reduce — no FFT library, no UDF."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    wall = Window.partitionBy()
    idx = daily.select(
        (F.col("y") - F.avg("y").over(wall)).alias("yc"),
        (F.row_number().over(Window.orderBy("d")) - 1).alias("t"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    fan = idx.select(
        "yc",
        "t",
        "n",
        F.explode(F.array(*[F.lit(p) for p in _PG_PERIODS])).alias("period"),
    )
    ang = 2 * math.pi * F.col("t") / F.col("period")
    power = fan.groupBy("period").agg(
        (
            (
                F.pow(F.sum(F.col("yc") * F.cos(ang)), 2)
                + F.pow(F.sum(F.col("yc") * F.sin(ang)), 2)
            )
            / F.max("n")
        ).alias("pw")
    )
    return power.select(
        F.col("period").cast("int").alias("period_days"),
        F.round("pw", 4).alias("power"),
        F.row_number()
        .over(Window.orderBy(F.desc("pw"), "period"))
        .cast("int")
        .alias("power_rank"),
    )


@register(
    "agg_variance_two_level_merge",
    oracle="""
    WITH pershard AS (
      SELECT shard, COUNT(*) AS n, AVG(x) AS m,
             SUM(x * x) - COUNT(*) * AVG(x) * AVG(x) AS m2
      FROM (SELECT o_orderkey % 8 AS shard, o_totalprice AS x FROM orders)
      GROUP BY shard
    ),
    merged AS (
      SELECT SUM(n) AS n,
             SUM(n * m) / SUM(n) AS mean,
             SUM(m2) + SUM(n * m * m) - SUM(n * m) * SUM(n * m) / SUM(n)
               AS m2
      FROM pershard
    ),
    direct AS (
      SELECT VAR_SAMP(o_totalprice) AS v FROM orders
    )
    SELECT CAST(merged.n AS BIGINT) AS n_rows,
           CAST(8 AS BIGINT) AS n_shards,
           ROUND(merged.m2 / (merged.n - 1), 4) AS merged_variance,
           ROUND(direct.v, 4) AS direct_variance,
           ABS(merged.m2 / (merged.n - 1) - direct.v) / direct.v < 1e-9
             AS merge_exact
    FROM merged CROSS JOIN direct
    """,
)
def agg_variance_two_level_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chan's parallel variance merge, made explicit: 8 hash shards
    each reduce to (n_i, mean_i, M2_i); the global M2 recombines as
    sum M2_i + sum n_i mean_i^2 - (sum n_i mean_i)^2 / N (the
    between-shard correction), and the result is checked against the
    direct single-pass VAR_SAMP to relative 1e-9. This identity is
    WHY every variance/stddev in this registry is safe under any
    partitioning — here it is computed out loud and verified, the
    same way `agg_hyperloglog_pinned` proves sketch mergeability.

    Shape: one grouped reduce to 8 shard rows, O(1) merge algebra,
    one direct aggregate for the cross-check."""
    o = load_table(spark, sf_dir, "orders")
    pershard = o.groupBy((F.col("o_orderkey") % 8).alias("shard")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("o_totalprice").alias("m"),
        (
            F.sum(F.col("o_totalprice") * F.col("o_totalprice"))
            - F.count(F.lit(1)) * F.avg("o_totalprice") * F.avg("o_totalprice")
        ).alias("m2"),
    )
    merged = pershard.agg(
        F.sum("n").alias("n"),
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("mean"),
        (
            F.sum("m2")
            + F.sum(F.col("n") * F.col("m") * F.col("m"))
            - F.sum(F.col("n") * F.col("m"))
            * F.sum(F.col("n") * F.col("m"))
            / F.sum("n")
        ).alias("m2"),
    )
    direct = o.agg(F.var_samp("o_totalprice").alias("v"))
    mv = F.col("m2") / (F.col("n") - 1)
    return merged.crossJoin(F.broadcast(direct)).select(
        F.col("n").cast("long").alias("n_rows"),
        F.lit(8).cast("long").alias("n_shards"),
        F.round(mv, 4).alias("merged_variance"),
        F.round("v", 4).alias("direct_variance"),
        (F.abs(mv - F.col("v")) / F.col("v") < 1e-9).alias("merge_exact"),
    )
