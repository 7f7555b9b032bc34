"""Analytics extras, batch 44: rolling regression, partial
autocorrelation, and video shot detection.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* rolling beta — 30-day windowed regression slope of a segment's
  revenue on total revenue, from windowed sufficient statistics.
* PACF — partial autocorrelation at lags 1..3 via Durbin-Levinson,
  the ARIMA order-selection diagnostic.
* video shot detection — frame-to-frame mean pixel delta over REAL
  concatenated-P6 frame walks, threshold crossings = cuts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "window_rolling_beta",
    oracle="""
    WITH daily AS (
      SELECT CAST(o.o_orderdate AS DATE) AS d,
             SUM(CASE WHEN c.c_mktsegment = 'BUILDING'
                      THEN o.o_totalprice ELSE 0 END) AS seg,
             SUM(o.o_totalprice) AS tot
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1
    ),
    rolled AS (
      SELECT d,
             COUNT(*) OVER w AS n,
             AVG(seg) OVER w AS ms, AVG(tot) OVER w AS mt,
             AVG(seg * tot) OVER w AS mst,
             AVG(tot * tot) OVER w AS mtt
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    ),
    beta AS (
      SELECT d, (mst - ms * mt) / (mtt - mt * mt) AS b
      FROM rolled WHERE n = 30 AND (mtt - mt * mt) > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_windows,
           ROUND(AVG(b), 6) AS mean_beta,
           ROUND(MIN(b), 6) AS min_beta,
           ROUND(MAX(b), 6) AS max_beta,
           ROUND(STDDEV_SAMP(b), 6) AS beta_vol
    FROM beta
    """,
)
def window_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day regression beta of the BUILDING segment's daily
    revenue against total revenue, computed from windowed sufficient
    statistics (E[xy] − E[x]E[y]) / (E[y²] − E[y]²) — the
    rolling-factor-exposure pattern (finance beta, demand
    sensitivity) with NO per-window refit: four windowed averages
    replace a regression per day. Summary of the beta path
    (mean/min/max/vol).

    Shape: join + daily reduce, then four O(days) frame windows over
    the tiny daily table — the window frames never touch fact-table
    rows."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    daily = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(
                F.when(
                    F.col("c_mktsegment") == "BUILDING", F.col("o_totalprice")
                ).otherwise(0.0)
            ).alias("seg"),
            F.sum("o_totalprice").alias("tot"),
        )
    )
    w = Window.orderBy("d").rowsBetween(-29, 0)
    rolled = daily.select(
        "d",
        F.count(F.lit(1)).over(w).alias("n"),
        F.avg("seg").over(w).alias("ms"),
        F.avg("tot").over(w).alias("mt"),
        F.avg(F.col("seg") * F.col("tot")).over(w).alias("mst"),
        F.avg(F.col("tot") * F.col("tot")).over(w).alias("mtt"),
    )
    beta = rolled.where(
        (F.col("n") == 30) & (F.col("mtt") - F.col("mt") * F.col("mt") > 0)
    ).select(
        (
            (F.col("mst") - F.col("ms") * F.col("mt"))
            / (F.col("mtt") - F.col("mt") * F.col("mt"))
        ).alias("b")
    )
    return beta.agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.round(F.avg("b"), 6).alias("mean_beta"),
        F.round(F.min("b"), 6).alias("min_beta"),
        F.round(F.max("b"), 6).alias("max_beta"),
        F.round(F.stddev_samp("b"), 6).alias("beta_vol"),
    )


@register(
    "timeseries_pacf",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT x,
             LAG(x, 1) OVER (ORDER BY d) AS x1,
             LAG(x, 2) OVER (ORDER BY d) AS x2,
             LAG(x, 3) OVER (ORDER BY d) AS x3
      FROM daily
    ),
    acf AS (
      SELECT CORR(x, x1) AS r1, CORR(x, x2) AS r2, CORR(x, x3) AS r3,
             COUNT(x3) AS n
      FROM lagged
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           ROUND(r1, 6) AS pacf_1,
           ROUND((r2 - r1 * r1) / (1 - r1 * r1), 6) AS pacf_2,
           ROUND((r3 - r1 * r2 - ((r2 - r1 * r1) / (1 - r1 * r1))
                        * (r2 - r1 * r1))
                 / (1 - r1 * r1 - ((r2 - r1 * r1) / (1 - r1 * r1))
                        * (r2 - r1 * r1)), 6) AS pacf_3
    FROM acf
    """,
)
def timeseries_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of daily order counts at lags 1-3 via
    the Durbin-Levinson recursion applied to the lag correlations —
    the ARIMA order-selection diagnostic (`timeseries_autocorr` gives
    ACF; PACF is what distinguishes AR(p) cutoffs from MA decay).
    φ₁₁=r₁; φ₂₂=(r₂−r₁²)/(1−r₁²); φ₃₃ from the second recursion
    step, all closed-form — identical algebra both engines.

    Shape: daily reduce, three lag windows over O(days), one
    correlation aggregate, O(1) recursion math."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 2).over(w).alias("x2"),
        F.lag("x", 3).over(w).alias("x3"),
    )
    acf = lagged.agg(
        F.corr("x", "x1").alias("r1"),
        F.corr("x", "x2").alias("r2"),
        F.corr("x", "x3").alias("r3"),
        F.count("x3").alias("n"),
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi33 = (r3 - r1 * r2 - phi22 * (r2 - r1 * r1)) / (
        1 - r1 * r1 - phi22 * (r2 - r1 * r1)
    )
    return acf.select(
        F.col("n").cast("long").alias("n_obs"),
        F.round(r1, 6).alias("pacf_1"),
        F.round(phi22, 6).alias("pacf_2"),
        F.round(phi33, 6).alias("pacf_3"),
    )


@register(
    "multimodal_video_shot_detection",
    oracle="""
    WITH vids AS (
      SELECT doc_id FROM documents WHERE doc_id % 4 = 2
    ),
    px AS (
      -- frame f (0..2) of the concatenated-P6 stream: pixels are
      -- md5('ppm:<doc_id*1000+f>:<chunk>') bytes, 768 per frame
      SELECT doc_id, f, p,
             ('0x' || substr(md5('ppm:' || (doc_id * 1000 + f) || ':'
                                 || (p // 16)), 2 * (p % 16) + 1, 2))::INT
               AS b
      FROM vids,
           UNNEST(generate_series(0, 2)) AS a(f),
           UNNEST(generate_series(0, 767)) AS g(p)
    ),
    deltas AS (
      SELECT cur.doc_id, cur.f,
             AVG(ABS(cur.b - prv.b)) AS mean_delta
      FROM px cur JOIN px prv
        ON prv.doc_id = cur.doc_id AND prv.p = cur.p
       AND prv.f = cur.f - 1
      GROUP BY cur.doc_id, cur.f
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frame_pairs,
           ROUND(AVG(mean_delta), 4) AS avg_frame_delta,
           CAST(SUM(CASE WHEN mean_delta > 30 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shot_cuts
    FROM deltas
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def multimodal_video_shot_detection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shot-boundary detection over the concatenated-P6 video assets:
    mean absolute pixel delta between consecutive frames, cut
    declared above threshold 30 — the classic histogram/pixel-diff
    shot detector, running on REAL frame boundaries (every frame pair
    of the synthetic streams is independent noise, so every pair is a
    cut — the detector's structure, not Hollywood, is what's
    verified cross-engine: the oracle re-synthesizes every pixel).

    Shape: per-asset frame walk and per-pixel deltas stay in-row /
    per-key (768 pixels × 2 pairs per asset); output is O(assets).
    The mapInPandas tier decodes real containers the same way
    (`operators/multimodal.py:iter_ppm_frames`); here the
    deterministic synthesis lets the whole detector be
    value-verified in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    vids = docs.where(F.col("doc_id") % 4 == 2).select("doc_id")
    px = (
        vids.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("f"),
        )
        .select(
            "doc_id",
            "f",
            F.explode(F.sequence(F.lit(0), F.lit(767))).alias("p"),
        )
        .select(
            "doc_id",
            "f",
            "p",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ppm:"),
                            (F.col("doc_id") * 1000 + F.col("f")).cast(
                                "string"
                            ),
                            F.lit(":"),
                            (F.col("p") / 16).cast("int").cast("string"),
                        )
                    ),
                    2 * (F.col("p") % 16) + 1,
                    2,
                ),
                16,
                10,
            )
            .cast("int")
            .alias("b"),
        )
    )
    cur = px.select("doc_id", "f", "p", F.col("b").alias("cb"))
    prv = px.select(
        "doc_id", (F.col("f") + 1).alias("f"), "p", F.col("b").alias("pb")
    )
    deltas = (
        cur.join(prv, ["doc_id", "f", "p"])
        .groupBy("doc_id", "f")
        .agg(F.avg(F.abs(F.col("cb") - F.col("pb"))).alias("mean_delta"))
    )
    return (
        deltas.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_frame_pairs"),
            F.round(F.avg("mean_delta"), 4).alias("avg_frame_delta"),
            F.sum(F.when(F.col("mean_delta") > 30, 1).otherwise(0))
            .cast("long")
            .alias("n_shot_cuts"),
        )
        .select(
            F.col("doc_id").cast("long"),
            "n_frame_pairs",
            "avg_frame_delta",
            "n_shot_cuts",
        )
        .orderBy("doc_id")
    )
