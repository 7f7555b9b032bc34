"""Analytics extras, batch 56: perceptual frame similarity, the runs
test, and star-except projection.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* video frame SSIM — the perceptual similarity metric between
  consecutive decoded frames (global-window SSIM over real pixels);
  the principled upgrade of `multimodal_video_shot_detection`'s raw
  mean-delta, fully pixel-oracled.
* runs test — Wald-Wolfowitz randomness check on the daily series'
  median-sign sequence: too FEW runs = trending/clustered, too MANY
  = oscillating; the model-free residual diagnostic.
* star-except — `SELECT * EXCEPT (...)` (Spark 4) vs DuckDB's
  `EXCLUDE`: the schema-evolution-friendly projection idiom, proven
  equivalent cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_SSIM_C1 = 6.5025  # (0.01 * 255)^2
_SSIM_C2 = 58.5225  # (0.03 * 255)^2


def _ssim_oracle() -> str:
    pix = (
        "('0x' || substr(md5('ppm:' || img_id || ':' || (p // 16)),"
        " 2 * (p % 16) + 1, 2))::INT"
    )
    return f"""
    WITH vids AS (
      SELECT doc_id FROM documents WHERE doc_id % 4 = 2
    ),
    frames AS (
      SELECT doc_id, f.f AS frame, doc_id * 1000 + f.f AS img_id
      FROM vids, UNNEST([0, 1, 2]) AS f(f)
    ),
    px AS (
      SELECT doc_id, frame, p // 3 AS pix_i, p % 3 AS ch, {pix} AS b
      FROM frames, UNNEST(generate_series(0, 767)) AS g(p)
    ),
    luma AS (
      SELECT doc_id, frame, pix_i,
             SUM(CASE ch WHEN 0 THEN 299 * b
                         WHEN 1 THEN 587 * b
                         ELSE 114 * b END) / 1000.0 AS l
      FROM px GROUP BY 1, 2, 3
    ),
    pairs AS (
      SELECT a.doc_id, a.frame AS pair_idx, a.pix_i,
             a.l AS x, b.l AS y
      FROM luma a JOIN luma b
        ON b.doc_id = a.doc_id AND b.frame = a.frame + 1
       AND b.pix_i = a.pix_i
      WHERE a.frame < 2
    ),
    stats AS (
      SELECT doc_id, pair_idx,
             AVG(x) AS mx, AVG(y) AS my,
             SUM(x * x) / 256.0 - AVG(x) * AVG(x) AS vx,
             SUM(y * y) / 256.0 - AVG(y) * AVG(y) AS vy,
             SUM(x * y) / 256.0 - AVG(x) * AVG(y) AS cxy
      FROM pairs GROUP BY 1, 2
    )
    SELECT doc_id, CAST(pair_idx AS INT) AS pair_idx,
           ROUND((2.0 * mx * my + {_SSIM_C1}) * (2.0 * cxy + {_SSIM_C2})
                 / ((mx * mx + my * my + {_SSIM_C1})
                    * (vx + vy + {_SSIM_C2})), 6) AS ssim
    FROM stats
    """


@register("multimodal_video_ssim", oracle=_ssim_oracle())
def multimodal_video_ssim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-window SSIM between consecutive REAL decoded video
    frames: luminance means, variances, and covariance over the 256
    luma values of each frame pair, combined by the standard
    ((2 mu_x mu_y + C1)(2 cov + C2)) / ((mu_x^2 + mu_y^2 + C1)
    (var_x + var_y + C2)) — the perceptual similarity metric that
    `multimodal_video_shot_detection`'s raw mean pixel delta only
    approximates (SSIM discounts uniform brightness shifts that a
    raw delta misreads as cuts). Every pixel is re-synthesized by
    the DuckDB twin, so the whole decode->luma->moments->SSIM path
    is value-verified.

    Shape: Arrow mapInPandas decode per frame (pixel fan-out stays
    executor-local), one (doc, frame) pair join at the REDUCED
    256-value grain, one moments rollup per pair."""
    from hivetomysql_spark.operators import multimodal as M

    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 4 == 2
    )
    binary = M.attach_multimodal_payload(docs, "doc_id", "text")

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame", IntegerType()),
            StructField("pix_i", IntegerType()),
            StructField("l", DoubleType()),
        ]
    )

    def batches(it):
        for pdf in it:
            ids, frames, pixs, ls = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for fi, fb in enumerate(M.iter_ppm_frames(payload)):
                    w, h, rgb = M.decode_ppm(fb)
                    for i in range(w * h):
                        l1000 = (
                            299 * rgb[3 * i]
                            + 587 * rgb[3 * i + 1]
                            + 114 * rgb[3 * i + 2]
                        )
                        ids.append(doc_id)
                        frames.append(fi)
                        pixs.append(i)
                        ls.append(l1000 / 1000.0)
            yield pd.DataFrame(
                {"doc_id": ids, "frame": frames, "pix_i": pixs, "l": ls}
            )

    luma = binary.mapInPandas(batches, schema=schema)
    b = luma.select(
        F.col("doc_id").alias("bd"),
        F.col("frame").alias("bf"),
        F.col("pix_i").alias("bp"),
        F.col("l").alias("y"),
    )
    pairs = luma.where(F.col("frame") < 2).join(
        b,
        (F.col("bd") == F.col("doc_id"))
        & (F.col("bf") == F.col("frame") + 1)
        & (F.col("bp") == F.col("pix_i")),
    ).select("doc_id", F.col("frame").alias("pair_idx"), F.col("l").alias("x"), "y")
    stats = pairs.groupBy("doc_id", "pair_idx").agg(
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        (F.sum(F.col("x") * F.col("x")) / 256.0 - F.avg("x") * F.avg("x")).alias("vx"),
        (F.sum(F.col("y") * F.col("y")) / 256.0 - F.avg("y") * F.avg("y")).alias("vy"),
        (F.sum(F.col("x") * F.col("y")) / 256.0 - F.avg("x") * F.avg("y")).alias("cxy"),
    )
    ssim = (
        (2.0 * F.col("mx") * F.col("my") + _SSIM_C1)
        * (2.0 * F.col("cxy") + _SSIM_C2)
    ) / (
        (F.col("mx") * F.col("mx") + F.col("my") * F.col("my") + _SSIM_C1)
        * (F.col("vx") + F.col("vy") + _SSIM_C2)
    )
    return stats.select(
        "doc_id",
        F.col("pair_idx").cast("int").alias("pair_idx"),
        F.round(ssim, 6).alias("ssim"),
    )


@register(
    "stats_runs_test",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, COUNT(*) AS y
      FROM events GROUP BY 1
    ),
    med AS (SELECT median(y) AS m FROM daily),
    signs AS (
      SELECT d, y > med.m AS above
      FROM daily CROSS JOIN med
      WHERE y <> med.m
    ),
    runs AS (
      SELECT above,
             CASE WHEN LAG(above) OVER (ORDER BY d) IS DISTINCT FROM above
                  THEN 1 ELSE 0 END AS new_run
      FROM signs
    ),
    agg AS (
      SELECT SUM(new_run) AS r,
             SUM(CASE WHEN above THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN above THEN 0 ELSE 1 END) AS n2
      FROM runs
    )
    SELECT CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           CAST(r AS BIGINT) AS n_runs,
           ROUND(2.0 * n1 * n2 / (n1 + n2) + 1.0, 4) AS expected_runs,
           ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * 1.0 * (n1 + n2 - 1))),
                 4) AS z
    FROM agg
    """,
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily event counts: encode
    each day as above/below the series median (ties dropped, the
    standard treatment), count sign runs, and compare against the
    expected count 2 n1 n2/(n1+n2)+1 — significantly FEW runs mean
    trending/clustered data, MANY mean oscillation; either way the
    'iid residuals' assumption under the control charts and
    forecast backtests in this registry is violated. Model-free,
    one ordered pass over the O(days) reduced series.

    Shape: N events reduce to O(days); the lag window, run count,
    and z statistic are all O(days) work after that."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    med = daily.agg(F.percentile("y", F.lit(0.5)).alias("m"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("y") != F.col("m"))
        .select("d", (F.col("y") > F.col("m")).alias("above"))
    )
    runs = signs.select(
        "above",
        F.when(
            ~F.lag("above").over(Window.orderBy("d")).eqNullSafe(
                F.col("above")
            ),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("new_run").alias("r"),
        F.sum(F.col("above").cast("long")).alias("n1"),
        F.sum((~F.col("above")).cast("long")).alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    exp_r = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var_r = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * 1.0 * (n1 + n2 - 1))
    )
    return agg.select(
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        r.cast("long").alias("n_runs"),
        F.round(exp_r, 4).alias("expected_runs"),
        F.round((r - exp_r) / F.sqrt(var_r), 4).alias("z"),
    )


@register(
    "func_select_except",
    oracle="""
    SELECT * EXCLUDE (o_totalprice, o_orderdate)
    FROM orders WHERE o_orderkey < 100
    """,
)
def func_select_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT * EXCEPT (...)` — Spark 4's star-except projection
    (DuckDB spells it EXCLUDE): project everything BUT the named
    columns, the schema-evolution-friendly idiom that keeps queries
    valid as tables grow columns. The reference's dump.map solves
    the same problem by whitelisting (`HiveToMysql.java:141-169`);
    star-except is the blacklist dual, and it composes with column
    pruning — the excluded columns never leave the scan.

    Pure scan + pushed filter; zero shuffles."""
    o = load_table(spark, sf_dir, "orders")
    return spark.sql(
        "SELECT * EXCEPT (o_totalprice, o_orderdate) "
        "FROM {orders} WHERE o_orderkey < 100",
        orders=o,
    )
