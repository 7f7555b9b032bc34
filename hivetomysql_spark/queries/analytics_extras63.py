"""Analytics extras, batch 63: pseudo-relevance feedback and Haar
wavelet energy.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* PRF re-query — Rocchio-style pseudo-relevance feedback over the
  embedding table: query -> top-5 -> centroid-blended query ->
  re-rank; reports how the result set moved. Completes the
  retrieval stack (exact/LSH/IVF/PQ/MMR/kNN) with the classic
  second-pass refinement.
* Haar energy — 3-level Haar wavelet decomposition of the daily
  series with per-level detail energies: the multi-resolution
  complement of the single-scale periodogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_COS_SQL = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)
_PRF_ALPHA = 0.5


@register(
    "similarity_prf_requery",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    q0 AS (SELECT x AS qx FROM e WHERE vec_id = 7),
    r1 AS (
      SELECT e.vec_id, e.x,
             ROW_NUMBER() OVER (
               ORDER BY {_COS_SQL.format(a="e.x", b="q0.qx")} DESC, e.vec_id
             ) AS rnk
      FROM e CROSS JOIN q0 WHERE e.vec_id <> 7
    ),
    fb AS (
      SELECT list_transform(range(1, 65),
                            d -> AVG_d.avs[d]) AS cx
      FROM (
        SELECT list(av ORDER BY d) AS avs
        FROM (
          SELECT dd.d AS d, AVG(x[dd.d]) AS av
          FROM r1, UNNEST(range(1, 65)) AS dd(d)
          WHERE rnk <= 5 GROUP BY dd.d
        )
      ) AVG_d
    ),
    q1 AS (
      SELECT list_transform(range(1, 65),
                            d -> {_PRF_ALPHA} * q0.qx[d]
                                 + {1 - _PRF_ALPHA} * fb.cx[d]) AS qx
      FROM q0 CROSS JOIN fb
    ),
    r2 AS (
      SELECT e.vec_id,
             ROW_NUMBER() OVER (
               ORDER BY {_COS_SQL.format(a="e.x", b="q1.qx")} DESC, e.vec_id
             ) AS rnk
      FROM e CROSS JOIN q1 WHERE e.vec_id <> 7
    ),
    top1 AS (SELECT vec_id FROM r1 WHERE rnk <= 10),
    top2 AS (SELECT vec_id FROM r2 WHERE rnk <= 10)
    SELECT CAST((SELECT COUNT(*) FROM top1 JOIN top2 USING (vec_id))
                AS BIGINT) AS n_common,
           CAST((SELECT COUNT(*) FROM top2 WHERE vec_id NOT IN
                 (SELECT vec_id FROM top1)) AS BIGINT) AS n_new,
           ROUND((SELECT COUNT(*) FROM top1 JOIN top2 USING (vec_id))
                 / 10.0, 2) AS overlap_at_10
    """,
)
def similarity_prf_requery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback (Rocchio, alpha=0.5): take vector 7
    as the query, retrieve top-5 by cosine, blend the query with the
    centroid of those pseudo-relevant results, re-rank, and report
    how much of the top-10 survived vs was newly pulled in — the
    classic zero-supervision second pass that improves recall when
    the corpus clusters, and the last missing stage of this
    registry's retrieval stack (exact -> LSH/IVF/PQ -> MMR -> kNN ->
    PRF). Both passes and the centroid blend are re-derived by the
    oracle.

    Shape: two broadcast-query scoring scans and one O(5 x d)
    centroid reduce — PRF costs one extra scan, never a shuffle of
    the corpus."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("x"),
    ).localCheckpoint(eager=False)

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def cos(a, b):
        return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))

    def rank_against(qdf):
        j = e.where(F.col("vec_id") != 7).crossJoin(F.broadcast(qdf))
        return j.select(
            "vec_id",
            "x",
            F.row_number()
            .over(Window.orderBy(F.desc(cos(F.col("x"), F.col("qx"))), "vec_id"))
            .alias("rnk"),
        )

    q0 = e.where(F.col("vec_id") == 7).select(F.col("x").alias("qx"))
    r1 = rank_against(q0).localCheckpoint(eager=False)
    fb = (
        r1.where(F.col("rnk") <= 5)
        .select(F.posexplode("x").alias("d", "v"))
        .groupBy("d")
        .agg(F.avg("v").alias("av"))
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "av"))),
                lambda s: s["av"],
            ).alias("cx")
        )
    )
    q1 = q0.crossJoin(F.broadcast(fb)).select(
        F.zip_with(
            "qx", "cx", lambda q, c: _PRF_ALPHA * q + (1 - _PRF_ALPHA) * c
        ).alias("qx")
    )
    r2 = rank_against(q1)
    top1 = r1.where(F.col("rnk") <= 10).select("vec_id")
    top2 = r2.where(F.col("rnk") <= 10).select(
        F.col("vec_id").alias("v2")
    )
    common = top1.join(top2, F.col("vec_id") == F.col("v2")).count()
    # assemble as a single-row DataFrame without driver-side math on
    # data-sized inputs (counts are scalars)
    return (
        top2.agg(F.count(F.lit(1)).alias("n2"))
        .select(
            F.lit(common).cast("long").alias("n_common"),
            (F.col("n2") - F.lit(common)).cast("long").alias("n_new"),
            F.round(F.lit(common) / 10.0, 2).alias("overlap_at_10"),
        )
    )


_HAAR_LEVELS = 3


@register(
    "timeseries_haar_energy",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT y, ROW_NUMBER() OVER (ORDER BY d) - 1 AS t,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    trimmed AS (
      -- truncate to a multiple of 8 so 3 Haar levels divide evenly
      SELECT y, t FROM idx WHERE t < (n // 8) * 8
    ),
    l1 AS (
      SELECT t // 2 AS t,
             SUM(CASE WHEN t % 2 = 0 THEN y ELSE 0 END) AS a,
             SUM(CASE WHEN t % 2 = 1 THEN y ELSE 0 END) AS b
      FROM trimmed GROUP BY t // 2
    ),
    l1o AS (SELECT t, (a + b) / 2.0 AS s, (a - b) / 2.0 AS dd FROM l1),
    l2 AS (
      SELECT t // 2 AS t,
             SUM(CASE WHEN t % 2 = 0 THEN s ELSE 0 END) AS a,
             SUM(CASE WHEN t % 2 = 1 THEN s ELSE 0 END) AS b
      FROM l1o GROUP BY t // 2
    ),
    l2o AS (SELECT t, (a + b) / 2.0 AS s, (a - b) / 2.0 AS dd FROM l2),
    l3 AS (
      SELECT t // 2 AS t,
             SUM(CASE WHEN t % 2 = 0 THEN s ELSE 0 END) AS a,
             SUM(CASE WHEN t % 2 = 1 THEN s ELSE 0 END) AS b
      FROM l2o GROUP BY t // 2
    ),
    l3o AS (SELECT t, (a + b) / 2.0 AS s, (a - b) / 2.0 AS dd FROM l3),
    energies AS (
      SELECT 1 AS level, SUM(dd * dd) AS energy, COUNT(*) AS n_coef FROM l1o
      UNION ALL
      SELECT 2, SUM(dd * dd), COUNT(*) FROM l2o
      UNION ALL
      SELECT 3, SUM(dd * dd), COUNT(*) FROM l3o
    )
    SELECT CAST(level AS INT) AS level,
           CAST(n_coef AS BIGINT) AS n_coefficients,
           ROUND(energy, 4) AS detail_energy,
           CAST(POW(2, level) AS BIGINT) AS scale_days
    FROM energies
    """,
)
def timeseries_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-level Haar wavelet decomposition of the daily event
    series: each level halves the series into pairwise means (smooth)
    and half-differences (detail), and the per-level detail ENERGY
    says at which time scale the variability lives — 2-day jitter
    (level 1) vs weekly-ish structure (level 3) — the
    multi-resolution view the single-scale `timeseries_periodogram`
    projects onto fixed periods. Pure pairwise groupBys, no UDF, no
    recursion: levels unroll as three O(n/2^k) reduces.

    Shape: the fact reduces to O(days) once; each level is one
    grouped pass over a halving table."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    idx = daily.select(
        "y",
        (F.row_number().over(Window.orderBy("d")) - 1).alias("t"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("n"),
    )
    trimmed = idx.where(
        F.col("t") < (F.floor(F.col("n") / 8) * 8)
    ).select("y", "t")

    def level(df, vcol):
        g = df.groupBy((F.col("t") / 2).cast("long").alias("t")).agg(
            F.sum(F.when(F.col("t") % 2 == 0, F.col(vcol)).otherwise(0.0)).alias("a"),
            F.sum(F.when(F.col("t") % 2 == 1, F.col(vcol)).otherwise(0.0)).alias("b"),
        )
        return g.select(
            "t",
            ((F.col("a") + F.col("b")) / 2.0).alias("s"),
            ((F.col("a") - F.col("b")) / 2.0).alias("dd"),
        )

    l1 = level(trimmed, "y").localCheckpoint(eager=False)
    l2 = level(l1, "s").localCheckpoint(eager=False)
    l3 = level(l2, "s")

    def energy(df, lv):
        return df.agg(
            F.lit(lv).cast("int").alias("level"),
            F.count(F.lit(1)).alias("n_coefficients"),
            F.round(F.sum(F.col("dd") * F.col("dd")), 4).alias(
                "detail_energy"
            ),
            F.lit(2 ** lv).cast("long").alias("scale_days"),
        )

    return (
        energy(l1, 1)
        .unionByName(energy(l2, 2))
        .unionByName(energy(l3, 3))
    )
