"""Analytics extras, batch 51: a verified quantile sketch, DP means,
seasonal-aware anomaly flags, and embedding-coverage auditing.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* DDSketch-style quantiles — log-bucketed (gamma=1.02) quantile
  sketch with its relative-error guarantee measured against the
  exact percentiles; the VERIFIED member of the quantile-sketch
  family next to the rows-only t-digest tier.
* DP clipped mean — the textbook clip-then-Laplace release with the
  clipping-bias bookkeeping, md5-pinned noise.
* STL-style anomaly flags — trend (centered MA) + DOW seasonal +
  remainder, alerting on remainder > 3 robust sigma: anomalies that
  respect seasonality instead of re-alerting every Monday.
* embedding coverage — the documents<->embeddings referential audit
  (missing vectors, orphan vectors, zero-norm/NaN health) every
  feature store runs before training reads it.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_DD_GAMMA = 1.02


@register(
    "agg_ddsketch_quantile_pinned",
    oracle=f"""
    WITH pts AS (SELECT o_totalprice AS x FROM orders WHERE o_totalprice > 0),
    buckets AS (
      SELECT CAST(CEIL(LN(x) / LN({_DD_GAMMA})) AS BIGINT) AS b,
             COUNT(*) AS c
      FROM pts GROUP BY 1
    ),
    cum AS (
      SELECT b, c, SUM(c) OVER (ORDER BY b) AS cum,
             SUM(c) OVER () AS n
      FROM buckets
    ),
    est AS (
      SELECT
        (SELECT MIN(b) FROM cum WHERE cum >= CEIL(0.5 * n)) AS b50,
        (SELECT MIN(b) FROM cum WHERE cum >= CEIL(0.9 * n)) AS b90,
        (SELECT MIN(b) FROM cum WHERE cum >= CEIL(0.99 * n)) AS b99,
        (SELECT COUNT(*) FROM buckets) AS n_buckets,
        (SELECT MAX(c) FROM buckets) AS max_bucket
      FROM (SELECT 1)
    ),
    exact AS (
      SELECT quantile_cont(x, 0.5) AS q50,
             quantile_cont(x, 0.9) AS q90,
             quantile_cont(x, 0.99) AS q99
      FROM pts
    )
    SELECT CAST(n_buckets AS BIGINT) AS n_buckets,
           CAST(max_bucket AS BIGINT) AS max_bucket,
           ROUND(2.0 * POW({_DD_GAMMA}, b50) / ({_DD_GAMMA} + 1.0), 4)
             AS p50_sketch,
           ROUND(ABS(2.0 * POW({_DD_GAMMA}, b50) / ({_DD_GAMMA} + 1.0) - q50)
                 / q50, 6) AS p50_rel_err,
           ROUND(2.0 * POW({_DD_GAMMA}, b90) / ({_DD_GAMMA} + 1.0), 4)
             AS p90_sketch,
           ROUND(ABS(2.0 * POW({_DD_GAMMA}, b90) / ({_DD_GAMMA} + 1.0) - q90)
                 / q90, 6) AS p90_rel_err,
           ROUND(2.0 * POW({_DD_GAMMA}, b99) / ({_DD_GAMMA} + 1.0), 4)
             AS p99_sketch,
           ROUND(ABS(2.0 * POW({_DD_GAMMA}, b99) / ({_DD_GAMMA} + 1.0) - q99)
                 / q99, 6) AS p99_rel_err
    FROM est CROSS JOIN exact
    """,
)
def agg_ddsketch_quantile_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A DDSketch-style quantile sketch, fully verified: values map
    to log buckets ceil(ln x / ln gamma) with gamma=1.02, bucket
    counts merge as plain sums (the mergeability that t-digest only
    approximates), and quantile q reads the first bucket whose
    cumulative count reaches ceil(q n); the midpoint estimate
    2 gamma^b/(gamma+1) is then within (gamma-1)/(gamma+1) ~ 1% of
    the true value BY CONSTRUCTION — and this query reports the
    measured relative error against the exact percentiles
    side-by-side. Spark's approx_percentile is the production tier
    (`agg_approx_percentile`, rows-only); this one the engine can
    prove.

    Shape: one map-side-combined groupBy to O(buckets ~ hundreds);
    the cumulative walk and the exact comparison run on that reduced
    table (the exact percentile is the oracle-side luxury — at
    100 TB you'd ship only the sketch)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    lg = math.log(_DD_GAMMA)
    buckets = o.groupBy(
        F.ceil(F.log("o_totalprice") / lg).cast("long").alias("b")
    ).agg(F.count(F.lit(1)).alias("c"))
    cum = buckets.select(
        "b",
        "c",
        F.sum("c").over(Window.orderBy("b")).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )

    def pick(q: float):
        return F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("b"))
        )

    est = cum.agg(
        pick(0.5).alias("b50"),
        pick(0.9).alias("b90"),
        pick(0.99).alias("b99"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("c").alias("max_bucket"),
    )
    exact = o.agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("q50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("q90"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("q99"),
    )

    def sk(b):
        return 2.0 * F.pow(F.lit(_DD_GAMMA), F.col(b)) / (_DD_GAMMA + 1.0)

    j = est.crossJoin(F.broadcast(exact))
    return j.select(
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.col("max_bucket").cast("long").alias("max_bucket"),
        F.round(sk("b50"), 4).alias("p50_sketch"),
        F.round(F.abs(sk("b50") - F.col("q50")) / F.col("q50"), 6).alias(
            "p50_rel_err"
        ),
        F.round(sk("b90"), 4).alias("p90_sketch"),
        F.round(F.abs(sk("b90") - F.col("q90")) / F.col("q90"), 6).alias(
            "p90_rel_err"
        ),
        F.round(sk("b99"), 4).alias("p99_sketch"),
        F.round(F.abs(sk("b99") - F.col("q99")) / F.col("q99"), 6).alias(
            "p99_rel_err"
        ),
    )


_DPM_CLIP = 100.0
_DPM_EPS = 1.0


@register(
    "privacy_dp_mean_clipped",
    oracle=f"""
    WITH base AS (
      SELECT event_type, value,
             LEAST(GREATEST(value, 0.0), {_DPM_CLIP}) AS clipped
      FROM events
    ),
    agg AS (
      SELECT event_type,
             COUNT(*) AS n,
             AVG(value) AS true_mean,
             SUM(clipped) AS s_clip,
             SUM(CASE WHEN value > {_DPM_CLIP} OR value < 0.0
                      THEN 1 ELSE 0 END) AS n_clipped
      FROM base GROUP BY event_type
    ),
    noised AS (
      SELECT event_type, n, true_mean, n_clipped,
             s_clip + (CASE WHEN u1 < 0.5 THEN 1.0 ELSE -1.0 END)
                      * ({_DPM_CLIP} / ({_DPM_EPS} / 2.0))
                      * LN(1.0 - 2.0 * ABS(u1 - 0.5)) AS noisy_sum,
             n + (CASE WHEN u2 < 0.5 THEN 1.0 ELSE -1.0 END)
                 * (1.0 / ({_DPM_EPS} / 2.0))
                 * LN(1.0 - 2.0 * ABS(u2 - 0.5)) AS noisy_n
      FROM (
        SELECT *,
          (('0x' || substr(md5('dpm1:' || event_type), 1, 8))::BIGINT + 0.5)
            / 4294967296.0 AS u1,
          (('0x' || substr(md5('dpm2:' || event_type), 1, 8))::BIGINT + 0.5)
            / 4294967296.0 AS u2
        FROM agg
      )
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           CAST(n_clipped AS BIGINT) AS n_clipped,
           ROUND(true_mean, 4) AS true_mean,
           ROUND(noisy_sum / noisy_n, 4) AS dp_mean,
           ROUND(ABS(noisy_sum / noisy_n - true_mean), 4) AS abs_error
    FROM noised
    """,
)
def privacy_dp_mean_clipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially private mean, the textbook recipe: clip each
    contribution to [0, C] (bounding sensitivity), add Laplace(C/
    (eps/2)) to the clipped sum and Laplace(1/(eps/2)) to the count
    (half the budget each), release noisy_sum / noisy_count. The
    clipped-row count is the utility bookkeeping (clipping bias is
    the price of bounded sensitivity). Laplace draws are the
    sign-log inverse CDF of md5-derived uniforms — the mechanism
    itself is oracle-verified, as with the DP count/histogram/
    quantile/top-k siblings. Swap a seeded RNG for release.

    Shape: one conditional-aggregate scan to O(groups); noise is
    O(groups) scalar math."""
    ev = load_table(spark, sf_dir, "events")
    clipped = F.least(F.greatest(F.col("value"), F.lit(0.0)), F.lit(_DPM_CLIP))
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("true_mean"),
        F.sum(clipped).alias("s_clip"),
        F.sum(
            ((F.col("value") > _DPM_CLIP) | (F.col("value") < 0.0)).cast(
                "long"
            )
        ).alias("n_clipped"),
    )

    def unif(tag: str):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(tag), F.col("event_type"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            + 0.5
        ) / 4294967296.0

    def lap(u, b: float):
        return (
            F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
            * F.lit(b)
            * F.log(F.lit(1.0) - 2.0 * F.abs(u - 0.5))
        )

    noisy_sum = F.col("s_clip") + lap(unif("dpm1:"), _DPM_CLIP / (_DPM_EPS / 2.0))
    noisy_n = F.col("n") + lap(unif("dpm2:"), 1.0 / (_DPM_EPS / 2.0))
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.col("n_clipped").cast("long").alias("n_clipped"),
        F.round("true_mean", 4).alias("true_mean"),
        F.round(noisy_sum / noisy_n, 4).alias("dp_mean"),
        F.round(F.abs(noisy_sum / noisy_n - F.col("true_mean")), 4).alias(
            "abs_error"
        ),
    )


@register(
    "timeseries_stl_anomaly_mad",
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
    interior AS (SELECT * FROM trended WHERE wn = 7),
    seasonal AS (
      SELECT ISODOW(d) AS dow, AVG(y - trend) AS s
      FROM interior GROUP BY 1
    ),
    rem AS (
      SELECT i.d, i.y, i.trend, s.s,
             i.y - i.trend - s.s AS r
      FROM interior i JOIN seasonal s ON s.dow = ISODOW(i.d)
    ),
    mad AS (
      SELECT median(ABS(r - (SELECT median(r) FROM rem))) AS m,
             (SELECT median(r) FROM rem) AS med
      FROM rem
    ),
    ranked AS (
      SELECT rem.d, rem.y, rem.r,
             (rem.r - mad.med) / (1.4826 * mad.m) AS rz,
             ROW_NUMBER() OVER (
               ORDER BY ABS((rem.r - mad.med) / (1.4826 * mad.m)) DESC, rem.d
             ) AS rnk
      FROM rem CROSS JOIN mad
    )
    SELECT d AS day,
           CAST(y AS BIGINT) AS n_events,
           ROUND(r, 4) AS remainder,
           ROUND(rz, 4) AS robust_z,
           ABS(rz) > 3.0 AS is_anomaly
    FROM ranked WHERE rnk <= 3
    """,
)
def timeseries_stl_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-aware anomaly detection: decompose the daily series
    into centered-7-day-MA trend + day-of-week seasonal indexes
    (the `timeseries_classical_decompose` machinery), then flag days
    whose REMAINDER exceeds 3 robust sigmas (1.4826 MAD) — so a busy
    Monday doesn't alert just for being Monday, which is exactly the
    false-alarm class a raw z-score monitor (`dq_anomaly_volume_
    spike`) pays. This composition — decompose, then MAD on the
    residual — is the standard production anomaly recipe (cf.
    Twitter's Seasonal-Hybrid ESD).

    Shape: N events reduce to O(days) once; windows, seasonal
    means, the MAD, and the flags all run on the reduced series."""
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
    iso_dow = ((F.dayofweek("d") + 5) % 7) + 1
    seasonal = trended.groupBy(iso_dow.alias("dow")).agg(
        F.avg(F.col("y") - F.col("trend")).alias("s")
    )
    rem = trended.join(
        F.broadcast(seasonal), iso_dow == F.col("dow")
    ).select(
        "d",
        "y",
        (F.col("y") - F.col("trend") - F.col("s")).alias("r"),
    )
    med = rem.agg(F.percentile("r", F.lit(0.5)).alias("med"))
    mad = (
        rem.crossJoin(F.broadcast(med))
        .agg(
            F.percentile(F.abs(F.col("r") - F.col("med")), F.lit(0.5)).alias(
                "m"
            ),
            F.first("med").alias("med"),
        )
    )
    rz = (F.col("r") - F.col("med")) / (1.4826 * F.col("m"))
    ranked = rem.crossJoin(F.broadcast(mad)).select(
        "d",
        "y",
        "r",
        rz.alias("rz"),
        F.row_number()
        .over(Window.orderBy(F.desc(F.abs(rz)), "d"))
        .alias("rnk"),
    )
    # always report the top-3 most anomalous days (flagged against
    # the 3-sigma line): a healthy series still yields a non-empty,
    # hash-checkable result instead of an empty gate
    return ranked.where(F.col("rnk") <= 3).select(
        F.col("d").alias("day"),
        F.col("y").cast("long").alias("n_events"),
        F.round("r", 4).alias("remainder"),
        F.round("rz", 4).alias("robust_z"),
        (F.abs("rz") > 3.0).alias("is_anomaly"),
    )


@register(
    "dq_embedding_coverage",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents),
    e AS (
      SELECT vec_id, len(embedding) AS dim,
             list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x),
                            'sum') AS sq
      FROM embeddings
    ),
    j AS (
      SELECT d.doc_id, e.vec_id, e.dim, e.sq
      FROM d FULL OUTER JOIN e ON e.vec_id = d.doc_id
    )
    SELECT CAST(COUNT(doc_id) AS BIGINT) AS n_documents,
           CAST(COUNT(vec_id) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_missing_vector,
           CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS orphan_vectors,
           CAST(SUM(CASE WHEN dim IS NOT NULL AND dim <> 64
                         THEN 1 ELSE 0 END) AS BIGINT) AS wrong_dim,
           CAST(SUM(CASE WHEN sq IS NOT NULL AND sq = 0.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_norm,
           CAST(SUM(CASE WHEN sq IS NOT NULL AND isnan(sq)
                         THEN 1 ELSE 0 END) AS BIGINT) AS nan_vectors
    FROM j
    """,
)
def dq_embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents<->embeddings referential and health audit: docs with
    no vector, vectors with no doc, wrong-dimension rows, zero-norm
    vectors (cosine would divide by zero), NaN contamination — the
    integrity gate a feature store runs before any training job is
    allowed to read the pair. One full-outer join on the id plus
    per-vector O(d) expression work; at 100 TB both sides bucket on
    the id and the join is co-partitioned.

    On healthy fixtures every failure column is 0 — which is the
    point: this query is the proof, re-checked every ingest."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("sq"),
    )
    j = d.join(e, d["doc_id"] == e["vec_id"], "full_outer")
    return j.agg(
        F.count("doc_id").cast("long").alias("n_documents"),
        F.count("vec_id").cast("long").alias("n_vectors"),
        F.sum(F.col("vec_id").isNull().cast("long")).cast("long").alias(
            "docs_missing_vector"
        ),
        F.sum(F.col("doc_id").isNull().cast("long")).cast("long").alias(
            "orphan_vectors"
        ),
        F.sum(
            (F.col("dim").isNotNull() & (F.col("dim") != 64)).cast("long")
        )
        .cast("long")
        .alias("wrong_dim"),
        F.sum(
            (F.col("sq").isNotNull() & (F.col("sq") == 0.0)).cast("long")
        )
        .cast("long")
        .alias("zero_norm"),
        F.sum((F.col("sq").isNotNull() & F.isnan("sq")).cast("long"))
        .cast("long")
        .alias("nan_vectors"),
    )
