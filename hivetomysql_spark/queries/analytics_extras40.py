"""Analytics extras, batch 40: ANN index tuning, experimentation
variance reduction, and composite supplier scoring.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* ANN recall sweep — recall@5 of the IVF index at nprobe 1/2/4 vs
  exact, the tuning curve that picks the latency/recall operating
  point.
* CUPED — pre-period covariate adjustment, the standard
  experimentation variance-reduction; θ and the measured variance
  drop from sufficient statistics.
* supplier scorecard — min-max-normalized composite of on-time
  rate, price consistency, and volume share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.operators import similarity as S
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_SWEEP_PROBES = (1, 2, 4)


def _ann_sweep_oracle() -> str:
    blocks = []
    for p in _SWEEP_PROBES:
        blocks.append(f"""cand{p} AS (
      SELECT q.query_id, i.vec_id AS neighbor_id
      FROM (SELECT vec_id AS query_id, cell FROM assign
            WHERE prank <= {p} AND vec_id < 10) q
      JOIN indexed i ON i.cell = q.cell AND i.vec_id <> q.query_id
    ),
    top{p} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT cand{p}.query_id, cand{p}.neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY cand{p}.query_id
                 ORDER BY list_dot_product(qa.v, ca.v)
                          / (qa.nrm * ca.nrm) DESC, cand{p}.neighbor_id
               ) AS rank
        FROM cand{p}
        JOIN base qa ON qa.vec_id = cand{p}.query_id
        JOIN base ca ON ca.vec_id = cand{p}.neighbor_id
      ) WHERE rank <= 5
    ),
    rec{p} AS (
      SELECT {p} AS nprobe,
             COUNT(*) * 1.0 / 50.0 AS recall_at_5,
             COUNT(DISTINCT t.query_id) AS n_queries
      FROM top{p} t
      JOIN exact e ON e.query_id = t.query_id
                  AND e.neighbor_id = t.neighbor_id
    )""")
    unions = " UNION ALL ".join(f"SELECT * FROM rec{p}" for p in _SWEEP_PROBES)
    return f"""
    WITH base AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      FROM embeddings
    ),
    cent AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
      FROM (SELECT vec_id, v FROM base ORDER BY vec_id LIMIT 16)
    ),
    assign AS MATERIALIZED (
      SELECT b.vec_id, c.cell,
             ROW_NUMBER() OVER (
               PARTITION BY b.vec_id
               ORDER BY list_dot_product(b.v, c.cv) DESC, c.cell
             ) AS prank
      FROM base b CROSS JOIN cent c
    ),
    indexed AS MATERIALIZED (
      SELECT vec_id, cell FROM assign WHERE prank = 1
    ),
    exact AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.v, b.v)
                          / (q.nrm * b.nrm) DESC, b.vec_id
               ) AS rank
        FROM base q JOIN base b ON b.vec_id <> q.vec_id
        WHERE q.vec_id < 10
      ) WHERE rank <= 5
    ),
    {",".join(blocks)}
    SELECT CAST(nprobe AS BIGINT) AS nprobe,
           CAST(n_queries AS BIGINT) AS n_queries,
           ROUND(recall_at_5, 4) AS recall_at_5
    FROM ({unions})
    ORDER BY nprobe
    """


@register("embedding_ann_recall_sweep", oracle=_ann_sweep_oracle())
def embedding_ann_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN tuning curve: recall@5 of the IVF index (16 cells) at
    nprobe ∈ {{1, 2, 4}} against exact brute force, for 10 query
    vectors — the measurement that picks the operating point on the
    latency/recall frontier BEFORE deploying an index config. Fully
    oracled because the coarse quantizer is deterministic (lowest-id
    centroids, argmax-dot assignment).

    Shape: the assignment table is computed once and reused across
    probe settings; each sweep point re-ranks only its candidate set.
    At 100 TB this is the offline eval job every vector store runs
    per index build — candidates ~ N·nprobe/n_cells per query, never
    all-pairs (the exact side runs on a sampled query set, as
    here)."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = S.cosine_topk_bruteforce(
        emb, query_pred=F.col("__id") < 10, k=5
    ).select("query_id", "neighbor_id")
    rows = None
    for p in _SWEEP_PROBES:
        ivf = S.ivf_cosine_topk(
            emb, query_pred=F.col("__id") < 10, k=5, n_cells=16, nprobe=p
        ).select("query_id", "neighbor_id")
        rec = (
            ivf.join(exact, ["query_id", "neighbor_id"])
            .agg(
                F.lit(p).cast("long").alias("nprobe"),
                F.countDistinct("query_id").cast("long").alias("n_queries"),
                F.round(F.count(F.lit(1)) / 50.0, 4).alias("recall_at_5"),
            )
        )
        rows = rec if rows is None else rows.unionByName(rec)
    return rows.orderBy("nprobe")


@register(
    "events_cuped_adjustment",
    oracle="""
    WITH med AS (
      SELECT quantile_cont(epoch_us(ts), 0.5) AS cut FROM events
    ),
    per_user AS (
      SELECT user_id,
             AVG(CASE WHEN epoch_us(ts) < med.cut THEN value END) AS pre,
             AVG(CASE WHEN epoch_us(ts) >= med.cut THEN value END) AS post
      FROM events, med
      GROUP BY user_id
      HAVING pre IS NOT NULL AND post IS NOT NULL
    ),
    theta AS (
      SELECT COVAR_SAMP(post, pre) / VAR_SAMP(pre) AS th,
             AVG(pre) AS pre_mean
      FROM per_user
    ),
    adj AS (
      SELECT post, post - th * (pre - pre_mean) AS cuped
      FROM per_user, theta
    )
    SELECT CAST((SELECT COUNT(*) FROM per_user) AS BIGINT) AS n_users,
           ROUND((SELECT th FROM theta), 6) AS theta,
           ROUND(AVG(post), 6) AS post_mean,
           ROUND(AVG(cuped), 6) AS cuped_mean,
           ROUND(1.0 - VAR_SAMP(cuped) / VAR_SAMP(post), 6)
             AS variance_reduction
    FROM adj
    """,
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al. 2013): adjust each user's post-period
    metric by θ·(pre − pre-mean) where θ = cov(post, pre)/var(pre) —
    the variance-reduction every mature experimentation platform
    applies before computing treatment effects, because the same
    experiment then needs (1 − var-reduction)× the sample. Reported:
    θ, the unchanged mean (CUPED is mean-preserving by
    construction), and the measured variance drop.

    Shape: one per-user 2-period aggregate, one covariance pass over
    O(users), one adjusted pass — three reduces, nothing data-sized
    after the first."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.agg(F.percentile(F.unix_micros("ts"), F.lit(0.5)).alias("cut"))
    per_user = (
        ev.crossJoin(F.broadcast(med))
        .groupBy("user_id")
        .agg(
            F.avg(
                F.when(F.unix_micros("ts") < F.col("cut"), F.col("value"))
            ).alias("pre"),
            F.avg(
                F.when(F.unix_micros("ts") >= F.col("cut"), F.col("value"))
            ).alias("post"),
        )
        .where(F.col("pre").isNotNull() & F.col("post").isNotNull())
    )
    theta = per_user.agg(
        (F.covar_samp("post", "pre") / F.var_samp("pre")).alias("th"),
        F.avg("pre").alias("pre_mean"),
        F.count(F.lit(1)).alias("n_users"),
    )
    adj = per_user.crossJoin(F.broadcast(theta)).select(
        "post",
        (
            F.col("post") - F.col("th") * (F.col("pre") - F.col("pre_mean"))
        ).alias("cuped"),
        "th",
        "n_users",
    )
    return adj.agg(
        F.first("n_users").cast("long").alias("n_users"),
        F.round(F.first("th"), 6).alias("theta"),
        F.round(F.avg("post"), 6).alias("post_mean"),
        F.round(F.avg("cuped"), 6).alias("cuped_mean"),
        F.round(
            1.0 - F.var_samp("cuped") / F.var_samp("post"), 6
        ).alias("variance_reduction"),
    )


@register(
    "supplier_scorecard",
    oracle="""
    WITH li AS (
      SELECT l_suppkey AS s,
             l_extendedprice * (1 - l_discount) AS rev,
             l_extendedprice / l_quantity AS unit_price,
             CASE WHEN date_diff('day',
                    (SELECT o_orderdate FROM orders o
                     WHERE o.o_orderkey = lineitem.l_orderkey),
                    l_shipdate) <= 60 THEN 1 ELSE 0 END AS on_time
      FROM lineitem
    ),
    per_s AS (
      SELECT s,
             AVG(on_time * 1.0) AS on_time_rate,
             COALESCE(STDDEV_SAMP(unit_price), 0) / AVG(unit_price) AS cv,
             SUM(rev) AS rev
      FROM li GROUP BY s
    ),
    ext AS (
      SELECT MIN(on_time_rate) AS lo_t, MAX(on_time_rate) AS hi_t,
             MIN(cv) AS lo_c, MAX(cv) AS hi_c,
             SUM(rev) AS tot
      FROM per_s
    )
    SELECT CAST(s AS BIGINT) AS s_suppkey,
           ROUND(on_time_rate, 6) AS on_time_rate,
           ROUND(cv, 6) AS price_cv,
           ROUND(rev / ext.tot, 6) AS volume_share,
           ROUND(0.5 * CASE WHEN hi_t = lo_t THEN 1.0
                       ELSE (on_time_rate - lo_t) / (hi_t - lo_t) END
                 + 0.3 * CASE WHEN hi_c = lo_c THEN 1.0
                         ELSE 1.0 - (cv - lo_c) / (hi_c - lo_c) END
                 + 0.2 * rev / ext.tot, 6) AS composite_score
    FROM per_s, ext
    ORDER BY composite_score DESC, s_suppkey
    """,
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite supplier scorecard: 0.5·min-max(on-time-within-60d
    rate) + 0.3·min-max(price consistency = 1 − normalized unit-price
    CV) + 0.2·revenue share — the weighted multi-metric ranking
    procurement reviews run quarterly; min-max normalization keeps
    each component comparable, with degenerate (constant) components
    pinned to 1.

    Shape: one fact scan joined to orders for the ship-lag predicate
    (the correlated lookup decorrelates to an equi-join), one
    supplier reduce, one O(1) extremes pass broadcast back."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    joined = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == o["o_orderkey"],
    ).select(
        F.col("l_suppkey").alias("s"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.when(
            F.datediff("l_shipdate", "o_orderdate") <= 60, 1
        )
        .otherwise(0)
        .alias("on_time"),
    )
    per_s = joined.groupBy("s").agg(
        F.avg(F.col("on_time") * 1.0).alias("on_time_rate"),
        (
            F.coalesce(F.stddev_samp("unit_price"), F.lit(0.0))
            / F.avg("unit_price")
        ).alias("cv"),
        F.sum("rev").alias("rev"),
    )
    ext = per_s.agg(
        F.min("on_time_rate").alias("lo_t"),
        F.max("on_time_rate").alias("hi_t"),
        F.min("cv").alias("lo_c"),
        F.max("cv").alias("hi_c"),
        F.sum("rev").alias("tot"),
    )
    t_norm = F.when(F.col("hi_t") == F.col("lo_t"), 1.0).otherwise(
        (F.col("on_time_rate") - F.col("lo_t"))
        / (F.col("hi_t") - F.col("lo_t"))
    )
    c_norm = F.when(F.col("hi_c") == F.col("lo_c"), 1.0).otherwise(
        1.0 - (F.col("cv") - F.col("lo_c")) / (F.col("hi_c") - F.col("lo_c"))
    )
    return (
        per_s.crossJoin(F.broadcast(ext))
        .select(
            F.col("s").cast("long").alias("s_suppkey"),
            F.round("on_time_rate", 6).alias("on_time_rate"),
            F.round("cv", 6).alias("price_cv"),
            F.round(F.col("rev") / F.col("tot"), 6).alias("volume_share"),
            F.round(
                0.5 * t_norm + 0.3 * c_norm + 0.2 * F.col("rev") / F.col("tot"),
                6,
            ).alias("composite_score"),
        )
        .orderBy(F.desc("composite_score"), "s_suppkey")
    )
