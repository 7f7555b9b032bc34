"""Analytics extras, batch 42: tail risk, cluster quality, and
sequential-testing discipline.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* VaR / CVaR — historical value-at-risk and expected shortfall of
  daily revenue changes.
* simplified silhouette — per-cluster cohesion vs nearest-other-
  centroid separation for the k-means assignment.
* peeking bias — how often a naive daily-checked A/A "experiment"
  crosses z=1.96 at least once, the number that justifies
  sequential corrections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "finance_var_cvar",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    chg AS (
      SELECT (rev - LAG(rev) OVER (ORDER BY d))
             / LAG(rev) OVER (ORDER BY d) AS r
      FROM daily
    ),
    clean AS (SELECT r FROM chg WHERE r IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(quantile_cont(r, 0.05), 6) AS var_95,
           ROUND(AVG(CASE WHEN r <= (SELECT quantile_cont(r, 0.05)
                                     FROM clean) THEN r END), 6)
             AS cvar_95,
           ROUND(STDDEV_SAMP(r), 6) AS daily_vol
    FROM clean
    """,
)
def finance_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical 95 % value-at-risk and expected shortfall (CVaR) of
    daily revenue relative changes: VaR is the 5th-percentile return,
    CVaR the mean of returns at or below it — the tail-risk pair
    (CVaR is coherent; VaR alone is not) that sizing and hedging
    decisions read together.

    Shape: daily reduce → one lag window over O(days) → percentile +
    conditional mean; everything after the first reduce is
    days-sized."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("d")
    chg = daily.select(
        ((F.col("rev") - F.lag("rev").over(w)) / F.lag("rev").over(w)).alias(
            "r"
        )
    ).where(F.col("r").isNotNull())
    var = chg.agg(F.percentile("r", F.lit(0.05)).alias("v"))
    return (
        chg.crossJoin(F.broadcast(var))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(F.first("v"), 6).alias("var_95"),
            F.round(
                F.avg(F.when(F.col("r") <= F.col("v"), F.col("r"))), 6
            ).alias("cvar_95"),
            F.round(F.stddev_samp("r"), 6).alias("daily_vol"),
        )
    )


_SIL_K = 8
_SIL_DIMS = 64


def _sil_dist_sql(a: str, b: str) -> str:
    return (
        f"sqrt(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        f" + list_dot_product({b}, {b}))"
    )


@register(
    "embedding_cluster_silhouette",
    oracle=f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
    ),
    cents AS MATERIALIZED (
      SELECT vec_id AS cid, x AS cx FROM e WHERE vec_id < {_SIL_K}
    ),
    dists AS (
      SELECT e.vec_id, c.cid, {_sil_dist_sql("e.x", "c.cx")} AS d
      FROM e CROSS JOIN cents c
    ),
    ranked AS (
      SELECT vec_id, cid, d,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid)
               AS rk
      FROM dists
    ),
    ab AS (
      SELECT a.vec_id, a.cid AS cluster, a.d AS a_dist, b.d AS b_dist
      FROM ranked a JOIN ranked b
        ON b.vec_id = a.vec_id AND a.rk = 1 AND b.rk = 2
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(AVG((b_dist - a_dist)
                     / GREATEST(a_dist, b_dist)), 6) AS avg_silhouette,
           ROUND(AVG(a_dist), 4) AS avg_intra_dist
    FROM ab
    GROUP BY cluster
    ORDER BY cluster
    """,
)
def embedding_cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette for the k-means
    assignment used by `embedding_kmeans_assign` (centroids = vectors
    0..7): per point, a = distance to its own centroid, b = distance
    to the nearest OTHER centroid, silhouette = (b−a)/max(a,b);
    averaged per cluster — the standard "are these clusters real"
    report (near 0 ⇒ overlapping, the honest answer for random-ish
    fixtures), at O(N·k) cost instead of exact silhouette's O(N²).

    Shape: broadcast centroids × one scan, a per-point top-2 rank
    over k distances (in-row work), one O(k) aggregate — the exact
    evaluation layout MLlib's ClusteringEvaluator uses."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("x"),
    )
    cents = e.where(F.col("vec_id") < _SIL_K).select(
        F.col("vec_id").alias("cid"), F.col("x").alias("cx")
    )

    def dist(a, b):
        dot = lambda p, q: F.aggregate(  # noqa: E731
            F.zip_with(p, q, lambda u, v: u * v),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.sqrt(dot(a, a) - 2 * dot(a, b) + dot(b, b))

    dists = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", dist(F.col("x"), F.col("cx")).alias("d")
    )
    w = Window.partitionBy("vec_id").orderBy("d", "cid")
    ranked = dists.withColumn("rk", F.row_number().over(w))
    a = ranked.where("rk = 1").select(
        "vec_id", F.col("cid").alias("cluster"), F.col("d").alias("a_dist")
    )
    b = ranked.where("rk = 2").select("vec_id", F.col("d").alias("b_dist"))
    ab = a.join(b, "vec_id")
    return (
        ab.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.round(
                F.avg(
                    (F.col("b_dist") - F.col("a_dist"))
                    / F.greatest("a_dist", "b_dist")
                ),
                6,
            ).alias("avg_silhouette"),
            F.round(F.avg("a_dist"), 4).alias("avg_intra_dist"),
        )
        .select(
            F.col("cluster").cast("long"),
            "n_members",
            "avg_silhouette",
            "avg_intra_dist",
        )
        .orderBy("cluster")
    )


@register(
    "events_ab_peeking_bias",
    oracle="""
    WITH assigned AS (
      SELECT CAST(ts AS DATE) AS d,
             user_id % 2 = 0 AS grp, value
      FROM events
    ),
    daily AS (
      SELECT d, grp, SUM(value) AS s, SUM(value * value) AS ss,
             COUNT(*) AS n
      FROM assigned GROUP BY d, grp
    ),
    cum AS (
      SELECT d, grp,
             SUM(s) OVER (PARTITION BY grp ORDER BY d
                          ROWS UNBOUNDED PRECEDING) AS cs,
             SUM(ss) OVER (PARTITION BY grp ORDER BY d
                           ROWS UNBOUNDED PRECEDING) AS css,
             SUM(n) OVER (PARTITION BY grp ORDER BY d
                          ROWS UNBOUNDED PRECEDING) AS cn
      FROM daily
    ),
    z AS (
      SELECT a.d,
             (a.cs / a.cn - b.cs / b.cn)
             / SQRT((a.css / a.cn - (a.cs / a.cn) * (a.cs / a.cn)) / a.cn
                    + (b.css / b.cn - (b.cs / b.cn) * (b.cs / b.cn)) / b.cn)
               AS zstat
      FROM cum a JOIN cum b ON b.d = a.d AND a.grp AND NOT b.grp
      WHERE a.cn >= 30 AND b.cn >= 30
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_looks,
           CAST(SUM(CASE WHEN ABS(zstat) > 1.96 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_triggers,
           ROUND(MAX(ABS(zstat)), 4) AS max_abs_z,
           ROUND(ABS((SELECT zstat FROM z ORDER BY d DESC LIMIT 1)), 4)
             AS final_abs_z
    FROM z
    """,
)
def events_ab_peeking_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peeking-bias measurement on an A/A split (even vs odd user
    ids, no true effect): the cumulative two-sample z statistic
    evaluated EVERY day, counting how many daily looks would have
    (falsely) crossed |z| > 1.96 — the concrete demonstration of why
    naive repeated significance checks inflate false positives and
    sequential corrections (mSPRT, alpha-spending) exist. The final-
    day z is the legitimate fixed-horizon test for contrast.

    Shape: daily (group × day) sufficient statistics, two cumulative
    windows over O(days), one join per day-pair — nothing data-sized
    after the first reduce, so the whole sequential trace costs one
    extra window over the daily table."""
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.select(
        F.col("ts").cast("date").alias("d"),
        (F.col("user_id") % 2 == 0).alias("grp"),
        "value",
    )
    daily = assigned.groupBy("d", "grp").agg(
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.partitionBy("grp").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = daily.select(
        "d",
        "grp",
        F.sum("s").over(w).alias("cs"),
        F.sum("ss").over(w).alias("css"),
        F.sum("n").over(w).alias("cn"),
    )
    a = cum.where("grp").select(
        "d",
        F.col("cs").alias("csa"),
        F.col("css").alias("cssa"),
        F.col("cn").alias("cna"),
    )
    b = cum.where("NOT grp").select(
        "d",
        F.col("cs").alias("csb"),
        F.col("css").alias("cssb"),
        F.col("cn").alias("cnb"),
    )
    ma = F.col("csa") / F.col("cna")
    mb = F.col("csb") / F.col("cnb")
    va = (F.col("cssa") / F.col("cna") - ma * ma) / F.col("cna")
    vb = (F.col("cssb") / F.col("cnb") - mb * mb) / F.col("cnb")
    z = (
        a.join(b, "d")
        .where((F.col("cna") >= 30) & (F.col("cnb") >= 30))
        .select("d", ((ma - mb) / F.sqrt(va + vb)).alias("zstat"))
    )
    final = (
        z.orderBy(F.desc("d"))
        .limit(1)
        .select(F.abs("zstat").alias("fz"))
    )
    return (
        z.crossJoin(F.broadcast(final))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_looks"),
            F.sum(F.when(F.abs("zstat") > 1.96, 1).otherwise(0))
            .cast("long")
            .alias("n_false_triggers"),
            F.round(F.max(F.abs("zstat")), 4).alias("max_abs_z"),
            F.round(F.first("fz"), 4).alias("final_abs_z"),
        )
    )
