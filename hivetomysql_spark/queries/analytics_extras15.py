"""Analytics extras, batch 15: ratio-metric confidence intervals,
duplicate-transaction detection, and embedding outliers.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's statistics / data-quality /
embedding tiers:

* ratio-metric CI — the delta method for revenue-per-order style
  metrics whose numerator and denominator are correlated per unit
  (naive SE is wrong there; this is the standard experimentation-
  platform fix);
* duplicate transactions — same customer, same amount, within 30
  days: the double-charge / double-load screen;
* Mahalanobis outliers — diagonal-covariance standardized distance
  over the embedding cloud, top-k most anomalous vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "agg_ratio_metrics_ci",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_mktsegment AS seg, c.c_custkey,
             SUM(o.o_totalprice) AS x,
             COUNT(*) AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    st AS (
      SELECT seg,
             COUNT(*) AS n,
             AVG(x) AS mx, AVG(y * 1.0) AS my,
             VAR_SAMP(x) AS vx, VAR_SAMP(y * 1.0) AS vy,
             COVAR_SAMP(x, y * 1.0) AS cxy
      FROM per_cust GROUP BY seg
    )
    SELECT seg,
           CAST(n AS BIGINT) AS n_customers,
           ROUND(mx / my, 4) AS revenue_per_order,
           ROUND(sqrt((vx - 2 * (mx / my) * cxy + (mx / my) * (mx / my) * vy)
                      / n) / my, 4) AS se_delta,
           ROUND(mx / my - 1.96 * sqrt((vx - 2 * (mx / my) * cxy
                 + (mx / my) * (mx / my) * vy) / n) / my, 4) AS ci_lo,
           ROUND(mx / my + 1.96 * sqrt((vx - 2 * (mx / my) * cxy
                 + (mx / my) * (mx / my) * vy) / n) / my, 4) AS ci_hi
    FROM st
    """,
)
def agg_ratio_metrics_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a ratio metric
    (revenue-per-order by segment, unit = customer): because each
    customer contributes to BOTH numerator and denominator, the naive
    per-order SE is wrong; Var(X̄/Ȳ) ≈ (vx - 2r·cov + r²·vy)/(n·Ȳ²)
    is the standard experimentation-platform correction (Deng et al.,
    "Applying the Delta Method in Metric Analytics").

    Shape: one grouped pass to per-unit sufficient statistics, one
    O(units) moment aggregate per segment — the CI math is scalar on
    O(segments) rows. Mergeable moments make this a single-scan
    computation at any scale."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per_cust = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("seg"), "c_custkey")
        .agg(
            F.sum("o_totalprice").alias("x"),
            F.count(F.lit(1)).cast("double").alias("y"),
        )
    )
    st = per_cust.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_samp("x").alias("vx"),
        F.var_samp("y").alias("vy"),
        F.covar_samp("x", "y").alias("cxy"),
    )
    r = F.col("mx") / F.col("my")
    se = (
        F.sqrt(
            (F.col("vx") - 2 * r * F.col("cxy") + r * r * F.col("vy")) / F.col("n")
        )
        / F.col("my")
    )
    return st.select(
        "seg",
        F.col("n").cast("long").alias("n_customers"),
        F.round(r, 4).alias("revenue_per_order"),
        F.round(se, 4).alias("se_delta"),
        F.round(r - 1.96 * se, 4).alias("ci_lo"),
        F.round(r + 1.96 * se, 4).alias("ci_hi"),
    )


@register(
    "dq_duplicate_transactions",
    oracle="""
    SELECT a.o_custkey,
           a.o_orderkey AS orderkey_a,
           b.o_orderkey AS orderkey_b,
           ROUND(a.o_totalprice, 2) AS amount_a,
           ROUND(b.o_totalprice, 2) AS amount_b,
           CAST(abs(date_diff('day', CAST(a.o_orderdate AS DATE),
                              CAST(b.o_orderdate AS DATE))) AS BIGINT)
             AS days_apart
    FROM orders a
    JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND FLOOR(a.o_totalprice / 500) = FLOOR(b.o_totalprice / 500)
     AND a.o_orderkey < b.o_orderkey
    WHERE abs(date_diff('day', CAST(a.o_orderdate AS DATE),
                        CAST(b.o_orderdate AS DATE))) <= 90
    """,
)
def dq_duplicate_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-charge screen: two orders by the same customer in the
    same $500 amount band within 90 days are flagged as suspected
    duplicates — the transactional analogue of near-dup detection,
    and the first report a billing/ingest incident review pulls.

    Shape: a self-join blocked on (custkey, amount-band) — the
    blocking keys make candidate sets tiny, so the join output is
    near-linear; the date-window predicate prunes the rest. At 100 TB
    this is the equi-join + residual-filter pattern, shuffle keyed on
    the blocking pair."""
    o = load_table(spark, sf_dir, "orders")
    a = o.alias("a")
    b = o.alias("b")
    days = F.abs(
        F.datediff(F.to_date("a.o_orderdate"), F.to_date("b.o_orderdate"))
    )
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (
                F.floor(F.col("a.o_totalprice") / 500)
                == F.floor(F.col("b.o_totalprice") / 500)
            )
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .where(days <= 90)
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.o_orderkey").alias("orderkey_a"),
            F.col("b.o_orderkey").alias("orderkey_b"),
            F.round(F.col("a.o_totalprice"), 2).alias("amount_a"),
            F.round(F.col("b.o_totalprice"), 2).alias("amount_b"),
            days.cast("long").alias("days_apart"),
        )
    )


_MAH_TOP = 10


@register(
    "embedding_outlier_mahalanobis",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    dims AS (SELECT i FROM generate_series(1, 64) t(i)),
    st AS (
      SELECT i, AVG(x[i]) AS mu, VAR_SAMP(x[i]) AS v
      FROM e, dims GROUP BY i
    ),
    d AS (
      SELECT e.vec_id,
             SUM((e.x[st.i] - st.mu) * (e.x[st.i] - st.mu) / st.v) AS d2
      FROM e, st GROUP BY e.vec_id
    )
    SELECT vec_id,
           ROUND(sqrt(d2), 3) AS mahalanobis,
           CAST(ROW_NUMBER() OVER (ORDER BY d2 DESC, vec_id) AS INT) AS rank
    FROM d
    ORDER BY d2 DESC, vec_id
    LIMIT {_MAH_TOP}
    """,
)
def embedding_outlier_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cloud outliers by diagonal-covariance Mahalanobis
    distance: each dimension is standardized by its own mean and
    variance, d² = Σ (x_i - mu_i)²/v_i, and the 10 most anomalous
    vectors are reported — the screen that catches corrupted or
    out-of-distribution embeddings before they poison an ANN index
    or a training mix. Diagonal covariance is the honest choice at
    scale: the full 64x64 inverse is cheap here but O(dim²) state
    everywhere, and the diagonal captures per-dim scale drift.

    Shape: per-dim moments via one posexplode aggregate (64 groups),
    broadcast back; the distance is a map-side zip over each vector;
    top-k is TakeOrdered. One scan, one tiny shuffle."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    st = (
        e.select("vec_id", F.posexplode("x").alias("i", "val"))
        .groupBy("i")
        .agg(F.avg("val").alias("mu"), F.var_samp("val").alias("v"))
    )
    ex = e.select("vec_id", F.posexplode("x").alias("i", "val"))
    d = (
        ex.join(F.broadcast(st), "i")
        .groupBy("vec_id")
        .agg(
            F.sum(
                (F.col("val") - F.col("mu"))
                * (F.col("val") - F.col("mu"))
                / F.col("v")
            ).alias("d2")
        )
    )
    ranked = d.select(
        "vec_id",
        F.round(F.sqrt("d2"), 3).alias("mahalanobis"),
        F.row_number().over(Window.orderBy(F.desc("d2"), "vec_id")).alias("rank"),
    )
    return ranked.where(F.col("rank") <= _MAH_TOP)