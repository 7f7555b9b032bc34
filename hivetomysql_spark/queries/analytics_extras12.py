"""Analytics extras, batch 12: Bayesian A/B and linear counting.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); rounds out SURVEY.md §2.2's statistics / sketch tiers:

* Bayesian A/B — Beta(1,1)-posterior conversion comparison with the
  normal approximation, P(A beats B) per metric (the decision-ready
  complement to the frequentist Welch/U/KS family);
* linear counting — the bitmap NDV sketch (Whang et al.) that beats
  HLL at small cardinalities, md5-pinned so the sketch itself is
  oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "stats_bayesian_ab",
    oracle="""
    WITH g AS (
      SELECT event_type,
             COUNT(*) FILTER (WHERE user_id % 2 = 0) AS n_a,
             COUNT(*) FILTER (WHERE user_id % 2 = 0 AND value > 50) AS s_a,
             COUNT(*) FILTER (WHERE user_id % 2 = 1) AS n_b,
             COUNT(*) FILTER (WHERE user_id % 2 = 1 AND value > 50) AS s_b
      FROM events GROUP BY event_type
    ),
    post AS (
      SELECT event_type, n_a, s_a, n_b, s_b,
             (s_a + 1.0) / (n_a + 2.0) AS mu_a,
             (s_b + 1.0) / (n_b + 2.0) AS mu_b,
             ((s_a + 1.0) / (n_a + 2.0)) * (1.0 - (s_a + 1.0) / (n_a + 2.0))
               / (n_a + 3.0) AS v_a,
             ((s_b + 1.0) / (n_b + 2.0)) * (1.0 - (s_b + 1.0) / (n_b + 2.0))
               / (n_b + 3.0) AS v_b
      FROM g
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           ROUND(mu_a, 4) AS conv_a,
           ROUND(mu_b, 4) AS conv_b,
           ROUND(1.0 / (1.0 + exp(-1.702 * (mu_a - mu_b) / sqrt(v_a + v_b))),
                 4) AS p_a_beats_b
    FROM post
    """,
)
def stats_bayesian_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B conversion comparison per event_type: with a
    uniform Beta(1,1) prior the posterior conversion is
    Beta(s+1, n-s+1); P(A beats B) integrates the posterior
    difference, here via the normal approximation (posterior means /
    variances, logistic CDF — identical closed form on both
    engines). Unlike a p-value this is the number a launch decision
    actually wants: the probability A is better.

    Shape: one conditional-count scan to O(metrics) sufficient
    statistics; the posterior algebra is scalar math on the
    aggregate. The normal approximation holds for n in the hundreds+
    (these cells have thousands); below that, swap in Monte-Carlo
    sampling over the broadcast posterior parameters."""
    ev = load_table(spark, sf_dir, "events")
    a = F.col("user_id") % 2 == 0
    conv = F.col("value") > 50
    g = ev.groupBy("event_type").agg(
        F.count(F.when(a, 1)).alias("n_a"),
        F.count(F.when(a & conv, 1)).alias("s_a"),
        F.count(F.when(~a, 1)).alias("n_b"),
        F.count(F.when(~a & conv, 1)).alias("s_b"),
    )
    mu_a = (F.col("s_a") + 1.0) / (F.col("n_a") + 2.0)
    mu_b = (F.col("s_b") + 1.0) / (F.col("n_b") + 2.0)
    v_a = mu_a * (1.0 - mu_a) / (F.col("n_a") + 3.0)
    v_b = mu_b * (1.0 - mu_b) / (F.col("n_b") + 3.0)
    z = (mu_a - mu_b) / F.sqrt(v_a + v_b)
    return g.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(mu_a, 4).alias("conv_a"),
        F.round(mu_b, 4).alias("conv_b"),
        F.round(1.0 / (1.0 + F.exp(-1.702 * z)), 4).alias("p_a_beats_b"),
    )


_LC_M = 1024


@register(
    "agg_linear_counting",
    oracle=f"""
    WITH b AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
               ::BIGINT % {_LC_M} AS bucket
      FROM events
    ),
    v AS (
      SELECT COUNT(*) AS occupied,
             (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_n
      FROM b
    )
    SELECT CAST(exact_n AS BIGINT) AS exact_distinct,
           CAST(occupied AS BIGINT) AS occupied_buckets,
           ROUND(-{_LC_M}.0 * ln(({_LC_M}.0 - occupied) / {_LC_M}.0), 2)
             AS lc_estimate,
           ROUND(abs(-{_LC_M}.0 * ln(({_LC_M}.0 - occupied) / {_LC_M}.0)
                     - exact_n) / exact_n, 4) AS rel_err
    FROM v
    """,
)
def agg_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear counting (Whang et al., TODS'90): distinct users hash
    into a 1024-bit bitmap; NDV_est = -m ln(empty_fraction). At low
    load factors this beats HyperLogLog's error — which is why
    production HLL implementations (including Spark's own
    approx_count_distinct) switch to linear counting below a
    cardinality threshold. The md5-pinned bucket function makes the
    sketch contents — not just the estimate's contract —
    oracle-checkable, alongside the exact count and realized error.

    Shape: the bitmap is a bounded distinct-on-bucket aggregate
    (1024 keys max, fully map-side combinable); merging bitmaps
    across partitions or days is a bitwise OR — the mergeability
    that makes it a streaming/rollup-friendly NDV at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _LC_M
    )
    b = ev.select(bucket.alias("bucket")).distinct()
    occupied = b.agg(F.count(F.lit(1)).alias("occupied"))
    exact = ev.agg(F.countDistinct("user_id").alias("exact_n"))
    v = occupied.crossJoin(exact)
    m = float(_LC_M)
    est = -m * F.log((m - F.col("occupied")) / m)
    return v.select(
        F.col("exact_n").cast("long").alias("exact_distinct"),
        F.col("occupied").cast("long").alias("occupied_buckets"),
        F.round(est, 2).alias("lc_estimate"),
        F.round(F.abs(est - F.col("exact_n")) / F.col("exact_n"), 4).alias(
            "rel_err"
        ),
    )
