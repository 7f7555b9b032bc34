"""Analytics extras, batch 77: standardized effect sizes.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); SURVEY.md §2.2 extension-tier entry:

* Cohen's d / Hedges' g — standardized A/B effect sizes per metric:
  the magnitude answer that p-values cannot give (at fleet sample
  sizes everything is 'significant'; d says whether anyone should
  care), with the small-sample bias correction and the conventional
  small/medium/large banding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "stats_cohens_d",
    oracle="""
    WITH g AS (
      SELECT event_type,
             COUNT(*) FILTER (WHERE user_id % 2 = 0) AS n_a,
             COUNT(*) FILTER (WHERE user_id % 2 = 1) AS n_b,
             AVG(value) FILTER (WHERE user_id % 2 = 0) AS m_a,
             AVG(value) FILTER (WHERE user_id % 2 = 1) AS m_b,
             VAR_SAMP(value) FILTER (WHERE user_id % 2 = 0) AS v_a,
             VAR_SAMP(value) FILTER (WHERE user_id % 2 = 1) AS v_b
      FROM events GROUP BY event_type
    ),
    eff AS (
      SELECT event_type, n_a, n_b,
             (m_a - m_b)
             / SQRT(((n_a - 1) * v_a + (n_b - 1) * v_b)
                    / (n_a + n_b - 2.0)) AS d
      FROM g
    )
    SELECT event_type,
           CAST(n_a + n_b AS BIGINT) AS n_total,
           ROUND(d, 6) AS cohens_d,
           ROUND(d * (1.0 - 3.0 / (4.0 * (n_a + n_b) - 9.0)), 6)
             AS hedges_g,
           CASE WHEN ABS(d) < 0.2 THEN 'negligible'
                WHEN ABS(d) < 0.5 THEN 'small'
                WHEN ABS(d) < 0.8 THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM eff
    """,
)
def stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect size per A/B metric: Cohen's d (mean
    difference over the pooled standard deviation) plus Hedges' g
    (the small-sample bias correction d·(1 − 3/(4N−9))) and the
    conventional negligible/small/medium/large banding — the number
    that keeps large-sample 'significance' honest: at fleet scale a
    p-value rejects for effects nobody should act on, and d is what
    the decision should read (the same reason `stats_power_analysis`
    sizes experiments in effect units). Completes the inference kit:
    test (Welch/TOST/Bayesian), correct (BH/Holm), size (this).

    Shape: one conditional-aggregate scan to O(metrics), scalar
    math."""
    ev = load_table(spark, sf_dir, "events")
    a = F.col("user_id") % 2 == 0
    g = ev.groupBy("event_type").agg(
        F.count(F.when(a, 1)).alias("n_a"),
        F.count(F.when(~a, 1)).alias("n_b"),
        F.avg(F.when(a, F.col("value"))).alias("m_a"),
        F.avg(F.when(~a, F.col("value"))).alias("m_b"),
        F.var_samp(F.when(a, F.col("value"))).alias("v_a"),
        F.var_samp(F.when(~a, F.col("value"))).alias("v_b"),
    )
    pooled_sd = F.sqrt(
        (
            (F.col("n_a") - 1) * F.col("v_a")
            + (F.col("n_b") - 1) * F.col("v_b")
        )
        / (F.col("n_a") + F.col("n_b") - 2.0)
    )
    d = (F.col("m_a") - F.col("m_b")) / pooled_sd
    n = F.col("n_a") + F.col("n_b")
    return g.select(
        "event_type",
        n.cast("long").alias("n_total"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * (1.0 - 3.0 / (4.0 * n - 9.0)), 6).alias("hedges_g"),
        F.when(F.abs(d) < 0.2, "negligible")
        .when(F.abs(d) < 0.5, "small")
        .when(F.abs(d) < 0.8, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )
