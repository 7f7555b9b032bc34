"""Analytics extras, batch 16: quantile normalization via
applyInPandas, RFM segment migration, power analysis, and invoice
reconciliation.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's feature-engineering /
segmentation / experimentation / data-quality tiers:

* quantile normalization — per-group values mapped onto the global
  quantile ladder (the omics/feature-pipeline distribution fix),
  implemented as an Arrow-batched applyInPandas grouped-map with the
  interpolation oracled in SQL;
* RFM migration — spend-quartile transition matrix between periods,
  the segmentation-dynamics view behind "are our best customers
  downgrading";
* power analysis — required n per arm for a target lift from
  observed variance, the pre-experiment sizing formula;
* invoice reconciliation — header-vs-lines amount audit (and in
  these fixtures it FINDS the inconsistency: o_totalprice is not
  derivable from lineitem, which is exactly what the audit is for).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_QN_POINTS = 101


def _qn_ladder_sql() -> str:
    pts = ", ".join(f"{i / 100.0}" for i in range(_QN_POINTS))
    return f"quantile_cont(value, [{pts}])"


@register(
    "groupedmap_quantile_normalize",
    oracle=f"""
    WITH ladder AS (
      SELECT {_qn_ladder_sql()} AS q FROM events
    ),
    pr AS (
      SELECT event_type, value,
             PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value)
               AS pr
      FROM events
    ),
    norm AS (
      SELECT event_type,
             q[CAST(FLOOR(pr * 100) AS BIGINT) + 1]
             + (pr * 100 - FLOOR(pr * 100))
               * (q[LEAST(CAST(FLOOR(pr * 100) AS BIGINT) + 2,
                          {_QN_POINTS})]
                  - q[CAST(FLOOR(pr * 100) AS BIGINT) + 1]) AS v
      FROM pr CROSS JOIN ladder
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(v), 3) AS mean_norm,
           ROUND(STDDEV_SAMP(v), 3) AS std_norm,
           ROUND(MIN(v), 3) AS min_norm,
           ROUND(MAX(v), 3) AS max_norm
    FROM norm GROUP BY event_type
    """,
)
def groupedmap_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization: each group's values are replaced by the
    GLOBAL value at the same within-group percent-rank (linear
    interpolation on a 101-point global quantile ladder) — after it,
    every event_type has the same marginal distribution, the standard
    cross-batch/cross-array normalization from omics pipelines
    applied to feature columns.

    Implementation is the Pandas-UDF path done right: the global
    ladder is one collected percentile array closed over by an
    Arrow-batched applyInPandas grouped-map (rank + np.interp per
    group, vectorized — never a row-at-a-time UDF); groups
    parallelize across executors and per-group state is the O(101)
    ladder. The oracle reproduces rank + interpolation in pure SQL,
    so the UDF's math is verified against a UDF-free formulation."""
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    ladder = (
        ev.agg(
            F.percentile(
                "value", F.array(*[F.lit(i / 100.0) for i in range(_QN_POINTS)])
            ).alias("q")
        ).collect()[0]["q"]
    )
    ladder = [float(x) for x in ladder]

    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("v", DoubleType()),
        ]
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n == 1:
            pr = pd.Series([0.0])
        else:
            pr = (pdf["value"].rank(method="min") - 1.0) / (n - 1.0)
        # same interpolation arithmetic as the SQL oracle: floor
        # index + fractional blend on the 101-point ladder
        idx = np.floor(pr * 100).astype(int)
        frac = pr * 100 - idx
        lo = np.asarray(ladder)[idx]
        hi = np.asarray(ladder)[np.minimum(idx + 1, _QN_POINTS - 1)]
        v = lo + frac.to_numpy() * (hi - lo)
        return pd.DataFrame(
            {"event_type": pdf["event_type"], "v": v}
        )

    norm = ev.groupBy("event_type").applyInPandas(normalize, schema)
    return norm.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("v"), 3).alias("mean_norm"),
        F.round(F.stddev_samp("v"), 3).alias("std_norm"),
        F.round(F.min("v"), 3).alias("min_norm"),
        F.round(F.max("v"), 3).alias("max_norm"),
    )


_RFM_SPLIT = "1998-01-01"


@register(
    "event_rfm_migration_matrix",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey,
             CASE WHEN o_orderdate < TIMESTAMP '{_RFM_SPLIT}' THEN 1 ELSE 2 END
               AS period,
             SUM(o_totalprice) AS s
      FROM orders GROUP BY 1, 2
    ),
    tiled AS (
      SELECT o_custkey, period,
             NTILE(4) OVER (PARTITION BY period ORDER BY s DESC, o_custkey)
               AS quartile
      FROM spend
    ),
    m AS (
      SELECT a.quartile AS q_from, b.quartile AS q_to
      FROM tiled a JOIN tiled b
        ON a.o_custkey = b.o_custkey AND a.period = 1 AND b.period = 2
    )
    SELECT CAST(q_from AS BIGINT) AS q_from,
           CAST(q_to AS BIGINT) AS q_to,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM m GROUP BY q_from, q_to
    """,
)
def event_rfm_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-migration matrix: customers are spend-quartiled (NTILE
    4, deterministic custkey tie-break) independently in two periods
    (split at 1998-01-01), and the matrix counts who moved where —
    the dynamics view that static RFM (segment_rfm) cannot show:
    a heavy diagonal means stable segments, mass below it means your
    best customers are downgrading.

    Shape: one grouped pass to (customer, period) spend, two small
    NTILE windows partitioned by period, one self-join on customer —
    all O(customers) after the first aggregate."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    spend = o.groupBy(
        "o_custkey",
        F.when(F.col("o_orderdate") < F.lit(_RFM_SPLIT).cast("timestamp"), 1)
        .otherwise(2)
        .alias("period"),
    ).agg(F.sum("o_totalprice").alias("s"))
    tiled = spend.select(
        "o_custkey",
        "period",
        F.ntile(4)
        .over(
            Window.partitionBy("period").orderBy(F.desc("s"), "o_custkey")
        )
        .alias("quartile"),
    )
    a = tiled.where(F.col("period") == 1).select(
        "o_custkey", F.col("quartile").alias("q_from")
    )
    b = tiled.where(F.col("period") == 2).select(
        F.col("o_custkey").alias("ck2"), F.col("quartile").alias("q_to")
    )
    m = a.join(b, a["o_custkey"] == b["ck2"])
    return m.groupBy("q_from", "q_to").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    ).select(
        F.col("q_from").cast("long").alias("q_from"),
        F.col("q_to").cast("long").alias("q_to"),
        "n_customers",
    )


@register(
    "stats_power_analysis",
    oracle="""
    WITH g AS (
      SELECT event_type,
             COUNT(*) AS n,
             AVG(value) AS mu,
             VAR_SAMP(value) AS v
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_observed,
           ROUND(mu, 4) AS mean_value,
           CAST(CEIL(2.0 * v * (1.96 + 0.84) * (1.96 + 0.84)
                     / (0.05 * mu * 0.05 * mu)) AS BIGINT) AS n_per_arm_5pct,
           CAST(CEIL(2.0 * v * (1.96 + 0.84) * (1.96 + 0.84)
                     / (0.01 * mu * 0.01 * mu)) AS BIGINT) AS n_per_arm_1pct
    FROM g
    """,
)
def stats_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-experiment sample sizing: n per arm = 2σ²(z_{α/2}+z_β)²/δ²
    for α=0.05 two-sided, 80% power (z=1.96, 0.84), at minimum
    detectable effects of 5% and 1% of the current mean — the
    capacity-planning number every A/B platform quotes before an
    experiment is approved, from the same one-scan sufficient
    statistics as the test itself.

    Shape: one conditional aggregate to O(metrics); the sizing
    formula is scalar math."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("mu"),
        F.var_samp("value").alias("v"),
    )
    zsum_sq = (1.96 + 0.84) * (1.96 + 0.84)

    def n_per_arm(mde_frac: float):
        delta = mde_frac * F.col("mu")
        return F.ceil(2.0 * F.col("v") * zsum_sq / (delta * delta)).cast("long")

    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_observed"),
        F.round("mu", 4).alias("mean_value"),
        n_per_arm(0.05).alias("n_per_arm_5pct"),
        n_per_arm(0.01).alias("n_per_arm_1pct"),
    )


@register(
    "dq_invoice_reconciliation",
    oracle="""
    WITH l AS (
      SELECT l_orderkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS line_total
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o.o_orderpriority AS priority,
             o.o_totalprice,
             l.line_total,
             abs(o.o_totalprice - l.line_total)
               / GREATEST(o.o_totalprice, 0.01) AS rel_gap
      FROM orders o JOIN l ON l.l_orderkey = o.o_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN rel_gap <= 0.01 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_within_1pct,
           ROUND(median(rel_gap), 4) AS median_rel_gap,
           ROUND(MAX(rel_gap), 4) AS max_rel_gap
    FROM j GROUP BY priority
    """,
)
def dq_invoice_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-lines reconciliation: o_totalprice against the
    recomputed sum(extendedprice·(1-disc)·(1+tax)) per order, with
    the relative-gap distribution by priority class. On real TPC-H
    data the books balance; on THESE fixtures the audit correctly
    reports that header totals are NOT derivable from lines (median
    relative gap ~40%) — which is precisely the finding such an audit
    exists to surface before anyone joins the two as if consistent.

    Shape: reduce lineitem to order grain BEFORE the join (the
    reduce-then-join pattern), then one grouped rollup; both
    shuffles key on orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    l_tot = li.groupBy("l_orderkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ),
            2,
        ).alias("line_total")
    )
    j = o.join(l_tot, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.col("o_orderpriority").alias("priority"),
        (
            F.abs(F.col("o_totalprice") - F.col("line_total"))
            / F.greatest(F.col("o_totalprice"), F.lit(0.01))
        ).alias("rel_gap"),
    )
    return j.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("rel_gap") <= 0.01, 1).otherwise(0))
        .cast("long")
        .alias("n_within_1pct"),
        F.round(F.percentile("rel_gap", F.lit(0.5)), 4).alias("median_rel_gap"),
        F.round(F.max("rel_gap"), 4).alias("max_rel_gap"),
    )
