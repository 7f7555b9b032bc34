"""Analytics extras, batch 78: min-max feature scaling.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); SURVEY.md §2.2 extension-tier entry:

* min-max scaling — per-group [0,1] rescaling of customer spend:
  the remaining classic feature scaler next to the registry's
  z-score (`groupedmap_zscore`), quantile
  (`feature_quantile_binning`), NTILE (`feature_ntile_binning`),
  and whitening (`embedding_standardize_dims`) tiers; min-max is
  what bounded-input models (neural nets, distance metrics over
  mixed units) actually consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "feature_minmax_scaling",
    oracle="""
    WITH spend AS (
      SELECT c.c_nationkey AS nationkey, o.o_custkey,
             SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    scaled AS (
      SELECT nationkey, o_custkey, cents,
             MIN(cents) OVER (PARTITION BY nationkey) AS mn,
             MAX(cents) OVER (PARTITION BY nationkey) AS mx
      FROM spend
    )
    SELECT nationkey, o_custkey,
           CAST(cents AS BIGINT) AS spend_cents,
           ROUND((cents - mn) * 1.0 / (mx - mn), 6) AS minmax_scaled
    FROM scaled
    WHERE nationkey < 5 AND mx > mn
    """,
)
def feature_minmax_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max scaling of customer spend WITHIN each nation:
    (x - min)/(max - min) onto [0, 1] — the bounded-range scaler
    that distance-based models and neural inputs consume (z-scores
    are unbounded; quantiles destroy spacing). Spend travels as
    integer cents so min/max/differences are exact; only the final
    ratio is floating point. Degenerate groups (max = min) are
    excluded rather than emitting 0/0 — the correctness detail naive
    pipelines NaN on. Output limited to five nations to keep the
    gate row count bounded.

    Shape: one fact reduce to customer grain, two window extremes
    per group, scan-stage arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"), "o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("cents")
        )
    )
    wn = Window.partitionBy("nationkey")
    scaled = spend.select(
        "nationkey",
        "o_custkey",
        "cents",
        F.min("cents").over(wn).alias("mn"),
        F.max("cents").over(wn).alias("mx"),
    )
    return scaled.where(
        (F.col("nationkey") < 5) & (F.col("mx") > F.col("mn"))
    ).select(
        "nationkey",
        "o_custkey",
        F.col("cents").cast("long").alias("spend_cents"),
        F.round(
            (F.col("cents") - F.col("mn")) * 1.0 / (F.col("mx") - F.col("mn")),
            6,
        ).alias("minmax_scaled"),
    )
