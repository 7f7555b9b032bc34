"""Analytics extras, batch 14: growth accounting, inventory reorder
points, and rare-category redaction.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's product-analytics / operations /
privacy tiers:

* user lifecycle — monthly growth accounting (new / retained /
  resurrected / churned), the canonical active-user bridge;
* reorder point — mu*L + z*sigma*sqrt(L) safety-stock math per part
  from daily demand statistics;
* rare-category redaction — small categories collapse into OTHER
  before release (the k-threshold suppression rule that complements
  privacy_k_anonymity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "event_user_lifecycle",
    oracle="""
    WITH am AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(date_diff('day', DATE '1970-01-01',
                                  CAST(ts AS DATE)) / 7.0) AS BIGINT) AS m
      FROM events
    ),
    seq AS (
      SELECT user_id, m,
             MIN(m) OVER (PARTITION BY user_id) AS first_m,
             LAG(m) OVER (PARTITION BY user_id ORDER BY m) AS prev_m
      FROM am
    ),
    flows AS (
      SELECT m,
             SUM(CASE WHEN m = first_m THEN 1 ELSE 0 END) AS n_new,
             SUM(CASE WHEN prev_m = m - 1 THEN 1 ELSE 0 END) AS n_retained,
             SUM(CASE WHEN prev_m IS NOT NULL AND prev_m < m - 1
                      THEN 1 ELSE 0 END) AS n_resurrected
      FROM seq GROUP BY m
    ),
    churn AS (
      SELECT a.m + 1 AS m, COUNT(*) AS n_churned
      FROM am a LEFT JOIN am b
        ON b.user_id = a.user_id AND b.m = a.m + 1
      WHERE b.user_id IS NULL AND a.m < (SELECT MAX(m) FROM am)
      GROUP BY a.m + 1
    )
    SELECT CAST(f.m AS BIGINT) AS week_no,
           CAST(f.n_new AS BIGINT) AS n_new,
           CAST(f.n_retained AS BIGINT) AS n_retained,
           CAST(f.n_resurrected AS BIGINT) AS n_resurrected,
           CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned,
           CAST(f.n_new + f.n_retained + f.n_resurrected AS BIGINT)
             AS n_active
    FROM flows f LEFT JOIN churn c ON c.m = f.m
    """,
)
def event_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: every active user is exactly one of
    new (first week ever), retained (active last week), or
    resurrected (active before, but not last week); churned(w) =
    users active in w-1 and silent in w. The bridge identity
    active(m) = active(m-1) + new + resurrected - churned is what a
    growth team reads weekly (the Social Capital accounting
    framework).

    Shape: the event stream compresses to distinct (user, month) in
    one pass; classification is a per-user lag window on the
    compressed table; churn is an anti-join of consecutive months.
    All shuffles are on user_id / month over O(users x months)
    rows."""
    ev = load_table(spark, sf_dir, "events")
    am = ev.select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) / 7.0
        )
        .cast("long")
        .alias("m"),
    ).distinct()
    w_u = Window.partitionBy("user_id")
    seq = am.select(
        "user_id",
        "m",
        F.min("m").over(w_u).alias("first_m"),
        F.lag("m").over(w_u.orderBy("m")).alias("prev_m"),
    )
    flows = seq.groupBy("m").agg(
        F.sum(F.when(F.col("m") == F.col("first_m"), 1).otherwise(0)).alias("n_new"),
        # when/otherwise, not bool-cast: NULL prev_m makes the
        # comparison NULL, and SUM of all-NULL is NULL (not 0)
        F.sum(F.when(F.col("prev_m") == F.col("m") - 1, 1).otherwise(0)).alias(
            "n_retained"
        ),
        F.sum(
            F.when(
                F.col("prev_m").isNotNull() & (F.col("prev_m") < F.col("m") - 1), 1
            ).otherwise(0)
        ).alias("n_resurrected"),
    )
    max_m = am.agg(F.max("m").alias("max_m"))
    nxt = am.select("user_id", (F.col("m") + 1).alias("m1"))
    churn = (
        am.crossJoin(F.broadcast(max_m))
        .where(F.col("m") < F.col("max_m"))
        .join(
            nxt,
            (am["user_id"] == nxt["user_id"]) & (nxt["m1"] == am["m"] + 1),
            "left_anti",
        )
        .groupBy((F.col("m") + 1).alias("cm"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    out = flows.join(churn, flows["m"] == churn["cm"], "left")
    return out.select(
        F.col("m").cast("long").alias("week_no"),
        F.col("n_new").cast("long").alias("n_new"),
        F.col("n_retained").cast("long").alias("n_retained"),
        F.col("n_resurrected").cast("long").alias("n_resurrected"),
        F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
        (F.col("n_new") + F.col("n_retained") + F.col("n_resurrected"))
        .cast("long")
        .alias("n_active"),
    )


_ROP_LEAD_DAYS = 7
_ROP_Z = 1.645
_ROP_TOP = 20


@register(
    "inventory_reorder_point",
    oracle=f"""
    WITH daily AS (
      SELECT l_partkey,
             CAST(l_shipdate AS DATE) AS d,
             SUM(l_quantity) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    stats AS (
      SELECT l_partkey,
             COUNT(*) AS n_days,
             SUM(q) AS total_q,
             AVG(q) AS mu,
             STDDEV_SAMP(q) AS sigma
      FROM daily GROUP BY l_partkey
    ),
    top AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY total_q DESC, l_partkey) AS rk
      FROM stats
    )
    SELECT l_partkey,
           CAST(n_days AS BIGINT) AS n_demand_days,
           ROUND(mu, 2) AS mu_daily,
           ROUND(sigma, 2) AS sigma_daily,
           ROUND(mu * {_ROP_LEAD_DAYS} + {_ROP_Z} * sigma
                 * sqrt({_ROP_LEAD_DAYS}.0), 2) AS reorder_point
    FROM top WHERE rk <= {_ROP_TOP}
    """,
)
def inventory_reorder_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety-stock reorder points for the top-20 parts by volume:
    ROP = mu_d*L + z*sigma_d*sqrt(L) with a 7-day replenishment lead
    and a 95% service level (z=1.645), from per-part daily demand
    statistics over days with observed demand — the operations-
    research formula a supply chain recomputes nightly over its whole
    catalog.

    Shape: one (part, day) aggregate then one per-part stats pass;
    the top-k is TakeOrdered on the O(parts) stats table. At 100 TB
    the first groupBy is the only fact-table shuffle, keyed on
    partkey (well spread)."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy("l_partkey", F.to_date("l_shipdate").alias("d")).agg(
        F.sum("l_quantity").alias("q")
    )
    stats = daily.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("q").alias("total_q"),
        F.avg("q").alias("mu"),
        F.stddev_samp("q").alias("sigma"),
    )
    top = stats.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("total_q"), "l_partkey"))
        .alias("rk"),
    ).where(F.col("rk") <= _ROP_TOP)
    rop = F.col("mu") * _ROP_LEAD_DAYS + _ROP_Z * F.col("sigma") * F.sqrt(
        F.lit(float(_ROP_LEAD_DAYS))
    )
    return top.select(
        "l_partkey",
        F.col("n_days").cast("long").alias("n_demand_days"),
        F.round("mu", 2).alias("mu_daily"),
        F.round("sigma", 2).alias("sigma_daily"),
        F.round(rop, 2).alias("reorder_point"),
    )


_REDACT_K = 60


@register(
    "privacy_redact_rare_categories",
    oracle=f"""
    WITH counts AS (
      SELECT p_brand, COUNT(*) AS n FROM part GROUP BY p_brand
    ),
    labeled AS (
      SELECT CASE WHEN n >= {_REDACT_K} THEN p_brand ELSE 'OTHER' END
               AS label,
             n
      FROM counts
    )
    SELECT label,
           CAST(SUM(n) AS BIGINT) AS n_parts,
           CAST(COUNT(*) AS BIGINT) AS n_source_categories
    FROM labeled GROUP BY label
    """,
)
def privacy_redact_rare_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-threshold category suppression: brands with fewer than 60
    members collapse into OTHER before the frequency table is
    released — small categories are re-identification handles (a
    brand with 3 parts pinpoints them), and suppressing them is the
    release rule that pairs with privacy_k_anonymity's row-level
    gate. The output keeps the bookkeeping (how many source
    categories each released label absorbs) so utility loss is
    visible.

    Shape: one count aggregate, one relabel, one re-aggregate — all
    O(categories) after the first grouped scan."""
    p = load_table(spark, sf_dir, "part")
    counts = p.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
    labeled = counts.select(
        F.when(F.col("n") >= _REDACT_K, F.col("p_brand"))
        .otherwise("OTHER")
        .alias("label"),
        "n",
    )
    return labeled.groupBy("label").agg(
        F.sum("n").cast("long").alias("n_parts"),
        F.count(F.lit(1)).cast("long").alias("n_source_categories"),
    )
