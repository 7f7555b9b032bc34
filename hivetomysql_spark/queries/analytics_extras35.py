"""Analytics extras, batch 35: targeting economics, embedding drift,
heavy tails, and graph mixing structure.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* cumulative gains / lift table — the decile targeting-economics
  view every campaign model ships with.
* embedding centroid drift — per-label centroid displacement between
  two corpus halves, the embedding-space drift monitor.
* Hill tail index — the heavy-tail exponent estimator for revenue /
  latency distributions.
* degree assortativity — do hubs link to hubs? The Pearson degree
  correlation over edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "ml_lift_gains_table",
    oracle="""
    WITH scored AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             NTILE(10) OVER (ORDER BY o_totalprice DESC, o_orderkey)
               AS decile
      FROM orders
    ),
    per AS (
      SELECT decile, COUNT(*) AS n, SUM(y) AS pos
      FROM scored GROUP BY decile
    ),
    tot AS (SELECT SUM(n) AS tn, SUM(pos) AS tp FROM per)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n AS BIGINT) AS n,
           CAST(pos AS BIGINT) AS n_pos,
           ROUND(SUM(pos) OVER (ORDER BY decile
                                ROWS UNBOUNDED PRECEDING) * 1.0 / tot.tp, 6)
             AS cum_gain,
           ROUND((pos * 1.0 / n) / (tot.tp * 1.0 / tot.tn), 6) AS lift
    FROM per, tot
    ORDER BY decile
    """,
)
def ml_lift_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains and lift by score decile (score = order value
    ranked desc, target = finished status): cum_gain is the share of
    all positives captured by the top-k deciles, lift is each
    decile's positive rate over the base rate — the table that
    decides how deep a campaign should mail. (Independent score ⇒
    lift ≈ 1 everywhere on this fixture; the metric plumbing is
    what's verified.)

    Shape: one NTILE rank window (range-partitionable at scale), one
    O(10) aggregate + running sum — two passes regardless of size."""
    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        F.ntile(10)
        .over(Window.orderBy(F.desc("o_totalprice"), "o_orderkey"))
        .alias("decile"),
    )
    per = scored.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    tot = per.agg(F.sum("n").alias("tn"), F.sum("pos").alias("tp"))
    cum = F.sum("pos").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("long"),
            F.col("n").cast("long"),
            F.col("pos").cast("long").alias("n_pos"),
            F.round(cum * 1.0 / F.col("tp"), 6).alias("cum_gain"),
            F.round(
                (F.col("pos") * 1.0 / F.col("n"))
                / (F.col("tp") * 1.0 / F.col("tn")),
                6,
            ).alias("lift"),
        )
        .orderBy("decile")
    )


_DRIFT_DIMS = 64


@register(
    "embedding_drift_centroids",
    oracle=f"""
    WITH halves AS (
      SELECT label, vec_id < 250 AS is_a, embedding::DOUBLE[] AS x
      FROM embeddings
    ),
    cents AS (
      SELECT label, is_a,
             [{", ".join(f"AVG(x[{j + 1}])" for j in range(_DRIFT_DIMS))}]
               AS c,
             COUNT(*) AS n
      FROM halves GROUP BY label, is_a
    ),
    paired AS (
      SELECT a.label, a.n AS n_a, b.n AS n_b,
             sqrt(list_dot_product(
               list_transform(range(1, {_DRIFT_DIMS + 1}),
                              i -> a.c[i] - b.c[i]),
               list_transform(range(1, {_DRIFT_DIMS + 1}),
                              i -> a.c[i] - b.c[i]))) AS shift
      FROM cents a JOIN cents b ON a.label = b.label
      WHERE a.is_a AND NOT b.is_a
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(shift, 6) AS centroid_shift
    FROM paired
    ORDER BY label
    """,
)
def embedding_drift_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: per-label centroid displacement (L2)
    between two corpus halves (vec_id < 250 vs rest — standing in for
    'last week vs this week') — the cheapest meaningful detector for
    embedding-space drift after a model or pipeline change; a large
    shift on one label flags re-embedding or upstream data change.

    Shape: one scan computing 64 per-dimension means per (label,
    half) — map-side combined, O(labels·dims) output — then O(labels)
    vector math. No explode, no shuffle of vectors."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "label",
        (F.col("vec_id") < 250).alias("is_a"),
        F.transform("embedding", lambda v: v.cast("double")).alias("x"),
    )
    cents = e.groupBy("label", "is_a").agg(
        F.array(
            *[F.avg(F.element_at("x", j + 1)) for j in range(_DRIFT_DIMS)]
        ).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    a = cents.where("is_a").select(
        "label", F.col("c").alias("ca"), F.col("n").alias("n_a")
    )
    b = cents.where("NOT is_a").select(
        "label", F.col("c").alias("cb"), F.col("n").alias("n_b")
    )
    diff = F.zip_with("ca", "cb", lambda p, q: p - q)
    shift = F.sqrt(
        F.aggregate(
            F.transform(diff, lambda d: d * d),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        a.join(b, "label")
        .select(
            F.col("label").cast("long"),
            F.col("n_a").cast("long"),
            F.col("n_b").cast("long"),
            F.round(shift, 6).alias("centroid_shift"),
        )
        .orderBy("label")
    )


_HILL_K = 100


@register(
    "finance_hill_tail_index",
    oracle=f"""
    WITH topk AS (
      SELECT o_totalprice AS x,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
               AS rk
      FROM orders
    ),
    sel AS (SELECT x, rk FROM topk WHERE rk <= {_HILL_K + 1}),
    xmin AS (SELECT x AS xk FROM sel WHERE rk = {_HILL_K + 1})
    SELECT CAST({_HILL_K} AS BIGINT) AS k,
           ROUND((SELECT xk FROM xmin), 4) AS threshold,
           ROUND(1.0 / (SUM(LN(sel.x / xmin.xk)) / {_HILL_K}), 6)
             AS hill_alpha
    FROM sel, xmin
    WHERE sel.rk <= {_HILL_K}
    """,
)
def finance_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the heavy-tail exponent α over the top-100
    order values: α̂ = k / Σ ln(x_(i)/x_(k+1)) — the standard tail
    estimator for revenue, latency, and claim-size distributions;
    α ≤ 2 means infinite variance (plan capacity by quantiles, not
    means), large α means the tail is thin and mean-based planning is
    safe.

    Shape: top-(k+1) selection is a TakeOrdered O(k) reduction (no
    global sort at scale), then O(k) log math — the data-sized stage
    is a single scan."""
    o = load_table(spark, sf_dir, "orders")
    topk = (
        o.select("o_totalprice", "o_orderkey")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(_HILL_K + 1)
        .select(
            F.col("o_totalprice").alias("x"),
            F.row_number()
            .over(Window.orderBy(F.desc("o_totalprice"), "o_orderkey"))
            .alias("rk"),
        )
    )
    xmin = topk.where(F.col("rk") == _HILL_K + 1).select(
        F.col("x").alias("xk")
    )
    return (
        topk.where(F.col("rk") <= _HILL_K)
        .crossJoin(F.broadcast(xmin))
        .agg(
            F.lit(_HILL_K).cast("long").alias("k"),
            F.round(F.first("xk"), 4).alias("threshold"),
            F.round(
                1.0 / (F.sum(F.log(F.col("x") / F.col("xk"))) / _HILL_K), 6
            ).alias("hill_alpha"),
        )
    )


@register(
    "graph_assortativity",
    oracle="""
    WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    epair AS MATERIALIZED (
      SELECT a.p AS u, b.p AS v
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= 2
    ),
    ed AS MATERIALIZED (
      SELECT u, v FROM epair UNION ALL SELECT v, u FROM epair
    ),
    deg AS (SELECT u, COUNT(*) * 1.0 AS d FROM ed GROUP BY u)
    SELECT CAST(COUNT(*) / 2 AS BIGINT) AS n_edges,
           ROUND(CORR(du.d, dv.d), 6) AS assortativity
    FROM ed
    JOIN deg du ON du.u = ed.u
    JOIN deg dv ON dv.u = ed.v
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the support-≥2 co-purchase graph: the
    Pearson correlation of endpoint degrees over the directed edge
    list (Newman 2002) — positive means hubs prefer hubs (social-like
    mixing), negative means hubs bind the periphery (technological /
    hub-and-spoke mixing), and the sign decides which failure and
    marketing-seeding models apply.

    Shape: degree table + two joins back to the edge list + one
    correlation aggregate — all keyed on node id, no iteration."""
    li = load_table(spark, sf_dir, "lineitem")
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint()
    )
    a = op.select("o", F.col("p").alias("u"))
    b = op.select("o", F.col("p").alias("v"))
    epair = (
        a.join(b, "o")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("nco"))
        .where(F.col("nco") >= 2)
        .select("u", "v")
    )
    ed = epair.union(
        epair.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    deg = ed.groupBy("u").agg((F.count(F.lit(1)) * 1.0).alias("d"))
    return (
        ed.join(deg.select(F.col("u"), F.col("d").alias("du")), "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v"
        )
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
            F.round(F.corr("du", "dv"), 6).alias("assortativity"),
        )
    )
