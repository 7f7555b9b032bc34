"""Analytics extras, batch 38: receivables aging, PR curves, local
graph structure, and randomization inference.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* AR aging buckets — open-order value by age band at a snapshot,
  the finance-ops workhorse report.
* precision/recall curve — threshold sweep over score deciles, the
  imbalanced-data complement of the ROC.
* local clustering coefficient — per-node triangle closure rate,
  averaged (Watts-Strogatz C).
* permutation (randomization) test — md5-determinized label
  reshuffles completing the bootstrap/jackknife resampling family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "orders_ar_aging",
    oracle="""
    WITH snap AS (SELECT MAX(o_orderdate) AS asof FROM orders),
    open_o AS (
      SELECT o_totalprice AS amt,
             date_diff('day', o_orderdate, snap.asof) AS age
      FROM orders, snap
      WHERE o_orderstatus = 'O'
    ),
    bucketed AS (
      SELECT CASE WHEN age <= 30 THEN '0-30'
                  WHEN age <= 90 THEN '31-90'
                  WHEN age <= 365 THEN '91-365'
                  ELSE '365+' END AS bucket,
             amt
      FROM open_o
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(amt), 2) AS open_value,
           ROUND(SUM(amt) / (SELECT SUM(amt) FROM bucketed), 6)
             AS value_share
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def orders_ar_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounts-receivable aging: open orders bucketed by age at the
    snapshot date (latest order date), with value and share per band
    — the report every finance-ops team refreshes daily, and the
    input to bad-debt provisioning (older buckets provision more).

    Shape: one max-date pass broadcast into a bucketing scan, one
    4-row aggregate — two scans at any scale; at 100 TB the
    `o_orderstatus` filter should ride partition pruning on a
    status-partitioned layout."""
    o = load_table(spark, sf_dir, "orders")
    snap = o.agg(F.max("o_orderdate").alias("asof"))
    open_o = (
        o.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(snap))
        .select(
            F.col("o_totalprice").alias("amt"),
            F.datediff("asof", "o_orderdate").alias("age"),
        )
    )
    bucketed = open_o.select(
        F.when(F.col("age") <= 30, "0-30")
        .when(F.col("age") <= 90, "31-90")
        .when(F.col("age") <= 365, "91-365")
        .otherwise("365+")
        .alias("bucket"),
        "amt",
    )
    tot = bucketed.agg(F.sum("amt").alias("t"))
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("amt"), 2).alias("open_value"),
            F.sum("amt").alias("_raw"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_orders",
            "open_value",
            F.round(F.col("_raw") / F.col("t"), 6).alias("value_share"),
        )
        .orderBy("bucket")
    )


@register(
    "ml_precision_recall_curve",
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
    cum AS (
      SELECT decile,
             SUM(n) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
               AS cn,
             SUM(pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
               AS cpos,
             (SELECT SUM(pos) FROM per) AS tp
      FROM per
    )
    SELECT CAST(decile AS BIGINT) AS threshold_decile,
           ROUND(cpos * 1.0 / cn, 6) AS precision,
           ROUND(cpos * 1.0 / tp, 6) AS recall,
           ROUND(2.0 * (cpos * 1.0 / cn) * (cpos * 1.0 / tp)
                 / ((cpos * 1.0 / cn) + (cpos * 1.0 / tp)), 6) AS f1
    FROM cum
    ORDER BY threshold_decile
    """,
)
def ml_precision_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 at 10 score-decile thresholds ("flag the
    top-k deciles"): the threshold-sweep table behind PR curves and
    operating-point selection — the evaluation that matters under
    class imbalance where ROC flatters. (Independent score ⇒
    precision ≈ base rate at every threshold on this fixture.)

    Shape: one NTILE rank window, one O(10) aggregate + running
    sums — identical cost profile to `ml_lift_gains_table`, and at
    scale the rank is the range-partitioned two-level form."""
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
    tot = per.agg(F.sum("pos").alias("tp"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.crossJoin(F.broadcast(tot)).select(
        "decile",
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cpos"),
        "tp",
    )
    prec = F.col("cpos") * 1.0 / F.col("cn")
    rec = F.col("cpos") * 1.0 / F.col("tp")
    return cum.select(
        F.col("decile").cast("long").alias("threshold_decile"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(2.0 * prec * rec / (prec + rec), 6).alias("f1"),
    ).orderBy("threshold_decile")


@register(
    "graph_clustering_coefficient",
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
    deg AS MATERIALIZED (SELECT u, COUNT(*) AS d FROM ed GROUP BY u),
    tri AS (
      -- triangles per node: wedges at the node closed by an edge
      SELECT e1.u AS n, COUNT(*) AS t2
      FROM ed e1
      JOIN ed e2 ON e2.u = e1.u AND e2.v > e1.v
      JOIN epair e3 ON e3.u = e1.v AND e3.v = e2.v
      GROUP BY e1.u
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes_deg2,
           ROUND(AVG(COALESCE(t2, 0) * 2.0 / (d * (d - 1))), 6)
             AS avg_clustering,
           CAST(SUM(COALESCE(t2, 0)) / 3 AS BIGINT) AS n_triangles
    FROM deg LEFT JOIN tri ON tri.n = deg.u
    WHERE d >= 2
    """,
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average local clustering coefficient (Watts-Strogatz C) of the
    support-≥2 co-purchase graph: per node, the fraction of its
    neighbor pairs that are themselves connected (closed wedges /
    possible wedges), averaged over nodes with degree ≥ 2 — THE
    small-world diagnostic, and a per-node feature for fraud/community
    models.

    Shape: the wedge enumeration joins on the apex node and closes
    with one edge-list join (ordered v1 < v2 so each triangle counts
    once per apex) — Σ deg² bounded by the support-2 sparsification,
    same budget as `graph_triangle_count`; degree table is O(V)."""
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
        .localCheckpoint()
    )
    ed = epair.union(
        epair.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    deg = ed.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    e1 = ed.select(F.col("u"), F.col("v").alias("v1"))
    e2 = ed.select(F.col("u"), F.col("v").alias("v2"))
    wedge = e1.join(e2, "u").where(F.col("v2") > F.col("v1"))
    tri = (
        wedge.join(
            epair.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
            ["v1", "v2"],
        )
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("t2"))
    )
    joined = deg.join(tri, "u", "left").where(F.col("d") >= 2)
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes_deg2"),
        F.round(
            F.avg(
                F.coalesce(F.col("t2"), F.lit(0))
                * 2.0
                / (F.col("d") * (F.col("d") - 1))
            ),
            6,
        ).alias("avg_clustering"),
        (F.sum(F.coalesce(F.col("t2"), F.lit(0))) / 3)
        .cast("long")
        .alias("n_triangles"),
    )


_PERM_R = 64


@register(
    "stats_permutation_test",
    oracle=f"""
    WITH base AS (
      SELECT value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
             event_id
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    obs AS (
      SELECT AVG(CASE WHEN grp = 1 THEN value END)
             - AVG(CASE WHEN grp = 0 THEN value END) AS d_obs,
             AVG(grp * 1.0) AS p1
      FROM base
    ),
    reps AS (SELECT UNNEST(RANGE(0, {_PERM_R})) AS rep),
    seeded AS (
      SELECT value,
             ('0x' || substr(md5('perm:' || event_id), 1, 15))::BIGINT
               % 999983 AS s
      FROM base
    ),
    perm AS (
      -- randomization test: replicate r reassigns each row to group
      -- 1 with the observed group-1 rate, via the shared md5 seed
      SELECT r.rep,
             CASE WHEN (((b.s * (7919 + 104729 * r.rep)) % 999983) + 0.5)
                       / 999983.0 < obs.p1
                  THEN 1 ELSE 0 END AS g,
             b.value
      FROM seeded b CROSS JOIN reps r CROSS JOIN obs
    ),
    null_d AS (
      SELECT rep,
             AVG(CASE WHEN g = 1 THEN value END)
             - AVG(CASE WHEN g = 0 THEN value END) AS d
      FROM perm GROUP BY rep
    )
    SELECT CAST({_PERM_R} AS BIGINT) AS n_replicates,
           ROUND((SELECT d_obs FROM obs), 6) AS observed_diff,
           ROUND(AVG(ABS(d)), 6) AS null_mean_abs,
           ROUND((SUM(CASE WHEN ABS(d) >= ABS((SELECT d_obs FROM obs))
                           THEN 1.0 ELSE 0.0 END) + 1.0)
                 / ({_PERM_R} + 1.0), 6) AS p_value
    FROM null_d
    """,
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization (permutation) test for the purchase-vs-click
    mean value difference: 64 label reshuffles (each row reassigned
    with the observed group rate via md5-determinized coins), p-value
    = (1 + #{|d_null| ≥ |d_obs|}) / (R + 1) — the
    distribution-free complement of `stats_ab_welch`, and the third
    member of the resampling family (bootstrap → SE, jackknife →
    bias, permutation → p-value). Deterministic coins make the
    whole inference oracle-checkable.

    Shape: one observed-stat pass, then a ×R in-row fan-out into a
    groupBy(rep) with map-side combine (same plan as
    `stats_poisson_bootstrap`) — no data-sized shuffle at any R."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.where(F.col("event_type").isin("purchase", "click")).select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "grp"
        ),
        "event_id",
    )
    obs = base.agg(
        (
            F.avg(F.when(F.col("grp") == 1, F.col("value")))
            - F.avg(F.when(F.col("grp") == 0, F.col("value")))
        ).alias("d_obs"),
        F.avg(F.col("grp") * 1.0).alias("p1"),
    )
    s = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("perm:"), F.col("event_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 999983
    )
    rep = F.explode(F.sequence(F.lit(0), F.lit(_PERM_R - 1))).alias("rep")
    # digest hoisted BELOW the generator: one md5 per input row, not
    # per (row, rep) — same fix as stats_poisson_bootstrap
    seeded = (
        base.select("value", s.alias("s"))
        .select("value", "s", rep)
        .crossJoin(F.broadcast(obs))
    )
    u = (
        (F.col("s") * (7919 + 104729 * F.col("rep"))) % 999983 + 0.5
    ) / 999983.0
    perm = seeded.select(
        "rep",
        F.when(u < F.col("p1"), 1).otherwise(0).alias("g"),
        "value",
        "d_obs",
    )
    null_d = perm.groupBy("rep").agg(
        (
            F.avg(F.when(F.col("g") == 1, F.col("value")))
            - F.avg(F.when(F.col("g") == 0, F.col("value")))
        ).alias("d"),
        F.first("d_obs").alias("d_obs"),
    )
    return null_d.agg(
        F.lit(_PERM_R).cast("long").alias("n_replicates"),
        F.round(F.first("d_obs"), 6).alias("observed_diff"),
        F.round(F.avg(F.abs("d")), 6).alias("null_mean_abs"),
        F.round(
            (
                F.sum(
                    F.when(
                        F.abs("d") >= F.abs(F.col("d_obs")), 1.0
                    ).otherwise(0.0)
                )
                + 1.0
            )
            / (_PERM_R + 1.0),
            6,
        ).alias("p_value"),
    )
