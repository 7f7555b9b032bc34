"""Analytics extras, batch 61: parametric survival, re-identification
risk, and rare-combination screening.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* Weibull fit — parametric survival of order fulfillment via the
  log-log linearization of the empirical survivor function (the
  parametric sibling of `stats_kaplan_meier`; shape k tells
  wear-out from infant-mortality).
* re-identification risk — sample uniqueness under growing
  quasi-identifier sets: the % of records unique on the QI combo,
  the standard re-id risk proxy (k-anonymity's dual: k-anon bounds
  the worst group, uniqueness measures the typical exposure).
* rare-combination screen — category pairs whose joint support is
  far below what their marginals predict: data-entry and fraud
  signal that pure frequency screens miss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "ml_weibull_survival_fit",
    oracle="""
    WITH durations AS (
      SELECT o.o_orderkey,
             date_diff('day', o.o_orderdate, MAX(l.l_shipdate)) AS dur
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
      HAVING date_diff('day', o.o_orderdate, MAX(l.l_shipdate)) >= 1
    ),
    surv AS (
      SELECT dur, COUNT(*) AS n_at,
             SUM(COUNT(*)) OVER (ORDER BY dur DESC) AS n_ge,
             SUM(COUNT(*)) OVER () AS n
      FROM durations GROUP BY dur
    ),
    pts AS (
      -- S(t) = P(T >= t); drop S in {1, smallest} tails where the
      -- log-log transform degenerates
      SELECT LN(CAST(dur AS DOUBLE)) AS x,
             LN(-LN(n_ge * 1.0 / n)) AS y
      FROM surv WHERE n_ge < n AND n_ge > 5
    ),
    ols AS (
      SELECT COUNT(*) AS npts,
             (SUM(x * y) - COUNT(*) * AVG(x) * AVG(y))
             / (SUM(x * x) - COUNT(*) * AVG(x) * AVG(x)) AS k,
             AVG(y) AS my, AVG(x) AS mx
      FROM pts
    )
    SELECT CAST((SELECT COUNT(*) FROM durations) AS BIGINT) AS n_orders,
           CAST(npts AS BIGINT) AS n_fit_points,
           ROUND(k, 4) AS shape_k,
           ROUND(EXP(mx - my / k), 4) AS scale_lambda,
           k > 1.0 AS wear_out_regime
    FROM ols
    """,
)
def ml_weibull_survival_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parametric Weibull fit of order-fulfillment durations via the
    classic linearization: if T ~ Weibull(k, lambda) then
    ln(-ln S(t)) = k ln t - k ln lambda, so one closed-form OLS over
    the empirical survivor curve yields shape and scale. Shape k > 1
    means hazard RISES with age (wear-out: old open orders are ever
    more likely to close), k < 1 infant mortality — the distributional
    claim `stats_kaplan_meier`'s nonparametric curve cannot make, and
    the generator behind parametric SLA forecasts.

    Shape: durations reduce per order, the survivor curve per
    distinct duration (O(distinct t) rows), one OLS aggregate."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    durations = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("shipped"))
        .select(
            F.datediff("shipped", "o_orderdate").alias("dur")
        )
        .where(F.col("dur") >= 1)
        .localCheckpoint(eager=False)
    )
    surv = durations.groupBy("dur").agg(F.count(F.lit(1)).alias("n_at"))
    w_desc = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    curve = surv.select(
        "dur",
        F.sum("n_at").over(w_desc).alias("n_ge"),
        F.sum("n_at").over(w_all).alias("n"),
    )
    pts = curve.where(
        (F.col("n_ge") < F.col("n")) & (F.col("n_ge") > 5)
    ).select(
        F.log(F.col("dur").cast("double")).alias("x"),
        F.log(-F.log(F.col("n_ge") * 1.0 / F.col("n"))).alias("y"),
    )
    ols = pts.agg(
        F.count(F.lit(1)).alias("npts"),
        (
            (
                F.sum(F.col("x") * F.col("y"))
                - F.count(F.lit(1)) * F.avg("x") * F.avg("y")
            )
            / (
                F.sum(F.col("x") * F.col("x"))
                - F.count(F.lit(1)) * F.avg("x") * F.avg("x")
            )
        ).alias("k"),
        F.avg("y").alias("my"),
        F.avg("x").alias("mx"),
    )
    n_orders = durations.agg(F.count(F.lit(1)).alias("no"))
    return ols.crossJoin(F.broadcast(n_orders)).select(
        F.col("no").cast("long").alias("n_orders"),
        F.col("npts").cast("long").alias("n_fit_points"),
        F.round("k", 4).alias("shape_k"),
        F.round(F.exp(F.col("mx") - F.col("my") / F.col("k")), 4).alias(
            "scale_lambda"
        ),
        (F.col("k") > 1.0).alias("wear_out_regime"),
    )


@register(
    "privacy_reidentification_risk",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_nationkey,
             c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band
      FROM customer
    ),
    q1 AS (
      SELECT 'nation' AS qi_set, COUNT(*) AS n,
             SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS uniq
      FROM (SELECT COUNT(*) OVER (PARTITION BY c_nationkey) AS cnt FROM base)
    ),
    q2 AS (
      SELECT 'nation+segment' AS qi_set, COUNT(*) AS n,
             SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS uniq
      FROM (SELECT COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment)
              AS cnt FROM base)
    ),
    q3 AS (
      SELECT 'nation+segment+balband' AS qi_set, COUNT(*) AS n,
             SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS uniq
      FROM (SELECT COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment,
                                  bal_band) AS cnt FROM base)
    )
    SELECT qi_set, CAST(n AS BIGINT) AS n_records,
           CAST(uniq AS BIGINT) AS n_unique,
           ROUND(uniq * 1.0 / n, 6) AS uniqueness_rate
    FROM (SELECT * FROM q1 UNION ALL SELECT * FROM q2
          UNION ALL SELECT * FROM q3)
    """,
)
def privacy_reidentification_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-uniqueness re-identification risk under growing
    quasi-identifier sets: the share of customers UNIQUE on
    (nation), (nation, segment), (nation, segment, balance band) —
    the Sweeney-style risk curve showing how fast 'harmless'
    attributes compose into fingerprints. k-anonymity
    (`privacy_k_anonymity`) gates the worst group; uniqueness rate
    measures typical exposure, and its growth across QI sets is the
    number that decides which columns a release may keep.

    Shape: three window-count passes over the dimension (each one
    shuffle on its QI), O(1) rollups."""
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )

    def uniq(name: str, *cols):
        cnt = F.count(F.lit(1)).over(Window.partitionBy(*cols))
        return base.select(cnt.alias("cnt")).agg(
            F.lit(name).alias("qi_set"),
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.sum((F.col("cnt") == 1).cast("long")).cast("long").alias(
                "n_unique"
            ),
            F.round(
                F.sum((F.col("cnt") == 1).cast("long"))
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("uniqueness_rate"),
        )

    return (
        uniq("nation", "c_nationkey")
        .unionByName(uniq("nation+segment", "c_nationkey", "c_mktsegment"))
        .unionByName(
            uniq(
                "nation+segment+balband",
                "c_nationkey",
                "c_mktsegment",
                "bal_band",
            )
        )
    )


@register(
    "dq_categorical_rare_combo",
    oracle="""
    WITH joint AS (
      SELECT c.c_mktsegment AS a, o.o_orderpriority AS b,
             COUNT(*) AS n_joint
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n_joint) AS n FROM joint),
    ma AS (SELECT a, SUM(n_joint) AS na FROM joint GROUP BY a),
    mb AS (SELECT b, SUM(n_joint) AS nb FROM joint GROUP BY b),
    scored AS (
      SELECT j.a, j.b, j.n_joint,
             ma.na * 1.0 * mb.nb / tot.n AS expected,
             j.n_joint / (ma.na * 1.0 * mb.nb / tot.n) AS lift,
             ROW_NUMBER() OVER (
               ORDER BY j.n_joint / (ma.na * 1.0 * mb.nb / tot.n), j.a, j.b
             ) AS rarity_rank
      FROM joint j
      JOIN ma ON ma.a = j.a
      JOIN mb ON mb.b = j.b
      CROSS JOIN tot
    )
    SELECT CAST(rarity_rank AS INT) AS rarity_rank,
           a AS segment, b AS priority,
           CAST(n_joint AS BIGINT) AS n_joint,
           ROUND(expected, 4) AS expected_n,
           ROUND(lift, 4) AS lift,
           lift < 0.5 AS suspicious
    FROM scored WHERE rarity_rank <= 5
    """,
)
def dq_categorical_rare_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-combination screen: category pairs whose JOINT count
    falls far below the independence expectation n_a*n_b/N — the
    'this combination should exist but barely does' signal that
    catches mis-mapped enum codes and fraud patterns which pure
    frequency screens miss (each marginal looks healthy). Reports
    the 5 lowest-lift (segment, priority) cells with the lift < 0.5
    flag; on independent fixtures lift stays near 1 and the flags
    correctly read false.

    Shape: one joined reduce to O(cells), marginals from the cell
    table itself (no second fact scan), O(cells) rank."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joint = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("a"),
            F.col("o_orderpriority").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("n_joint"))
        # pin the O(cells) reduce: marginals/total otherwise re-scan
        # the fact join once per consumer (8 scans in the plan)
        .localCheckpoint(eager=False)
    )
    tot = joint.agg(F.sum("n_joint").alias("n"))
    ma = joint.groupBy("a").agg(F.sum("n_joint").alias("na"))
    mb = joint.groupBy("b").agg(F.sum("n_joint").alias("nb"))
    scored = (
        joint.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
    )
    expected = F.col("na") * 1.0 * F.col("nb") / F.col("n")
    lift = F.col("n_joint") / expected
    ranked = scored.select(
        "a",
        "b",
        "n_joint",
        expected.alias("expected"),
        lift.alias("lift"),
        F.row_number().over(Window.orderBy(lift, "a", "b")).alias(
            "rarity_rank"
        ),
    )
    return ranked.where(F.col("rarity_rank") <= 5).select(
        F.col("rarity_rank").cast("int").alias("rarity_rank"),
        F.col("a").alias("segment"),
        F.col("b").alias("priority"),
        F.col("n_joint").cast("long").alias("n_joint"),
        F.round("expected", 4).alias("expected_n"),
        F.round("lift", 4).alias("lift"),
        (F.col("lift") < 0.5).alias("suspicious"),
    )
