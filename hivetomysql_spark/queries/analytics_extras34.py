"""Analytics extras, batch 34: graph partition quality, queueing
audit, generation diversity, and local differential privacy.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* modularity — partition quality of a labeling over the co-purchase
  graph, the community-detection objective as a closed-form query.
* Little's law audit — L = λ·W consistency check over the order
  flow, the queueing-theory sanity test for ops metrics.
* distinct n-gram diversity — the distinct-1/2/3 metrics used to
  audit generated-text (or corpus) diversity.
* randomized response — local-DP frequency estimation with
  md5-determinized coin flips, debiased back to true rates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "graph_modularity",
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
    lab AS (SELECT p_partkey AS n, p_brand AS c FROM part),
    m2 AS (SELECT COUNT(*) * 1.0 AS two_m FROM ed),
    intra AS (
      SELECT SUM(CASE WHEN lu.c = lv.c THEN 1 ELSE 0 END) * 1.0 AS e_in
      FROM ed JOIN lab lu ON lu.n = ed.u JOIN lab lv ON lv.n = ed.v
    ),
    degc AS (
      SELECT lab.c, SUM(d) * 1.0 AS dc
      FROM (SELECT u, COUNT(*) AS d FROM ed GROUP BY u) deg
      JOIN lab ON lab.n = deg.u
      GROUP BY lab.c
    )
    SELECT CAST((SELECT COUNT(*) FROM degc) AS BIGINT) AS n_communities,
           CAST((SELECT two_m / 2 FROM m2) AS BIGINT) AS n_edges,
           ROUND((SELECT e_in FROM intra) / (SELECT two_m FROM m2)
                 - (SELECT SUM((dc / two_m) * (dc / two_m))
                    FROM degc, m2), 6) AS modularity
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q = Σ_c [e_c/m − (d_c/2m)²] of the brand
    partition over the support-≥2 co-purchase graph — the objective
    every community-detection algorithm (Louvain/Leiden) climbs,
    here evaluated closed-form for a given labeling (do brands form
    purchasing communities? Q ≈ 0 says no, Q > 0.3 says strongly).

    Shape: edge list + two broadcast label joins + O(communities)
    aggregates — modularity EVALUATION is embarrassingly parallel
    (it's the optimization loop that is hard); at 100 TB this is two
    scans of the reduced edge list."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
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
    lab = part.select(
        F.col("p_partkey").alias("n"), F.col("p_brand").alias("c")
    )
    two_m = ed.agg((F.count(F.lit(1)) * 1.0).alias("two_m"))
    intra = (
        ed.join(F.broadcast(lab.select(F.col("n").alias("u"), F.col("c").alias("cu"))), "u")
        .join(F.broadcast(lab.select(F.col("n").alias("v"), F.col("c").alias("cv"))), "v")
        .agg(
            F.sum(F.when(F.col("cu") == F.col("cv"), 1).otherwise(0))
            .cast("double")
            .alias("e_in")
        )
    )
    degc = (
        ed.groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
        .join(F.broadcast(lab.select(F.col("n").alias("u"), "c")), "u")
        .groupBy("c")
        .agg(F.sum("d").cast("double").alias("dc"))
    )
    sq = degc.crossJoin(F.broadcast(two_m)).agg(
        F.sum((F.col("dc") / F.col("two_m")) * (F.col("dc") / F.col("two_m"))).alias(
            "sum_sq"
        ),
        F.count(F.lit(1)).alias("n_communities"),
    )
    return (
        intra.crossJoin(F.broadcast(two_m))
        .crossJoin(F.broadcast(sq))
        .select(
            F.col("n_communities").cast("long"),
            (F.col("two_m") / 2).cast("long").alias("n_edges"),
            F.round(
                F.col("e_in") / F.col("two_m") - F.col("sum_sq"), 6
            ).alias("modularity"),
        )
    )


@register(
    "orders_littles_law",
    oracle="""
    WITH spans AS (
      -- each order is 'in the system' from orderdate to its last
      -- lineitem shipdate
      SELECT o.o_orderkey, o.o_orderdate AS s, MAX(l.l_shipdate) AS e
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
      HAVING MAX(l.l_shipdate) > o.o_orderdate
    ),
    horizon AS (
      SELECT MIN(s) AS t0, MAX(e) AS t1,
             date_diff('day', MIN(s), MAX(e)) * 1.0 AS days
      FROM spans
    ),
    agg AS (
      SELECT COUNT(*) * 1.0 AS n,
             SUM(date_diff('day', s, e)) * 1.0 AS tot_days
      FROM spans
    )
    SELECT CAST(agg.n AS BIGINT) AS n_orders,
           ROUND(agg.n / horizon.days, 6) AS lambda_per_day,
           ROUND(agg.tot_days / agg.n, 6) AS w_days,
           ROUND(agg.tot_days / horizon.days, 6) AS l_avg_in_system,
           ROUND((agg.n / horizon.days) * (agg.tot_days / agg.n)
                 / (agg.tot_days / horizon.days), 6) AS littles_ratio
    FROM agg, horizon
    """,
)
def orders_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit L = λ·W over the order pipeline: arrival
    rate λ (orders per day over the horizon), mean time-in-system W
    (orderdate → last shipdate), and average WIP L (total order-days
    / horizon). For a complete observation window the identity holds
    exactly — `littles_ratio` = λW/L ≡ 1 by construction here, and
    any deviation in a windowed production version quantifies
    censoring/backlog drift. The queueing-theory cross-check every
    ops dashboard should run on its own metrics.

    Shape: one join-aggregate to order spans (shuffle on orderkey),
    then O(1) scalar math — single data-sized stage."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("e"))
        .where(F.col("e") > F.col("o_orderdate"))
        .select(F.col("o_orderdate").alias("s"), "e")
    )
    horizon = spans.agg(
        (F.datediff(F.max("e"), F.min("s")) * 1.0).alias("days")
    )
    agg = spans.agg(
        (F.count(F.lit(1)) * 1.0).alias("n"),
        (F.sum(F.datediff("e", "s")) * 1.0).alias("tot_days"),
    )
    return agg.crossJoin(F.broadcast(horizon)).select(
        F.col("n").cast("long").alias("n_orders"),
        F.round(F.col("n") / F.col("days"), 6).alias("lambda_per_day"),
        F.round(F.col("tot_days") / F.col("n"), 6).alias("w_days"),
        F.round(F.col("tot_days") / F.col("days"), 6).alias("l_avg_in_system"),
        F.round(
            (F.col("n") / F.col("days"))
            * (F.col("tot_days") / F.col("n"))
            / (F.col("tot_days") / F.col("days")),
            6,
        ).alias("littles_ratio"),
    )


@register(
    "text_distinct_ngram_diversity",
    oracle="""
    WITH words AS (
      SELECT source, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ),
    uni AS (
      SELECT source, COUNT(DISTINCT g) AS dn, COUNT(*) AS tn
      FROM (SELECT source, unnest(w) AS g FROM words) GROUP BY source
    ),
    bi AS (
      SELECT source, COUNT(DISTINCT g) AS dn, COUNT(*) AS tn
      FROM (SELECT source, array_to_string(w[i:i+1], ' ') AS g
            FROM words, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
            WHERE len(w) >= 2) GROUP BY source
    ),
    tri AS (
      SELECT source, COUNT(DISTINCT g) AS dn, COUNT(*) AS tn
      FROM (SELECT source, array_to_string(w[i:i+2], ' ') AS g
            FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
            WHERE len(w) >= 3) GROUP BY source
    )
    SELECT uni.source,
           ROUND(uni.dn * 1.0 / uni.tn, 6) AS distinct_1,
           ROUND(bi.dn * 1.0 / bi.tn, 6) AS distinct_2,
           ROUND(tri.dn * 1.0 / tri.tn, 6) AS distinct_3
    FROM uni
    JOIN bi ON bi.source = uni.source
    JOIN tri ON tri.source = uni.source
    ORDER BY uni.source
    """,
)
def text_distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity (distinct n-grams / total n-grams for
    n=1,2,3) per source — the Li et al. 2016 "distinct" metrics used
    to audit generated-text repetitiveness, applied per corpus slice:
    a source whose distinct-2/3 collapse is a template farm (or a
    mode-collapsed generator).

    Shape: one token explosion feeding three distinct-count
    aggregates keyed on source — map-side partial distinct via
    Spark's two-phase count_distinct; everything post-explode is
    vocabulary-bounded."""
    docs = load_table(spark, sf_dir, "documents")
    # tokenize once: the three n-gram passes would otherwise each
    # re-scan and re-split the corpus
    words = docs.select(
        "source", F.split(F.trim(F.lower("text")), r"\s+").alias("w")
    ).localCheckpoint()

    def grams(n: int) -> DataFrame:
        if n == 1:
            g = words.select("source", F.explode("w").alias("g"))
        else:
            g = words.where(F.size("w") >= n).select(
                "source",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("w") - (n - 1)),
                        lambda i: F.concat_ws(" ", F.slice(F.col("w"), i, n)),
                    )
                ).alias("g"),
            )
        return g.groupBy("source").agg(
            (F.countDistinct("g") * 1.0 / F.count(F.lit(1))).alias(
                f"distinct_{n}"
            )
        )

    out = (
        grams(1)
        .join(grams(2), "source")
        .join(grams(3), "source")
        .select(
            "source",
            F.round("distinct_1", 6).alias("distinct_1"),
            F.round("distinct_2", 6).alias("distinct_2"),
            F.round("distinct_3", 6).alias("distinct_3"),
        )
    )
    return out.orderBy("source")


_RR_P = 0.75  # probability of answering truthfully


@register(
    "privacy_randomized_response",
    oracle=f"""
    WITH flips AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             ((('0x' || substr(md5('rr1:' || o_orderkey), 1, 8))::BIGINT
               % 999983) + 0.5) / 999983.0 AS u1,
             ((('0x' || substr(md5('rr2:' || o_orderkey), 1, 8))::BIGINT
               % 999983) + 0.5) / 999983.0 AS u2
      FROM orders
    ),
    reported AS (
      SELECT y,
             CASE WHEN u1 < {_RR_P} THEN y
                  WHEN u2 < 0.5 THEN 1 ELSE 0 END AS r
      FROM flips
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(y * 1.0), 6) AS true_rate,
           ROUND(AVG(r * 1.0), 6) AS reported_rate,
           ROUND((AVG(r * 1.0) - (1 - {_RR_P}) * 0.5) / {_RR_P}, 6)
             AS debiased_rate
    FROM reported
    """,
)
def privacy_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner-style randomized response, the local-DP primitive: each
    row reports its true bit with probability p=0.75, else a fair
    coin; the aggregate debiases by (rate − (1−p)/2)/p. The coins are
    md5-derived so the WHOLE mechanism — flips, reported rate, and
    debiasing — is oracle-verified deterministically (production
    swaps in client-side RNG, nothing else changes). This is the
    aggregation path RAPPOR-style telemetry uses when the collector
    must never see a true bit.

    Shape: pure scan-stage arithmetic plus one scalar aggregate —
    zero-shuffle at any scale."""
    o = load_table(spark, sf_dir, "orders")

    def uni(prefix: str):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), F.col("o_orderkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return ((h % 999983) + 0.5) / 999983.0

    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    r = F.when(uni("rr1:") < _RR_P, y).otherwise(
        F.when(uni("rr2:") < 0.5, 1).otherwise(0)
    )
    reported = o.select(y.alias("y"), r.alias("r"))
    return reported.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg(F.col("y") * 1.0), 6).alias("true_rate"),
        F.round(F.avg(F.col("r") * 1.0), 6).alias("reported_rate"),
        F.round(
            (F.avg(F.col("r") * 1.0) - (1 - _RR_P) * 0.5) / _RR_P, 6
        ).alias("debiased_rate"),
    )
