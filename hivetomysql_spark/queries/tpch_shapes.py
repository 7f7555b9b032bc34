"""Classic TPC-H-shaped analytics the reference's users would expect
from a general engine: nation-pair trade volume (Q7), market share
(Q8), customer order-count distribution (Q13), small-quantity revenue
with a correlated per-group average (Q17), disjunctive join predicates
(Q19), and inactive-customer rollup with NOT EXISTS + scalar subquery
(Q22).

The reference (hiveToMysql: HiveToMysql.java single-table dump path)
has no joins or aggregates at all — this module is part of the
extension tier mandated by SURVEY.md §2.2. Each query is written the
way it should run at 100 TB: dimension tables reduced before
touching the fact table (broadcast is left to AQE — customer,
supplier and part all scale with the warehouse, so a forced hint
is an OOM at 100 TB; the fixed 25/5-row nation/region keep theirs), correlated subqueries left to
Catalyst's decorrelation (aggregate + join, never a per-row loop),
disjunctions kept as a single scan predicate so the fact table is
read once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "agg_nation_pair_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM(CAST(volume AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders   o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation  n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation  n2 ON n2.n_nationkey = c.c_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) v
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def agg_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations per year.

    The OR spans both nation roles, so no single-side filter is
    implied automatically — we reduce each dimension chain to the
    two-nation subset *before* it meets the fact table (supplier and
    customer each shrink ~12.5×), then apply the cross-role OR last.
    Both reduced dims join unhinted — AQE broadcasts them while they
    fit and switches to shuffle joins when the nation subsets outgrow
    memory (they are ~1/12.5 of two tables that scale with the
    warehouse; forced-broadcast hints removed in the r10 audit).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    pair = ["NATION_1", "NATION_2"]
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(pair))
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            # DECIMAL ledger, not a float sum: volume has <= 4 true
            # decimal digits, so the per-row decimal(18,4) cast is
            # engine-identical and the sum is exact/associative —
            # ROUND(float_sum, 2) hit a half-case at sf1 (caught by
            # the r8 certification sweep; sf0.01 passed by luck)
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "agg_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part     p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders   o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation  n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region   r ON r.r_regionkey = n1.n_regionkey
      JOIN nation  n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    ) v
    GROUP BY o_year
    """,
)
def agg_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3 suppliers' share of PROMO-part revenue
    sold to ASIA customers, per order year.

    A conditional-sum ratio — one aggregation computes both numerator
    and denominator (never two scans joined back). The selective dims
    (part filtered to one type, customers restricted to one region)
    are reduced first; AQE broadcasts them at fixture scale and
    shuffle-joins them at warehouse scale (they are fixed FRACTIONS
    of scaling tables — the r10 broadcast audit measured all three
    growing 9-10× per 10× step, so the hints are gone).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                n.join(r, F.col("n_regionkey") == F.col("r_regionkey")).select(
                    "n_nationkey"
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "agg_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      GROUP BY c.c_custkey
    ) cc
    GROUP BY c_count
    """,
)
def agg_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of urgent-order counts per customer,
    *including the zero bucket* — the compound left-join condition
    (key equality AND a non-key filter on the preserved-null side)
    keeps every customer, so COUNT(o_orderkey) is 0 for customers
    with no urgent orders. A plain WHERE would silently drop them.
    Two shuffles (join/agg on c_custkey — AQE coalesces, same key
    reused — then the tiny histogram agg).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderpriority") == "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "subquery_correlated_avg",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < 0.5 * (SELECT AVG(l2.l_quantity)
                                FROM lineitem l2
                                WHERE l2.l_partkey = l.l_partkey)
    """,
)
def subquery_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity line items, where
    "small" is relative to each part's own average quantity — a
    correlated scalar subquery.

    Expressed through the SQL surface: Catalyst decorrelates the
    subquery into one per-part aggregate joined back to the filtered
    scan, so lineitem is read twice but never nested-loop probed.
    At 100 TB the decorrelated aggregate shuffles O(parts) rows, not
    O(lineitems).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
        FROM {lineitem} l
        JOIN {part} p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < 0.5 * (SELECT AVG(l2.l_quantity)
                                    FROM {lineitem} l2
                                    WHERE l2.l_partkey = l.l_partkey)
        """,
        lineitem=li,
        part=p,
    )


@register(
    "join_disjunctive_pred",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def join_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    regimes. The disjunction stays a single predicate on one
    broadcast join — never three scans unioned. Catalyst's constraint
    propagation extracts the common implications (p_brand IN (...),
    l_quantity <= 40) and pushes them into each side's scan, so both
    files are pruned before the join evaluates the full OR.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    regime = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    return j.where(regime).agg(
        # DECIMAL ledger: exact sum, engine- and order-independent
        F.round(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(18,4)")
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )


@register(
    "subquery_not_exists_rollup",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_mktsegment
    """,
)
def subquery_not_exists_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no recent orders,
    rolled up by market segment. Combines an uncorrelated scalar
    subquery (global positive-balance average — computed once,
    broadcast into the filter) with a correlated NOT EXISTS
    (decorrelated to a left-anti join on c_custkey). The anti join's
    build side is orders *pre-filtered to the recent window*, so the
    anti probe is against the small recent slice, not all history.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT c.c_mktsegment, COUNT(*) AS numcust,
               CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
        FROM {customer} c
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM {customer} c2
                             WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM {orders} o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c.c_mktsegment
        """,
        customer=c,
        orders=o,
    )


@register(
    "agg_returned_item_report",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders   o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation   n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def agg_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers losing the most revenue to
    returns. Join order puts the selective lineitem filter first
    (returnflag pushed to the scan), nation broadcasts, and the final
    top-20 with a deterministic tie-break plans as
    TakeOrderedAndProject — per-partition heaps, no global sort.
    Revenue in DECIMAL for engine-exact cents."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(rev, 2).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "subquery_min_per_group_joinback",
    oracle="""
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             ROUND(l_extendedprice / l_quantity, 4) AS unit_price
      FROM lineitem
    )
    SELECT u.l_partkey, u.l_suppkey, u.unit_price
    FROM unit u
    WHERE u.l_partkey < 300
      AND u.unit_price = (SELECT MIN(u2.unit_price) FROM unit u2
                          WHERE u2.l_partkey = u.l_partkey)
    """,
)
def subquery_min_per_group_joinback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: which supplier offers each part at its minimum
    unit price — equality against a correlated per-group MIN, the
    other classic decorrelation pattern (Q17 compares against a
    correlated AVG with <; this joins back on =, preserving ties:
    multiple suppliers at the same minimum all qualify, exactly like
    Q2's multi-supplier output). Catalyst plans one per-part MIN
    aggregate joined back — never a per-row re-scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        WITH unit AS (
          SELECT l_partkey, l_suppkey,
                 ROUND(l_extendedprice / l_quantity, 4) AS unit_price
          FROM {lineitem}
        )
        SELECT u.l_partkey, u.l_suppkey, u.unit_price
        FROM unit u
        WHERE u.l_partkey < 300
          AND u.unit_price = (SELECT MIN(u2.unit_price) FROM unit u2
                              WHERE u2.l_partkey = u.l_partkey)
        """,
        lineitem=li,
    )


@register(
    "agg_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def agg_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the forecasting-revenue-change query — a pure
    filter+aggregate with every predicate pushed to the parquet scan
    (date range, discount band, quantity cap) and a single partial-
    aggregated shuffle of one row per partition. The canonical
    scan-efficiency benchmark: at 100 TB its cost is IO on the
    pruned row groups, nothing else. DECIMAL arithmetic pins the
    cents across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * F.col("l_discount").cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue_delta")
        )
    )
