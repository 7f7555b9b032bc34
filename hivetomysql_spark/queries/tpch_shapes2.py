"""Second batch of TPC-H-shaped analytics (Q4, Q9, Q11, Q12, Q14,
Q15, Q16, Q20, Q21 analogues), adapted to the fixture star schema
(FIXTURES.md §A — no partsupp table, no l_shipmode/l_commitdate
columns, so each query keeps the *plan shape* of its TPC-H namesake
while substituting available columns).

The reference (hiveToMysql: HiveToMysql.java:1-641) has no joins,
subqueries, or aggregates — this whole module is extension tier per
SURVEY.md §2.2. Scale stance per query: dimension sides are reduced
then broadcast before touching lineitem; EXISTS/NOT EXISTS become
semi/anti joins (Catalyst does this for the SQL form; we write the
DataFrame form explicitly); per-order "any other / no other"
predicates (Q21) are one window pass over a single lineitem shuffle
instead of two self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "subquery_exists_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def subquery_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a quarter with at least one lineitem
    shipped >60 days after the order date, counted per priority.

    EXISTS is a LEFT SEMI join on the order key — no fan-out, no
    distinct needed, and the date window prunes orders before the
    join. The correlated comparison (l_shipdate vs o_orderdate)
    rides along as a join predicate, so Spark still plans a hash
    semi-join on the equi-key. At 100 TB the orders side is the
    smaller post-filter input; AQE picks broadcast when the quarter
    is selective enough.
    """
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "agg_product_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(ROUND(SUM(CAST(amount AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity AS amount
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def agg_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per year for parts
    matching a name pattern (supply cost proxied as 60% of retail
    since the fixtures have no partsupp).

    The part filter is the selective predicate — applied before the
    join so only matching partkeys reach it (unhinted: a filtered
    part subset is still a fixed fraction of a scaling table; AQE
    broadcasts it while it fits). supplier⋈nation collapses to one
    keyed frame the same way. lineitem→orders is
    the only large join; at 100 TB both sides shuffle on l_orderkey
    unless pre-bucketed, which is the layout this engine's
    write_bucketed_table sink exists for.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            # DECIMAL ledger: amount has <= 4 true decimal digits
            # (2-digit money x 2-digit discount/0.6 factors), so the
            # per-row decimal(18,4) cast is engine-identical and the
            # sum exact — ROUND(float_sum, 2) hit a half-case at sf1
            # (r8 certification sweep)
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
                    ).cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("sum_profit")
        )
    )


@register(
    "subquery_important_stock",
    oracle="""
    WITH partvalue AS (
      SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS part_value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, ROUND(part_value, 2) AS part_value
    FROM partvalue
    WHERE part_value > (SELECT AVG(part_value) * 1.5 FROM partvalue)
    """,
)
def subquery_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose total traded value exceeds a
    scale-invariant threshold — 1.5× the mean per-part value (proxied by lineitem
    extendedprice×quantity).

    One grouped aggregate feeds both branches: the global threshold
    is a second-level aggregate of the *partial* result (O(parts)
    rows, not a rescan of lineitem), joined back as a broadcast
    scalar. Spark caches nothing explicitly — the per-part aggregate
    is small enough that recomputing its global sum costs one extra
    exchange over O(parts), far cheaper than a second lineitem pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("part_value")
    )
    threshold = pv.agg((F.avg("part_value") * F.lit(1.5)).alias("thr"))
    return (
        pv.join(F.broadcast(threshold))
        .where(F.col("part_value") > F.col("thr"))
        .select("l_partkey", F.round("part_value", 2).alias("part_value"))
    )


@register(
    "agg_priority_by_returnflag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def agg_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high- vs low-priority line counts per return
    flag (shipmode substituted by l_returnflag — fixtures lack
    l_shipmode) for one ship year.

    Conditional counts in a single grouped pass; the year filter is
    pushed to the lineitem scan. orders contributes only its
    priority column, so the join projects two columns — at 100 TB
    this is the classic fact-to-fact join that bucketing on orderkey
    removes entirely.
    """
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_promo_revenue_share",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def agg_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO parts' share of one month's revenue.

    Numerator and denominator in one aggregate over one scan; part
    joins in carrying only (partkey, type) — unhinted, AQE's call
    (part scales with the warehouse). The month predicate
    prunes the fact scan — with date-partitioned storage this is a
    partition-pruned read of ~1/36 of the table.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "subquery_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-07-01'
        AND l_shipdate < TIMESTAMP '1996-10-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def subquery_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly
    revenue — tie-preserving (= MAX, not LIMIT 1).

    The revenue CTE is one grouped aggregate (O(suppliers) rows);
    the max is a broadcast scalar over that small result; supplier
    joins in unhinted (it scales with the warehouse — AQE decides). Only one pass over lineitem regardless of
    scale. Rounding happens *before* the max comparison so Spark and
    the oracle agree on exact-tie semantics at double precision.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        # DECIMAL ledger: the max-tie comparison downstream needs the
        # rounded revenue to be engine- and order-identical
        F.round(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(18,4)")
            ),
            2,
        )
        .cast("double")
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "agg_supplier_part_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 2, 3, 4, 5, 10, 15, 20)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def agg_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part attribute
    combo, excluding some brands/types/sizes and negative-balance
    suppliers (the Q16 complaint-supplier NOT IN).

    NOT IN over a non-nullable key column is a null-safe anti join —
    written here as LEFT ANTI against the (tiny, broadcast) excluded
    supplier set. Part predicates push to the part scan before the
    broadcast. COUNT(DISTINCT) shuffles once on the group keys;
    dedup happens map-side first via the partial aggregate.
    """
    p = (
        load_table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#1")
            & (~F.col("p_type").like("MEDIUM%"))
            & (F.col("p_size").isin(1, 2, 3, 4, 5, 10, 15, 20))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(
            bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "subquery_excess_shippers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM (
        SELECT l.l_suppkey, p.p_partkey,
               SUM(l.l_quantity) AS shipped_qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'small%'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l.l_suppkey, p.p_partkey
      ) sq WHERE shipped_qty > 60
    )
    ORDER BY s.s_suppkey
    """,
)
def subquery_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than a threshold
    quantity of any name-matched part in one year (availability
    threshold proxied by a constant — fixtures lack partsupp).

    Inner block: one filtered, part-broadcast grouped aggregate on
    (suppkey, partkey). The IN becomes a LEFT SEMI from supplier to
    the qualifying-supplier set; both sides of that semi join are
    O(suppliers), so the whole query costs one lineitem pass.
    """
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    qualifying = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "p_partkey")
        .agg(F.sum("l_quantity").alias("shipped_qty"))
        .where(F.col("shipped_qty") > 60)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "window_sole_late_supplier",
    oracle="""
    WITH flagged AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM (SELECT DISTINCT l_orderkey, l_suppkey, l_shipdate FROM lineitem) l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey, l_suppkey, MAX(is_late) AS supp_late
      FROM flagged GROUP BY l_orderkey, l_suppkey
    ),
    stats AS (
      SELECT l_orderkey,
             COUNT(*) AS n_supp,
             SUM(supp_late) AS n_late
      FROM per_order GROUP BY l_orderkey
    )
    SELECT p.l_suppkey AS s_suppkey, COUNT(*) AS numwait
    FROM per_order p JOIN stats st ON st.l_orderkey = p.l_orderkey
    WHERE p.supp_late = 1 AND st.n_supp > 1 AND st.n_late = 1
    GROUP BY p.l_suppkey
    ORDER BY numwait DESC, s_suppkey
    """,
)
def window_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the *only* late shipper on
    a finished multi-supplier order (lateness = shipped >60 days
    after order date; fixtures lack commit/receipt dates).

    Q21's textbook form is two correlated EXISTS self-joins on
    lineitem. Here both collapse into one window-free aggregation
    chain: per (order, supplier) lateness → per-order supplier/late
    counts → filter. lineitem shuffles once on l_orderkey and every
    later step reuses that partitioning (Catalyst sees the child
    distribution and skips re-exchanges), versus 3 shuffles for the
    naive EXISTS pair at 100 TB.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .distinct()
    )
    flagged = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        F.when(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1)
        .otherwise(0)
        .alias("is_late"),
    )
    per_supp = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late")
    )
    w = Window.partitionBy("l_orderkey")
    annotated = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "supp_late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("supp_late").over(w).alias("n_late"),
    )
    return (
        annotated.where(
            (F.col("supp_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
    )
