"""Relational extension tier: filters, joins, aggregations, sorts,
set operations (SURVEY.md §2.2 rows 3-8).

The reference has none of these (its 641 lines contain no join/agg/
sort — SURVEY.md §2.2); this tier is the general-analytics surface
the north star mandates. All stock DataFrame API — Catalyst handles
pushdown, pruning, join selection; AQE handles skew and runtime
broadcast.

Scale notes are attached per query: which side broadcasts, where the
shuffles are, and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@register(
    "agg_pricing_summary",
    oracle="""
    -- INTEGER-UNITS ledger: every money/quantity aggregate is a
    -- BIGINT sum of per-row quantized units (floor(x*scale + 0.5) —
    -- identical on both engines since the pre-quantization double is
    -- identical), so nothing depends on float summation order and the
    -- sums stay in whole-stage-codegen-native long arithmetic (the
    -- DECIMAL form measured 2x slower on this 600k-row scan).
    -- Rounding to cents happens in integer space ((u + half) div
    -- step); all values are positive so integer div == HALF_UP.
    -- Overflow envelope: charge units are <= ~1.1e11/row, so BIGINT
    -- holds ~8e7 rows/group — fine through sf10; a 100 TB deployment
    -- swaps the charge ledger to DECIMAL(38,6) sums.
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
             / 100.0 AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS sum_base_price,
           ((CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000
                                 + 0.5) AS BIGINT)) AS BIGINT) + 50) // 100)
             / 100.0 AS sum_disc_price,
           ((CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                 * (1 + l_tax) * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) + 5000) // 10000)
             / 100.0 AS sum_charge,
           ROUND(CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT))
                      AS BIGINT) / 100.0 / COUNT(*), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                      AS BIGINT) / 100.0 / COUNT(*), 4) AS avg_price,
           ROUND(CAST(SUM(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))
                      AS BIGINT) / 100.0 / COUNT(*), 4) AS avg_disc,
           COUNT(*)                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: hash aggregate with partial
    (map-side) combine — at 100 TB the shuffle carries only
    4 groups × partial states, not rows."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    # INTEGER-UNITS ledgers (see oracle comment): per-row quantized
    # BIGINT units keep the sums exact/order-independent at native
    # long-sum speed; integer div performs the HALF_UP cents round
    # (never float-divide the unit sums — they exceed 2^53)
    def units(col, scale):
        return F.floor(col * scale + 0.5).cast("long")

    def cents_div(sum_col, half, step):
        return F.expr(f"({sum_col} + {half}) div {step}") / 100.0

    n = F.count(F.lit(1))
    grouped = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(units(F.col("l_quantity"), 100)).alias("qu"),
            F.sum(units(F.col("l_extendedprice"), 100)).alias("pu"),
            F.sum(units(disc_price, 10000)).alias("du"),
            F.sum(units(disc_price * (1 + F.col("l_tax")), 1000000)).alias(
                "cu"
            ),
            F.sum(units(F.col("l_discount"), 100)).alias("dcu"),
            n.alias("count_order"),
        )
    )
    return grouped.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("qu") / 100.0).alias("sum_qty"),
        (F.col("pu") / 100.0).alias("sum_base_price"),
        cents_div("du", 50, 100).alias("sum_disc_price"),
        cents_div("cu", 5000, 10000).alias("sum_charge"),
        F.round(F.col("qu") / 100.0 / F.col("count_order"), 4).alias(
            "avg_qty"
        ),
        F.round(F.col("pu") / 100.0 / F.col("count_order"), 4).alias(
            "avg_price"
        ),
        F.round(F.col("dcu") / 100.0 / F.col("count_order"), 4).alias(
            "avg_disc"
        ),
        "count_order",
    )


@register(
    "agg_distinct_counts",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*)                  AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Spark expands to a two-phase aggregate
    (distinct keys shuffled once, then counted); no driver collect."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path for
    cardinality: one pass, fixed-size sketch, no distinct shuffle.

    The raw estimate is implementation-specific (sketch internals),
    so the driver-checkable contract is emitted instead: the exact
    twin per group plus ``within_5pct`` — |approx−exact|/exact ≤ 0.05
    at the declared rsd=0.01 (5σ headroom). The oracle asserts the
    boolean and the exact columns, turning the former rows-only row
    into a value-checked one. The exact ``countDistinct`` here is the
    verification harness; the production path at 100 TB is the sketch
    alone (drop the twin, keep the plan).

    The sketch and the exact twin aggregate SEPARATELY and join on
    the 3-row group set: combined in one agg, Catalyst's Expand for
    the mixed distinct/non-distinct plan makes the partial
    approx_count_distinct buffer exist per (flag, partkey) group —
    ~200k × 2^14-register HLL buffers at rsd=0.01 (measured 4.2 s vs
    1.8 s split at sf0.1; the production sketch-only plan stays one
    exchange)."""
    li = load_table(spark, sf_dir, "lineitem")
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts")
    )
    agg = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .join(F.broadcast(approx), "l_returnflag")
    )
    rel_err = F.abs(F.col("approx_parts") - F.col("exact_parts")) / F.col(
        "exact_parts"
    )
    return agg.select(
        "l_returnflag",
        "n_rows",
        "exact_parts",
        (rel_err <= 0.05).alias("within_5pct"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals — Spark expands grouping sets in one
    Expand+HashAggregate, still a single shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_qty"),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status × priority."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


# ---------------------------------------------------------------------------
# Filters / predicates
# ---------------------------------------------------------------------------


@register(
    "filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
    FROM part
    WHERE p_size BETWEEN 5 AND 20
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_type LIKE '%O%'
      AND p_retailprice IS NOT NULL
      AND NOT (p_size = 13)
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full predicate surface: BETWEEN / IN / LIKE / IS NOT NULL /
    NOT — all pushed into the parquet scan by Catalyst (visible as
    PushedFilters in .explain), so at 100 TB row groups that can't
    match are never decoded."""
    part = load_table(spark, sf_dir, "part")
    return part.where(
        F.col("p_size").between(5, 20)
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_type").like("%O%")
        & F.col("p_retailprice").isNotNull()
        & ~(F.col("p_size") == 13)
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "join_broadcast_dims",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region, COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dimension joins with explicit broadcast() — at
    100 TB the fact side never shuffles for these joins; the ~KB
    dimension tables ship to every executor."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"), r.r_name.alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_acctbal"),
        )
    )


@register(
    "join_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 20
    """,
)
def join_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style fact-fact join + top-k. customer⋈orders is
    dimension-pruned first (segment filter before the join), then
    orders⋈lineitem shuffles on the join key — the natural TPC-H
    plan; AQE converts the pruned customer side to broadcast at
    runtime when it fits."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(20)
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving order-less customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cust_n AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
                    FROM customer GROUP BY c_nationkey),
         supp_n AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
                    FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_customers,
           COALESCE(s.n_supp, 0) AS n_suppliers
    FROM cust_n c FULL OUTER JOIN supp_n s ON c.nk = s.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two pre-aggregated sides (aggregate before
    join — the shuffle carries group counts, not raw rows)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, c.nk == s.nk, "full")
        .select(
            F.coalesce(c.nk, s.nk).alias("nationkey"),
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_customers"),
            F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with at least one big
    order — semi join never duplicates the left side, and Spark
    builds/broadcasts only the distinct keys of the right side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no order above
    400k."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_range_theta",
    oracle="""
    SELECT p.p_partkey, p.p_size, COUNT(*) AS n_similar
    FROM part p
    JOIN part q
      ON q.p_partkey <> p.p_partkey
     AND q.p_size BETWEEN p.p_size - 1 AND p.p_size + 1
     AND q.p_brand = p.p_brand
    GROUP BY p.p_partkey, p.p_size
    """,
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/theta join — by DOMAIN REDUCTION (r12): the naive form
    (equi-key on brand carrying the shuffle, range predicate
    post-shuffle) concentrates N/25 rows per brand on one reducer
    and enumerates O(N^2 / |brand x size|) pairs — the r12 sf1-
    extended join audit measured max per-key reducer input 8-9x per
    decade on a flat 25-key domain. But n_similar depends ONLY on
    (brand, size): count parts per (brand, size) — one partially
    aggregated shuffle to an O(25 x 50) frame — run the ±1 range
    window THERE (tiny), and join the answer back on (brand, size)
    (AQE broadcasts it). Identical result, no pair enumeration, no
    bounded-key data shuffle; the same reduction window_range_frame
    uses. A theta join whose range key had an UNBOUNDED domain would
    instead band the range key into the equi key
    (join_interval_overlap, join_range_bucketed)."""
    from pyspark.sql.window import Window

    from hivetomysql_spark.operators.ranks import join_back

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    counts = p.groupBy("p_brand", "p_size").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = (
        Window.partitionBy("p_brand")
        .orderBy("p_size")
        .rangeBetween(-1, 1)
    )
    m = counts.select(
        "p_brand",
        "p_size",
        (F.sum("__c").over(w) - 1).cast("long").alias("n_similar"),
    )
    return (
        join_back(p, m, ["p_brand", "p_size"], [])
        .where(F.col("n_similar") > 0)
        .select("p_partkey", "p_size", "n_similar")
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k
# ---------------------------------------------------------------------------


@register(
    "sort_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice_r,
           o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT — Spark plans TakeOrderedAndProject: each
    partition keeps a 25-row heap, the driver merges heaps; no global
    sort, no full shuffle, O(k) memory at any scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice_r"),
            "o_orderdate",
        )
    )


@register(
    "sort_multi_key",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation
    ORDER BY n_regionkey DESC, n_name ASC
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort (range-partitioned exchange + per-
    partition sort)."""
    return (
        load_table(spark, sf_dir, "nation")
        .orderBy(F.desc("n_regionkey"), F.asc("n_name"))
        .select("n_nationkey", "n_name", "n_regionkey")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — no shuffle at all (partitions concatenate)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — nations having both customers and
    suppliers. DISTINCT-FIRST (r12): Catalyst rewrites INTERSECT as
    Distinct(left SEMI JOIN right) with the join over the RAW
    frames, so the semi join shuffles N customer rows onto 25 nation
    keys — the r12 sf1-extended join audit measured max per-key
    reducer input 8.5x per decade on a flat key domain. Distincting
    each side FIRST is semantics-preserving for INTERSECT and turns
    the shuffles into partially-aggregated 25-row exchanges (map-side
    combine), with the semi join a 25x25 broadcast. Catalyst does
    not push Distinct below the semi join itself."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.distinct().intersect(s.distinct())


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — nations with customers but no well-funded
    supplier (the acctbal predicate keeps the result non-vacuous on
    the fixture: every nation has SOME supplier, so the unfiltered
    difference is empty)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    # distinct-first: EXCEPT DISTINCT plans as Distinct(ANTI JOIN)
    # over the raw frames — same bounded-key shuffle set_intersect
    # documents; distinct on each side first is semantics-preserving
    return c.distinct().subtract(s.distinct())


@register(
    "agg_time_rollup",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS y,
           CAST(QUARTER(o_orderdate) AS INT) AS q,
           CAST(MONTH(o_orderdate) AS INT) AS m,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY ROLLUP (YEAR(o_orderdate), QUARTER(o_orderdate),
                     MONTH(o_orderdate))
    """,
)
def agg_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup (year → quarter → month): monthly
    revenue with quarter, year, and grand totals from ONE pass —
    Catalyst expands the grouping sets inside a single aggregate
    (the 4 levels share map-side partials), vs four separate
    aggregations unioned. NULL level markers distinguish subtotal
    rows; DECIMAL sums pin the cents."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup(
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "agg_fulfillment_latency",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority,
             epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate) AS lat_us
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    )
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(ROUND(QUANTILE_CONT(lat_us, 0.5), 0) AS BIGINT) AS p50_us,
           CAST(ROUND(QUANTILE_CONT(lat_us, 0.95), 0) AS BIGINT) AS p95_us,
           CAST(MAX(lat_us) AS BIGINT) AS max_us
    FROM lat
    GROUP BY o_orderpriority
    """,
)
def agg_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency distribution per priority (p50/p95/max in
    integer micros) — the SLA measurement against
    join_values_lookup's targets. Durations computed as micros
    differences (never fractional days) for engine-exact
    percentiles; negative latencies (data noise in the synthetic
    fixtures) excluded explicitly rather than silently absorbed."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lat = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "o_orderpriority",
            (
                F.unix_micros(F.col("l_shipdate").cast("timestamp"))
                - F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            ).alias("lat_us"),
        )
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("lat_us", F.lit(0.5)), 0)
        .cast("bigint")
        .alias("p50_us"),
        F.round(F.percentile("lat_us", F.lit(0.95)), 0)
        .cast("bigint")
        .alias("p95_us"),
        F.max("lat_us").alias("max_us"),
    )


@register(
    "window_repeat_purchase",
    oracle="""
    WITH seq AS (
      SELECT c.c_mktsegment,
             epoch_us(LEAD(o.o_orderdate) OVER (
               PARTITION BY o.o_custkey
               ORDER BY o.o_orderdate, o.o_orderkey))
               - epoch_us(o.o_orderdate) AS gap_us,
             LEAD(o.o_totalprice) OVER (
               PARTITION BY o.o_custkey
               ORDER BY o.o_orderdate, o.o_orderkey) - o.o_totalprice
               AS value_delta
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT c_mktsegment,
           COUNT(gap_us) AS n_repeat_pairs,
           CAST(ROUND(AVG(gap_us / 86400000000.0), 2) AS DOUBLE)
             AS avg_days_between,
           ROUND(AVG(value_delta), 2) AS avg_value_delta
    FROM seq WHERE gap_us IS NOT NULL
    GROUP BY c_mktsegment
    """,
)
def window_repeat_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase dynamics per market segment: average days
    between a customer's consecutive orders and how the basket value
    moves — the inter-purchase-interval metric behind replenishment
    forecasting. One customer-keyed lead window (deterministic
    (date, key) order), then a segment rollup; gap arithmetic in
    integer micros converted to days only at presentation."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ts = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    next_ts = F.unix_micros(
        F.lead(F.col("o_orderdate").cast("timestamp")).over(w)
    )
    seq = (
        o.join(c.select("c_custkey", "c_mktsegment"),
               F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_mktsegment",
            (next_ts - ts).alias("gap_us"),
            (F.lead("o_totalprice").over(w) - F.col("o_totalprice")).alias(
                "value_delta"
            ),
        )
        .where(F.col("gap_us").isNotNull())
    )
    return seq.groupBy("c_mktsegment").agg(
        F.count("gap_us").alias("n_repeat_pairs"),
        F.round(F.avg(F.col("gap_us") / 86_400_000_000.0), 2)
        .cast("double")
        .alias("avg_days_between"),
        F.round(F.avg("value_delta"), 2).alias("avg_value_delta"),
    )
