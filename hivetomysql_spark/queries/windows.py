"""Window-function tier + as-of join (SURVEY.md §2.2 "Window functions").

Scale note common to all: a window = one hash shuffle on the
partition keys + per-partition sort. None of these materialize the
whole table on one node — the thing to avoid at 100 TB is a window
with *no* partitionBy (global sort); every query here partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.operators.asof import asof_join
from hivetomysql_spark.operators.ranks import (
    grouped_dense_rank,
    grouped_ntile,
    grouped_row_number,
    grouped_running_max_exclusive,
)
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "window_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_name, rn
    FROM (
      SELECT c_mktsegment, c_custkey, c_name,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per segment — ROW_NUMBER + filter.
    Spark pushes the rn<=3 limit into the sort (WindowGroupLimit),
    so each group keeps only 3 rows through the shuffle."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "rn")
    )


@register(
    "window_rank_ntile",
    oracle="""
    SELECT p_brand, p_partkey,
           RANK()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS price_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS size_dense_rank,
           NTILE(4)     OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS price_quartile
    FROM part
    """,
)
def window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / NTILE ranking family — ADAPTIVE-dispatch
    grouped primitives (operators/ranks, r12): p_brand is a BOUNDED
    key (25 values at every scale) over ``part`` — which in the
    warehouse scale model is a CATALOG table whose per-brand slice
    never grows with transactions. One partially-aggregated count
    measures the largest brand group; below PLAIN_WINDOW_BOUND
    (~2M rows — true for this catalog at any sf, measured ~800 rows
    at sf0.1-sf10) all three functions run as the plain one-shuffle
    ``Window.partitionBy(p_brand)`` on a shared sorted exchange;
    above it (a genuinely data-sized input) each flips to the
    two-level (brand, value-bucket) hash-exchange shape with
    O(brands x buckets) offset frames and no single-task sort. The
    r11 always-two-level form priced the insurance even where the
    hazard could not occur: +1.5 s at sf0.1 and 4.4x at sf10
    (SCALING.md:1244); the measured dispatch keeps the cheap plan
    exactly while the per-group bound holds.

    RANK over the total (price DESC, partkey) order equals
    ROW_NUMBER, so the family decomposes into grouped_row_number
    (key = -price; non-null column, so the negation idiom's NULLS
    caveat in ranks.py does not bite), grouped_dense_rank, and
    grouped_ntile on independent lineages joined on p_partkey:
    chaining them (each consuming the previous output) re-executes
    the upstream rank inside every consumer branch of the next
    primitive — measured 3.8 s vs 1.3 s at sf0.1."""
    from hivetomysql_spark.operators.ranks import max_group_rows

    p = load_table(spark, sf_dir, "part").select(
        "p_brand", "p_partkey", "p_retailprice", "p_size"
    )
    mg = max_group_rows(p, ["p_brand"])
    r1 = grouped_row_number(
        p.withColumn("__negprice", -F.col("p_retailprice")),
        ["p_brand"],
        "__negprice",
        ["p_partkey"],
        out="price_rank",
        dispatch="auto",
        max_group=mg,
    ).select("p_partkey", "price_rank")
    r2 = grouped_dense_rank(
        p, ["p_brand"], "p_size", out="size_dense_rank",
        dispatch="auto", max_group=mg,
    ).select("p_partkey", "size_dense_rank")
    r3 = grouped_ntile(
        p, ["p_brand"], 4, "p_retailprice", ["p_partkey"],
        out="price_quartile",
        dispatch="auto", max_group=mg,
    ).select("p_partkey", "price_quartile")
    return (
        p.select("p_brand", "p_partkey")
        .join(r1, "p_partkey")
        .join(r2, "p_partkey")
        .join(r3, "p_partkey")
        .select(
            "p_brand",
            "p_partkey",
            F.col("price_rank").cast("int").alias("price_rank"),
            F.col("size_dense_rank").cast("int").alias("size_dense_rank"),
            "price_quartile",
        )
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           ROUND(AVG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + 3-row moving average (explicit ROWS frames)."""
    o = load_table(spark, sf_dir, "orders")
    order = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = order.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(running), 2).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(moving), 4).alias("moving_avg_3"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, event_type,
           LAG(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS value_delta
    FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD sessionization primitives over the event stream."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("value_delta"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
           COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_size
                          RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_within_2
    FROM part
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric ordering column (value-based frame,
    not row-count-based). Scalable form: p_brand is bounded (25
    values), so the windowed count is computed by DOMAIN REDUCTION —
    aggregate to the O(brands x distinct sizes) frame, run the RANGE
    window there (tiny, ~50 sizes per brand at any scale), and join
    the per-(brand, size) answer back onto the scan (AQE broadcasts
    the map). Exact because a RANGE frame's value depends only on
    the (brand, size) pair, never the row."""
    p = load_table(spark, sf_dir, "part")
    per_size = p.groupBy("p_brand", "p_size").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = (
        Window.partitionBy("p_brand")
        .orderBy("p_size")
        .rangeBetween(-2, Window.currentRow)
    )
    m = per_size.select(
        "p_brand", "p_size", F.sum("__c").over(w).alias("n_within_2")
    )
    # null-safe like the window form it replaces (PARTITION BY treats
    # a NULL group as a regular partition; a name-list join drops it)
    from hivetomysql_spark.operators.ranks import join_back

    return join_back(p, m, ["p_brand", "p_size"], []).select(
        "p_brand", "p_partkey", "p_size", "n_within_2"
    )


@register(
    "window_first_last",
    oracle="""
    SELECT DISTINCT c_nationkey,
           FIRST_VALUE(c_name) OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest,
           LAST_VALUE(c_name)  OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest
    FROM customer
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE with full-partition frames. Scalable
    form: a full-partition extreme is an AGGREGATE, not a window —
    max_by/min_by over the (acctbal, -custkey) ordering struct get
    partial (map-side) aggregation and a 25-row shuffle, where the
    window form sorted N/25 customers in one task per nation (r11
    window audit). FIRST over (bal DESC, key ASC) = max_by on
    (bal, -key); LAST = min_by on the same struct."""
    c = load_table(spark, sf_dir, "customer")
    order = F.struct(F.col("c_acctbal"), (-F.col("c_custkey")).alias("nk"))
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_name", order).alias("richest"),
        F.min_by("c_name", order).alias("poorest"),
    )


@register(
    "asof_join_last_click",
    oracle="""
    SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
           (SELECT MAX(CAST(c.ts AS TIMESTAMP)) FROM events c
            WHERE c.user_id = p.user_id
              AND c.event_type = 'click'
              AND CAST(c.ts AS TIMESTAMP) < CAST(p.ts AS TIMESTAMP)) AS ts_click
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest strictly-earlier
    click by the same user. Implemented with the union+window
    operator (operators/asof.py) — linear cost, vs the oracle's
    quadratic correlated subquery."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_values=[],
        allow_exact_matches=False,
        suffix="_click",
    )
    return joined.select("event_id", "user_id", "ts", "ts_click")


@register(
    "window_time_range_rolling",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER w, 2) AS rolling_1h,
           COUNT(*) OVER w AS n_in_window
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
    """,
)
def window_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per-user rolling 1-hour sum/count. The
    frame is defined on event time (all rows within the trailing
    hour), not row counts — RANGE peers make ties unambiguous, so no
    tie-break column is needed (unlike every ROWS frame in this
    engine). Spark expresses interval frames as rangeBetween on an
    integer-microseconds ordering column; one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("rolling_1h"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


@register(
    "window_ignore_nulls_ffill",
    oracle="""
    SELECT event_id, user_id,
           LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    ) t
    """,
)
def window_ignore_nulls_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill via LAST_VALUE ... IGNORE NULLS: error events
    carry no reading (NULL), so each takes the user's most recent
    valid value. The standard sensor/telemetry repair — one window
    pass, deterministic under the engine's (ts, event_id) tie rule;
    rows before any valid reading stay NULL by design."""
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(v, ignorenulls=True).over(w).alias("filled"),
    )


@register(
    "window_cumulative_distinct",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS INT) AS n_types_so_far
    FROM events
    WHERE user_id < 30
    """,
)
def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct count per user (how many event types has this
    user touched so far) — Spark has no DISTINCT window aggregate, so
    the running set IS the state: collect_set over the frame, sized.
    State per row is O(distinct values) — fine for low-cardinality
    attributes like event types; for high-cardinality keys switch to
    a merged HLL sketch column. The feature-engineering staple for
    'engagement breadth at time t'."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_types_so_far"),
    )


@register(
    "window_pareto_frontier",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice, o_orderdate,
             MAX(o_totalprice) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_orderdate DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_newer
      FROM orders
    )
    SELECT o_orderpriority, o_orderkey,
           ROUND(o_totalprice, 2) AS price,
           o_orderdate
    FROM ranked
    WHERE best_newer IS NULL OR o_totalprice > best_newer
    """,
)
def window_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline) per priority class: orders not
    dominated on (recency, price) — every kept order has a higher
    price than ALL newer orders in its class. The sort-sweep
    formulation: one descending-date window with a running price max
    over strictly-preceding rows turns the O(n²) dominance test into
    one window pass. Partitioned by priority so no global sort; the
    (date, key) tie-break pins which of two same-instant orders
    counts as 'newer' on both engines.

    Scalable form: o_orderpriority is BOUNDED (5 classes), so the
    window form sweeps N/5 orders in one sorted task per class.
    grouped_running_max_exclusive runs the same sweep two-level:
    the (class, date-bucket) hash exchange does the sorting, and
    each earlier bucket's max rides an O(classes x buckets) frame.
    The descending date order becomes an ascending numeric key by
    negating unix_micros."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "__negd", -F.unix_micros("o_orderdate")
    )
    ranked = grouped_running_max_exclusive(
        o,
        ["o_orderpriority"],
        "__negd",
        ["o_orderkey"],
        value="o_totalprice",
        out="best_newer",
    )
    return ranked.where(
        F.col("best_newer").isNull()
        | (F.col("o_totalprice") > F.col("best_newer"))
    ).select(
        "o_orderpriority",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        "o_orderdate",
    )


@register(
    "window_topk_with_ties",
    oracle="""
    WITH r AS (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
             RANK() OVER (PARTITION BY l_returnflag
                          ORDER BY l_quantity DESC) AS rk
      FROM lineitem
    )
    SELECT l_returnflag, l_orderkey, l_linenumber,
           ROUND(l_quantity, 2) AS qty, CAST(rk AS INT) AS rk
    FROM r WHERE rk <= 3
    """,
)
def window_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH ties (RANK, not ROW_NUMBER): every line item tying
    the third-highest quantity qualifies, so group sizes vary — the
    semantics leaderboards and 'all records at the cutoff' reports
    need (window_topk_per_group is the exactly-k variant; choosing
    between them is a correctness decision, not style). Output is
    tie-complete and needs no arbitrary tie-break column."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("l_quantity"))
    return (
        li.withColumn("rk", F.rank().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            F.round("l_quantity", 2).alias("qty"),
            F.col("rk").cast("int").alias("rk"),
        )
    )
