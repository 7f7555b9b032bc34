"""Analytics extras, batch 11: star-schema flattening, join-key skew
profiling, entity-resolution cluster rollup, and forecast
backtesting.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's relational / data-quality /
entity-resolution / time-series tiers:

* star flatten — the one-pass all-broadcast-dims denormalization
  every BI extract runs;
* join-key skew — the partition-balance profiler you consult BEFORE
  a 100 TB join, quantifying hot keys;
* ER cluster rollup — fuzzy-match pairs closed into entities by
  iterative min-label propagation (recursive-CTE closure oracle);
* seasonal-naive backtest — forecast y(d) with y(d-7) and score it,
  the baseline every fancier model must beat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "join_star_flatten",
    oracle="""
    SELECT r.r_name AS region,
           c.c_mktsegment AS segment,
           o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name, c.c_mktsegment, o.o_orderpriority
    """,
)
def join_star_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema flatten: the orders fact joins its full dimension
    chain (customer -> nation -> region) in one pass and rolls up by
    three dimension attributes — the denormalized extract every BI
    layer asks a warehouse for.

    Scale shape: every dimension is broadcast (customer is the
    largest; at true 100 TB you would broadcast nation/region and
    shuffle-join customer bucketed on custkey), so the fact table
    streams through map-side hash joins with zero pre-aggregation
    shuffles; the only exchange is the final O(groups) rollup.
    Catalyst collapses the join chain into successive
    BroadcastHashJoins inside one WholeStageCodegen span."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    flat = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return flat.groupBy(
        F.col("r_name").alias("region"),
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.countDistinct("c_custkey").cast("long").alias("n_customers"),
    )


@register(
    "dq_join_key_skew",
    oracle="""
    WITH k AS (
      SELECT l_orderkey AS key, COUNT(*) AS n FROM lineitem GROUP BY 1
    ),
    st AS (
      SELECT COUNT(*) AS n_keys,
             SUM(n) AS n_rows,
             MAX(n) AS max_n,
             quantile_cont(n, 0.5) AS p50,
             quantile_cont(n, 0.99) AS p99
      FROM k
    )
    SELECT CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(max_n AS BIGINT) AS max_rows_one_key,
           ROUND(max_n * 1.0 / n_rows, 6) AS top_key_share,
           ROUND(p50, 1) AS p50_rows_per_key,
           ROUND(p99, 1) AS p99_rows_per_key,
           ROUND(p99 / p50, 2) AS p99_p50_ratio
    FROM st
    """,
)
def dq_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for lineitem.l_orderkey: per-key row
    counts summarized as max share, p50/p99 rows-per-key, and their
    ratio — the numbers that decide whether a planned join needs
    salting, AQE skew splitting, or nothing. Profiling the key is
    O(keys); discovering skew mid-join at 100 TB is an OOM.

    Shape: one count-by-key pass (map-side partial aggregation does
    most of the work), then exact percentiles over the O(keys)
    count table."""
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    st = k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
        F.percentile("n", F.lit(0.5)).alias("p50"),
        F.percentile("n", F.lit(0.99)).alias("p99"),
    )
    return st.select(
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("max_n").cast("long").alias("max_rows_one_key"),
        F.round(F.col("max_n") / F.col("n_rows"), 6).alias("top_key_share"),
        F.round("p50", 1).alias("p50_rows_per_key"),
        F.round("p99", 1).alias("p99_rows_per_key"),
        F.round(F.col("p99") / F.col("p50"), 2).alias("p99_p50_ratio"),
    )


@register(
    "er_cluster_rollup",
    oracle="""
    WITH RECURSIVE names AS (
      SELECT DISTINCT p_name,
             string_split(p_name, ' ')[-1] AS block
      FROM part
    ),
    pairs AS (
      SELECT a.p_name AS na, b.p_name AS nb
      FROM names a JOIN names b
        ON a.block = b.block AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 4
    ),
    und AS (SELECT na, nb FROM pairs UNION SELECT nb, na FROM pairs),
    nodes AS (SELECT DISTINCT na AS n FROM und),
    reach(n, m) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.n, u.nb FROM reach r JOIN und u ON u.na = r.m
    ),
    lab AS (SELECT n, MIN(m) AS canonical FROM reach GROUP BY n),
    clusters AS (
      SELECT canonical, COUNT(*) AS cluster_size FROM lab GROUP BY canonical
    )
    SELECT canonical,
           CAST(cluster_size AS BIGINT) AS cluster_size
    FROM clusters WHERE cluster_size >= 2
    """,
)
def er_cluster_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution, closed: the er_blocked_fuzzy candidate
    pairs (blocked Levenshtein <= 4 on part names) are merged into
    entities by iterative min-label propagation — A~B and B~C land in
    one entity even when A and C never matched directly, which the
    pairwise view cannot express. Output: canonical name (the
    lexicographic minimum, a deterministic survivor rule) and entity
    size, for multi-member entities.

    Shape: same Pregel-style rounds as graph_connected_components
    (join + min-aggregate per round, localCheckpoint lineage cuts),
    on the O(matches) pair graph rather than the corpus. The oracle
    closes the identical pair set with a recursive CTE."""
    p = load_table(spark, sf_dir, "part")
    names = p.select(
        "p_name", F.element_at(F.split("p_name", " "), -1).alias("block")
    ).distinct()
    a = names.alias("a")
    b = names.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 4)
        .select(F.col("a.p_name").alias("na"), F.col("b.p_name").alias("nb"))
    )
    und = pairs.union(
        pairs.select(F.col("nb").alias("na"), F.col("na").alias("nb"))
    ).localCheckpoint()
    labels = und.select(F.col("na").alias("n")).distinct().select(
        "n", F.col("n").alias("canonical")
    )
    prev = None
    for _ in range(12):
        prop = und.join(labels, und["na"] == labels["n"]).select(
            F.col("nb").alias("n"), "canonical"
        )
        diffused = labels.union(prop).groupBy("n").agg(
            F.min("canonical").alias("canonical")
        )
        # pointer jumping (see graph_connected_components): O(log
        # diameter) rounds
        tgt = diffused.select(
            F.col("n").alias("pn"), F.col("canonical").alias("pcan")
        )
        labels = (
            diffused.join(tgt, diffused["canonical"] == tgt["pn"])
            .select("n", F.col("pcan").alias("canonical"))
        ).localCheckpoint()
        cur = labels.agg(F.count_distinct("canonical")).collect()[0][0]
        if cur == prev:
            break
        prev = cur
    return (
        labels.groupBy("canonical")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .where(F.col("cluster_size") >= 2)
        .select("canonical", F.col("cluster_size").cast("long").alias("cluster_size"))
    )


@register(
    "timeseries_backtest_snaive",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, COUNT(*) AS y
      FROM events GROUP BY 1
    ),
    j AS (
      SELECT a.d, a.y, b.y AS yhat
      FROM daily a JOIN daily b ON b.d = a.d - INTERVAL 7 DAY
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_scored_days,
           ROUND(AVG(abs(y - yhat) * 1.0 / y), 4) AS mape,
           ROUND(AVG(y - yhat * 1.0), 2) AS mean_bias,
           ROUND(CAST(MAX(abs(y - yhat)) AS DOUBLE), 1) AS worst_abs_err
    FROM j
    """,
)
def timeseries_backtest_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest: forecast each day's event volume with
    the value seven days earlier and score MAPE / bias / worst error
    — the baseline any forecasting model must beat before it ships,
    and the honest way to quote "our model is X% better".

    Shape: the series compresses to O(days) in one pass; the
    forecast join is a self-join on a shifted date over the compressed
    table. Nothing about this changes at 100 TB except the first
    groupBy."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    b = daily.select(
        F.date_add("d", 7).alias("d7"), F.col("y").alias("yhat")
    )
    j = daily.join(b, daily["d"] == b["d7"])
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_scored_days"),
        F.round(F.avg(F.abs(F.col("y") - F.col("yhat")) / F.col("y")), 4).alias(
            "mape"
        ),
        F.round(F.avg(F.col("y") - F.col("yhat")), 2).alias("mean_bias"),
        F.round(F.max(F.abs(F.col("y") - F.col("yhat"))).cast("double"), 1).alias(
            "worst_abs_err"
        ),
    )
