"""Analytics extras, batch 2: experiment statistics, categorical
encoding, and relational graph analytics.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's aggregation / governance tiers:

* Welch's t-test — the unequal-variance A/B significance test, as ONE
  conditional-aggregate pass (no per-variant scans);
* frequency string indexer — MLlib StringIndexer semantics
  (frequencyDesc with deterministic tie-break) expressed relationally;
* degree distribution + triangle count — graph-shape metrics computed
  on relational edge lists, the pre-GraphX shape that scales as plain
  joins/aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "stats_ab_welch",
    oracle="""
    WITH g AS (
      SELECT event_type,
             COUNT(*) FILTER (WHERE user_id % 2 = 0) AS n_a,
             COUNT(*) FILTER (WHERE user_id % 2 = 1) AS n_b,
             AVG(value) FILTER (WHERE user_id % 2 = 0) AS mean_a,
             AVG(value) FILTER (WHERE user_id % 2 = 1) AS mean_b,
             VAR_SAMP(value) FILTER (WHERE user_id % 2 = 0) AS var_a,
             VAR_SAMP(value) FILTER (WHERE user_id % 2 = 1) AS var_b
      FROM events
      GROUP BY event_type
    )
    SELECT event_type, n_a, n_b,
           ROUND(mean_a, 4) AS mean_a,
           ROUND(mean_b, 4) AS mean_b,
           ROUND((mean_a - mean_b)
                 / sqrt(var_a / n_a + var_b / n_b), 4) AS t_stat,
           ROUND(pow(var_a / n_a + var_b / n_b, 2)
                 / (pow(var_a / n_a, 2) / (n_a - 1)
                    + pow(var_b / n_b, 2) / (n_b - 1)), 2) AS welch_df
    FROM g
    """,
)
def stats_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test per event_type, treating even/odd
    user_id as the A/B assignment: one conditional-aggregate pass
    produces both variants' (n, mean, s²) and the t statistic plus
    Welch–Satterthwaite degrees of freedom come out map-side from the
    O(groups) aggregate — the experiment-readout shape that at 100 TB
    is a single shuffle of partial moments, never two scans."""
    ev = load_table(spark, sf_dir, "events")
    a = F.col("user_id") % 2 == 0
    b = F.col("user_id") % 2 == 1
    g = ev.groupBy("event_type").agg(
        F.count(F.when(a, 1)).alias("n_a"),
        F.count(F.when(b, 1)).alias("n_b"),
        F.avg(F.when(a, F.col("value"))).alias("mean_a"),
        F.avg(F.when(b, F.col("value"))).alias("mean_b"),
        F.var_samp(F.when(a, F.col("value"))).alias("var_a"),
        F.var_samp(F.when(b, F.col("value"))).alias("var_b"),
    )
    se2_a = F.col("var_a") / F.col("n_a")
    se2_b = F.col("var_b") / F.col("n_b")
    t = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2_a + se2_b)
    df_w = F.pow(se2_a + se2_b, 2) / (
        F.pow(se2_a, 2) / (F.col("n_a") - 1) + F.pow(se2_b, 2) / (F.col("n_b") - 1)
    )
    return g.select(
        "event_type",
        "n_a",
        "n_b",
        F.round("mean_a", 4).alias("mean_a"),
        F.round("mean_b", 4).alias("mean_b"),
        F.round(t, 4).alias("t_stat"),
        F.round(df_w, 2).alias("welch_df"),
    )


@register(
    "stats_chi_square",
    oracle="""
    WITH g AS (
      SELECT event_type,
             COUNT(*) FILTER (WHERE user_id % 2 = 0) AS a,
             COUNT(*) FILTER (WHERE user_id % 2 = 1) AS b
      FROM events GROUP BY event_type
    ),
    tot AS (SELECT SUM(a) AS ta, SUM(b) AS tb, SUM(a + b) AS n FROM g)
    SELECT CAST(COUNT(*) - 1 AS BIGINT) AS dof,
           ROUND(SUM(
             pow(a - (a + b) * ta * 1.0 / n, 2) / ((a + b) * ta * 1.0 / n)
             + pow(b - (a + b) * tb * 1.0 / n, 2) / ((a + b) * tb * 1.0 / n)
           ), 4) AS chi2
    FROM g, tot
    """,
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event_type × A/B variant
    (even/odd user_id): one conditional-aggregate pass builds the
    contingency table (O(types) rows), the grand totals broadcast
    back, and expected-vs-observed contributions sum map-side. The
    fact table is scanned once; everything after is O(cells) — the
    test scales to 100 TB as a single shuffle of partial counts."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.when(F.col("user_id") % 2 == 0, 1)).alias("a"),
        F.count(F.when(F.col("user_id") % 2 == 1, 1)).alias("b"),
    )
    tot = g.agg(
        F.sum("a").alias("ta"),
        F.sum("b").alias("tb"),
        F.sum(F.col("a") + F.col("b")).alias("n"),
    )
    j = g.crossJoin(F.broadcast(tot))
    row_t = F.col("a") + F.col("b")
    exp_a = row_t * F.col("ta") / F.col("n")
    exp_b = row_t * F.col("tb") / F.col("n")
    contrib = F.pow(F.col("a") - exp_a, 2) / exp_a + F.pow(
        F.col("b") - exp_b, 2
    ) / exp_b
    return j.agg(
        (F.count(F.lit(1)) - 1).cast("long").alias("dof"),
        F.round(F.sum(contrib), 4).alias("chi2"),
    )


@register(
    "stats_mann_whitney",
    oracle="""
    WITH r AS (
      SELECT event_type, user_id % 2 AS variant,
             rank() OVER (PARTITION BY event_type ORDER BY value) AS rk
      FROM events
    ),
    g AS (
      SELECT event_type,
             COUNT(*) FILTER (WHERE variant = 0) AS n_a,
             COUNT(*) FILTER (WHERE variant = 1) AS n_b,
             SUM(rk) FILTER (WHERE variant = 0) AS r_a
      FROM r GROUP BY event_type
    )
    SELECT event_type, n_a, n_b,
           CAST(r_a - n_a * (n_a + 1) / 2 AS BIGINT) AS u_a,
           ROUND((r_a - n_a * (n_a + 1) / 2 - n_a * n_b / 2.0)
                 / sqrt(n_a * n_b * (n_a + n_b + 1) / 12.0), 4) AS z_approx
    FROM g
    """,
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) test per event_type for the A/B
    variants — the non-parametric complement to stats_ab_welch:
    immune to outliers and non-normality. One rank window per
    event_type (the partition IS the shuffle key — no global sort),
    then a conditional aggregate for rank sums and the normal
    z-approximation. Rank ties share the min rank in both engines,
    keeping the oracle exact for continuous data."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    r = ev.select(
        "event_type",
        (F.col("user_id") % 2).alias("variant"),
        F.rank().over(w).alias("rk"),
    )
    g = r.groupBy("event_type").agg(
        F.count(F.when(F.col("variant") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("variant") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("rk"))).alias("r_a"),
    )
    u_a = F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1) / 2
    mu = F.col("n_a") * F.col("n_b") / 2.0
    sigma = F.sqrt(
        F.col("n_a") * F.col("n_b") * (F.col("n_a") + F.col("n_b") + 1) / 12.0
    )
    return g.select(
        "event_type",
        "n_a",
        "n_b",
        u_a.cast("long").alias("u_a"),
        F.round((u_a - mu) / sigma, 4).alias("z_approx"),
    )


@register(
    "stats_ks_test",
    oracle="""
    WITH per_val AS (
      SELECT event_type, value,
             COUNT(*) FILTER (WHERE user_id % 2 = 0) AS a,
             COUNT(*) FILTER (WHERE user_id % 2 = 1) AS b
      FROM events GROUP BY event_type, value
    ),
    cum AS (
      SELECT event_type,
             SUM(a) OVER (PARTITION BY event_type ORDER BY value
                          ROWS UNBOUNDED PRECEDING) AS cum_a,
             SUM(b) OVER (PARTITION BY event_type ORDER BY value
                          ROWS UNBOUNDED PRECEDING) AS cum_b
      FROM per_val
    ),
    tot AS (
      SELECT event_type, CAST(SUM(a) AS BIGINT) AS n_a,
             CAST(SUM(b) AS BIGINT) AS n_b
      FROM per_val GROUP BY event_type
    )
    SELECT c.event_type, t.n_a, t.n_b,
           ROUND(MAX(abs(c.cum_a * 1.0 / t.n_a - c.cum_b * 1.0 / t.n_b)), 6)
             AS ks_d
    FROM cum c JOIN tot t USING (event_type)
    GROUP BY c.event_type, t.n_a, t.n_b
    """,
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per event_type between
    the A/B variants: sup-norm distance between the two empirical
    CDFs, evaluated after pre-grouping to distinct values (ties are
    counted jointly, so the step function is well-defined and
    engine-agnostic). One groupBy compresses the stream to distinct
    values, one per-group ordered window forms both running CDFs in
    a single pass, one aggregate takes the sup — the shuffle key is
    event_type throughout, never a global sort."""
    ev = load_table(spark, sf_dir, "events")
    per_val = ev.groupBy("event_type", "value").agg(
        F.count(F.when(F.col("user_id") % 2 == 0, 1)).alias("a"),
        F.count(F.when(F.col("user_id") % 2 == 1, 1)).alias("b"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_val.select(
        "event_type",
        "a",
        "b",
        F.sum("a").over(w).alias("cum_a"),
        F.sum("b").over(w).alias("cum_b"),
    )
    tot = per_val.groupBy("event_type").agg(
        F.sum("a").alias("n_a"), F.sum("b").alias("n_b")
    )
    j = cum.join(F.broadcast(tot), "event_type")
    d = F.abs(F.col("cum_a") / F.col("n_a") - F.col("cum_b") / F.col("n_b"))
    return j.groupBy("event_type", "n_a", "n_b").agg(
        F.round(F.max(d), 6).alias("ks_d")
    )


@register(
    "agg_decimal_money",
    oracle="""
    WITH cents AS (
      SELECT o_orderstatus,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      FROM orders
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(c) AS BIGINT) AS total_cents,
           CAST(CAST(SUM(c) AS BIGINT) / 100.0 AS DOUBLE) AS total_dollars
    FROM cents
    GROUP BY o_orderstatus
    """,
)
def agg_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact money accounting: prices enter an integer-cents ledger
    (floor(x·100 + 0.5) — engine-agnostic rounding, no float-sum
    drift, no HALF_UP/HALF_EVEN divergence at representable
    midpoints), totals aggregate as BIGINT cents, and only the
    display column divides by 100.0 — an IEEE-exact DOUBLE (the
    BIGINT total is < 2^53, so cents/100.0 is one deterministic
    rounding, identical bits on every engine; a DECIMAL display cast
    was driver-red for 3 rounds because pandas renders DuckDB
    DECIMAL as float64 but Spark DECIMAL as object-Decimal). The
    shape a financial pipeline needs at 100 TB: integer partial sums
    are associative, overflow-checked, and bit-identical under any
    partitioning — unlike double sums whose low bits depend on
    reduction order."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("c"),
    )
    return cents.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("c").alias("total_cents"),
        (F.sum("c") / 100.0).alias("total_dollars"),
    )


@register(
    "feature_string_indexer",
    oracle="""
    WITH counts AS (
      SELECT o_orderpriority AS category, COUNT(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT category, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, category) - 1 AS BIGINT)
             AS category_index
    FROM counts
    """,
)
def feature_string_indexer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical label encoding with MLlib StringIndexer semantics
    (frequencyDesc order, lexical tie-break), expressed relationally:
    one groupBy for the frequency table, one O(distinct)-sized window
    for the dense 0-based indices. The model is the tiny (category →
    index) table — at 100 TB it is broadcast back for the actual
    encode join, so the fact table never shuffles."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy(F.col("o_orderpriority").alias("category")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy(F.desc("n"), "category")
    return counts.select(
        "category",
        "n",
        (F.row_number().over(w) - 1).cast("long").alias("category_index"),
    )


# edge list shared by both graph queries: nation-pair trade edges where
# customers of nation A bought from suppliers of nation B (undirected,
# deduplicated, self-loops dropped)
_EDGES_CTE = """
edges_d AS (
  SELECT DISTINCT
         least(c.c_nationkey, s.s_nationkey)    AS u,
         greatest(c.c_nationkey, s.s_nationkey) AS v
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
)
"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
    )
    return pairs.select(
        F.least("c_nationkey", "s_nationkey").alias("u"),
        F.greatest("c_nationkey", "s_nationkey").alias("v"),
    ).distinct()


@register(
    "graph_degree_distribution",
    oracle=f"""
    WITH {_EDGES_CTE},
    und AS (
      SELECT u AS node, v AS other FROM edges_d
      UNION ALL
      SELECT v AS node, u AS other FROM edges_d
    ),
    deg AS (SELECT node, COUNT(*) AS degree FROM und GROUP BY node)
    SELECT degree, COUNT(*) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the nation-level trade graph (edge = some
    customer of nation A bought from a supplier of nation B). The
    fact-table joins reduce to a DISTINCT edge list first — after that
    every graph metric is O(edges), independent of the 100 TB fact
    volume that produced it."""
    edges = _trade_edges(spark, sf_dir)
    # one explode instead of unionAll of two selects — the union form
    # would duplicate the whole 4-table join tree (8 scans → 4)
    und = edges.select(F.explode(F.array("u", "v")).alias("node"))
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH {_EDGES_CTE}
    SELECT COUNT(*) AS n_triangles
    FROM edges_d e1
    JOIN edges_d e2 ON e2.u = e1.u AND e2.v > e1.v
    JOIN edges_d e3 ON e3.u = e1.v AND e3.v = e2.v
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the nation trade graph via the ordered-wedge
    join: with every edge stored (u < v), a wedge (e1.u—e1.v, e1.u—
    e2.v with e1.v < e2.v) closes into exactly one candidate third
    edge — each triangle counted once, no orientation blowup. Two
    equi-joins on the deduplicated edge list; the standard distributed
    triangle algorithm (node-order = degree order is the published
    skew fix at scale)."""
    edges = _trade_edges(spark, sf_dir).localCheckpoint(eager=True)
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    wedges = e1.join(
        e2,
        (F.col("e2.u") == F.col("e1.u")) & (F.col("e2.v") > F.col("e1.v")),
    )
    tri = wedges.join(
        e3,
        (F.col("e3.u") == F.col("e1.v")) & (F.col("e3.v") == F.col("e2.v")),
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))
