"""Analytics extras, batch 3: market-basket association rules,
one-way ANOVA, time-series autocorrelation and seasonality, and a
time-constrained conversion funnel.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's aggregation / events tiers:

* association rules — support/confidence/lift over within-order brand
  pairs, the classic recommender co-purchase signal;
* one-way ANOVA F — does the metric differ across k variants, in two
  aggregate passes over one scan;
* lag-1 autocorrelation — is the daily series trending or mean-
  reverting, per event type;
* day-of-week seasonal indexes — multiplicative seasonality factors
  for forecast baselines;
* windowed funnel — view→click→purchase where each step must land
  within 24h of the previous (greedy first-touch chain), the
  ClickHouse-windowFunnel-shaped variant of `funnel_conversion`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "basket_association_rules",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM items),
    singles AS (SELECT brand, COUNT(*) AS cnt FROM items GROUP BY brand),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS pair_cnt
      FROM items a JOIN items b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY 1, 2
    )
    SELECT p.brand_a, p.brand_b, CAST(p.pair_cnt AS BIGINT) AS pair_cnt,
           ROUND(p.pair_cnt * 1.0 / n.n_orders, 6) AS support,
           ROUND(p.pair_cnt * 1.0 / s1.cnt, 6) AS confidence,
           ROUND(p.pair_cnt * 1.0 * n.n_orders / (s1.cnt * s2.cnt), 6)
             AS lift
    FROM pairs p
    JOIN singles s1 ON s1.brand = p.brand_a
    JOIN singles s2 ON s2.brand = p.brand_b
    CROSS JOIN n
    WHERE p.pair_cnt >= 5
    """,
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over within-order brand pairs:
    support, confidence (a⇒b), and lift, with a min-support cut.

    Scale shape: the item set is deduplicated FIRST (distinct on
    (order, brand) — one shuffle that also shrinks the fact table to
    ≤25 rows per order), so the pair self-join explodes at most
    C(25,2) pairs per order, bounded by the brand vocabulary, never by
    line items. Pair counting shuffles on the order key both sides
    (co-partitioned self-join); singles and the order count are tiny
    aggregates broadcast back. At 100 TB the only O(data) stages are
    the first join (part dim broadcast) and the distinct; everything
    downstream is O(orders × k²) with small k.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # Materialize the deduplicated item set once: four consumers
    # (order count, single counts, both pair-join sides) would
    # otherwise each redo the O(data) scan+distinct.
    items = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
        .localCheckpoint()
    )
    n = items.agg(F.countDistinct("ok").alias("n_orders"))
    singles = items.groupBy("brand").agg(F.count("*").alias("cnt"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count("*").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= 5)
    )
    s1 = singles.select(
        F.col("brand").alias("brand_a"), F.col("cnt").alias("cnt_a")
    )
    s2 = singles.select(
        F.col("brand").alias("brand_b"), F.col("cnt").alias("cnt_b")
    )
    return (
        pairs.join(F.broadcast(s1), "brand_a")
        .join(F.broadcast(s2), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "pair_cnt",
            F.round(F.col("pair_cnt") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("pair_cnt") / F.col("cnt_a"), 6).alias("confidence"),
            F.round(
                F.col("pair_cnt") * F.col("n_orders")
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "stats_anova_f",
    oracle="""
    WITH g AS (
      SELECT event_type, COUNT(*) AS n, AVG(value) AS m,
             VAR_SAMP(value) AS s2
      FROM events GROUP BY event_type
    ),
    tot AS (
      SELECT SUM(n) AS n_tot, SUM(n * m) / SUM(n) AS m_all, COUNT(*) AS k
      FROM g
    )
    SELECT CAST(t.k AS BIGINT) AS k_groups, CAST(t.n_tot AS BIGINT) AS n_total,
      ROUND(SUM(g.n * (g.m - t.m_all) * (g.m - t.m_all)) / (t.k - 1), 6)
        AS ms_between,
      ROUND(SUM((g.n - 1) * g.s2) / (t.n_tot - t.k), 6) AS ms_within,
      ROUND((SUM(g.n * (g.m - t.m_all) * (g.m - t.m_all)) / (t.k - 1))
            / (SUM((g.n - 1) * g.s2) / (t.n_tot - t.k)), 6) AS f_stat
    FROM g, tot t GROUP BY t.k, t.n_tot, t.m_all
    """,
)
def stats_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic for `value` across event types:
    between-group mean square over within-group mean square.

    One O(data) scan reduces to k per-group (n, mean, var) rows; the
    grand mean and the two mean squares are O(k) arithmetic on that
    tiny frame (k=5 here, k≤thousands at scale — always driver-
    broadcastable). Sufficient-statistics decomposition is what makes
    this a single-pass test at 100 TB: no per-group re-scan, no
    residual materialization.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("s2"),
    )
    tot = g.agg(
        F.sum("n").alias("n_tot"),
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("m_all"),
        F.count("*").alias("k"),
    )
    j = g.crossJoin(F.broadcast(tot))
    ssb = F.sum(
        F.col("n") * (F.col("m") - F.col("m_all")) * (F.col("m") - F.col("m_all"))
    )
    ssw = F.sum((F.col("n") - 1) * F.col("s2"))
    return j.groupBy(
        F.col("k").alias("k_groups"), F.col("n_tot").alias("n_total")
    ).agg(
        F.round(ssb / (F.first("k") - 1), 6).alias("ms_between"),
        F.round(ssw / (F.first("n_tot") - F.first("k")), 6).alias("ms_within"),
        F.round(
            (ssb / (F.first("k") - 1))
            / (ssw / (F.first("n_tot") - F.first("k"))),
            6,
        ).alias("f_stat"),
    )


@register(
    "timeseries_autocorr",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS d,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, cnt,
             LAG(cnt) OVER (PARTITION BY event_type ORDER BY d) AS prev
      FROM daily
    )
    SELECT event_type, CAST(COUNT(prev) AS BIGINT) AS n_pairs,
           ROUND(CORR(cnt, prev), 6) AS acf_lag1
    FROM lagged GROUP BY event_type
    """,
)
def timeseries_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily event-count series per
    event type: Pearson correlation of (x_t, x_{t-1}) — positive ⇒
    trending/bursty days, negative ⇒ mean-reverting.

    The O(data) stage is one groupBy down to (type, day) — at 100 TB
    that is years × types rows, tiny. The lag window and the corr
    aggregate both key on event_type, so the day-series shuffle is
    reused (window partition == groupBy key, no second exchange of
    consequence). corr() is the sample correlation in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type", "cnt", F.lag("cnt").over(w).alias("prev")
    )
    return lagged.groupBy("event_type").agg(
        F.count("prev").alias("n_pairs"),
        F.round(F.corr("cnt", "prev"), 6).alias("acf_lag1"),
    )


@register(
    "timeseries_seasonality_dow",
    oracle="""
    WITH daily AS (
      SELECT CAST(DATE_TRUNC('day', o_orderdate) AS DATE) AS d,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT AVG(rev) AS overall FROM daily)
    SELECT CAST(EXTRACT(DOW FROM d) AS INT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(rev), 2) AS avg_rev,
           ROUND(AVG(rev) / ANY_VALUE(t.overall), 6) AS seasonal_idx
    FROM daily, tot t GROUP BY 1
    """,
)
def timeseries_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative day-of-week seasonality of order revenue: mean
    daily revenue per weekday divided by the overall daily mean — the
    seasonal-index vector a forecast baseline divides out.

    One O(data) groupBy to daily totals; the 7-row index and the
    scalar grand mean are O(days) follow-ups (the grand mean rides in
    broadcast). Index convention pinned to DOW 0=Sunday in both
    engines (Spark's dayofweek() is 1-based Sunday, hence the -1).
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    tot = daily.agg(F.avg("rev").alias("overall"))
    return (
        daily.crossJoin(F.broadcast(tot))
        .groupBy((F.dayofweek("d") - 1).cast("int").alias("dow"))
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.avg("rev"), 2).alias("avg_rev"),
            F.round(F.avg("rev") / F.first("overall"), 6).alias("seasonal_idx"),
        )
    )


@register(
    "event_funnel_windowed",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
        AND e.ts <= v.t_view + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_buy
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        AND e.ts <= c.t_click + INTERVAL 24 HOUR
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_24h,
           (SELECT COUNT(*) FROM p) AS n_purchase_24h
    """,
)
def event_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel (greedy first-touch chain): first view,
    then first click within 24h of that view, then first purchase
    within 24h of that click — the windowFunnel-shaped counterpart of
    `funnel_conversion`, where unbounded ordering is replaced by a
    per-step deadline.

    Implemented as three chained window aggregates all partitioned by
    user_id: Spark plans them over ONE exchange + sort (consecutive
    Window operators with the same partitioning share the shuffle),
    and the final per-user reduce reuses that partitioning too — the
    whole funnel costs a single O(data) shuffle, with no per-stage
    self-joins (the oracle spells the same chain as joins because SQL
    can't reference a window result inside a peer window).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    h24 = F.expr("INTERVAL 24 HOURS")
    e1 = e.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    e2 = e1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t_view"))
                & (F.col("ts") <= F.col("t_view") + h24),
                F.col("ts"),
            )
        ).over(w),
    )
    e3 = e2.withColumn(
        "t_buy",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click"))
                & (F.col("ts") <= F.col("t_click") + h24),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = e3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_buy").alias("t_buy"),
    )
    return per_user.agg(
        F.count_if(F.col("t_view").isNotNull()).alias("n_view"),
        F.count_if(F.col("t_click").isNotNull()).alias("n_click_24h"),
        F.count_if(F.col("t_buy").isNotNull()).alias("n_purchase_24h"),
    )
