"""Business/finance analytics suite.

Folded from the round-build batch modules (analytics_extras*): every
query whose name matches this domain moved here verbatim together
with its batch-local helpers, so related operators read side by side.
Section banners record the source batch; helpers shared across
domains were duplicated module-private; colliding private names carry
a _b<batch> suffix.
"""

from __future__ import annotations



# ========================================================================
# from analytics_extras3.py — original batch rationale:
# Analytics extras, batch 3: market-basket association rules,
# one-way ANOVA, time-series autocorrelation and seasonality, and a
# time-constrained conversion funnel.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's aggregation / events tiers:
#
# * association rules — support/confidence/lift over within-order brand
#   pairs, the classic recommender co-purchase signal;
# * one-way ANOVA F — does the metric differ across k variants, in two
#   aggregate passes over one scan;
# * lag-1 autocorrelation — is the daily series trending or mean-
#   reverting, per event type;
# * day-of-week seasonal indexes — multiplicative seasonality factors
#   for forecast baselines;
# * windowed funnel — view→click→purchase where each step must land
#   within 24h of the previous (greedy first-touch chain), the
#   ClickHouse-windowFunnel-shaped variant of `funnel_conversion`.
# ========================================================================
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

    Scale shape: ONE ok-keyed groupBy builds per-order distinct-brand
    baskets (collect_set dedups in-row, ≤ 25 brands per order), and
    pairs are expanded IN-ROW (C(25,2) max per order) before a
    brand-pair aggregate — no ok-keyed self-join, so the incidence
    list is shuffled once, not three times. Singles and the order
    count are tiny aggregates broadcast back. At 100 TB the only
    O(data) stages are the first join (part, unhinted — AQE's call)
    and the basket groupBy; everything downstream is
    O(orders × k²) with small k.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # Per-order distinct-brand baskets via ONE ok-keyed groupBy
    # (collect_set dedups in-row), materialized once for the three
    # consumers (order count, single counts, pair expansion). The
    # former distinct + ok-keyed self-join re-shuffled the item set
    # to ok-partitioning on BOTH join sides (r13, same in-basket
    # C(n,2) expansion as recsys_item_cooccurrence); pairs stay
    # in-row until exploded, <= C(25,2) per order (brand vocabulary
    # bounds the basket).
    baskets = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .groupBy("ok")
        .agg(F.array_sort(F.collect_set("brand")).alias("bs"))
        .localCheckpoint()
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    singles = baskets.select(F.explode("bs").alias("brand")).groupBy(
        "brand"
    ).agg(F.count("*").alias("cnt"))
    pair_arr = F.flatten(
        F.transform(
            F.col("bs"),
            lambda x, i: F.transform(
                F.slice(F.col("bs"), i + 2, F.size(F.col("bs"))),
                lambda y: F.struct(x.alias("brand_a"), y.alias("brand_b")),
            ),
        )
    )
    pairs = (
        baskets.where(F.size("bs") >= 2)
        .select(F.explode(pair_arr).alias("pr"))
        .select(
            F.col("pr.brand_a").alias("brand_a"),
            F.col("pr.brand_b").alias("brand_b"),
        )
        .groupBy("brand_a", "brand_b")
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


# ========================================================================
# from analytics_extras4.py — original batch rationale:
# Analytics extras, batch 4: C4-style duplicate-span corpus stats,
# linear multi-touch attribution, price-series drawdown, ABC (Pareto
# class) inventory classification, CUSUM changepoint detection, and
# daily lead-lag cross-correlation.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's LLM-pipeline / aggregation /
# time-series tiers:
#
# * duplicate-span stats — the C4/RefinedWeb signal "how much of each
#   document is made of spans that also occur in other documents",
#   computed on non-overlapping 10-token spans;
# * linear attribution — purchase value split equally across the
#   user's view/click touches in the prior 7 days, the simplest
#   defensible multi-touch model;
# * max drawdown — largest peak-to-trough decline of the daily-revenue
#   series, the classic risk statistic;
# * ABC classification — A/B/C Pareto classes by cumulative revenue
#   share (70/90 cut), the inventory-management staple;
# * CUSUM changepoint — day of maximum |cumulative deviation from the
#   mean| per event type, the page-one change-detection statistic;
# * cross-correlation — Pearson correlation between the daily view
#   series and the purchase series shifted by lag −3..+3 days, the
#   lead-lag discovery tool.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "finance_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(DATE_TRUNC('day', o_orderdate) AS DATE) AS d,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    dd AS (SELECT d, rev, MAX(rev) OVER (ORDER BY d) AS peak FROM daily)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(MAX(peak - rev), 2) AS max_drawdown,
           ROUND(MAX((peak - rev) / peak), 6) AS max_drawdown_frac
    FROM dd
    """,
)
def finance_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily-revenue series: largest decline
    from the running peak, absolute and as a fraction of the peak.

    Scale shape: one O(data) groupBy collapses to the daily series
    (years of days — thousands of rows); the running-max window and
    the final reduce are O(days) on a single partition, which is the
    correct plan for a series that small. At 100 TB only the first
    aggregate touches the fact table.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.select(
        "rev", F.max("rev").over(w).alias("peak")
    )
    return dd.agg(
        F.count("*").alias("n_days"),
        F.round(F.max(F.col("peak") - F.col("rev")), 2).alias("max_drawdown"),
        F.round(
            F.max((F.col("peak") - F.col("rev")) / F.col("peak")), 6
        ).alias("max_drawdown_frac"),
    )


# ========================================================================
# from analytics_extras5.py — original batch rationale:
# Analytics extras, batch 5: leave-one-out target encoding, bigram
# language-model surprisal, closed-form two-factor OLS, data-freshness
# audit, and a running order-backlog series.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's feature-engineering / corpus-
# curation / governance tiers:
#
# * LOO target encoding — the leakage-safe categorical encoder
#   ((sum−own)/(n−1)), reported as per-category distribution stats;
# * bigram surprisal — add-one-smoothed bigram LM scored over its own
#   corpus, the step past `text_lm_unigram_score`'s unigram model;
# * two-factor OLS — price ~ quantity + line-count by Cramer's rule on
#   sufficient statistics, the multivariate step past
#   `udaf_regression_slope`;
# * freshness lag — hours since each event type's latest record vs the
#   global high-watermark, the staleness monitor every ingest needs;
# * order backlog — opened-minus-shipped running balance, peak and
#   date, the gaps-and-islands-free flow/stock query.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "orders_backlog_running",
    oracle="""
    WITH opened AS (
      SELECT CAST(DATE_TRUNC('day', o_orderdate) AS DATE) AS d,
             COUNT(*) AS delta
      FROM orders GROUP BY 1
    ),
    closed AS (
      SELECT CAST(DATE_TRUNC('day', mx) AS DATE) AS d, -COUNT(*) AS delta
      FROM (SELECT l_orderkey, MAX(l_shipdate) AS mx
            FROM lineitem GROUP BY 1)
      GROUP BY 1
    ),
    flows AS (
      SELECT d, SUM(delta) AS net FROM (
        SELECT * FROM opened UNION ALL SELECT * FROM closed) GROUP BY d
    ),
    bal AS (SELECT d, SUM(net) OVER (ORDER BY d) AS backlog FROM flows)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(backlog) AS BIGINT) AS peak_backlog,
           CAST(MIN(CASE WHEN backlog = (SELECT MAX(backlog) FROM bal)
                         THEN d END) AS TIMESTAMP) AS peak_day,
           CAST(SUM(CASE WHEN backlog < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS neg_days
    FROM bal
    """,
)
def orders_backlog_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time: +1 the day an order is placed,
    −1 the day its last line ships; running-sum the daily net flow
    and report the peak backlog, its date, and a sanity count of
    negative days (must be 0 — an order cannot close before opening).

    Scale shape: two O(data) aggregates (orders by day; lineitem
    reduced per order then by day) collapse to day-level flows before
    any window; the union, running sum, and final reduce are O(days).
    The flow/stock decomposition is what avoids the naive
    per-order interval explode — no row ever carries an interval, so
    there is no overlap join anywhere.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    opened = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count("*").alias("delta")
    )
    closed = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("mx"))
        .groupBy(F.to_date("mx").alias("d"))
        .agg((-F.count("*")).alias("delta"))
    )
    flows = (
        opened.unionAll(closed).groupBy("d").agg(F.sum("delta").alias("net"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    bal = flows.select("d", F.sum("net").over(w).alias("backlog"))
    peak = bal.agg(F.max("backlog").alias("pk"))
    return bal.crossJoin(F.broadcast(peak)).agg(
        F.count("*").alias("n_days"),
        F.max("backlog").alias("peak_backlog"),
        F.min(F.when(F.col("backlog") == F.col("pk"), F.col("d")))
        .cast("timestamp")
        .alias("peak_day"),
        F.sum((F.col("backlog") < 0).cast("int")).alias("neg_days"),
    )


# ========================================================================
# from analytics_extras10.py — original batch rationale:
# Analytics extras, batch 10: retrieval end-to-end, embedding
# compression trade-offs, volume anomaly alerts, and cohort LTV.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's similarity-search / embedding /
# data-quality / finance tiers:
#
# * semantic search e2e — query vector -> cosine top-k -> metadata
#   join, the full retrieval path in one plan;
# * Matryoshka truncation — recall@10 of prefix-16-dim cosine against
#   full 64-dim ranking (the MRL trade-off, measured);
# * binary quantization — sign-bit signatures + Hamming ranking vs
#   exact cosine, recall@10 per query;
# * volume spike — trailing-window z-score day alerts;
# * cohort LTV — first-order cohorts x age, cumulative spend per
#   customer (the retention-triangle economics view).
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "finance_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             CAST(date_trunc('month', MIN(CAST(o_orderdate AS DATE)))
                  AS TIMESTAMP) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    sized AS (
      SELECT cohort, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort
    ),
    spend AS (
      SELECT f.cohort,
             date_diff('month', f.cohort,
                       CAST(date_trunc('month', CAST(o.o_orderdate AS DATE))
                            AS TIMESTAMP)) AS age,
             -- integer cents: float partial-sum order would make the
             -- cumulative total differ in the last bit across engines
             CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT s.cohort, s.age,
             SUM(s.rev_cents) OVER (PARTITION BY s.cohort ORDER BY s.age
                              ROWS UNBOUNDED PRECEDING) AS cum_cents,
             z.cohort_size
      FROM spend s JOIN sized z ON z.cohort = s.cohort
    )
    SELECT cohort, CAST(age AS BIGINT) AS age_months,
           CAST(cohort_size AS BIGINT) AS cohort_size,
           ROUND(cum_cents / (100.0 * cohort_size), 2) AS cum_ltv_per_customer
    FROM cum WHERE age <= 6
    """,
)
def finance_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers cohort by first-order
    month; revenue accumulates per cohort across age-in-months; the
    output is cumulative LTV per customer for ages 0-6 — the
    retention-economics view (does a newer cohort monetize faster?)
    that sits one step past retention_weekly's activity matrix.

    Shape: firsts is one groupBy on custkey, re-joined to orders on
    the same key (co-partitioned at scale via bucketing); the
    age-ordered running sum operates on the O(cohorts x ages)
    aggregate, not on orders."""
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min(F.to_date("o_orderdate"))).alias("cohort")
    )
    sized = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    month = F.date_trunc("month", F.to_date("o_orderdate"))
    spend = (
        o.join(firsts, "o_custkey")
        .select(
            "cohort",
            F.months_between(month, F.col("cohort")).cast("long").alias("age"),
            # integer cents: exact associative partial sums (see oracle)
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("cohort", "age")
        .agg(F.sum("cents").alias("rev_cents"))
    )
    wc = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = spend.join(F.broadcast(sized), "cohort").select(
        "cohort",
        "age",
        "cohort_size",
        F.sum("rev_cents").over(wc).alias("cum_cents"),
    )
    return cum.where(F.col("age") <= 6).select(
        "cohort",
        F.col("age").cast("long").alias("age_months"),
        F.col("cohort_size").cast("long").alias("cohort_size"),
        F.round(F.col("cum_cents") / (100.0 * F.col("cohort_size")), 2).alias(
            "cum_ltv_per_customer"
        ),
    )


# ========================================================================
# from analytics_extras14.py — original batch rationale:
# Analytics extras, batch 14: growth accounting, inventory reorder
# points, and rare-category redaction.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's product-analytics / operations /
# privacy tiers:
#
# * user lifecycle — monthly growth accounting (new / retained /
#   resurrected / churned), the canonical active-user bridge;
# * reorder point — mu*L + z*sigma*sqrt(L) safety-stock math per part
#   from daily demand statistics;
# * rare-category redaction — small categories collapse into OTHER
#   before release (the k-threshold suppression rule that complements
#   privacy_k_anonymity).
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_ROP_LEAD_DAYS = 7


_ROP_Z = 1.645


_ROP_TOP = 20



@register(
    "inventory_reorder_point",
    oracle=f"""
    WITH daily AS (
      SELECT l_partkey,
             CAST(l_shipdate AS DATE) AS d,
             SUM(l_quantity) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    stats AS (
      SELECT l_partkey,
             COUNT(*) AS n_days,
             SUM(q) AS total_q,
             AVG(q) AS mu,
             STDDEV_SAMP(q) AS sigma
      FROM daily GROUP BY l_partkey
    ),
    top AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY total_q DESC, l_partkey) AS rk
      FROM stats
    )
    SELECT l_partkey,
           CAST(n_days AS BIGINT) AS n_demand_days,
           ROUND(mu, 2) AS mu_daily,
           ROUND(sigma, 2) AS sigma_daily,
           ROUND(mu * {_ROP_LEAD_DAYS} + {_ROP_Z} * sigma
                 * sqrt({_ROP_LEAD_DAYS}.0), 2) AS reorder_point
    FROM top WHERE rk <= {_ROP_TOP}
    """,
)
def inventory_reorder_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety-stock reorder points for the top-20 parts by volume:
    ROP = mu_d*L + z*sigma_d*sqrt(L) with a 7-day replenishment lead
    and a 95% service level (z=1.645), from per-part daily demand
    statistics over days with observed demand — the operations-
    research formula a supply chain recomputes nightly over its whole
    catalog.

    Shape: one (part, day) aggregate then one per-part stats pass;
    the top-k is TakeOrdered on the O(parts) stats table. At 100 TB
    the first groupBy is the only fact-table shuffle, keyed on
    partkey (well spread)."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy("l_partkey", F.to_date("l_shipdate").alias("d")).agg(
        F.sum("l_quantity").alias("q")
    )
    stats = daily.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("q").alias("total_q"),
        F.avg("q").alias("mu"),
        F.stddev_samp("q").alias("sigma"),
    )
    top = stats.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("total_q"), "l_partkey"))
        .alias("rk"),
    ).where(F.col("rk") <= _ROP_TOP)
    rop = F.col("mu") * _ROP_LEAD_DAYS + _ROP_Z * F.col("sigma") * F.sqrt(
        F.lit(float(_ROP_LEAD_DAYS))
    )
    return top.select(
        "l_partkey",
        F.col("n_days").cast("long").alias("n_demand_days"),
        F.round("mu", 2).alias("mu_daily"),
        F.round("sigma", 2).alias("sigma_daily"),
        F.round(rop, 2).alias("reorder_point"),
    )


# ========================================================================
# from analytics_extras19.py — original batch rationale:
# Analytics extras, batch 19: classifier evaluation, promo lift,
# supplier concentration, and character entropy.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's evaluation / business-analytics /
# text tiers:
#
# * langid confusion — declared-vs-predicted label matrix + accuracy
#   for the text_langid classifier (models need scoreboards, not just
#   predictions);
# * promo-day lift — first-of-month revenue vs same-day-of-week
#   baseline, the seasonally-controlled lift read;
# * supplier HHI — Herfindahl-Hirschman concentration of supplier
#   revenue within each brand, the supply-chain-risk index;
# * char entropy — per-document character-distribution entropy, the
#   cheapest corrupted/low-quality-text screen.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.queries.llm import _langid_oracle
from hivetomysql_spark.operators import text as T
from hivetomysql_spark.tables import load_table



@register(
    "supply_chain_hhi",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand AS brand, l.l_suppkey,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS r
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT brand, SUM(r) AS t, COUNT(*) AS n_suppliers FROM rev GROUP BY brand
    )
    SELECT rev.brand,
           CAST(MIN(tot.n_suppliers) AS BIGINT) AS n_suppliers,
           ROUND(SUM((rev.r / tot.t) * (rev.r / tot.t)) * 10000, 1) AS hhi,
           ROUND(MAX(rev.r / tot.t), 4) AS top_supplier_share
    FROM rev JOIN tot ON tot.brand = rev.brand
    GROUP BY rev.brand
    """,
)
def supply_chain_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per brand: the Herfindahl-Hirschman
    index (sum of squared revenue shares x 10000 — the antitrust
    scale where >2500 is 'highly concentrated') plus the single
    largest supplier's share — the supply-chain-risk screen that
    flags brands one supplier outage would take down.

    Shape: one fact-scan aggregate to (brand, supplier) revenue
    (part is broadcast), one O(pairs) rollup; shares come from a
    broadcast-joined totals table, not a window over the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("p_brand").alias("brand"), "l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"))
    )
    tot = rev.groupBy("brand").agg(
        F.sum("r").alias("t"), F.count(F.lit(1)).alias("n_suppliers")
    )
    j = rev.join(F.broadcast(tot), "brand")
    share = F.col("r") / F.col("t")
    return j.groupBy("brand").agg(
        F.min("n_suppliers").cast("long").alias("n_suppliers"),
        F.round(F.sum(share * share) * 10000, 1).alias("hhi"),
        F.round(F.max(share), 4).alias("top_supplier_share"),
    )


# ========================================================================
# from analytics_extras22.py — original batch rationale:
# Analytics extras, batch 22: margin waterfall, error-budget burn,
# and discount elasticity.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's finance / SRE / pricing tiers:
#
# * margin waterfall — gross -> discount -> tax -> net monthly bridge,
#   the revenue-decomposition view finance closes the month with;
# * error-budget burn — SLO error-rate burn multiple per day plus
#   days-to-exhaustion, the SRE alerting arithmetic;
# * discount elasticity — quantity response across discount bands with
#   the overall correlation, the naive pricing-effect read.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "orders_margin_waterfall",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS TIMESTAMP)
               AS month,
             -- per-row terms quantized to integer 1e-4 units before
             -- summing: the row products are bit-identical across
             -- engines, and integer partial sums are order-exact, so
             -- no ROUND can land on a float-sum boundary
             SUM(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT))
               AS gross_u,
             SUM(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5)
                 AS BIGINT)) AS disc_u,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * l_tax
                            * 10000 + 0.5) AS BIGINT)) AS tax_u,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                            * 10000 + 0.5) AS BIGINT)) AS inv_u
      FROM lineitem GROUP BY 1
    )
    SELECT month,
           -- cent-rounding in INTEGER space: (u+50)//100 cents — a
           -- float ROUND would hit .xx5 half-cases where Spark
           -- (shortest-repr HALF_UP) and DuckDB (raw-bits) disagree
           CAST(FLOOR((gross_u + 50) / 100.0) AS BIGINT) / 100.0 AS gross,
           CAST(FLOOR((disc_u + 50) / 100.0) AS BIGINT) / 100.0
             AS discount_given,
           CAST(FLOOR((tax_u + 50) / 100.0) AS BIGINT) / 100.0
             AS tax_collected,
           CAST(FLOOR((inv_u + 50) / 100.0) AS BIGINT) / 100.0 AS invoiced,
           ROUND(disc_u * 1.0 / gross_u, 4) AS discount_rate
    FROM m
    """,
)
def orders_margin_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly margin waterfall over shipped lines: gross extended
    price, minus discounts given, plus tax collected, to the invoiced
    total — the bridge a finance close walks to explain why net moved
    (volume? discounting? tax mix?). Each component is a separate
    SUM so the bridge is additive and auditable.

    Shape: one grouped scan; every waterfall component is a parallel
    aggregate over the same rows — no self-joins, no windows."""
    li = load_table(spark, sf_dir, "lineitem")
    month = F.date_trunc("month", F.to_date("l_shipdate"))

    def units(expr):
        # integer 1e-4-unit ledger — order-exact partial sums (see oracle)
        return F.sum(F.floor(expr * 10000 + 0.5).cast("long"))

    gross = units(F.col("l_extendedprice"))
    disc = units(F.col("l_extendedprice") * F.col("l_discount"))
    tax = units(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.col("l_tax")
    )
    inv = units(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    def cents(u):
        # integer-space cent rounding (see oracle comment)
        return F.floor((u + 50) / 100.0).cast("long") / 100.0

    return li.groupBy(month.alias("month")).agg(
        cents(gross).alias("gross"),
        cents(disc).alias("discount_given"),
        cents(tax).alias("tax_collected"),
        cents(inv).alias("invoiced"),
        F.round(disc / gross, 4).alias("discount_rate"),
    )



@register(
    "pricing_discount_elasticity",
    oracle="""
    WITH banded AS (
      SELECT CAST(FLOOR(l_discount * 100 / 2) * 2 AS BIGINT) AS discount_pct_band,
             l_quantity, l_discount
      FROM lineitem
    ),
    corr_all AS (
      SELECT CORR(l_discount, l_quantity) AS c FROM lineitem
    )
    SELECT discount_pct_band,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(AVG(l_quantity), 3) AS avg_quantity,
           ROUND(MIN(c), 4) AS corr_discount_quantity
    FROM banded CROSS JOIN corr_all
    GROUP BY discount_pct_band
    """,
)
def pricing_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-response read: average quantity per 2-percentage-point
    discount band plus the overall discount-quantity correlation —
    the first-pass answer to 'do discounts move volume'. Flat bands
    with near-zero correlation (as in these fixtures, where discount
    is assigned independently) correctly read as NO naive
    elasticity — the guard against a pricing team over-reading
    observational data.

    Shape: one banded grouped scan; the corr is a second tiny
    aggregate broadcast across bands so every row of the report
    carries the headline number."""
    li = load_table(spark, sf_dir, "lineitem")
    banded = li.select(
        (F.floor(F.col("l_discount") * 100 / 2) * 2)
        .cast("long")
        .alias("discount_pct_band"),
        "l_quantity",
    )
    corr_all = li.agg(F.corr("l_discount", "l_quantity").alias("c"))
    return (
        banded.crossJoin(F.broadcast(corr_all))
        .groupBy("discount_pct_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(F.avg("l_quantity"), 3).alias("avg_quantity"),
            F.round(F.min("c"), 4).alias("corr_discount_quantity"),
        )
    )


# ========================================================================
# from analytics_extras23.py — original batch rationale:
# Analytics extras, batch 23: order-value percentile trends and
# categorical mix-shift drift.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); closes SURVEY.md §2.2's monitoring tier for this round:
#
# * percentile trend — monthly p50/p90/p99 order value, the tail-aware
#   alternative to tracking means;
# * mix-shift TVD — month-over-month total-variation distance of the
#   order-priority composition, the categorical counterpart of
#   drift_psi_value_distribution's numeric PSI.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "orders_percentile_trend",
    oracle="""
    WITH ranked AS (
      SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS TIMESTAMP)
               AS month,
             o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY date_trunc('month', CAST(o_orderdate AS DATE))
               ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (
               PARTITION BY date_trunc('month', CAST(o_orderdate AS DATE)))
               AS n
      FROM orders
    ),
    -- DISCRETE percentiles (value at rank ceil(q*n)): interpolated
    -- quantile_cont hits float half-cases where the two engines'
    -- lerp algebra differs in the last ulp; a rank-pick returns an
    -- exact data value, identical everywhere
    m AS (
      SELECT month,
             MIN(n) AS n,
             MIN(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN o_totalprice END) AS p50,
             MIN(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                      THEN o_totalprice END) AS p90,
             MIN(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                      THEN o_totalprice END) AS p99
      FROM ranked GROUP BY month
    )
    SELECT month,
           CAST(n AS BIGINT) AS n_orders,
           ROUND(p50, 2) AS p50,
           ROUND(p90, 2) AS p90,
           ROUND(p99, 2) AS p99,
           ROUND(p99 / p50, 3) AS tail_ratio
    FROM m
    """,
)
def orders_percentile_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order-value percentiles (p50/p90/p99) with the
    p99/p50 tail ratio — the distribution-aware trend line that
    catches 'the median is flat but whales doubled' months that a
    mean series hides.

    Shape: discrete percentiles via the grouped two-level row_number
    (months are BOUNDED — the calendar doesn't grow with the data,
    so a per-month rank window sorts N/80 rows in one task per month;
    r11 window audit) and a conditional pick at rank ceil(q*n) —
    exact data values, engine-portable (no interpolation). The month
    sizes ride out of the rank's own per-(month, bucket) totals
    (with_group_size — no second full-input aggregation). At 100 TB
    approx_percentile's mergeable
    t-digest is the cheaper-but-inexact alternative; the report
    shape is unchanged."""
    from hivetomysql_spark.operators.ranks import grouped_row_number

    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.to_date("o_orderdate"))
    base = o.select(month.alias("month"), "o_totalprice", "o_orderkey")
    ranked = grouped_row_number(
        base, ["month"], "o_totalprice", ["o_orderkey"], out="rn",
        with_group_size="n",
    ).select("month", "o_totalprice", "rn", "n")

    def disc(q: float):
        # discrete percentile: exact data value at rank ceil(q*n)
        # (see oracle comment on why not interpolated percentiles)
        return F.min(
            F.when(
                F.col("rn") == F.ceil(q * F.col("n")).cast("long"),
                F.col("o_totalprice"),
            )
        )

    g = ranked.groupBy("month").agg(
        F.min("n").alias("n"),
        disc(0.5).alias("p50"),
        disc(0.9).alias("p90"),
        disc(0.99).alias("p99"),
    )
    return g.select(
        "month",
        F.col("n").cast("long").alias("n_orders"),
        F.round("p50", 2).alias("p50"),
        F.round("p90", 2).alias("p90"),
        F.round("p99", 2).alias("p99"),
        F.round(F.col("p99") / F.col("p50"), 3).alias("tail_ratio"),
    )


# ========================================================================
# from analytics_extras24.py — original batch rationale:
# Analytics extras, batch 24: realized volatility and activation
# rate.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's finance / product-analytics
# tiers:
#
# * realized volatility — rolling 10-day standard deviation of daily
#   log revenue returns (annualized), the risk gauge behind
#   vol-scaled alerting and position sizing;
# * activation rate — share of users reaching >= 3 events in their
#   first week, the onboarding funnel's headline number.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "finance_realized_volatility",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    rets AS (
      SELECT d,
             ln(rev / LAG(rev) OVER (ORDER BY d)) AS r
      FROM daily
    ),
    vol AS (
      SELECT d, r,
             STDDEV_SAMP(r) OVER (ORDER BY d ROWS BETWEEN 9 PRECEDING
                                  AND CURRENT ROW) AS sd,
             COUNT(r) OVER (ORDER BY d ROWS BETWEEN 9 PRECEDING
                            AND CURRENT ROW) AS wn
      FROM rets WHERE r IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(sd) * sqrt(365.0), 4) AS avg_annualized_vol,
           ROUND(MAX(sd) * sqrt(365.0), 4) AS max_annualized_vol,
           ROUND(MAX(abs(r)), 4) AS max_abs_daily_return
    FROM vol WHERE wn = 10
    """,
)
def finance_realized_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized volatility of daily revenue: log returns
    ln(rev_t/rev_{t-1}), their rolling 10-day sample standard
    deviation annualized by sqrt(365), summarized as average and peak
    vol plus the largest single-day move — the risk lens (is revenue
    merely growing, or growing and destabilizing?) that pairs with
    the Bollinger monitor's level-based read.

    Shape: N orders compress to O(days); returns are one lag window
    and the vol one rolling window over the compressed series."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    wl = Window.orderBy("d")
    rets = daily.select(
        "d", F.log(F.col("rev") / F.lag("rev").over(wl)).alias("r")
    ).where(F.col("r").isNotNull())
    wv = Window.orderBy("d").rowsBetween(-9, 0)
    vol = rets.select(
        "r",
        F.stddev_samp("r").over(wv).alias("sd"),
        F.count("r").over(wv).alias("wn"),
    ).where(F.col("wn") == 10)
    ann = 365.0 ** 0.5
    return vol.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.avg("sd") * ann, 4).alias("avg_annualized_vol"),
        F.round(F.max("sd") * ann, 4).alias("max_annualized_vol"),
        F.round(F.max(F.abs("r")), 4).alias("max_abs_daily_return"),
    )


# ========================================================================
# from analytics_extras25.py — original batch rationale:
# Analytics extras, batch 25: OTIF logistics rate and unit-price
# dispersion.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's operations / pricing-governance
# tiers:
#
# * OTIF — on-time (ship within 30 days of order) share per priority
#   class, the fulfillment KPI contracts are written against;
# * price dispersion — per-part unit-price coefficient of variation,
#   the pricing-consistency audit that surfaces negotiated-discount
#   leakage and data errors alike.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_DISP_TOP = 15



@register(
    "pricing_dispersion_audit",
    oracle=f"""
    WITH unit AS (
      SELECT l_partkey,
             l_extendedprice / l_quantity AS unit_price
      FROM lineitem WHERE l_quantity > 0
    ),
    st AS (
      SELECT l_partkey,
             COUNT(*) AS n,
             AVG(unit_price) AS mu,
             STDDEV_SAMP(unit_price) AS sd
      FROM unit GROUP BY l_partkey
      HAVING COUNT(*) >= 5
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY sd / mu DESC, l_partkey) AS rk
      FROM st
    )
    SELECT l_partkey,
           CAST(n AS BIGINT) AS n_sales,
           ROUND(mu, 2) AS mean_unit_price,
           ROUND(sd / mu, 4) AS price_cv
    FROM ranked WHERE rk <= {_DISP_TOP}
    """,
)
def pricing_dispersion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-price consistency audit: for every part sold at least 5
    times, the coefficient of variation of realized unit price
    (extendedprice/quantity), reporting the 15 most-dispersed parts —
    high CV means inconsistent pricing (negotiated leakage, currency
    mistakes, or unit errors), the audit a pricing desk runs before
    trusting revenue analytics built on 'the' price.

    Shape: one scan to per-part moments (map-side combinable), top-k
    by CV via TakeOrdered on the O(parts) stats table."""
    li = load_table(spark, sf_dir, "lineitem")
    unit = li.where(F.col("l_quantity") > 0).select(
        "l_partkey", (F.col("l_extendedprice") / F.col("l_quantity")).alias("up")
    )
    st = (
        unit.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("up").alias("mu"),
            F.stddev_samp("up").alias("sd"),
        )
        .where(F.col("n") >= 5)
    )
    ranked = st.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc(F.col("sd") / F.col("mu")), "l_partkey"))
        .alias("rk"),
    ).where(F.col("rk") <= _DISP_TOP)
    return ranked.select(
        "l_partkey",
        F.col("n").cast("long").alias("n_sales"),
        F.round("mu", 2).alias("mean_unit_price"),
        F.round(F.col("sd") / F.col("mu"), 4).alias("price_cv"),
    )


# ========================================================================
# from analytics_extras28.py — original batch rationale:
# Analytics extras, batch 28: scalable statistics and graph/recsys ops.
#
# None of these exist in the reference (`HiveToMysql.java:1-641` copies
# rows, computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * Spearman rank correlation — the robust (monotone, outlier-immune)
#   complement of the `agg_stats` Pearson family.
# * Poisson bootstrap — THE scalable bootstrap (one pass, no
#   resampling shuffle); md5-deterministic so the whole mechanism is
#   oracle-checked end-to-end.
# * item co-occurrence similarity — the item-item collaborative-
#   filtering kernel (cosine over co-purchase incidence).
# * common-neighbor link prediction — Jaccard scores for unlinked
#   pairs of the co-purchase graph.
# * WOE / information value — the credit-scoring feature screen.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "recsys_item_cooccurrence",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    deg AS (SELECT p, COUNT(*) AS d FROM op GROUP BY p),
    pairs AS (
      SELECT a.p AS p1, b.p AS p2, COUNT(*) AS n_co
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
    )
    SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
           CAST(n_co AS BIGINT) AS n_co,
           ROUND(n_co / SQRT(d1.d * d2.d), 6) AS cosine
    FROM pairs
    JOIN deg d1 ON d1.p = pairs.p1
    JOIN deg d2 ON d2.p = pairs.p2
    WHERE n_co >= 2
    ORDER BY cosine DESC, p1, p2
    LIMIT 20
    """,
)
def recsys_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering kernel: cosine similarity
    over the order×part incidence matrix — n_co(i,j) / sqrt(n_i·n_j),
    reported for the top-20 co-purchased part pairs (min support 2).
    This is the batch half of every "customers also bought" ranker.

    Shape: the self-join is keyed on l_orderkey, so the fan-out per
    order is bounded by order size squared (TPC-H ≤ 7 lines → ≤ 21
    pairs) — a posting-list expansion, not an all-pairs product; then
    one groupBy(p1,p2) and two joins against the O(parts) degree
    table. At 100 TB the same plan holds because the per-order bound
    is a data invariant; a hot-item cap (drop items in > T% of
    orders, as in `dedup_ngram_jaccard`'s max_posting_len) bounds the
    worst case."""
    li = load_table(spark, sf_dir, "lineitem")
    # per-order part sets -> in-array C(n,2) pair expansion (the same
    # 1-shuffle form graph_kcore/copurchase_component_labels use,
    # r13): the former distinct + o-keyed self-join re-shuffled the
    # incidence list to order partitioning on BOTH join sides; here
    # the pairs never leave the row until exploded, and only the
    # basket groupBy and the pair aggregate shuffle. Baskets are
    # bounded by order size (TPC-H <= 7 lines), so the expansion is
    # <= 21 in-row structs per order. Materialized once: it feeds the
    # degree table AND the pair expansion.
    baskets = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o")
        .agg(F.array_sort(F.collect_set("p")).alias("ps"))
        .localCheckpoint()
    )
    deg = baskets.select(F.explode("ps").alias("p")).groupBy("p").agg(
        F.count(F.lit(1)).alias("d")
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("p1"), y.alias("p2")),
            ),
        )
    )
    pairs = (
        baskets.where(F.size("ps") >= 2)
        .select(F.explode(pair_arr).alias("pr"))
        .select(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .where(F.col("n_co") >= 2)
    )
    out = (
        pairs.join(deg.select(F.col("p").alias("p1"), F.col("d").alias("d1")), "p1")
        .join(deg.select(F.col("p").alias("p2"), F.col("d").alias("d2")), "p2")
        .select(
            F.col("p1").cast("long"),
            F.col("p2").cast("long"),
            F.col("n_co").cast("long"),
            F.round(F.col("n_co") / F.sqrt(F.col("d1") * F.col("d2")), 6).alias(
                "cosine"
            ),
        )
    )
    return out.orderBy(F.desc("cosine"), "p1", "p2").limit(20)


# ========================================================================
# from analytics_extras29.py — original batch rationale:
# Analytics extras, batch 29: relational ML training/eval and
# corpus-tooling ops.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * multinomial naive Bayes language ID — train AND predict fully
#   relationally (count model + broadcast log-likelihood join), the
#   simplest end-to-end ML loop an engine can host.
# * ABC/XYZ inventory matrix — Pareto revenue class × demand
#   variability class, the ops-planning segmentation.
# * discrete-time churn hazard — the hazard-table complement of the
#   Kaplan-Meier survival query.
# * BPE first-merge candidates — the pair-count step every tokenizer
#   trainer runs over the corpus.
# * RAKE keyword extraction — stopword-delimited phrase scoring via
#   gaps-and-islands, no UDFs.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "inventory_abc_xyz",
    oracle="""
    WITH rev AS (
      SELECT l_partkey AS p,
             SUM(l_extendedprice * (1 - l_discount)) AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    abc AS (
      SELECT p, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, p
                                ROWS UNBOUNDED PRECEDING)
               / SUM(revenue) OVER () AS cum_share
      FROM rev
    ),
    abc_cls AS (
      SELECT p, revenue,
             CASE WHEN cum_share <= 0.5 THEN 'A'
                  WHEN cum_share <= 0.8 THEN 'B' ELSE 'C' END AS abc_class
      FROM abc
    ),
    monthly AS (
      SELECT l_partkey AS p, DATE_TRUNC('month', l_shipdate) AS m,
             SUM(l_quantity) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    xyz AS (
      SELECT p,
             CASE WHEN AVG(q) = 0 THEN 'Z'
                  WHEN COALESCE(STDDEV_SAMP(q), 0) / AVG(q) <= 0.3 THEN 'X'
                  WHEN COALESCE(STDDEV_SAMP(q), 0) / AVG(q) <= 0.6 THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM monthly GROUP BY p
    )
    SELECT abc_class, xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE)
                 / (SELECT CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE)
                    FROM rev), 6)
             AS revenue_share
    FROM abc_cls JOIN xyz USING (p)
    GROUP BY abc_class, xyz_class
    ORDER BY abc_class, xyz_class
    """,
)
def inventory_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/XYZ inventory segmentation matrix: ABC = Pareto class of
    cumulative revenue share (A ≤ 50 %, B ≤ 80 %, C rest, ordered
    revenue-desc with part-key tie-break), XYZ = demand-variability
    class from the coefficient of variation of monthly shipped
    quantity (X ≤ 0.3, Y ≤ 0.6, Z above) — the 3×3 grid that decides
    stocking policy per cell (forecast-driven for AX, make-to-order
    for CZ).

    Shape: two part-keyed aggregations (revenue, monthly demand) and
    one O(parts) cumulative window; the global cum-share window is
    over the already-reduced part table, orders of magnitude smaller
    than the fact scan — at 100 TB it becomes a range-partitioned
    prefix sum like `etl_surrogate_keys`."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )
    cum = rev.select(
        "p",
        "revenue",
        (
            F.sum("revenue").over(
                Window.orderBy(F.desc("revenue"), "p").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            / F.sum("revenue").over(
                Window.partitionBy()
            )
        ).alias("cum_share"),
    )
    abc = cum.select(
        "p",
        "revenue",
        F.when(F.col("cum_share") <= 0.5, "A")
        .when(F.col("cum_share") <= 0.8, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    monthly = li.groupBy(
        F.col("l_partkey").alias("p"),
        F.date_trunc("month", "l_shipdate").alias("m"),
    ).agg(F.sum("l_quantity").alias("q"))
    cv = F.coalesce(F.stddev_samp("q"), F.lit(0.0)) / F.avg("q")
    xyz = monthly.groupBy("p").agg(
        F.when(F.avg("q") == 0, "Z")
        .when(cv <= 0.3, "X")
        .when(cv <= 0.6, "Y")
        .otherwise("Z")
        .alias("xyz_class")
    )
    tot = rev.agg(
        F.sum(F.col("revenue").cast("decimal(18,4)")).cast("double").alias("t")
    )
    return (
        abc.join(xyz, "p")
        .crossJoin(F.broadcast(tot))
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(
                F.sum(F.col("revenue").cast("decimal(18,4)")).cast("double")
                / F.first("t"),
                6,
            ).alias("revenue_share"),
        )
        .orderBy("abc_class", "xyz_class")
    )


# ========================================================================
# from analytics_extras34.py — original batch rationale:
# Analytics extras, batch 34: graph partition quality, queueing
# audit, generation diversity, and local differential privacy.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * modularity — partition quality of a labeling over the co-purchase
#   graph, the community-detection objective as a closed-form query.
# * Little's law audit — L = λ·W consistency check over the order
#   flow, the queueing-theory sanity test for ops metrics.
# * distinct n-gram diversity — the distinct-1/2/3 metrics used to
#   audit generated-text (or corpus) diversity.
# * randomized response — local-DP frequency estimation with
#   md5-determinized coin flips, debiased back to true rates.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



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


# ========================================================================
# from analytics_extras35.py — original batch rationale:
# Analytics extras, batch 35: targeting economics, embedding drift,
# heavy tails, and graph mixing structure.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * cumulative gains / lift table — the decile targeting-economics
#   view every campaign model ships with.
# * embedding centroid drift — per-label centroid displacement between
#   two corpus halves, the embedding-space drift monitor.
# * Hill tail index — the heavy-tail exponent estimator for revenue /
#   latency distributions.
# * degree assortativity — do hubs link to hubs? The Pearson degree
#   correlation over edges.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_HILL_K = 100



@register(
    "finance_hill_tail_index",
    oracle=f"""
    WITH topk AS (
      SELECT o_totalprice AS x,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
               AS rk
      FROM orders
    ),
    sel AS (SELECT x, rk FROM topk WHERE rk <= {_HILL_K + 1}),
    xmin AS (SELECT x AS xk FROM sel WHERE rk = {_HILL_K + 1})
    SELECT CAST({_HILL_K} AS BIGINT) AS k,
           ROUND((SELECT xk FROM xmin), 4) AS threshold,
           ROUND(1.0 / (SUM(LN(sel.x / xmin.xk)) / {_HILL_K}), 6)
             AS hill_alpha
    FROM sel, xmin
    WHERE sel.rk <= {_HILL_K}
    """,
)
def finance_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the heavy-tail exponent α over the top-100
    order values: α̂ = k / Σ ln(x_(i)/x_(k+1)) — the standard tail
    estimator for revenue, latency, and claim-size distributions;
    α ≤ 2 means infinite variance (plan capacity by quantiles, not
    means), large α means the tail is thin and mean-based planning is
    safe.

    Shape: top-(k+1) selection is a TakeOrdered O(k) reduction (no
    global sort at scale), then O(k) log math — the data-sized stage
    is a single scan."""
    o = load_table(spark, sf_dir, "orders")
    topk = (
        o.select("o_totalprice", "o_orderkey")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(_HILL_K + 1)
        .select(
            F.col("o_totalprice").alias("x"),
            F.row_number()
            .over(Window.orderBy(F.desc("o_totalprice"), "o_orderkey"))
            .alias("rk"),
        )
    )
    xmin = topk.where(F.col("rk") == _HILL_K + 1).select(
        F.col("x").alias("xk")
    )
    return (
        topk.where(F.col("rk") <= _HILL_K)
        .crossJoin(F.broadcast(xmin))
        .agg(
            F.lit(_HILL_K).cast("long").alias("k"),
            F.round(F.first("xk"), 4).alias("threshold"),
            F.round(
                1.0 / (F.sum(F.log(F.col("x") / F.col("xk"))) / _HILL_K), 6
            ).alias("hill_alpha"),
        )
    )


# ========================================================================
# from analytics_extras37.py — original batch rationale:
# Analytics extras, batch 37: clustering initialization, inventory
# economics, causal estimation, and intermittent-demand forecasting.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * k-means++ seeding — D²-weighted center selection, the step that
#   makes Lloyd's algorithm work; md5-determinized so the sampling
#   itself is oracle-checked round by round.
# * newsvendor quantile — the critical-fractile stocking level from
#   the empirical demand distribution.
# * difference-in-differences — the 2×2 causal estimator over a
#   pre/post × treat/control split.
# * Croston's method — the intermittent-demand forecaster (separate
#   EMAs for demand size and inter-demand interval).
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "finance_newsvendor_quantile",
    oracle="""
    WITH demand AS (
      SELECT l_partkey AS p, DATE_TRUNC('month', l_shipdate) AS m,
             SUM(l_quantity) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    pick AS (
      SELECT p,
             COUNT(*) AS n_months,
             quantile_cont(q, 0.75) AS stock_cf75,
             quantile_cont(q, 0.5) AS stock_cf50,
             AVG(q) AS mean_q
      FROM demand GROUP BY p
      HAVING COUNT(*) >= 24
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(AVG(stock_cf75 / mean_q), 6) AS avg_uplift_cf75,
           ROUND(AVG(stock_cf50 / mean_q), 6) AS avg_uplift_cf50,
           ROUND(AVG(stock_cf75 - stock_cf50), 4) AS avg_buffer
    FROM pick
    """,
)
def finance_newsvendor_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking levels: with underage cost c_u and overage
    c_o, the optimal order-up-to level is the c_u/(c_u+c_o) quantile
    of demand (critical fractile) — evaluated per part from the
    empirical monthly distribution at fractiles 0.75 (underage 3×
    overage) and 0.5 (symmetric), summarized as uplift over mean
    demand and the safety buffer between service levels. The
    operations-research decision rule as a two-aggregate query.

    Shape: fact → monthly demand (one shuffle) → per-part percentile
    aggregate → O(1) summary."""
    li = load_table(spark, sf_dir, "lineitem")
    demand = li.groupBy(
        F.col("l_partkey").alias("p"),
        F.date_trunc("month", "l_shipdate").alias("m"),
    ).agg(F.sum("l_quantity").alias("q"))
    pick = (
        demand.groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_months"),
            F.percentile("q", F.lit(0.75)).alias("stock_cf75"),
            F.percentile("q", F.lit(0.5)).alias("stock_cf50"),
            F.avg("q").alias("mean_q"),
        )
        .where(F.col("n_months") >= 24)
    )
    return pick.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.round(F.avg(F.col("stock_cf75") / F.col("mean_q")), 6).alias(
            "avg_uplift_cf75"
        ),
        F.round(F.avg(F.col("stock_cf50") / F.col("mean_q")), 6).alias(
            "avg_uplift_cf50"
        ),
        F.round(F.avg(F.col("stock_cf75") - F.col("stock_cf50")), 4).alias(
            "avg_buffer"
        ),
    )



@register(
    "inventory_croston_forecast",
    oracle="""
    WITH monthly AS (
      SELECT l_partkey AS p, DATE_TRUNC('month', l_shipdate) AS m,
             CAST(SUM(l_quantity) AS DOUBLE) AS q
      FROM lineitem WHERE l_partkey < 50 GROUP BY 1, 2
    ),
    series AS (
      SELECT p, list(q ORDER BY m) AS qs FROM monthly GROUP BY p
    ),
    folded AS (
      -- Croston state [z, x, psd]: demand-size EMA z, inter-demand
      -- interval EMA x, periods-since-demand counter (alpha = 0.2).
      -- Every observed month here has demand > 0, so the interval
      -- EMA converges to 1 — the structure, not the sparsity, is
      -- what the oracle verifies
      SELECT p, len(qs) AS n,
             list_reduce(
               list_transform(qs, v -> [v, 1.0, 1.0]),
               (acc, e) -> CASE WHEN e[1] > 0 THEN
                 [0.2 * e[1] + 0.8 * acc[1],
                  0.2 * acc[3] + 0.8 * acc[2],
                  1.0]
               ELSE [acc[1], acc[2], acc[3] + 1.0] END
             ) AS st
      FROM series
    )
    SELECT CAST(p AS BIGINT) AS p,
           CAST(n AS BIGINT) AS n_months,
           ROUND(st[1], 4) AS demand_ema,
           ROUND(st[2], 4) AS interval_ema,
           ROUND(st[1] / st[2], 4) AS croston_rate
    FROM folded
    ORDER BY p
    """,
)
def inventory_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for intermittent demand (parts < 50): two
    coupled EMAs — demand size z and inter-demand interval x — give
    forecast rate z/x per period; for sparse demand this beats plain
    EMA, which is biased toward zero right after each demand spike.
    Another member of the sequential-recurrence-as-fold family with a
    3-component state vector.

    Shape: monthly reduce (one shuffle) then a per-part sorted-array
    fold — per-key state O(1), keys parallelize; streaming twin is
    applyInPandasWithState with the same update."""
    li = load_table(spark, sf_dir, "lineitem")
    monthly = (
        li.where(F.col("l_partkey") < 50)
        .groupBy(
            F.col("l_partkey").alias("p"),
            F.date_trunc("month", "l_shipdate").alias("m"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("q"))
    )
    series = monthly.groupBy("p").agg(
        F.array_sort(F.collect_list(F.struct("m", "q"))).alias("seq")
    )
    qs = F.transform(F.col("seq"), lambda s: s["q"])
    init = F.array(F.element_at(qs, 1), F.lit(1.0), F.lit(1.0))
    st = F.aggregate(
        F.slice(qs, 2, F.greatest(F.size(qs) - 1, F.lit(0))),
        init,
        lambda acc, v: F.when(
            v > 0,
            F.array(
                0.2 * v + 0.8 * F.element_at(acc, 1),
                0.2 * F.element_at(acc, 3) + 0.8 * F.element_at(acc, 2),
                F.lit(1.0),
            ),
        ).otherwise(
            F.array(
                F.element_at(acc, 1),
                F.element_at(acc, 2),
                F.element_at(acc, 3) + 1.0,
            )
        ),
    )
    return series.select(
        F.col("p").cast("long"),
        F.size(qs).cast("long").alias("n_months"),
        F.round(F.element_at(st, 1), 4).alias("demand_ema"),
        F.round(F.element_at(st, 2), 4).alias("interval_ema"),
        F.round(F.element_at(st, 1) / F.element_at(st, 2), 4).alias(
            "croston_rate"
        ),
    ).orderBy("p")


# ========================================================================
# from analytics_extras38.py — original batch rationale:
# Analytics extras, batch 38: receivables aging, PR curves, local
# graph structure, and randomization inference.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * AR aging buckets — open-order value by age band at a snapshot,
#   the finance-ops workhorse report.
# * precision/recall curve — threshold sweep over score deciles, the
#   imbalanced-data complement of the ROC.
# * local clustering coefficient — per-node triangle closure rate,
#   averaged (Watts-Strogatz C).
# * permutation (randomization) test — md5-determinized label
#   reshuffles completing the bootstrap/jackknife resampling family.
# ========================================================================
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
           CAST(ROUND(SUM(CAST(amt AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS open_value,
           ROUND(CAST(SUM(CAST(amt AS DECIMAL(18,2))) AS DOUBLE)
                 / (SELECT CAST(SUM(CAST(amt AS DECIMAL(18,2))) AS DOUBLE)
                    FROM bucketed), 6)
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
    tot = bucketed.agg(
        F.sum(F.col("amt").cast("decimal(18,2)")).cast("double").alias("t")
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum(F.col("amt").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("open_value"),
            F.sum(F.col("amt").cast("decimal(18,2)"))
            .cast("double")
            .alias("_raw"),
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


# ========================================================================
# from analytics_extras39.py — original batch rationale:
# Analytics extras, batch 39: revenue retention, reliability
# metrics, distribution divergence, and metric-learning data prep.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * NRR / GRR — net and gross revenue retention year over year, the
#   SaaS board metrics, as two cohort aggregates.
# * MTBF / MTTR — mean time between failures and to recovery from the
#   error stream, the reliability pair under every SLO.
# * Jensen-Shannon divergence — per-source token-distribution
#   distance from the corpus, the symmetric bounded drift measure.
# * semi-hard triplet mining — the batch data-prep step of metric
#   learning (FaceNet-style): negatives inside the (d_ap, d_ap+margin)
#   band per anchor.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "orders_nrr_grr",
    oracle="""
    WITH yearly AS (
      SELECT o_custkey AS c, EXTRACT(year FROM o_orderdate) AS y,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1, 2
    ),
    paired AS (
      SELECT a.y AS base_year, a.rev AS rev0, COALESCE(b.rev, 0) AS rev1
      FROM yearly a
      LEFT JOIN yearly b ON b.c = a.c AND b.y = a.y + 1
    )
    SELECT CAST(base_year AS BIGINT) AS base_year,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(LEAST(rev1, rev0)) / SUM(rev0), 6) AS grr,
           ROUND(SUM(rev1) / SUM(rev0), 6) AS nrr
    FROM paired
    WHERE base_year < (SELECT MAX(y) FROM yearly)
    GROUP BY base_year
    ORDER BY base_year
    """,
)
def orders_nrr_grr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net and gross revenue retention by base year: for customers
    active in year Y, GRR caps each customer's next-year revenue at
    this year's (churn + contraction only), NRR lets expansion count
    — the pair of numbers that separates "leaky bucket" from
    "negative churn" businesses.

    Shape: one (customer, year) reduce, one self-join shifted by a
    year (both sides pre-reduced to O(customers·years)), one O(years)
    aggregate."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.col("o_custkey").alias("c"), F.year("o_orderdate").alias("y")
    ).agg(F.sum("o_totalprice").alias("rev"))
    nxt = yearly.select(
        "c", (F.col("y") - 1).alias("y"), F.col("rev").alias("rev1")
    )
    paired = yearly.join(nxt, ["c", "y"], "left").select(
        F.col("y").alias("base_year"),
        F.col("rev").alias("rev0"),
        F.coalesce(F.col("rev1"), F.lit(0.0)).alias("rev1"),
    )
    max_y = yearly.agg(F.max("y").alias("my"))
    return (
        paired.crossJoin(F.broadcast(max_y))
        .where(F.col("base_year") < F.col("my"))
        .groupBy("base_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(
                F.sum(F.least("rev1", "rev0")) / F.sum("rev0"), 6
            ).alias("grr"),
            F.round(F.sum("rev1") / F.sum("rev0"), 6).alias("nrr"),
        )
        .select(
            F.col("base_year").cast("long"), "n_customers", "grr", "nrr"
        )
        .orderBy("base_year")
    )


# ========================================================================
# from analytics_extras40.py — original batch rationale:
# Analytics extras, batch 40: ANN index tuning, experimentation
# variance reduction, and composite supplier scoring.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * ANN recall sweep — recall@5 of the IVF index at nprobe 1/2/4 vs
#   exact, the tuning curve that picks the latency/recall operating
#   point.
# * CUPED — pre-period covariate adjustment, the standard
#   experimentation variance-reduction; θ and the measured variance
#   drop from sufficient statistics.
# * supplier scorecard — min-max-normalized composite of on-time
#   rate, price consistency, and volume share.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.operators import similarity as S
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "supplier_scorecard",
    oracle="""
    WITH li AS (
      SELECT l_suppkey AS s,
             l_extendedprice * (1 - l_discount) AS rev,
             l_extendedprice / l_quantity AS unit_price,
             CASE WHEN date_diff('day',
                    (SELECT o_orderdate FROM orders o
                     WHERE o.o_orderkey = lineitem.l_orderkey),
                    l_shipdate) <= 60 THEN 1 ELSE 0 END AS on_time
      FROM lineitem
    ),
    per_s AS (
      SELECT s,
             -- exact integer ratio: both engines compute the identical
             -- IEEE double, emitted UNROUNDED below — ROUND(rate, 6)
             -- flips on dyadic-rational half-cases (e.g. 333/640 =
             -- 0.5203125: Spark HALF_UP vs DuckDB round-half-even),
             -- caught by the sf0.1 differential sweep
             SUM(on_time) * 1.0 / COUNT(*) AS on_time_rate,
             COALESCE(STDDEV_SAMP(unit_price), 0) / AVG(unit_price) AS cv,
             SUM(rev) AS rev
      FROM li GROUP BY s
    ),
    ext AS (
      SELECT MIN(on_time_rate) AS lo_t, MAX(on_time_rate) AS hi_t,
             MIN(cv) AS lo_c, MAX(cv) AS hi_c,
             SUM(rev) AS tot
      FROM per_s
    )
    SELECT CAST(s AS BIGINT) AS s_suppkey,
           on_time_rate,
           ROUND(cv, 6) AS price_cv,
           ROUND(rev / ext.tot, 6) AS volume_share,
           ROUND(0.5 * CASE WHEN hi_t = lo_t THEN 1.0
                       ELSE (on_time_rate - lo_t) / (hi_t - lo_t) END
                 + 0.3 * CASE WHEN hi_c = lo_c THEN 1.0
                         ELSE 1.0 - (cv - lo_c) / (hi_c - lo_c) END
                 + 0.2 * rev / ext.tot, 6) AS composite_score
    FROM per_s, ext
    ORDER BY composite_score DESC, s_suppkey
    """,
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite supplier scorecard: 0.5·min-max(on-time-within-60d
    rate) + 0.3·min-max(price consistency = 1 − normalized unit-price
    CV) + 0.2·revenue share — the weighted multi-metric ranking
    procurement reviews run quarterly; min-max normalization keeps
    each component comparable, with degenerate (constant) components
    pinned to 1.

    Shape: one fact scan joined to orders for the ship-lag predicate
    (the correlated lookup decorrelates to an equi-join), one
    supplier reduce, one O(1) extremes pass broadcast back."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    joined = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == o["o_orderkey"],
    ).select(
        F.col("l_suppkey").alias("s"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.when(
            F.datediff("l_shipdate", "o_orderdate") <= 60, 1
        )
        .otherwise(0)
        .alias("on_time"),
    )
    per_s = joined.groupBy("s").agg(
        (F.sum("on_time") * 1.0 / F.count(F.lit(1))).alias("on_time_rate"),
        (
            F.coalesce(F.stddev_samp("unit_price"), F.lit(0.0))
            / F.avg("unit_price")
        ).alias("cv"),
        F.sum("rev").alias("rev"),
    )
    ext = per_s.agg(
        F.min("on_time_rate").alias("lo_t"),
        F.max("on_time_rate").alias("hi_t"),
        F.min("cv").alias("lo_c"),
        F.max("cv").alias("hi_c"),
        F.sum("rev").alias("tot"),
    )
    t_norm = F.when(F.col("hi_t") == F.col("lo_t"), 1.0).otherwise(
        (F.col("on_time_rate") - F.col("lo_t"))
        / (F.col("hi_t") - F.col("lo_t"))
    )
    c_norm = F.when(F.col("hi_c") == F.col("lo_c"), 1.0).otherwise(
        1.0 - (F.col("cv") - F.col("lo_c")) / (F.col("hi_c") - F.col("lo_c"))
    )
    return (
        per_s.crossJoin(F.broadcast(ext))
        .select(
            F.col("s").cast("long").alias("s_suppkey"),
            F.col("on_time_rate"),
            F.round("cv", 6).alias("price_cv"),
            F.round(F.col("rev") / F.col("tot"), 6).alias("volume_share"),
            F.round(
                0.5 * t_norm + 0.3 * c_norm + 0.2 * F.col("rev") / F.col("tot"),
                6,
            ).alias("composite_score"),
        )
        .orderBy(F.desc("composite_score"), "s_suppkey")
    )


# ========================================================================
# from analytics_extras42.py — original batch rationale:
# Analytics extras, batch 42: tail risk, cluster quality, and
# sequential-testing discipline.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * VaR / CVaR — historical value-at-risk and expected shortfall of
#   daily revenue changes.
# * simplified silhouette — per-cluster cohesion vs nearest-other-
#   centroid separation for the k-means assignment.
# * peeking bias — how often a naive daily-checked A/A "experiment"
#   crosses z=1.96 at least once, the number that justifies
#   sequential corrections.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "finance_var_cvar",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    chg AS (
      SELECT (rev - LAG(rev) OVER (ORDER BY d))
             / LAG(rev) OVER (ORDER BY d) AS r
      FROM daily
    ),
    clean AS (SELECT r FROM chg WHERE r IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(quantile_cont(r, 0.05), 6) AS var_95,
           ROUND(AVG(CASE WHEN r <= (SELECT quantile_cont(r, 0.05)
                                     FROM clean) THEN r END), 6)
             AS cvar_95,
           ROUND(STDDEV_SAMP(r), 6) AS daily_vol
    FROM clean
    """,
)
def finance_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical 95 % value-at-risk and expected shortfall (CVaR) of
    daily revenue relative changes: VaR is the 5th-percentile return,
    CVaR the mean of returns at or below it — the tail-risk pair
    (CVaR is coherent; VaR alone is not) that sizing and hedging
    decisions read together.

    Shape: daily reduce → one lag window over O(days) → percentile +
    conditional mean; everything after the first reduce is
    days-sized."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("d")
    chg = daily.select(
        ((F.col("rev") - F.lag("rev").over(w)) / F.lag("rev").over(w)).alias(
            "r"
        )
    ).where(F.col("r").isNotNull())
    var = chg.agg(F.percentile("r", F.lit(0.05)).alias("v"))
    return (
        chg.crossJoin(F.broadcast(var))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(F.first("v"), 6).alias("var_95"),
            F.round(
                F.avg(F.when(F.col("r") <= F.col("v"), F.col("r"))), 6
            ).alias("cvar_95"),
            F.round(F.stddev_samp("r"), 6).alias("daily_vol"),
        )
    )


# ========================================================================
# from analytics_extras52.py — original batch rationale:
# Analytics extras, batch 52: LSH quality audit, Theil inequality,
# CV fold assignment, and the bullwhip effect.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * LSH quality audit — precision/recall of the banded-MinHash
#   candidate set against exact Jaccard ground truth, BOTH computed
#   in-engine and both re-derived by the oracle: the evaluation
#   harness for the dedup tier, as a query.
# * Theil T index — the decomposable inequality measure next to the
#   Gini / Lorenz pair already in the registry.
# * CV folds — deterministic md5 k-fold assignment with per-fold
#   target statistics (balance check before any model training).
# * bullwhip effect — order-vs-shipment variance amplification, the
#   classic supply-chain signal-distortion diagnostic.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.operators import dedup as D
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "supply_bullwhip_effect",
    oracle="""
    WITH ordered AS (
      SELECT CAST(date_trunc('month', CAST(o.o_orderdate AS DATE))
                  AS TIMESTAMP) AS m,
             SUM(l.l_quantity) AS q
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    ),
    shipped AS (
      SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE))
                  AS TIMESTAMP) AS m,
             SUM(l_quantity) AS q
      FROM lineitem GROUP BY 1
    ),
    o_stats AS (
      SELECT COUNT(*) AS n, AVG(q) AS mu, VAR_SAMP(q) AS v FROM ordered
    ),
    s_stats AS (
      SELECT COUNT(*) AS n, AVG(q) AS mu, VAR_SAMP(q) AS v FROM shipped
    )
    SELECT CAST(o_stats.n AS BIGINT) AS n_order_months,
           CAST(s_stats.n AS BIGINT) AS n_ship_months,
           ROUND(o_stats.v / (o_stats.mu * o_stats.mu), 6) AS cv2_orders,
           ROUND(s_stats.v / (s_stats.mu * s_stats.mu), 6) AS cv2_shipments,
           ROUND((o_stats.v / (o_stats.mu * o_stats.mu))
                 / (s_stats.v / (s_stats.mu * s_stats.mu)), 4)
             AS bullwhip_ratio
    FROM o_stats CROSS JOIN s_stats
    """,
)
def supply_bullwhip_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip-effect diagnostic: squared coefficient of variation
    of monthly ORDERED quantity over monthly SHIPPED quantity — a
    ratio above 1 means demand signals amplify as they travel up the
    chain (Lee et al.'s classic distortion), the number that decides
    whether to damp ordering policies. Both series reduce to
    O(months) before any statistics.

    Shape: two fact reduces (one joined to orders for the order
    date), two O(1) variance aggregates, one scalar division."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ordered = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.date_trunc("month", F.to_date("o_orderdate")).alias("m"))
        .agg(F.sum("l_quantity").alias("q"))
    )
    shipped = li.groupBy(
        F.date_trunc("month", F.to_date("l_shipdate")).alias("m")
    ).agg(F.sum("l_quantity").alias("q"))
    os_ = ordered.agg(
        F.count(F.lit(1)).alias("no"),
        F.avg("q").alias("muo"),
        F.var_samp("q").alias("vo"),
    )
    ss = shipped.agg(
        F.count(F.lit(1)).alias("ns"),
        F.avg("q").alias("mus"),
        F.var_samp("q").alias("vs"),
    )
    cv2o = F.col("vo") / (F.col("muo") * F.col("muo"))
    cv2s = F.col("vs") / (F.col("mus") * F.col("mus"))
    return os_.crossJoin(F.broadcast(ss)).select(
        F.col("no").cast("long").alias("n_order_months"),
        F.col("ns").cast("long").alias("n_ship_months"),
        F.round(cv2o, 6).alias("cv2_orders"),
        F.round(cv2s, 6).alias("cv2_shipments"),
        F.round(cv2o / cv2s, 4).alias("bullwhip_ratio"),
    )


# ========================================================================
# from analytics_extras54.py — original batch rationale:
# Analytics extras, batch 54: full Lloyd k-means rounds, Monte
# Carlo simulation, and honest train/eval LM perplexity.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * k-means Lloyd rounds — 3 full assignment+update iterations over
#   the 64-dim embeddings with QUANTIZED centroids (round-6 after
#   each update) so both engines walk bit-identical trajectories;
#   completes the clustering family: `ml_kmeans_plusplus_seeding`
#   (init) -> this (iterate) -> `embedding_cluster_silhouette` (eval).
# * Monte Carlo revenue — 64 md5-determinized Box-Muller paths of
#   30-day demand, P5/P50/P95 of the terminal value: the simulation
#   sibling of the Poisson bootstrap.
# * train/eval perplexity — add-one bigram LM trained on half the
#   corpus, perplexity measured on the OTHER half with OOV->UNK (the
#   held-out measurement `text_bigram_surprisal` does in-sample).
# ========================================================================
import math
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_MC_PATHS = 64


_MC_DAYS = 30



@register(
    "finance_monte_carlo_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM orders GROUP BY 1
    ),
    stats AS (
      SELECT AVG(y) AS mu, STDDEV_SAMP(y) AS sigma FROM daily
    ),
    draws AS (
      SELECT p.p, t.t,
             stats.mu + stats.sigma *
             SQRT(-2.0 * LN(
               (('0x' || substr(md5('mc1:' || p.p || ':' || t.t), 1, 8))
                ::BIGINT + 0.5) / 4294967296.0))
             * COS(2.0 * PI() *
               (('0x' || substr(md5('mc2:' || p.p || ':' || t.t), 1, 8))
                ::BIGINT + 0.5) / 4294967296.0) AS sim
      FROM UNNEST(range(0, {_MC_PATHS})) AS p(p),
           UNNEST(range(0, {_MC_DAYS})) AS t(t),
           stats
    ),
    terminals AS (
      SELECT p, SUM(sim) AS total FROM draws GROUP BY p
    )
    SELECT CAST({_MC_PATHS} AS BIGINT) AS n_paths,
           CAST({_MC_DAYS} AS BIGINT) AS horizon_days,
           ROUND((SELECT mu FROM stats) * {_MC_DAYS}, 4) AS expected_total,
           ROUND(AVG(total), 4) AS sim_mean,
           ROUND(quantile_cont(total, 0.05), 4) AS p5,
           ROUND(quantile_cont(total, 0.5), 4) AS p50,
           ROUND(quantile_cont(total, 0.95), 4) AS p95
    FROM terminals
    """,
)
def finance_monte_carlo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monte Carlo demand forecast: 64 paths of 30 daily draws from
    N(mu, sigma) fitted to the historical daily order counts, normal
    variates via Box-Muller over md5-derived uniforms — the
    simulation mechanism itself is deterministic and oracle-verified
    (the same pinned-randomness contract as the Poisson bootstrap /
    permutation test; production swaps a seeded RNG). Reported: the
    simulated terminal distribution's mean and P5/P50/P95 against
    the analytic expectation mu*T.

    Scale: the history reduces to two scalars; the simulation is a
    paths x days in-row fan-out (1920 rows here, embarrassingly
    parallel at any size), one O(paths) reduce."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    stats = daily.agg(
        F.avg("y").alias("mu"), F.stddev_samp("y").alias("sigma")
    )

    def unif(tag: str):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(tag),
                            F.col("p").cast("string"),
                            F.lit(":"),
                            F.col("t").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            + 0.5
        ) / 4294967296.0

    grid = (
        spark.range(_MC_PATHS)
        .select(F.col("id").alias("p"))
        .crossJoin(
            spark.range(_MC_DAYS).select(F.col("id").alias("t"))
        )
        .crossJoin(F.broadcast(stats))
    )
    z = F.sqrt(-2.0 * F.log(unif("mc1:"))) * F.cos(
        2.0 * F.lit(float(math.pi)) * unif("mc2:")
    )
    draws = grid.select("p", (F.col("mu") + F.col("sigma") * z).alias("sim"))
    terminals = draws.groupBy("p").agg(F.sum("sim").alias("total"))
    return terminals.crossJoin(F.broadcast(stats)).agg(
        F.lit(_MC_PATHS).cast("long").alias("n_paths"),
        F.lit(_MC_DAYS).cast("long").alias("horizon_days"),
        F.round(F.first("mu") * _MC_DAYS, 4).alias("expected_total"),
        F.round(F.avg("total"), 4).alias("sim_mean"),
        F.round(F.percentile("total", F.lit(0.05)), 4).alias("p5"),
        F.round(F.percentile("total", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("total", F.lit(0.95)), 4).alias("p95"),
    )


# ========================================================================
# from analytics_extras55.py — original batch rationale:
# Analytics extras, batch 55: interrupted time-series analysis and
# economic order quantity. (The third member of this batch is the LEFT
# OUTER stream-stream join registered in queries/streaming_batch.py as
# `stream_join_left_batch`, with its watermark-governed equivalence
# test in tests/test_streaming.py.)
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * interrupted time series — pre-period OLS trend projected as the
#   post-period counterfactual: level shift, slope change, cumulative
#   excess (the quasi-experimental design when there is no control
#   group, sibling of `event_diff_in_diff` which needs one).
# * EOQ — sqrt(2DS/H) economic order quantity per part, completing
#   the inventory family (reorder point, ABC/XYZ, Croston,
#   newsvendor).
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_EOQ_ORDER_COST = 100.0


_EOQ_HOLD_RATE = 0.2



@register(
    "supply_eoq_quantity",
    oracle=f"""
    WITH demand AS (
      SELECT l.l_partkey AS partkey,
             SUM(l.l_quantity) AS total_qty,
             COUNT(DISTINCT EXTRACT(year FROM l.l_shipdate)) AS n_years,
             AVG(l.l_extendedprice / l.l_quantity) AS unit_price
      FROM lineitem l
      GROUP BY 1
    ),
    calc AS (
      SELECT partkey,
             total_qty / n_years AS annual_d,
             unit_price * {_EOQ_HOLD_RATE} AS h,
             SQRT(2.0 * (total_qty / n_years) * {_EOQ_ORDER_COST}
                  / (unit_price * {_EOQ_HOLD_RATE})) AS eoq
      FROM demand
    ),
    ranked AS (
      SELECT partkey, annual_d, h, eoq,
             ROW_NUMBER() OVER (ORDER BY annual_d DESC, partkey) AS rnk
      FROM calc
    )
    SELECT CAST(rnk AS INT) AS rank,
           CAST(partkey AS BIGINT) AS partkey,
           ROUND(annual_d, 4) AS annual_demand,
           ROUND(h, 4) AS holding_cost,
           ROUND(eoq, 4) AS eoq,
           ROUND(annual_d / eoq, 4) AS orders_per_year
    FROM ranked WHERE rnk <= 15
    """,
)
def supply_eoq_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity per part: EOQ = sqrt(2DS/H) with
    annualized demand D, fixed order cost S=100, holding cost H = 20%
    of unit price — the Wilson lot-size formula that balances
    ordering against carrying cost, reported for the 15
    highest-demand parts with the implied orders/year cadence.
    Completes the inventory-planning family (reorder point, ABC/XYZ,
    Croston, newsvendor).

    Shape: one fact reduce to part grain, scalar math, one top-k
    rank (TakeOrdered shape after the reduce)."""
    li = load_table(spark, sf_dir, "lineitem")
    demand = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum("l_quantity").alias("total_qty"),
        F.countDistinct(F.year("l_shipdate")).alias("n_years"),
        F.avg(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_price"
        ),
    )
    annual_d = F.col("total_qty") / F.col("n_years")
    h = F.col("unit_price") * _EOQ_HOLD_RATE
    eoq = F.sqrt(2.0 * annual_d * _EOQ_ORDER_COST / h)
    from pyspark.sql.window import Window

    ranked = demand.select(
        "partkey",
        annual_d.alias("annual_d"),
        h.alias("h"),
        eoq.alias("eoq"),
        F.row_number()
        .over(Window.orderBy(F.desc(annual_d), "partkey"))
        .alias("rnk"),
    )
    return ranked.where(F.col("rnk") <= 15).select(
        F.col("rnk").cast("int").alias("rank"),
        F.col("partkey").cast("long").alias("partkey"),
        F.round("annual_d", 4).alias("annual_demand"),
        F.round("h", 4).alias("holding_cost"),
        F.round("eoq", 4).alias("eoq"),
        F.round(F.col("annual_d") / F.col("eoq"), 4).alias(
            "orders_per_year"
        ),
    )


# ========================================================================
# from analytics_extras64.py — original batch rationale:
# Analytics extras, batch 64: price indexing and inter-arrival
# distribution fitting.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * Laspeyres price index — base-year-basket-weighted price relatives
#   per year: the economics-grade inflation measure over the catalog
#   (a plain average of prices confounds mix shift with price change;
#   Laspeyres holds the basket fixed).
# * exponential gap fit — MLE fit of inter-event gaps with a KS
#   distance against the fitted exponential: the Poisson-process
#   check underlying every rate-based model in the registry.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_LP_BASE_YEAR = 1995



@register(
    "finance_price_index_laspeyres",
    oracle=f"""
    WITH pq AS (
      SELECT EXTRACT(year FROM l_shipdate) AS yr, l_partkey,
             SUM(l_quantity) AS q,
             SUM(l_extendedprice) / SUM(l_quantity) AS p
      FROM lineitem
      WHERE EXTRACT(year FROM l_shipdate) BETWEEN {_LP_BASE_YEAR}
            AND {_LP_BASE_YEAR + 3}
      GROUP BY 1, 2
    ),
    base AS (
      SELECT l_partkey, q AS q0, p AS p0
      FROM pq WHERE yr = {_LP_BASE_YEAR}
    ),
    joined AS (
      SELECT pq.yr, pq.p, base.p0, base.q0
      FROM pq JOIN base ON base.l_partkey = pq.l_partkey
    )
    SELECT CAST(yr AS INT) AS year,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(p * q0) / SUM(p0 * q0), 6) AS laspeyres_index
    FROM joined GROUP BY yr
    """,
)
def finance_price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index per year: sum(p_t * q_0) / sum(p_0 *
    q_0) over parts present in the base year (1995), with unit
    prices as revenue/quantity per (year, part). Holding the BASE
    basket fixed isolates price change from mix shift — the error a
    naive average-price trend makes; this is how CPI-style deflators
    are built from transaction data. On independently-priced
    fixtures the index correctly hovers near 1.

    Shape: one fact reduce to (year, part), a broadcast-or-
    copartitioned join against the base-year slice of the same
    reduce, one O(years) rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    pq = (
        li.where(
            F.year("l_shipdate").between(_LP_BASE_YEAR, _LP_BASE_YEAR + 3)
        )
        .groupBy(F.year("l_shipdate").alias("yr"), "l_partkey")
        .agg(
            F.sum("l_quantity").alias("q"),
            (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p"),
        )
        .localCheckpoint(eager=False)  # base slice + all years reuse it
    )
    base = pq.where(F.col("yr") == _LP_BASE_YEAR).select(
        F.col("l_partkey").alias("bpk"),
        F.col("q").alias("q0"),
        F.col("p").alias("p0"),
    )
    joined = pq.join(base, F.col("l_partkey") == F.col("bpk"))
    return joined.groupBy(F.col("yr").cast("int").alias("year")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(
            F.sum(F.col("p") * F.col("q0"))
            / F.sum(F.col("p0") * F.col("q0")),
            6,
        ).alias("laspeyres_index"),
    )


# ========================================================================
# from analytics_extras71.py — original batch rationale:
# Analytics extras, batch 71: the Count-Sketch and the price-index
# trio.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * Count-Sketch — the SIGNED frequency sketch (Charikar et al.):
#   random-sign hashing makes collision noise cancel in expectation,
#   so estimates are unbiased where count-min only over-counts;
#   md5-pinned like `agg_count_min_sketch`, every cell and estimate
#   oracle-verified.
# * Fisher index — Laspeyres (base basket), Paasche (current basket),
#   and their geometric mean: the index-number trio whose spread
#   brackets substitution bias; completes batch 64's single-index
#   query.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_FI_BASE = 1995



@register(
    "finance_price_index_fisher",
    oracle=f"""
    WITH pq AS (
      SELECT EXTRACT(year FROM l_shipdate) AS yr, l_partkey,
             SUM(l_quantity) AS q,
             SUM(l_extendedprice) / SUM(l_quantity) AS p
      FROM lineitem
      WHERE EXTRACT(year FROM l_shipdate) BETWEEN {_FI_BASE}
            AND {_FI_BASE + 3}
      GROUP BY 1, 2
    ),
    base AS (
      SELECT l_partkey, q AS q0, p AS p0 FROM pq WHERE yr = {_FI_BASE}
    ),
    joined AS (
      SELECT pq.yr, pq.p, pq.q, base.p0, base.q0
      FROM pq JOIN base ON base.l_partkey = pq.l_partkey
    )
    SELECT CAST(yr AS INT) AS year,
           ROUND(SUM(p * q0) / SUM(p0 * q0), 6) AS laspeyres,
           ROUND(SUM(p * q) / SUM(p0 * q), 6) AS paasche,
           ROUND(SQRT((SUM(p * q0) / SUM(p0 * q0))
                      * (SUM(p * q) / SUM(p0 * q))), 6) AS fisher
    FROM joined GROUP BY yr
    """,
)
def finance_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index-number trio: Laspeyres (base-year basket, overstates
    inflation under substitution), Paasche (current basket,
    understates it), and Fisher's ideal index — their geometric mean,
    the one that satisfies the time-reversal test and the form
    national statistics agencies actually publish. The L-P spread is
    the measured substitution bias. Extends
    `finance_price_index_laspeyres` to the complete family from the
    same (year, part) reduce.

    Shape: identical to the single-index query — one fact reduce,
    one base-slice join, one O(years) rollup now carrying both
    baskets."""
    li = load_table(spark, sf_dir, "lineitem")
    pq = (
        li.where(F.year("l_shipdate").between(_FI_BASE, _FI_BASE + 3))
        .groupBy(F.year("l_shipdate").alias("yr"), "l_partkey")
        .agg(
            F.sum("l_quantity").alias("q"),
            (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p"),
        )
        .localCheckpoint(eager=False)
    )
    base = pq.where(F.col("yr") == _FI_BASE).select(
        F.col("l_partkey").alias("bpk"),
        F.col("q").alias("q0"),
        F.col("p").alias("p0"),
    )
    joined = pq.join(base, F.col("l_partkey") == F.col("bpk"))
    lasp = F.sum(F.col("p") * F.col("q0")) / F.sum(F.col("p0") * F.col("q0"))
    paas = F.sum(F.col("p") * F.col("q")) / F.sum(F.col("p0") * F.col("q"))
    return joined.groupBy(F.col("yr").cast("int").alias("year")).agg(
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


# ========================================================================
# from analytics_extras73.py — original batch rationale:
# Analytics extras, batch 73: rich-club structure and CR4
# concentration.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * rich-club coefficient — edge density among the top-degree nodes
#   relative to the whole graph: do the hubs preferentially trade
#   with each other? Completes the co-purchase-graph toolkit
#   (degree, triangles, clustering, assortativity, modularity,
#   k-core, HITS).
# * CR4 — the four-firm concentration ratio per brand market, the
#   antitrust-style sibling of `supply_chain_hhi` (CR4 is what
#   regulators quote; HHI is what they compute).
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "supply_cr4_concentration",
    oracle="""
    WITH sales AS (
      SELECT p.p_brand AS brand, l.l_suppkey,
             SUM(l.l_quantity) AS q
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT brand, q,
             ROW_NUMBER() OVER (PARTITION BY brand
                                ORDER BY q DESC, l_suppkey) AS r,
             SUM(q) OVER (PARTITION BY brand) AS tot,
             COUNT(*) OVER (PARTITION BY brand) AS n_sup
      FROM sales
    )
    SELECT brand,
           CAST(MAX(n_sup) AS BIGINT) AS n_suppliers,
           ROUND(SUM(CASE WHEN r <= 4 THEN q ELSE 0 END) / MAX(tot), 4)
             AS cr4,
           SUM(CASE WHEN r <= 4 THEN q ELSE 0 END) / MAX(tot) > 0.6
             AS concentrated_flag
    FROM ranked GROUP BY brand
    """,
)
def supply_cr4_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-firm concentration ratio per brand market: the top-4
    suppliers' share of shipped quantity, flagged above the 0.6
    oligopoly line — the regulator-quoted sibling of
    `supply_chain_hhi` (CR4 reads directly as 'four firms control
    X%'; HHI weighs the whole distribution). A CR4 near 4/n_sup
    means an even market; near 1 means four throats to choke.

    Shape: one joined reduce to (brand, supplier), then a LITERAL
    rank<=4 filter (so Spark's partial WindowGroupLimit pre-trims
    every map task to 4 rows per brand before the shuffle — the
    bounded-key window is scale-safe in this form, where the
    previous CASE-on-rank-inside-the-aggregate form sorted all
    suppliers-per-brand in one task; r11 window audit) and the
    totals as a groupBy joined back."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    sales = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    tots = sales.groupBy("brand").agg(
        F.sum("q").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    top4 = (
        sales.withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("brand").orderBy(
                    F.desc("q"), "l_suppkey"
                )
            ),
        )
        .where(F.col("r") <= 4)
        .groupBy("brand")
        .agg(F.sum("q").alias("q4"))
    )
    cr4 = F.col("q4") / F.col("tot")
    return tots.join(top4, "brand").select(
        "brand",
        "n_suppliers",
        F.round(cr4, 4).alias("cr4"),
        (cr4 > 0.6).alias("concentrated_flag"),
    )
