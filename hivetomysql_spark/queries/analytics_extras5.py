"""Analytics extras, batch 5: leave-one-out target encoding, bigram
language-model surprisal, closed-form two-factor OLS, data-freshness
audit, and a running order-backlog series.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's feature-engineering / corpus-
curation / governance tiers:

* LOO target encoding — the leakage-safe categorical encoder
  ((sum−own)/(n−1)), reported as per-category distribution stats;
* bigram surprisal — add-one-smoothed bigram LM scored over its own
  corpus, the step past `text_lm_unigram_score`'s unigram model;
* two-factor OLS — price ~ quantity + line-count by Cramer's rule on
  sufficient statistics, the multivariate step past
  `udaf_regression_slope`;
* freshness lag — hours since each event type's latest record vs the
  global high-watermark, the staleness monitor every ingest needs;
* order backlog — opened-minus-shipped running balance, peak and
  date, the gaps-and-islands-free flow/stock query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "feature_target_encoding",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg, o.o_totalprice AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    g AS (SELECT seg, COUNT(*) AS n, SUM(y) AS s FROM j GROUP BY seg),
    loo AS (
      SELECT j.seg, (g.s - j.y) / (g.n - 1) AS enc
      FROM j JOIN g ON j.seg = g.seg
    )
    SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(enc), 4) AS loo_mean,
           ROUND(STDDEV_SAMP(enc), 4) AS loo_std,
           ROUND(MIN(enc), 4) AS loo_min,
           ROUND(MAX(enc), 4) AS loo_max
    FROM loo GROUP BY seg
    """,
)
def feature_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of customer market segment
    against order price — each row's encoding excludes its own target
    ((sum−y)/(n−1)), the standard leakage guard — summarized as
    per-segment distribution stats.

    Scale shape: the dimension join broadcasts customer-side columns;
    per-segment (n, sum) is one O(data) aggregate whose k-row result
    broadcasts back onto the fact rows, so the per-row encoding is a
    map-side expression — two scans of the joined frame, one shuffle
    each, no per-row re-aggregation. The window-function alternative
    (sum over segment partition) would shuffle the full fact table on
    a 5-value key; the broadcast-back form never keys a shuffle on
    the low-cardinality column.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
    ).select(F.col("c_mktsegment").alias("seg"), F.col("o_totalprice").alias("y"))
    g = j.groupBy("seg").agg(F.count("*").alias("n"), F.sum("y").alias("s"))
    loo = j.join(F.broadcast(g), "seg").select(
        "seg", ((F.col("s") - F.col("y")) / (F.col("n") - 1)).alias("enc")
    )
    return loo.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.round(F.avg("enc"), 4).alias("loo_mean"),
        F.round(F.stddev_samp("enc"), 4).alias("loo_std"),
        F.round(F.min("enc"), 4).alias("loo_min"),
        F.round(F.max("enc"), 4).alias("loo_max"),
    )


@register(
    "text_bigram_surprisal",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    big AS (
      SELECT doc_id, tk[g] AS w1, tk[g+1] AS w2
      FROM toks, generate_series(1, 100000) AS gs(g) WHERE g < len(tk)
    ),
    bc AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
    uc AS (SELECT w1, SUM(c2) AS c1 FROM bc GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w2) AS vocab FROM bc),
    scored AS (
      SELECT b.doc_id, LN((bc.c2 + 1.0) / (uc.c1 + v.vocab)) AS lp
      FROM big b JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
      JOIN uc ON b.w1 = uc.w1 CROSS JOIN v
    )
    SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           ROUND(AVG(-lp), 6) AS mean_surprisal,
           ROUND(MIN(-lp), 6) AS min_surprisal,
           ROUND(MAX(-lp), 6) AS max_surprisal
    FROM scored
    """,
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM surprisal over the corpus: train add-one-smoothed
    bigram probabilities on the corpus itself, score every bigram
    occurrence, report corpus-level surprisal stats — the quality
    proxy one order up from `text_lm_unigram_score`.

    Scale shape: bigrams are a scan-stage transform (posexplode of
    adjacent token pairs). One shuffle builds the bigram count table;
    unigram context counts derive from it (O(vocab²) input, not
    O(data)); vocab is a scalar broadcast. The score join keys on the
    bigram — occurrences and counts co-partition on the same key, so
    training and scoring share one exchange layout. At 100 TB the
    count model is the only state and it is vocabulary-, not
    corpus-, sized.
    """
    d = load_table(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.split("text", " ").alias("tk"))
    big = tk.select(
        "doc_id",
        F.posexplode(F.slice("tk", 1, F.size("tk") - 1)).alias("pos", "w1"),
        "tk",
    ).select(
        "doc_id", "w1", F.expr("tk[pos + 1]").alias("w2")
    )
    bc = big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    uc = bc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    v = bc.agg(F.countDistinct("w2").alias("vocab"))
    scored = (
        big.join(bc, ["w1", "w2"])
        .join(F.broadcast(uc), "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("vocab"))).alias(
                "lp"
            ),
        )
    )
    return scored.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.round(F.avg(-F.col("lp")), 6).alias("mean_surprisal"),
        F.round(F.min(-F.col("lp")), 6).alias("min_surprisal"),
        F.round(F.max(-F.col("lp")), 6).alias("max_surprisal"),
    )


@register(
    "stats_ols_two_factor",
    oracle="""
    WITH feat AS (
      SELECT o.o_orderkey, ANY_VALUE(o.o_totalprice) AS y,
             SUM(l.l_quantity) AS x1, COUNT(*) AS x2
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    ),
    s AS (
      SELECT COUNT(*) AS n, SUM(x1) AS sx1, SUM(x2) AS sx2, SUM(y) AS sy,
             SUM(x1*x1) AS sx11, SUM(x2*x2) AS sx22, SUM(x1*x2) AS sx12,
             SUM(x1*y) AS sx1y, SUM(x2*y) AS sx2y
      FROM feat
    ),
    c AS (
      SELECT n,
        sx11 - sx1*sx1/n AS a11, sx12 - sx1*sx2/n AS a12,
        sx22 - sx2*sx2/n AS a22,
        sx1y - sx1*sy/n AS b1, sx2y - sx2*sy/n AS b2,
        sy/n AS my, sx1/n AS m1, sx2/n AS m2
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
      ROUND((b1*a22 - b2*a12) / (a11*a22 - a12*a12), 6) AS beta_qty,
      ROUND((b2*a11 - b1*a12) / (a11*a22 - a12*a12), 6) AS beta_lines,
      ROUND(my - ((b1*a22 - b2*a12)/(a11*a22 - a12*a12))*m1
               - ((b2*a11 - b1*a12)/(a11*a22 - a12*a12))*m2, 4) AS intercept
    FROM c
    """,
)
def stats_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-regressor OLS (order price ~ total quantity + line count)
    solved in closed form: centered normal equations by Cramer's rule
    over nine sufficient statistics.

    Scale shape: one shuffle builds per-order features (join keys on
    the order key both sides — co-partitioned); every cross-moment is
    then a single global aggregate with map-side partials, and the
    2×2 solve is O(1) arithmetic on that one row. This is the
    sufficient-statistics pattern that scales OLS to any row count
    with exactly two shuffles and no iteration — the p-regressor
    generalization just widens the moment vector to O(p²) columns.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    feat = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.any_value("o_totalprice").alias("y"),
            F.sum("l_quantity").alias("x1"),
            F.count("*").alias("x2"),
        )
    )
    s = feat.agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx11"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx22"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx12"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
    )
    c = s.select(
        "n",
        (F.col("sx11") - F.col("sx1") * F.col("sx1") / F.col("n")).alias("a11"),
        (F.col("sx12") - F.col("sx1") * F.col("sx2") / F.col("n")).alias("a12"),
        (F.col("sx22") - F.col("sx2") * F.col("sx2") / F.col("n")).alias("a22"),
        (F.col("sx1y") - F.col("sx1") * F.col("sy") / F.col("n")).alias("b1"),
        (F.col("sx2y") - F.col("sx2") * F.col("sy") / F.col("n")).alias("b2"),
        (F.col("sy") / F.col("n")).alias("my"),
        (F.col("sx1") / F.col("n")).alias("m1"),
        (F.col("sx2") / F.col("n")).alias("m2"),
    )
    det = F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    beta1 = (F.col("b1") * F.col("a22") - F.col("b2") * F.col("a12")) / det
    beta2 = (F.col("b2") * F.col("a11") - F.col("b1") * F.col("a12")) / det
    return c.select(
        F.col("n").alias("n_orders"),
        F.round(beta1, 6).alias("beta_qty"),
        F.round(beta2, 6).alias("beta_lines"),
        F.round(
            F.col("my") - beta1 * F.col("m1") - beta2 * F.col("m2"), 4
        ).alias("intercept"),
    )


@register(
    "dq_freshness_lag",
    oracle="""
    SELECT event_type,
           ROUND(EXTRACT(EPOCH FROM
             (SELECT MAX(ts) FROM events) - MAX(ts)) / 3600.0, 4)
             AS lag_hours,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness audit: hours between each event type's latest
    record and the global high-watermark — the staleness monitor that
    pages when one upstream feed silently stops.

    Scale shape: one O(data) aggregate to per-type (max ts, count);
    the global watermark is the max of that k-row frame, broadcast
    back — the fact table is scanned once, not once per type and not
    twice for the global max.
    """
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.max("ts").alias("mx"), F.count("*").alias("n")
    )
    hi = g.agg(F.max("mx").alias("hi"))
    return g.crossJoin(F.broadcast(hi)).select(
        "event_type",
        F.round(
            (
                F.col("hi").cast("double") - F.col("mx").cast("double")
            )
            / 3600.0,
            4,
        ).alias("lag_hours"),
        "n",
    )


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
