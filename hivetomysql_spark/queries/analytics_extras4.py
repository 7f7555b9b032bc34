"""Analytics extras, batch 4: C4-style duplicate-span corpus stats,
linear multi-touch attribution, price-series drawdown, ABC (Pareto
class) inventory classification, CUSUM changepoint detection, and
daily lead-lag cross-correlation.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's LLM-pipeline / aggregation /
time-series tiers:

* duplicate-span stats — the C4/RefinedWeb signal "how much of each
  document is made of spans that also occur in other documents",
  computed on non-overlapping 10-token spans;
* linear attribution — purchase value split equally across the
  user's view/click touches in the prior 7 days, the simplest
  defensible multi-touch model;
* max drawdown — largest peak-to-trough decline of the daily-revenue
  series, the classic risk statistic;
* ABC classification — A/B/C Pareto classes by cumulative revenue
  share (70/90 cut), the inventory-management staple;
* CUSUM changepoint — day of maximum |cumulative deviation from the
  mean| per event type, the page-one change-detection statistic;
* cross-correlation — Pearson correlation between the daily view
  series and the purchase series shifted by lag −3..+3 days, the
  lead-lag discovery tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

SPAN = 10  # tokens per non-overlapping span


@register(
    "dedup_span_duplicates",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    spans AS (
      SELECT doc_id, array_to_string(tk[(g*10+1):(g*10+10)], ' ') AS span
      FROM toks, generate_series(0, 1000) AS gs(g)
      WHERE len(tk) >= (g*10+10)
    ),
    span_docs AS (
      SELECT span, COUNT(DISTINCT doc_id) AS nd FROM spans GROUP BY span
    ),
    per_doc AS (
      SELECT s.doc_id, COUNT(*) AS n_spans,
             SUM(CASE WHEN sd.nd > 1 THEN 1 ELSE 0 END) AS dup_spans
      FROM spans s JOIN span_docs sd ON s.span = sd.span
      GROUP BY s.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dup_spans) AS BIGINT) AS total_dup_spans,
           ROUND(AVG(dup_spans * 1.0 / n_spans), 6) AS avg_dup_ratio,
           CAST(SUM(CASE WHEN dup_spans > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_dup
    FROM per_doc
    """,
)
def dedup_span_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style duplicate-span statistics: chop each document into
    non-overlapping 10-token spans, mark spans that occur in more
    than one document, and report corpus totals plus the mean
    duplicated fraction per document.

    Scale shape: spans are derived in the scan stage (split + slice,
    no shuffle, ~n_tokens/10 rows per doc). One shuffle groups spans
    to get their doc-frequency; the join back to per-doc rows keys on
    the span hash — both sides already partitioned by span from the
    same exchange. The final two aggregates are O(docs) then O(1).
    At 100 TB, hash the span (xxhash64) instead of carrying text into
    the shuffle — here the span text stays because the oracle needs
    identical grouping keys.
    """
    d = load_table(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.split("text", " ").alias("tk"))
    n_spans = (F.size("tk") / SPAN).cast("int")
    spans = tk.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_spans - 1)).alias("g"),
        "tk",
    ).select(
        "doc_id",
        F.concat_ws(
            " ", F.slice("tk", F.col("g") * SPAN + 1, SPAN)
        ).alias("span"),
    )
    span_docs = spans.groupBy("span").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    per_doc = (
        spans.join(span_docs, "span")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum((F.col("nd") > 1).cast("int")).alias("dup_spans"),
        )
    )
    return per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dup_spans").alias("total_dup_spans"),
        F.round(F.avg(F.col("dup_spans") / F.col("n_spans")), 6).alias(
            "avg_dup_ratio"
        ),
        F.sum((F.col("dup_spans") > 0).cast("int")).alias("docs_with_dup"),
    )


@register(
    "attribution_linear_touch",
    oracle="""
    WITH buys AS (
      SELECT user_id, ts AS buy_ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT e.user_id, e.event_type, b.buy_ts, b.value
      FROM events e JOIN buys b ON e.user_id = b.user_id
      WHERE e.event_type IN ('view','click') AND e.ts < b.buy_ts
        AND e.ts >= b.buy_ts - INTERVAL 7 DAY
    ),
    per_buy AS (
      SELECT event_type, value,
             COUNT(*) OVER (PARTITION BY user_id, buy_ts) AS n_touch
      FROM touches
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(SUM(value / n_touch), 2) AS attributed_value
    FROM per_buy GROUP BY event_type
    """,
)
def attribution_linear_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value is split
    equally across the user's view/click events in the 7 days before
    it; report touch count and attributed value per touch type.

    Scale shape: both sides reduce before the join — purchases are a
    small filtered slice, touches a filtered projection — and the
    join keys on user_id, so one co-partitioning shuffle serves the
    join, the per-purchase touch-count window (user_id partition ⊇
    user_id,buy_ts), and nothing else; the final groupBy is O(types).
    The 7-day predicate bounds the per-user fan-out, so a hot user
    contributes at most touches×purchases-in-window pairs, not a full
    cross product.
    """
    e = load_table(spark, sf_dir, "events")
    buys = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("buy_ts"), "value"
    )
    t = e.where(F.col("event_type").isin("view", "click")).select(
        "user_id", "event_type", F.col("ts").alias("touch_ts")
    )
    touches = t.join(buys, "user_id").where(
        (F.col("touch_ts") < F.col("buy_ts"))
        & (F.col("touch_ts") >= F.col("buy_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    w = Window.partitionBy("user_id", "buy_ts")
    per_buy = touches.select(
        "event_type", "value", F.count("*").over(w).alias("n_touch")
    )
    return per_buy.groupBy("event_type").agg(
        F.count("*").alias("n_touches"),
        F.round(F.sum(F.col("value") / F.col("n_touch")), 2).alias(
            "attributed_value"
        ),
    )


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


@register(
    "agg_abc_classification",
    oracle="""
    WITH prev AS (
      SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT rev, SUM(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum,
             SUM(rev) OVER () AS tot
      FROM prev
    ),
    cls AS (
      SELECT CASE WHEN cum / tot <= 0.7 THEN 'A'
                  WHEN cum / tot <= 0.9 THEN 'B' ELSE 'C' END AS abc_class,
             rev
      FROM ranked
    )
    SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(rev), 2) AS class_revenue
    FROM cls GROUP BY 1
    """,
)
def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A
    = the head covering 70% of cumulative revenue, B to 90%, C the
    tail; report part count and revenue per class.

    Scale shape: the O(data) stage is the per-part revenue groupBy;
    the ranked cumulative share runs on O(parts) rows. The global
    ordered window is a single-partition sort of the part aggregate —
    at 100 TB parts are millions of rows, still one executor's work;
    if that ever dominates, the two-level prefix-sum pattern from
    `pack_sequences` applies verbatim. Ties broken by part key so the
    cumulative sum (and hence class cuts) is deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    prev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev"
        )
    )
    w = Window.orderBy(F.desc("rev"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy()
    ranked = prev.select(
        "rev",
        F.sum("rev").over(w).alias("cum"),
        F.sum("rev").over(wtot).alias("tot"),
    )
    cls = ranked.select(
        F.when(F.col("cum") / F.col("tot") <= 0.7, "A")
        .when(F.col("cum") / F.col("tot") <= 0.9, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev",
    )
    return cls.groupBy("abc_class").agg(
        F.count("*").alias("n_parts"),
        F.round(F.sum("rev"), 2).alias("class_revenue"),
    )


@register(
    "timeseries_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS d,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    m AS (SELECT event_type, AVG(cnt) AS mu FROM daily GROUP BY 1),
    c AS (
      SELECT d.event_type, d.d,
             SUM(d.cnt - m.mu)
               OVER (PARTITION BY d.event_type ORDER BY d.d) AS cusum
      FROM daily d JOIN m ON d.event_type = m.event_type
    )
    SELECT event_type, ROUND(MAX(ABS(cusum)), 4) AS max_abs_cusum,
           -- TIMESTAMP, not DATE: a DATE output column round-trips
           -- differently through pandas on the two engines
           CAST(MIN(CASE WHEN rnk = 1 THEN d END) AS TIMESTAMP)
             AS changepoint_day
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_type ORDER BY ABS(cusum) DESC, d) AS rnk
      FROM c
    )
    GROUP BY 1
    """,
)
def timeseries_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: cumulative sum of
    daily-count deviations from the series mean; the day where |CUSUM|
    peaks is the estimated changepoint (the classic single-changepoint
    estimator).

    Scale shape: one O(data) groupBy to (type, day); the mean join
    rides broadcast; the cusum window, the argmax rank, and the final
    groupBy all partition by event_type, so Spark reuses one exchange
    for the entire post-aggregate chain. Ties in |CUSUM| break to the
    earliest day for determinism.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("cnt"))
    m = daily.groupBy("event_type").agg(F.avg("cnt").alias("mu"))
    wc = Window.partitionBy("event_type").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = (
        daily.join(F.broadcast(m), "event_type")
        .select(
            "event_type",
            "d",
            F.sum(F.col("cnt") - F.col("mu")).over(wc).alias("cusum"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs("cusum")), "d"
    )
    return (
        c.withColumn("rnk", F.row_number().over(wr))
        .groupBy("event_type")
        .agg(
            F.round(F.max(F.abs("cusum")), 4).alias("max_abs_cusum"),
            F.min(F.when(F.col("rnk") == 1, F.col("d")))
            .cast("timestamp")
            .alias("changepoint_day"),
        )
    )


@register(
    "timeseries_cross_correlation",
    oracle="""
    WITH daily AS (
      SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS d,
             SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS v,
             SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS p
      FROM events GROUP BY 1
    )
    SELECT CAST(lag AS INT) AS lag, CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CORR(a.v, b.p), 6) AS xcorr
    FROM generate_series(-3, 3) AS gs(lag)
    JOIN daily a ON TRUE
    JOIN daily b ON b.d = a.d + lag * INTERVAL 1 DAY
    GROUP BY lag
    """,
)
def timeseries_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation: Pearson correlation between the
    daily view-count series and the purchase series shifted by −3..+3
    days — does viewing predict purchasing k days later?

    Scale shape: one O(data) conditional groupBy to the daily (v, p)
    pair series; the 7 lags come from exploding a literal range onto
    the O(days) frame and self-joining on the shifted date — both
    sides tiny, the join broadcast. corr() per lag is a one-pass
    aggregate. At 100 TB nothing downstream of the first groupBy
    grows.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum((F.col("event_type") == "view").cast("int")).alias("v"),
        F.sum((F.col("event_type") == "purchase").cast("int")).alias("p"),
    )
    lags = daily.select(
        "d", "v", F.explode(F.sequence(F.lit(-3), F.lit(3))).alias("lag")
    ).withColumn("d_shift", F.date_add("d", F.col("lag")))
    b = daily.select(F.col("d").alias("d_shift"), F.col("p").alias("p_b"))
    joined = lags.join(F.broadcast(b), "d_shift")
    return joined.groupBy("lag").agg(
        F.count("*").alias("n_days"),
        F.round(F.corr("v", "p_b"), 6).alias("xcorr"),
    )
