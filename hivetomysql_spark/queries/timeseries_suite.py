"""Time-series analytics suite.

Folded from the round-build batch modules (analytics_extras*): every
query whose name matches this domain moved here verbatim together
with its batch-local helpers, so related operators read side by side.
Section banners record the source batch; helpers shared across
domains were duplicated module-private; colliding private names carry
a _b<batch> suffix.
"""

from __future__ import annotations



# ========================================================================
# from analytics_extras.py — original batch rationale:
# Analytics extras: robust statistics, customer segmentation,
# sequential recurrences, pinned-hash sketches, containment dedup, and
# one-pass centroid assignment.
#
# Not in the reference (hiveToMysql computes nothing — the single class
# `HiveToMysql.java:1-641` only copies rows); these widen the extension
# tiers of SURVEY.md §2.2 with operator shapes a production analytics /
# training-data stack runs daily:
#
# * MAD outlier flags — the robust anomaly screen (3·1.4826·MAD rule);
# * RFM segmentation — the classic marketing cohort cut;
# * per-key EMA — a *sequential recurrence*, the one aggregation class
#   a parallel engine cannot express as a commutative fold;
# * count-min sketch — with the hash family pinned to md5 so the sketch
#   itself (not just its contract) is oracle-checkable in DuckDB;
# * n-gram containment — the asymmetric near-dup signal for
#   quoted/sub-document duplication (Jaccard misses short-inside-long);
# * k-means assignment — the map-side step of Lloyd's / IVF coarse
#   quantization, as one broadcast join.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.operators import dedup as D
from hivetomysql_spark.operators.similarity import _as_double, _dot, _norm
from hivetomysql_spark.queries import register
from hivetomysql_spark.queries.llm import _SHINGLES_CTE
from hivetomysql_spark.tables import load_table



@register(
    "timeseries_ema",
    oracle="""
    WITH s AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vals
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           ROUND(list_reduce(vals::DOUBLE[], (acc, x) -> acc * 0.7 + x * 0.3), 4)
             AS ema
    FROM s
    """,
)
def timeseries_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average (α = 0.3) over the event
    stream — a *sequential recurrence*: ema_t = 0.7·ema_{t-1} +
    0.3·x_t cannot be a commutative shuffle fold. Expressed as one
    groupBy collecting the (ts, event_id, value) sequence and one
    JVM-side array fold (sort_array + aggregate) — per-key state is
    O(events-per-key), the per-group fold order is total (event_id
    tie-break), and both engines fold identically so the oracle
    matches bit-for-bit before rounding.

    Scale: per-key sequences in a training/event store are bounded
    (thousands, not billions); for unbounded keys the same recurrence
    runs as applyInPandasWithState over the stream (see
    streaming/stateful.py) or via the log-domain prefix-product
    closed form."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))).alias(
            "seq"
        )
    )
    vals = F.transform(F.col("seq"), lambda s: s["value"])
    ema = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1).cast("double"),
        lambda acc, x: acc * 0.7 + x * 0.3,
    )
    return seq.select(
        "user_id",
        F.size(vals).cast("long").alias("n_events"),
        F.round(ema, 4).alias("ema"),
    )


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


# ========================================================================
# from analytics_extras6.py — original batch rationale:
# Analytics extras, batch 6: survival analysis, multiple-testing
# correction, Holt-Winters smoothing, differential-privacy counts, KMV
# set sketches, watermark-dedup batch twin, bloom-prefiltered join,
# distributed connected components, the feature-hashing trick, and a
# Poisson rate test.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's statistics / privacy / sketch /
# graph tiers:
#
# * Kaplan-Meier — right-censored survival over order→last-ship
#   durations (status 'F' = event, else censored);
# * Benjamini-Hochberg — step-up FDR adjustment over per-group Welch
#   z p-values (logistic CDF approximation, identical in both engines);
# * Holt-Winters — level+trend double exponential smoothing, a genuine
#   sequential recurrence run as one per-key array fold;
# * DP noisy counts — Laplace mechanism with an md5-derived inverse-CDF
#   sample, so the noise is deterministic and oracle-checkable;
# * KMV sketch — k-minimum-values NDV + Jaccard/intersection estimates
#   with exact counterparts side by side;
# * watermark dedup — batch twin of Structured Streaming's
#   dropDuplicatesWithinWatermark (first event wins per key);
# * bloom prefilter — two-phase dim-key pruning (hashed bucket-set
#   broadcast, then exact broadcast semi join);
# * connected components — iterative min-label propagation on the
#   co-purchase graph, oracled by a recursive-CTE closure;
# * hashing trick — fixed-width token bucketing (the streaming-safe
#   vocabulary-free vectorizer);
# * Poisson rate test — conditional two-sample count comparison.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "timeseries_holt_winters",
    oracle="""
    WITH s AS (
      SELECT user_id, list(value ORDER BY ts, event_id)::DOUBLE[] AS vals
      FROM events GROUP BY user_id
    ),
    hw AS (
      SELECT user_id, len(vals) AS n,
             -- accumulator is a 2-element [level, trend] list:
             -- DuckDB 1.0's list_reduce miscomputes struct
             -- accumulators (field values bleed between iterations),
             -- while list accumulators fold correctly. Updates are
             -- the flat linear forms of the Holt recurrence
             -- (l' = a*x + (1-a)(l+b); b' = B(l'-l) + (1-B)b
             -- expanded), matching the Spark fold's float op order.
             list_reduce(
               list_transform(vals, x -> [x, 0.0::DOUBLE]),
               (acc, e) -> [0.5 * e[1] + 0.5 * acc[1] + 0.5 * acc[2],
                            0.15 * e[1] - 0.15 * acc[1] + 0.85 * acc[2]]
             ) AS st
      FROM s
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_events,
           ROUND(st[1], 4) AS level,
           ROUND(st[2], 4) AS trend,
           ROUND(st[1] + st[2], 4) AS forecast_1
    FROM hw
    """,
)
def timeseries_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing (alpha=0.5,
    beta=0.3) per user: l_t = a·x_t + (1-a)(l_{t-1}+b_{t-1}),
    b_t = B(l_t - l_{t-1}) + (1-B)b_{t-1}, seeded at (l=x_1, b=0) —
    the one-step-ahead forecast is l+b. Like timeseries_ema this is a
    sequential recurrence, here with a 2-component state vector:
    expressed as one per-key sorted-array fold with a struct
    accumulator, matching the DuckDB struct list_reduce bit for bit.

    Scale: the fold is JVM-side whole-stage codegen over per-key
    arrays; keys parallelize across executors, and the per-key state
    stays O(1). For unbounded keys the identical update runs inside
    applyInPandasWithState (streaming/stateful.py)."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))).alias("seq")
    )
    vals = F.transform(F.col("seq"), lambda s: s["value"].cast("double"))
    init = F.struct(
        F.element_at(vals, 1).alias("l"), F.lit(0.0).alias("b")
    )

    def step(acc, x):
        # flat linear forms, matching the oracle's float op order
        return F.struct(
            (0.5 * x + 0.5 * acc["l"] + 0.5 * acc["b"]).alias("l"),
            (0.15 * x - 0.15 * acc["l"] + 0.85 * acc["b"]).alias("b"),
        )

    st = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))), init, step
    )
    return seq.select(
        "user_id",
        F.size(vals).cast("long").alias("n_events"),
        F.round(st["l"], 4).alias("level"),
        F.round(st["b"], 4).alias("trend"),
        F.round(st["l"] + st["b"], 4).alias("forecast_1"),
    )


# ========================================================================
# from analytics_extras9.py — original batch rationale:
# Analytics extras, batch 9: classical seasonal decomposition, DP
# histograms with contribution bounding, full-batch logistic
# regression, and haversine hub assignment.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's time-series / privacy / ML / geo
# tiers:
#
# * classical decomposition — centered-MA trend, day-of-week seasonal
#   indexes, remainder spread (the pre-STL workhorse);
# * DP histogram — per-user contribution capping (bounded sensitivity)
#   before Laplace noise, the step naive DP counts miss;
# * logistic regression — three full-batch gradient-descent rounds on
#   sufficient statistics, every round oracled via unrolled CTEs;
# * haversine hubs — great-circle nearest-hub assignment over
#   deterministic pseudo-coordinates.
# ========================================================================
import math
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "timeseries_classical_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(o_totalprice) AS y
      FROM orders GROUP BY 1
    ),
    ma AS (
      SELECT d, y,
             AVG(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS trend,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS wn
      FROM daily
    ),
    det AS (
      SELECT d, y - trend AS detrended, ISODOW(d) AS dow
      FROM ma WHERE wn = 7
    ),
    seas AS (
      SELECT dow, AVG(detrended) AS seasonal, COUNT(*) AS n_days
      FROM det GROUP BY dow
    )
    SELECT CAST(det.dow AS BIGINT) AS dow,
           CAST(MIN(seas.n_days) AS BIGINT) AS n_days,
           ROUND(MIN(seas.seasonal), 2) AS seasonal_index,
           ROUND(STDDEV_SAMP(det.detrended - seas.seasonal), 2)
             AS remainder_std
    FROM det JOIN seas ON seas.dow = det.dow
    GROUP BY det.dow
    """,
)
def timeseries_classical_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily order revenue:
    trend = centered 7-day moving average (full windows only),
    seasonal = mean detrended value per ISO day-of-week, remainder =
    what neither explains, reported as per-DOW spread. The pre-STL
    diagnostic separating weekly rhythm from drift.

    Shape: N rows compress to O(days) in one grouped pass; the
    centered-MA window and everything after run on the compressed
    series — the ordered stage is bounded by the calendar, not the
    data. At 100 TB only the first groupBy sees the fact table."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("y")
    )
    wma = Window.orderBy("d").rowsBetween(-3, 3)
    ma = daily.select(
        "d",
        "y",
        F.avg("y").over(wma).alias("trend"),
        F.count(F.lit(1)).over(wma).alias("wn"),
    )
    det = ma.where(F.col("wn") == 7).select(
        (F.weekday("d") + 1).alias("dow"),
        (F.col("y") - F.col("trend")).alias("detrended"),
    )
    seas = det.groupBy("dow").agg(
        F.avg("detrended").alias("seasonal"), F.count(F.lit(1)).alias("n_days")
    )
    j = det.join(F.broadcast(seas), "dow")
    return j.groupBy("dow").agg(
        F.min("n_days").cast("long").alias("n_days"),
        F.round(F.min("seasonal"), 2).alias("seasonal_index"),
        F.round(F.stddev_samp(F.col("detrended") - F.col("seasonal")), 2).alias(
            "remainder_std"
        ),
    ).select(F.col("dow").cast("long").alias("dow"), "n_days", "seasonal_index", "remainder_std")


# ========================================================================
# from analytics_extras11.py — original batch rationale:
# Analytics extras, batch 11: star-schema flattening, join-key skew
# profiling, entity-resolution cluster rollup, and forecast
# backtesting.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's relational / data-quality /
# entity-resolution / time-series tiers:
#
# * star flatten — the one-pass all-broadcast-dims denormalization
#   every BI extract runs;
# * join-key skew — the partition-balance profiler you consult BEFORE
#   a 100 TB join, quantifying hot keys;
# * ER cluster rollup — fuzzy-match pairs closed into entities by
#   iterative min-label propagation (recursive-CTE closure oracle);
# * seasonal-naive backtest — forecast y(d) with y(d-7) and score it,
#   the baseline every fancier model must beat.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



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


# ========================================================================
# from analytics_extras21.py — original batch rationale:
# Analytics extras, batch 21: Bollinger-band breakout detection —
# the 300th registry operator.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); a final time-series entry for SURVEY.md §2.2:
#
# * Bollinger bands — rolling mean ± 2 sigma envelope over daily
#   revenue with breakout-day flags, the mean-reversion monitor that
#   complements the CUSUM changepoint and z-score spike detectors.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "timeseries_bollinger_breakouts",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    bands AS (
      SELECT d, rev,
             AVG(rev) OVER w AS mid,
             STDDEV_SAMP(rev) OVER w AS sd,
             COUNT(*) OVER w AS wn
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    flagged AS (
      SELECT d, rev, mid, sd,
             CASE WHEN rev > mid + 2 * sd THEN 1
                  WHEN rev < mid - 2 * sd THEN -1
                  ELSE 0 END AS breakout
      FROM bands WHERE wn = 20
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN breakout = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_upper_breakouts,
           CAST(SUM(CASE WHEN breakout = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lower_breakouts,
           ROUND(AVG(CASE WHEN breakout <> 0 THEN abs(rev - mid) / sd END), 3)
             AS avg_breakout_sigma,
           ROUND(AVG(2 * 2 * sd / mid), 4) AS avg_bandwidth
    FROM flagged
    """,
)
def timeseries_bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band monitoring of daily revenue: a 20-day rolling
    mean ± 2-sigma envelope, counting upper/lower breakout days,
    their average severity in sigmas, and the average relative band
    width (the volatility gauge). Completes the anomaly family:
    z-score spikes (dq_anomaly_volume_spike) catch level jumps,
    CUSUM catches slow drifts, Bollinger catches volatility-scaled
    excursions in trending series.

    Shape: N orders compress to O(days) first; the rolling window
    and everything after run on the compressed series — same
    sketch-then-finalize split as every series operator here."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(-19, 0)
    bands = daily.select(
        "d",
        "rev",
        F.avg("rev").over(w).alias("mid"),
        F.stddev_samp("rev").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("wn"),
    ).where(F.col("wn") == 20)
    breakout = (
        F.when(F.col("rev") > F.col("mid") + 2 * F.col("sd"), 1)
        .when(F.col("rev") < F.col("mid") - 2 * F.col("sd"), -1)
        .otherwise(0)
    )
    flagged = bands.select("rev", "mid", "sd", breakout.alias("breakout"))
    sigma = F.abs(F.col("rev") - F.col("mid")) / F.col("sd")
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.when(F.col("breakout") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_upper_breakouts"),
        F.sum(F.when(F.col("breakout") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_lower_breakouts"),
        F.round(
            F.avg(F.when(F.col("breakout") != 0, sigma)), 3
        ).alias("avg_breakout_sigma"),
        F.round(F.avg(4 * F.col("sd") / F.col("mid")), 4).alias("avg_bandwidth"),
    )


# ========================================================================
# from analytics_extras41.py — original batch rationale:
# Analytics extras, batch 41: seasonal smoothing, corpus
# dispersion, and embedding-space geometry.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * seasonal Holt-Winters — additive triple exponential smoothing with
#   a 7-slot day-of-week seasonal state, completing the EMA → Holt →
#   Holt-Winters smoothing family as array folds.
# * token dispersion — Gries' DP: how unevenly a token spreads across
#   corpus parts (beyond raw frequency).
# * embedding isotropy — mean pairwise cosine WITHOUT a pairwise join
#   (sufficient-statistics identity), the embedding-quality metric
#   behind "all my vectors point the same way" bugs.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_HW_ALPHA = 0.3


_HW_BETA = 0.1


_HW_GAMMA = 0.2


_HW_P = 7


def _hw_state_update_sql() -> str:
    # state list: [level, trend, s1..s7, idx]; e = [x]
    # si for the CURRENT period is slot (idx % 7) + 3 in acc
    a, b, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    slots = ", ".join(
        f"CASE WHEN CAST(acc[10] AS INT) % 7 = {i} "
        f"THEN {g} * (e[1] - ({a} * (e[1] - acc[{i + 3}])"
        f" + (1 - {a}) * (acc[1] + acc[2]))) "
        f"+ (1 - {g}) * acc[{i + 3}] ELSE acc[{i + 3}] END"
        for i in range(_HW_P)
    )
    lvl = f"{a} * (e[1] - acc[CAST(acc[10] AS INT) % 7 + 3]) + (1 - {a}) * (acc[1] + acc[2])"
    trd = (
        f"{b} * (({lvl}) - acc[1]) + (1 - {b}) * acc[2]"
    )
    return f"[{lvl}, {trd}, {slots}, acc[10] + 1]"



@register(
    "timeseries_holt_winters_seasonal",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      GROUP BY 1
    ),
    s AS (
      SELECT list(x ORDER BY d) AS xs, COUNT(*) AS n FROM daily
    ),
    folded AS (
      SELECT n,
             list_reduce(
               -- trailing 1.0 = the period index AFTER consuming the
               -- seed observation (only the first element's transform
               -- is ever used as the accumulator seed)
               list_transform(xs, v -> [v, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                                        0.0, 0.0, 1.0]),
               (acc, e) -> {_hw_state_update_sql()}
             ) AS st
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(st[1], 4) AS level,
           ROUND(st[2], 4) AS trend,
           ROUND(st[3], 4) AS season_slot0,
           ROUND(st[1] + st[2]
                 + st[CAST(st[10] AS INT) % 7 + 3], 4) AS forecast_1
    FROM folded
    """,
)
def timeseries_holt_winters_seasonal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Additive Holt-Winters (α=0.3, β=0.1, γ=0.2, period 7) over
    daily order counts from 1997 on: level, trend, and a 7-slot
    day-of-week seasonal state updated per observation — completing
    the smoothing family (`timeseries_ema` → `timeseries_holt_winters`
    → seasonal), expressed as ONE per-series array fold with a
    10-component state vector (level, trend, 7 seasonal slots,
    index). Seed: level = x₁, trend and seasonals 0 — both engines
    fold the identical flat-linear update forms, so the oracle
    matches bit-for-bit before rounding.

    Shape: the fact table reduces to O(days) first; the fold is
    JVM-side whole-stage codegen over one array; the streaming twin
    is applyInPandasWithState with the same update."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.where(F.col("o_orderdate") >= F.lit("1997-01-01"))
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    s = daily.agg(
        F.array_sort(F.collect_list(F.struct("d", "x"))).alias("seq"),
        F.count(F.lit(1)).alias("n"),
    )
    xs = F.transform(F.col("seq"), lambda e: e["x"])
    a, b, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA

    def upd(acc, x):
        idx = F.element_at(acc, 10).cast("int") % _HW_P
        si = F.element_at(acc, idx + 3)  # slot i sits at position i+3
        lvl = a * (x - si) + (1 - a) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        trd = b * (lvl - F.element_at(acc, 1)) + (1 - b) * F.element_at(
            acc, 2
        )
        slots = [
            F.when(
                idx == i,
                g * (x - lvl) + (1 - g) * F.element_at(acc, i + 3),
            ).otherwise(F.element_at(acc, i + 3))
            for i in range(_HW_P)
        ]
        return F.array(lvl, trd, *slots, F.element_at(acc, 10) + 1)

    init = F.array(
        F.element_at(xs, 1),
        *([F.lit(0.0)] * (_HW_P + 1)),
        F.lit(1.0),
    )
    st = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))), init, upd
    )
    nxt_si = F.element_at(
        st, (F.element_at(st, 10).cast("int") % _HW_P) + 3
    )
    return s.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.element_at(st, 1), 4).alias("level"),
        F.round(F.element_at(st, 2), 4).alias("trend"),
        F.round(F.element_at(st, 3), 4).alias("season_slot0"),
        F.round(
            F.element_at(st, 1) + F.element_at(st, 2) + nxt_si, 4
        ).alias("forecast_1"),
    )


# ========================================================================
# from analytics_extras44.py — original batch rationale:
# Analytics extras, batch 44: rolling regression, partial
# autocorrelation, and video shot detection.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * rolling beta — 30-day windowed regression slope of a segment's
#   revenue on total revenue, from windowed sufficient statistics.
# * PACF — partial autocorrelation at lags 1..3 via Durbin-Levinson,
#   the ARIMA order-selection diagnostic.
# * video shot detection — frame-to-frame mean pixel delta over REAL
#   concatenated-P6 frame walks, threshold crossings = cuts.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "timeseries_pacf",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT x,
             LAG(x, 1) OVER (ORDER BY d) AS x1,
             LAG(x, 2) OVER (ORDER BY d) AS x2,
             LAG(x, 3) OVER (ORDER BY d) AS x3
      FROM daily
    ),
    acf AS (
      SELECT CORR(x, x1) AS r1, CORR(x, x2) AS r2, CORR(x, x3) AS r3,
             COUNT(x3) AS n
      FROM lagged
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           ROUND(r1, 6) AS pacf_1,
           ROUND((r2 - r1 * r1) / (1 - r1 * r1), 6) AS pacf_2,
           ROUND((r3 - r1 * r2 - ((r2 - r1 * r1) / (1 - r1 * r1))
                        * (r2 - r1 * r1))
                 / (1 - r1 * r1 - ((r2 - r1 * r1) / (1 - r1 * r1))
                        * (r2 - r1 * r1)), 6) AS pacf_3
    FROM acf
    """,
)
def timeseries_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of daily order counts at lags 1-3 via
    the Durbin-Levinson recursion applied to the lag correlations —
    the ARIMA order-selection diagnostic (`timeseries_autocorr` gives
    ACF; PACF is what distinguishes AR(p) cutoffs from MA decay).
    φ₁₁=r₁; φ₂₂=(r₂−r₁²)/(1−r₁²); φ₃₃ from the second recursion
    step, all closed-form — identical algebra both engines.

    Shape: daily reduce, three lag windows over O(days), one
    correlation aggregate, O(1) recursion math."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 2).over(w).alias("x2"),
        F.lag("x", 3).over(w).alias("x3"),
    )
    acf = lagged.agg(
        F.corr("x", "x1").alias("r1"),
        F.corr("x", "x2").alias("r2"),
        F.corr("x", "x3").alias("r3"),
        F.count("x3").alias("n"),
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi33 = (r3 - r1 * r2 - phi22 * (r2 - r1 * r1)) / (
        1 - r1 * r1 - phi22 * (r2 - r1 * r1)
    )
    return acf.select(
        F.col("n").cast("long").alias("n_obs"),
        F.round(r1, 6).alias("pacf_1"),
        F.round(phi22, 6).alias("pacf_2"),
        F.round(phi33, 6).alias("pacf_3"),
    )


# ========================================================================
# from analytics_extras47.py — original batch rationale:
# Analytics extras, batch 47: image perceptual hashing, state-space
# filtering, variance-homogeneity testing, and l-diversity auditing.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * perceptual hash — block-mean 64-bit image signatures over real PPM
#   pixels, the image-dedup analogue of `dedup_simhash` (signatures
#   feed the same banded Hamming self-join at scale).
# * Kalman local-level filter — the simplest state-space model over
#   the daily order series, the principled successor to the EMA/Holt
#   smoothers already in the registry.
# * Brown-Forsythe (robust Levene) — variance-homogeneity test, the
#   gate statistic before pooled-variance tests like `stats_anova_f`.
# * l-diversity — per-quasi-identifier-group distinct-sensitive-value
#   audit, the release gate that `privacy_k_anonymity` alone misses
#   (a k-anonymous group with one sensitive value still leaks).
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.operators import multimodal as M
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_KQ, _KR, _KP0 = 10.0, 100.0, 1000.0



@register(
    "timeseries_kalman_local_level",
    oracle=f"""
    WITH d AS (
      SELECT date_trunc('day', o_orderdate) AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM orders GROUP BY 1
    ),
    s AS (SELECT list(y ORDER BY d) AS vals FROM d),
    f AS (
      SELECT len(vals) AS n,
             list_reduce(
               list_transform(
                 vals, x -> [x, {_KP0}::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE]),
               (acc, e) -> [
                 acc[1] + ((acc[2] + {_KQ}) / (acc[2] + {_KQ} + {_KR}))
                          * (e[1] - acc[1]),
                 (1.0 - (acc[2] + {_KQ}) / (acc[2] + {_KQ} + {_KR}))
                 * (acc[2] + {_KQ}),
                 acc[3] + (e[1] - acc[1]) * (e[1] - acc[1]),
                 (acc[2] + {_KQ}) / (acc[2] + {_KQ} + {_KR})
               ]
             ) AS st
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(st[1], 4) AS level,
           ROUND(st[2], 6) AS variance,
           ROUND(st[4], 6) AS final_gain,
           ROUND(SQRT(st[3] / (n - 1)), 4) AS innovation_rms
    FROM f
    """,
)
def timeseries_kalman_local_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-level (random-walk-plus-noise) Kalman filter over the
    daily order-count series: predict P+=Q, gain K=P/(P+R), update
    x+=K*(y-x), P*=(1-K) — the minimal state-space model whose
    steady-state gain the EMA alpha only approximates. Observations
    are integer counts (exact on both engines); the recurrence is a
    per-series sorted-array fold (same pattern as `timeseries_ema` /
    `timeseries_holt_winters`) with a 4-component [x, P, sum_innov2,
    K] accumulator, written in the identical float op order as the
    DuckDB list_reduce twin so the fold matches bit for bit before
    rounding. Innovation RMS doubles as the model-fit diagnostic.

    Scale: the fact table reduces to O(days) rows first; the fold is
    one task over a ~2.5k-element array. Per-key variants (one filter
    per series) parallelize across keys; unbounded streams run the
    identical update in applyInPandasWithState."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    s = daily.agg(
        F.array_sort(F.collect_list(F.struct("d", "y"))).alias("seq")
    )
    ys = F.transform(F.col("seq"), lambda e: e["y"])
    init = F.struct(
        F.element_at(ys, 1).alias("x"),
        F.lit(_KP0).alias("p"),
        F.lit(0.0).alias("ss"),
        F.lit(0.0).alias("k"),
    )

    def step(acc, y):
        # identical inline float op order as the oracle lambda
        k = (acc["p"] + _KQ) / (acc["p"] + _KQ + _KR)
        return F.struct(
            (acc["x"] + k * (y - acc["x"])).alias("x"),
            ((F.lit(1.0) - k) * (acc["p"] + _KQ)).alias("p"),
            (acc["ss"] + (y - acc["x"]) * (y - acc["x"])).alias("ss"),
            k.alias("k"),
        )

    st = F.aggregate(
        F.slice(ys, 2, F.greatest(F.size(ys) - 1, F.lit(0))), init, step
    )
    return s.select(
        F.size(ys).cast("long").alias("n_days"),
        F.round(st["x"], 4).alias("level"),
        F.round(st["p"], 6).alias("variance"),
        F.round(st["k"], 6).alias("final_gain"),
        F.round(
            F.sqrt(st["ss"] / (F.size(ys) - F.lit(1))), 4
        ).alias("innovation_rms"),
    )


# ========================================================================
# from analytics_extras51.py — original batch rationale:
# Analytics extras, batch 51: a verified quantile sketch, DP means,
# seasonal-aware anomaly flags, and embedding-coverage auditing.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * DDSketch-style quantiles — log-bucketed (gamma=1.02) quantile
#   sketch with its relative-error guarantee measured against the
#   exact percentiles; the VERIFIED member of the quantile-sketch
#   family next to the rows-only t-digest tier.
# * DP clipped mean — the textbook clip-then-Laplace release with the
#   clipping-bias bookkeeping, md5-pinned noise.
# * STL-style anomaly flags — trend (centered MA) + DOW seasonal +
#   remainder, alerting on remainder > 3 robust sigma: anomalies that
#   respect seasonality instead of re-alerting every Monday.
# * embedding coverage — the documents<->embeddings referential audit
#   (missing vectors, orphan vectors, zero-norm/NaN health) every
#   feature store runs before training reads it.
# ========================================================================
import math
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "timeseries_stl_anomaly_mad",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    trended AS (
      SELECT d, y,
             AVG(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS trend,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                            AND 3 FOLLOWING) AS wn
      FROM daily
    ),
    interior AS (SELECT * FROM trended WHERE wn = 7),
    seasonal AS (
      SELECT ISODOW(d) AS dow, AVG(y - trend) AS s
      FROM interior GROUP BY 1
    ),
    rem AS (
      SELECT i.d, i.y, i.trend, s.s,
             i.y - i.trend - s.s AS r
      FROM interior i JOIN seasonal s ON s.dow = ISODOW(i.d)
    ),
    mad AS (
      SELECT median(ABS(r - (SELECT median(r) FROM rem))) AS m,
             (SELECT median(r) FROM rem) AS med
      FROM rem
    ),
    ranked AS (
      SELECT rem.d, rem.y, rem.r,
             (rem.r - mad.med) / (1.4826 * mad.m) AS rz,
             ROW_NUMBER() OVER (
               ORDER BY ABS((rem.r - mad.med) / (1.4826 * mad.m)) DESC, rem.d
             ) AS rnk
      FROM rem CROSS JOIN mad
    )
    SELECT d AS day,
           CAST(y AS BIGINT) AS n_events,
           ROUND(r, 4) AS remainder,
           ROUND(rz, 4) AS robust_z,
           ABS(rz) > 3.0 AS is_anomaly
    FROM ranked WHERE rnk <= 3
    """,
)
def timeseries_stl_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-aware anomaly detection: decompose the daily series
    into centered-7-day-MA trend + day-of-week seasonal indexes
    (the `timeseries_classical_decompose` machinery), then flag days
    whose REMAINDER exceeds 3 robust sigmas (1.4826 MAD) — so a busy
    Monday doesn't alert just for being Monday, which is exactly the
    false-alarm class a raw z-score monitor (`dq_anomaly_volume_
    spike`) pays. This composition — decompose, then MAD on the
    residual — is the standard production anomaly recipe (cf.
    Twitter's Seasonal-Hybrid ESD).

    Shape: N events reduce to O(days) once; windows, seasonal
    means, the MAD, and the flags all run on the reduced series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    wt = Window.orderBy("d").rowsBetween(-3, 3)
    trended = daily.select(
        "d",
        "y",
        F.avg("y").over(wt).alias("trend"),
        F.count(F.lit(1)).over(wt).alias("wn"),
    ).where(F.col("wn") == 7)
    iso_dow = ((F.dayofweek("d") + 5) % 7) + 1
    seasonal = trended.groupBy(iso_dow.alias("dow")).agg(
        F.avg(F.col("y") - F.col("trend")).alias("s")
    )
    rem = trended.join(
        F.broadcast(seasonal), iso_dow == F.col("dow")
    ).select(
        "d",
        "y",
        (F.col("y") - F.col("trend") - F.col("s")).alias("r"),
    )
    med = rem.agg(F.percentile("r", F.lit(0.5)).alias("med"))
    mad = (
        rem.crossJoin(F.broadcast(med))
        .agg(
            F.percentile(F.abs(F.col("r") - F.col("med")), F.lit(0.5)).alias(
                "m"
            ),
            F.first("med").alias("med"),
        )
    )
    rz = (F.col("r") - F.col("med")) / (1.4826 * F.col("m"))
    ranked = rem.crossJoin(F.broadcast(mad)).select(
        "d",
        "y",
        "r",
        rz.alias("rz"),
        F.row_number()
        .over(Window.orderBy(F.desc(F.abs(rz)), "d"))
        .alias("rnk"),
    )
    # always report the top-3 most anomalous days (flagged against
    # the 3-sigma line): a healthy series still yields a non-empty,
    # hash-checkable result instead of an empty gate
    return ranked.where(F.col("rnk") <= 3).select(
        F.col("d").alias("day"),
        F.col("y").cast("long").alias("n_events"),
        F.round("r", 4).alias("remainder"),
        F.round("rz", 4).alias("robust_z"),
        (F.abs("rz") > 3.0).alias("is_anomaly"),
    )


# ========================================================================
# from analytics_extras57.py — original batch rationale:
# Analytics extras, batch 57: lag-feature construction, synthetic
# independence gap, spectral periodicity, and mergeable variance.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * lag matrix — the supervised feature table for forecasting
#   (t-1/t-7 lags, 7-day rolling mean, DOW) built leakage-free from
#   strictly-past windows.
# * synthetic independence gap — TVD between the real joint
#   distribution and the product of its marginals: exactly what a
#   marginals-only synthetic data release would lose.
# * periodogram — explicit cos/sin power at candidate periods over
#   the daily series; finds the weekly cycle spectrally.
# * two-level variance merge — Chan's parallel moments merge computed
#   EXPLICITLY from per-shard (n, mean, M2) and proven equal to the
#   direct variance: the algebra that makes every var/std in this
#   registry safe under any partitioning.
# ========================================================================
import math
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_PG_PERIODS = list(range(2, 15))



@register(
    "timeseries_periodogram",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT y - AVG(y) OVER () AS yc,
             ROW_NUMBER() OVER (ORDER BY d) - 1 AS t,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    power AS (
      SELECT p.p AS period,
             (POW(SUM(yc * COS(2 * PI() * t / p.p)), 2)
              + POW(SUM(yc * SIN(2 * PI() * t / p.p)), 2))
             / MAX(n) AS pw
      FROM idx, UNNEST([{", ".join(str(p) for p in _PG_PERIODS)}]) AS p(p)
      GROUP BY p.p
    )
    SELECT CAST(period AS INT) AS period_days,
           ROUND(pw, 4) AS power,
           CAST(ROW_NUMBER() OVER (ORDER BY pw DESC, period) AS INT)
             AS power_rank
    FROM power
    """,
)
def timeseries_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram of the daily event series: spectral power
    (cos-sum^2 + sin-sum^2)/n of the mean-centered counts at
    candidate periods 2..14 days — the frequency-domain way to FIND
    the dominant cycle that `timeseries_seasonality_dow` then
    quantifies by assuming week-7 (here the spectrum says whether
    that assumption was right). Same Goertzel-style explicit
    projection as `multimodal_audio_dft_bands`, applied to the
    business series.

    Shape: reduce to O(days), one in-row fan-out over 13 candidate
    periods, one O(periods) reduce — no FFT library, no UDF."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    wall = Window.partitionBy()
    idx = daily.select(
        (F.col("y") - F.avg("y").over(wall)).alias("yc"),
        (F.row_number().over(Window.orderBy("d")) - 1).alias("t"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    fan = idx.select(
        "yc",
        "t",
        "n",
        F.explode(F.array(*[F.lit(p) for p in _PG_PERIODS])).alias("period"),
    )
    ang = 2 * math.pi * F.col("t") / F.col("period")
    power = fan.groupBy("period").agg(
        (
            (
                F.pow(F.sum(F.col("yc") * F.cos(ang)), 2)
                + F.pow(F.sum(F.col("yc") * F.sin(ang)), 2)
            )
            / F.max("n")
        ).alias("pw")
    )
    return power.select(
        F.col("period").cast("int").alias("period_days"),
        F.round("pw", 4).alias("power"),
        F.row_number()
        .over(Window.orderBy(F.desc("pw"), "period"))
        .cast("int")
        .alias("power_rank"),
    )


# ========================================================================
# from analytics_extras62.py — original batch rationale:
# Analytics extras, batch 62: image near-dup candidates, forecast
# tournament, and share-of-parent rollups.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * pHash dedup pairs — the banded-Hamming candidate join over the
#   64-bit image signatures from `multimodal_phash`: the image
#   counterpart of `dedup_simhash`'s text plan, summarized so the
#   result is stable on a corpus of independent images.
# * backtest tournament — naive vs seasonal-naive vs EMA one-step
#   forecasts raced on the same monthly series by MAPE: the
#   model-selection table above the individual backtests.
# * share-of-parent — each (nation, priority) cell's share of its
#   nation and each nation's share of total: the hierarchical ratio
#   every drill-down UI renders next to rollup counts.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "timeseries_backtest_tournament",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT y, ROW_NUMBER() OVER (ORDER BY m) AS t FROM monthly
    ),
    ema AS (
      SELECT t, y,
             -- one-step-ahead EMA forecast: fold over the strict
             -- prefix (alpha = 0.3)
             (SELECT list_reduce(list(i.y ORDER BY i.t),
                                 (acc, x) -> acc * 0.7 + x * 0.3)
              FROM idx i WHERE i.t < idx.t) AS ema_prev
      FROM idx
    ),
    joined AS (
      SELECT a.t, a.y,
             n.y AS naive_f,
             s.y AS snaive_f,
             e.ema_prev AS ema_f
      FROM idx a
      JOIN idx n ON n.t = a.t - 1
      JOIN idx s ON s.t = a.t - 12
      JOIN ema e ON e.t = a.t
      WHERE a.t >= 13
    ),
    scores AS (
      SELECT 'naive' AS method,
             AVG(ABS(y - naive_f) / y) AS mape FROM joined
      UNION ALL
      SELECT 'snaive', AVG(ABS(y - snaive_f) / y) FROM joined
      UNION ALL
      SELECT 'ema03', AVG(ABS(y - ema_f) / y) FROM joined
    )
    SELECT method,
           ROUND(mape, 6) AS mape,
           CAST(ROW_NUMBER() OVER (ORDER BY mape, method) AS INT) AS rank
    FROM scores
    """,
)
def timeseries_backtest_tournament(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-method tournament on the monthly order series: naive
    (last month), seasonal-naive (12 months back), and EMA(0.3)
    one-step-ahead forecasts raced by MAPE over the common evaluation
    window (t >= 13) — the model-selection table that sits above
    `timeseries_backtest_snaive`'s single-method report. The EMA
    forecast for month t folds over the STRICT prefix (a growing-
    array fold, same machinery as `dq_control_chart_ewma`), so no
    forecast sees its own month.

    Shape: everything runs on the O(months) reduce; the prefix folds
    are months^2 scalar ops at worst — trivial against any fact
    scan."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    idx = monthly.select(
        "y", F.row_number().over(Window.orderBy("m")).alias("t")
    ).localCheckpoint(eager=False)
    # growing-list EMA trace: element k = EMA of the first k values
    seq = idx.agg(
        F.array_sort(F.collect_list(F.struct("t", "y"))).alias("s")
    )
    ys = F.transform(F.col("s"), lambda e: e["y"])
    trace = F.aggregate(
        F.slice(ys, 2, F.greatest(F.size(ys) - 1, F.lit(0))),
        F.array(F.element_at(ys, 1)),
        lambda acc, x: F.concat(
            acc, F.array(F.element_at(acc, F.size(acc)) * 0.7 + x * 0.3)
        ),
    )
    ema = seq.select(F.posexplode(trace).alias("t0", "ema_at"))
    ema_prev = ema.select(
        (F.col("t0") + 2).alias("te"), F.col("ema_at").alias("ema_f")
    )  # trace[k] (1-based k=t0+1) is EMA through month k -> forecast for k+1
    n_ = idx.select(F.col("t").alias("tn"), F.col("y").alias("naive_f"))
    s_ = idx.select(F.col("t").alias("ts"), F.col("y").alias("snaive_f"))
    joined = (
        idx.join(n_, F.col("tn") == F.col("t") - 1)
        .join(s_, F.col("ts") == F.col("t") - 12)
        .join(F.broadcast(ema_prev), F.col("te") == F.col("t"))
        .where(F.col("t") >= 13)
    )
    scores = (
        joined.agg(
            F.lit("naive").alias("method"),
            F.avg(F.abs(F.col("y") - F.col("naive_f")) / F.col("y")).alias(
                "mape"
            ),
        )
        .unionByName(
            joined.agg(
                F.lit("snaive").alias("method"),
                F.avg(
                    F.abs(F.col("y") - F.col("snaive_f")) / F.col("y")
                ).alias("mape"),
            )
        )
        .unionByName(
            joined.agg(
                F.lit("ema03").alias("method"),
                F.avg(F.abs(F.col("y") - F.col("ema_f")) / F.col("y")).alias(
                    "mape"
                ),
            )
        )
    )
    return scores.select(
        "method",
        F.round("mape", 6).alias("mape"),
        F.row_number()
        .over(Window.orderBy("mape", "method"))
        .cast("int")
        .alias("rank"),
    )


# ========================================================================
# from analytics_extras63.py — original batch rationale:
# Analytics extras, batch 63: pseudo-relevance feedback and Haar
# wavelet energy.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * PRF re-query — Rocchio-style pseudo-relevance feedback over the
#   embedding table: query -> top-5 -> centroid-blended query ->
#   re-rank; reports how the result set moved. Completes the
#   retrieval stack (exact/LSH/IVF/PQ/MMR/kNN) with the classic
#   second-pass refinement.
# * Haar energy — 3-level Haar wavelet decomposition of the daily
#   series with per-level detail energies: the multi-resolution
#   complement of the single-scale periodogram.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "timeseries_haar_energy",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT y, ROW_NUMBER() OVER (ORDER BY d) - 1 AS t,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    trimmed AS (
      -- truncate to a multiple of 8 so 3 Haar levels divide evenly
      SELECT y, t FROM idx WHERE t < (n // 8) * 8
    ),
    l1 AS (
      SELECT t // 2 AS t,
             SUM(CASE WHEN t % 2 = 0 THEN y ELSE 0 END) AS a,
             SUM(CASE WHEN t % 2 = 1 THEN y ELSE 0 END) AS b
      FROM trimmed GROUP BY t // 2
    ),
    l1o AS (SELECT t, (a + b) / 2.0 AS s, (a - b) / 2.0 AS dd FROM l1),
    l2 AS (
      SELECT t // 2 AS t,
             SUM(CASE WHEN t % 2 = 0 THEN s ELSE 0 END) AS a,
             SUM(CASE WHEN t % 2 = 1 THEN s ELSE 0 END) AS b
      FROM l1o GROUP BY t // 2
    ),
    l2o AS (SELECT t, (a + b) / 2.0 AS s, (a - b) / 2.0 AS dd FROM l2),
    l3 AS (
      SELECT t // 2 AS t,
             SUM(CASE WHEN t % 2 = 0 THEN s ELSE 0 END) AS a,
             SUM(CASE WHEN t % 2 = 1 THEN s ELSE 0 END) AS b
      FROM l2o GROUP BY t // 2
    ),
    l3o AS (SELECT t, (a + b) / 2.0 AS s, (a - b) / 2.0 AS dd FROM l3),
    energies AS (
      SELECT 1 AS level, SUM(dd * dd) AS energy, COUNT(*) AS n_coef FROM l1o
      UNION ALL
      SELECT 2, SUM(dd * dd), COUNT(*) FROM l2o
      UNION ALL
      SELECT 3, SUM(dd * dd), COUNT(*) FROM l3o
    )
    SELECT CAST(level AS INT) AS level,
           CAST(n_coef AS BIGINT) AS n_coefficients,
           ROUND(energy, 4) AS detail_energy,
           CAST(POW(2, level) AS BIGINT) AS scale_days
    FROM energies
    """,
)
def timeseries_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-level Haar wavelet decomposition of the daily event
    series: each level halves the series into pairwise means (smooth)
    and half-differences (detail), and the per-level detail ENERGY
    says at which time scale the variability lives — 2-day jitter
    (level 1) vs weekly-ish structure (level 3) — the
    multi-resolution view the single-scale `timeseries_periodogram`
    projects onto fixed periods. Pure pairwise groupBys, no UDF, no
    recursion: levels unroll as three O(n/2^k) reduces.

    Shape: the fact reduces to O(days) once; each level is one
    grouped pass over a halving table."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    idx = daily.select(
        "y",
        (F.row_number().over(Window.orderBy("d")) - 1).alias("t"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("n"),
    )
    trimmed = idx.where(
        F.col("t") < (F.floor(F.col("n") / 8) * 8)
    ).select("y", "t")

    def level(df, vcol):
        g = df.groupBy((F.col("t") / 2).cast("long").alias("t")).agg(
            F.sum(F.when(F.col("t") % 2 == 0, F.col(vcol)).otherwise(0.0)).alias("a"),
            F.sum(F.when(F.col("t") % 2 == 1, F.col(vcol)).otherwise(0.0)).alias("b"),
        )
        return g.select(
            "t",
            ((F.col("a") + F.col("b")) / 2.0).alias("s"),
            ((F.col("a") - F.col("b")) / 2.0).alias("dd"),
        )

    l1 = level(trimmed, "y").localCheckpoint(eager=False)
    l2 = level(l1, "s").localCheckpoint(eager=False)
    l3 = level(l2, "s")

    def energy(df, lv):
        return df.agg(
            F.lit(lv).cast("int").alias("level"),
            F.count(F.lit(1)).alias("n_coefficients"),
            F.round(F.sum(F.col("dd") * F.col("dd")), 4).alias(
                "detail_energy"
            ),
            F.lit(2 ** lv).cast("long").alias("scale_days"),
        )

    return (
        energy(l1, 1)
        .unionByName(energy(l2, 2))
        .unionByName(energy(l3, 3))
    )


# ========================================================================
# from analytics_extras80.py — original batch rationale:
# Analytics extras, batch 80: degree power-law fit and seasonal
# strength.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * degree power-law fit — continuous-MLE exponent of the co-purchase
#   degree distribution (alpha = 1 + n / sum ln(d/dmin)): the
#   scale-free-or-not verdict on the graph whose hubs the rich-club
#   and HITS queries already rank.
# * seasonal strength — Hyndman's F_s = max(0, 1 - Var(remainder) /
#   Var(detrended)): the single scalar that says HOW seasonal the
#   series is, quantifying what the periodogram locates and the DOW
#   decomposition removes.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "timeseries_seasonal_strength",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    trended AS (
      SELECT d, y,
             AVG(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS trend,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                            AND 3 FOLLOWING) AS wn
      FROM daily
    ),
    interior AS (
      SELECT d, y, trend, y - trend AS detrended
      FROM trended WHERE wn = 7
    ),
    seasonal AS (
      SELECT ISODOW(d) AS dow, AVG(detrended) AS s
      FROM interior GROUP BY 1
    ),
    rem AS (
      SELECT i.detrended, i.detrended - s.s AS r
      FROM interior i JOIN seasonal s ON s.dow = ISODOW(i.d)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(VAR_SAMP(detrended), 4) AS var_detrended,
           ROUND(VAR_SAMP(r), 4) AS var_remainder,
           ROUND(GREATEST(0.0, 1.0 - VAR_SAMP(r) / VAR_SAMP(detrended)), 4)
             AS seasonal_strength
    FROM rem
    """,
)
def timeseries_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman's seasonal-strength index: F_s = max(0, 1 -
    Var(remainder)/Var(detrended)) from the centered-MA +
    DOW-seasonal decomposition — the single scalar that says how
    much of the detrended variation the weekly pattern explains
    (near 0: don't bother with seasonal models; near 1: the DOW
    indexes ARE the series). Quantifies what
    `timeseries_periodogram` locates spectrally and what the
    decomposition/anomaly queries assume; the number a forecasting
    pipeline uses to CHOOSE between the snaive and naive baselines
    it backtests.

    Shape: one reduce to O(days); the trend window, seasonal means,
    and both variances run on the reduced series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    wt = Window.orderBy("d").rowsBetween(-3, 3)
    trended = daily.select(
        "d",
        "y",
        F.avg("y").over(wt).alias("trend"),
        F.count(F.lit(1)).over(wt).alias("wn"),
    ).where(F.col("wn") == 7)
    interior = trended.select(
        "d", (F.col("y") - F.col("trend")).alias("detrended")
    )
    iso_dow = ((F.dayofweek("d") + 5) % 7) + 1
    seasonal = interior.groupBy(iso_dow.alias("dow")).agg(
        F.avg("detrended").alias("s")
    )
    rem = interior.join(
        F.broadcast(seasonal), iso_dow == F.col("dow")
    ).select("detrended", (F.col("detrended") - F.col("s")).alias("r"))
    return rem.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.var_samp("detrended"), 4).alias("var_detrended"),
        F.round(F.var_samp("r"), 4).alias("var_remainder"),
        F.round(
            F.greatest(
                F.lit(0.0),
                1.0 - F.var_samp("r") / F.var_samp("detrended"),
            ),
            4,
        ).alias("seasonal_strength"),
    )
