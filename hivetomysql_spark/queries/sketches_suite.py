"""Sketch and approximate-aggregate suite.

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


def _cms_bucket(depth_expr: str, key_expr: str, width: int) -> str:
    """SQL text for one md5-derived CMS bucket (DuckDB oracle side)."""
    return (
        f"('0x' || substr(md5({depth_expr} || ':' || {key_expr}), 1, 8))::BIGINT"
        f" % {width}"
    )


_CMS_DEPTH = 4


_CMS_WIDTH = 64



@register(
    "agg_count_min_sketch",
    oracle=f"""
    WITH rows_ AS (
      SELECT i AS d,
             {_cms_bucket("i::VARCHAR", "CAST(user_id AS VARCHAR)", _CMS_WIDTH)} AS b
      FROM events, UNNEST([0, 1, 2, 3]) AS t(i)
    ),
    cms AS (SELECT d, b, COUNT(*) AS cnt FROM rows_ GROUP BY 1, 2),
    probes AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
    pb AS (
      SELECT user_id, i AS d,
             {_cms_bucket("i::VARCHAR", "CAST(user_id AS VARCHAR)", _CMS_WIDTH)} AS b
      FROM probes, UNNEST([0, 1, 2, 3]) AS t(i)
    ),
    est AS (
      SELECT user_id, MIN(cnt) AS cms_est FROM pb JOIN cms USING (d, b)
      GROUP BY user_id
    ),
    exact AS (
      SELECT user_id, COUNT(*) AS exact_n FROM events
      WHERE user_id < 20 GROUP BY user_id
    )
    SELECT e.user_id, e.exact_n, est.cms_est
    FROM exact e JOIN est USING (user_id)
    """,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 × width 64) over the event stream's
    user_id frequencies, with the hash family pinned to md5 so the
    *sketch contents* — not merely the ≥-exact contract — are
    reproducible in the DuckDB oracle. The counter table is (d, b) →
    count: mergeable by addition, 256 cells regardless of stream size
    — the canonical bounded-memory heavy-hitter state at 100 TB.
    Probing 20 keys returns min over depths of the landed counters,
    reported next to the exact counts (est ≥ exact always; equality
    when no collision)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k"), "user_id"
    )

    def bucket(i: int, key: F.Column) -> F.Column:
        h = F.md5(F.concat(F.lit(str(i)), F.lit(":"), key))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _CMS_WIDTH

    hashed = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("d"), bucket(i, F.col("k")).alias("b"))
                    for i in range(_CMS_DEPTH)
                ]
            )
        ).alias("h")
    )
    cms = hashed.groupBy(F.col("h.d").alias("d"), F.col("h.b").alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    probes = ev.where(F.col("user_id") < 20).select("user_id", "k").distinct()
    pb = probes.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("d"), bucket(i, F.col("k")).alias("b"))
                    for i in range(_CMS_DEPTH)
                ]
            )
        ).alias("h"),
    ).select("user_id", F.col("h.d").alias("d"), F.col("h.b").alias("b"))
    est = (
        pb.join(F.broadcast(cms), ["d", "b"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("cms_est"))
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    return exact.join(est, "user_id").select("user_id", "exact_n", "cms_est")


# ========================================================================
# from analytics_extras2.py — original batch rationale:
# Analytics extras, batch 2: experiment statistics, categorical
# encoding, and relational graph analytics.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's aggregation / governance tiers:
#
# * Welch's t-test — the unequal-variance A/B significance test, as ONE
#   conditional-aggregate pass (no per-variant scans);
# * frequency string indexer — MLlib StringIndexer semantics
#   (frequencyDesc with deterministic tie-break) expressed relationally;
# * degree distribution + triangle count — graph-shape metrics computed
#   on relational edge lists, the pre-GraphX shape that scales as plain
#   joins/aggregates.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



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
    "agg_abc_classification",
    oracle="""
    -- rev as an EXACT decimal and the class-cut ratio as a division
    -- of DOUBLE casts of those exact sums: the 0.7/0.9 cuts sit on
    -- knife edges where float summation drift could flip a part's
    -- class between engines
    WITH prev AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS rev
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT rev, SUM(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum,
             SUM(rev) OVER () AS tot
      FROM prev
    ),
    cls AS (
      SELECT CASE WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.7
                    THEN 'A'
                  WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.9
                    THEN 'B' ELSE 'C' END AS abc_class,
             rev
      FROM ranked
    )
    SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS class_revenue
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
        # exact DECIMAL revenue: cum/tot sit on 0.7/0.9 class-cut
        # knife edges, so float drift could flip a part's class
        F.sum(
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).cast("decimal(18,4)")
        ).alias("rev")
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
    ratio = F.col("cum").cast("double") / F.col("tot").cast("double")
    cls = ranked.select(
        F.when(ratio <= 0.7, "A")
        .when(ratio <= 0.9, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev",
    )
    return cls.groupBy("abc_class").agg(
        F.count("*").alias("n_parts"),
        F.round(F.sum("rev"), 2).cast("double").alias("class_revenue"),
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


_KMV_K = 64


def _kmv_frac_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 12))::BIGINT / 281474976710656.0)"



@register(
    "agg_kmv_set_operations",
    oracle=f"""
    WITH a_set AS (
      SELECT DISTINCT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'
    ),
    b_set AS (
      SELECT DISTINCT l_partkey AS k FROM lineitem WHERE l_discount > 0.05
    ),
    a_h AS (
      SELECT k, {_kmv_frac_sql("CAST(k AS VARCHAR)")} AS h,
             ROW_NUMBER() OVER (ORDER BY {_kmv_frac_sql("CAST(k AS VARCHAR)")})
               AS rn
      FROM a_set
    ),
    b_h AS (
      SELECT k, {_kmv_frac_sql("CAST(k AS VARCHAR)")} AS h,
             ROW_NUMBER() OVER (ORDER BY {_kmv_frac_sql("CAST(k AS VARCHAR)")})
               AS rn
      FROM b_set
    ),
    u_set AS (SELECT k FROM a_set UNION SELECT k FROM b_set),
    u_h AS (
      SELECT k, {_kmv_frac_sql("CAST(k AS VARCHAR)")} AS h,
             ROW_NUMBER() OVER (ORDER BY {_kmv_frac_sql("CAST(k AS VARCHAR)")})
               AS rn
      FROM u_set
    ),
    est AS (
      SELECT
        (SELECT COUNT(*) FROM a_set) AS exact_a,
        (SELECT COUNT(*) FROM b_set) AS exact_b,
        (SELECT COUNT(*) FROM u_set) AS exact_union,
        (SELECT CASE WHEN COUNT(*) <= {_KMV_K} THEN COUNT(*) * 1.0
                ELSE ({_KMV_K} - 1) / MAX(CASE WHEN rn = {_KMV_K} THEN h END)
                END FROM a_h) AS est_a,
        (SELECT CASE WHEN COUNT(*) <= {_KMV_K} THEN COUNT(*) * 1.0
                ELSE ({_KMV_K} - 1) / MAX(CASE WHEN rn = {_KMV_K} THEN h END)
                END FROM b_h) AS est_b,
        (SELECT CASE WHEN COUNT(*) <= {_KMV_K} THEN COUNT(*) * 1.0
                ELSE ({_KMV_K} - 1) / MAX(CASE WHEN rn = {_KMV_K} THEN h END)
                END FROM u_h) AS est_union,
        (SELECT COUNT(*) * 1.0 / LEAST({_KMV_K},
                   (SELECT COUNT(*) FROM u_h))
         FROM u_h
         WHERE rn <= {_KMV_K}
           AND k IN (SELECT k FROM a_set)
           AND k IN (SELECT k FROM b_set)) AS jacc
    )
    SELECT CAST(exact_a AS BIGINT) AS exact_a,
           CAST(exact_b AS BIGINT) AS exact_b,
           CAST(exact_union AS BIGINT) AS exact_union,
           ROUND(est_a, 2) AS est_a,
           ROUND(est_b, 2) AS est_b,
           ROUND(est_union, 2) AS est_union,
           ROUND(jacc, 4) AS jaccard_kmv,
           ROUND(jacc * est_union, 2) AS est_intersection
    FROM est
    """,
)
def agg_kmv_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values sketches (k=64) for distinct-count set
    algebra: NDV_est = (k-1)/h_(k) from the k-th smallest normalized
    hash, the union sketch is the k smallest of the merged sketches,
    and Jaccard = |sketch(A∪B) ∩ A ∩ B| / k gives the intersection
    estimate J·NDV(A∪B) — the mergeable-sketch way to answer
    "how many users did both" without a COUNT(DISTINCT) over the
    intersection. Exact values ride along for error inspection.

    Scale: each sketch is a bounded top-k-by-hash aggregation
    (mergeable across partitions, O(k) state); the hash is md5-derived
    so both engines rank identically. At 100 TB the same construction
    runs as one partial-aggregate pass per set, no distinct shuffle.

    Sets: parts returned ('R') vs parts sold at deep discount —
    large overlapping subsets of the part dimension."""
    li = load_table(spark, sf_dir, "lineitem")
    k = _KMV_K
    # ONE scan + ONE shuffle: per-part membership flags for both sets;
    # every sketch/estimate after this runs on the O(distinct parts)
    # table (the 100 TB shape — the fact table is touched once).
    base = (
        li.groupBy(F.col("l_partkey").alias("k"))
        .agg(
            F.max((F.col("l_returnflag") == "R").cast("int")).alias("in_a"),
            F.max((F.col("l_discount") > 0.05).cast("int")).alias("in_b"),
        )
        .where((F.col("in_a") == 1) | (F.col("in_b") == 1))
        .withColumn(
            "h",
            F.conv(
                F.substring(F.md5(F.col("k").cast("string")), 1, 12), 16, 10
            ).cast("double")
            / F.lit(281474976710656.0),
        )
    )
    w = Window.orderBy("h")
    ranked = base.select(
        "in_a",
        "in_b",
        "h",
        F.when(F.col("in_a") == 1, F.sum("in_a").over(w)).alias("rn_a"),
        F.when(F.col("in_b") == 1, F.sum("in_b").over(w)).alias("rn_b"),
        F.row_number().over(w).alias("rn_u"),
    )

    def est(n_col, kth_h):
        return F.when(n_col <= k, n_col.cast("double")).otherwise((k - 1) / kth_h)

    agg = ranked.agg(
        F.sum("in_a").alias("exact_a"),
        F.sum("in_b").alias("exact_b"),
        F.count(F.lit(1)).alias("exact_union"),
        F.max(F.when((F.col("in_a") == 1) & (F.col("rn_a") == k), F.col("h"))).alias(
            "ha"
        ),
        F.max(F.when((F.col("in_b") == 1) & (F.col("rn_b") == k), F.col("h"))).alias(
            "hb"
        ),
        F.max(F.when(F.col("rn_u") == k, F.col("h"))).alias("hu"),
        F.sum(
            F.when(
                (F.col("rn_u") <= k) & (F.col("in_a") == 1) & (F.col("in_b") == 1), 1
            ).otherwise(0)
        ).alias("n_common"),
    )
    jacc = F.col("n_common") / F.least(F.lit(k), F.col("exact_union"))
    est_u = est(F.col("exact_union"), F.col("hu"))
    return agg.select(
        F.col("exact_a").cast("long").alias("exact_a"),
        F.col("exact_b").cast("long").alias("exact_b"),
        F.col("exact_union").cast("long").alias("exact_union"),
        F.round(est(F.col("exact_a"), F.col("ha")), 2).alias("est_a"),
        F.round(est(F.col("exact_b"), F.col("hb")), 2).alias("est_b"),
        F.round(est_u, 2).alias("est_union"),
        F.round(jacc, 4).alias("jaccard_kmv"),
        F.round(jacc * est_u, 2).alias("est_intersection"),
    )


# ========================================================================
# from analytics_extras12.py — original batch rationale:
# Analytics extras, batch 12: Bayesian A/B and linear counting.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); rounds out SURVEY.md §2.2's statistics / sketch tiers:
#
# * Bayesian A/B — Beta(1,1)-posterior conversion comparison with the
#   normal approximation, P(A beats B) per metric (the decision-ready
#   complement to the frequentist Welch/U/KS family);
# * linear counting — the bitmap NDV sketch (Whang et al.) that beats
#   HLL at small cardinalities, md5-pinned so the sketch itself is
#   oracle-checked.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_LC_M = 1024



@register(
    "agg_linear_counting",
    oracle=f"""
    WITH b AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
               ::BIGINT % {_LC_M} AS bucket
      FROM events
    ),
    v AS (
      SELECT COUNT(*) AS occupied,
             (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_n
      FROM b
    )
    SELECT CAST(exact_n AS BIGINT) AS exact_distinct,
           CAST(occupied AS BIGINT) AS occupied_buckets,
           ROUND(-{_LC_M}.0 * ln(({_LC_M}.0 - occupied) / {_LC_M}.0), 2)
             AS lc_estimate,
           ROUND(abs(-{_LC_M}.0 * ln(({_LC_M}.0 - occupied) / {_LC_M}.0)
                     - exact_n) / exact_n, 4) AS rel_err
    FROM v
    """,
)
def agg_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear counting (Whang et al., TODS'90): distinct users hash
    into a 1024-bit bitmap; NDV_est = -m ln(empty_fraction). At low
    load factors this beats HyperLogLog's error — which is why
    production HLL implementations (including Spark's own
    approx_count_distinct) switch to linear counting below a
    cardinality threshold. The md5-pinned bucket function makes the
    sketch contents — not just the estimate's contract —
    oracle-checkable, alongside the exact count and realized error.

    Shape: the bitmap is a bounded distinct-on-bucket aggregate
    (1024 keys max, fully map-side combinable); merging bitmaps
    across partitions or days is a bitwise OR — the mergeability
    that makes it a streaming/rollup-friendly NDV at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _LC_M
    )
    b = ev.select(bucket.alias("bucket")).distinct()
    occupied = b.agg(F.count(F.lit(1)).alias("occupied"))
    exact = ev.agg(F.countDistinct("user_id").alias("exact_n"))
    v = occupied.crossJoin(exact)
    m = float(_LC_M)
    est = -m * F.log((m - F.col("occupied")) / m)
    return v.select(
        F.col("exact_n").cast("long").alias("exact_distinct"),
        F.col("occupied").cast("long").alias("occupied_buckets"),
        F.round(est, 2).alias("lc_estimate"),
        F.round(F.abs(est - F.col("exact_n")) / F.col("exact_n"), 4).alias(
            "rel_err"
        ),
    )


# ========================================================================
# from analytics_extras15.py — original batch rationale:
# Analytics extras, batch 15: ratio-metric confidence intervals,
# duplicate-transaction detection, and embedding outliers.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's statistics / data-quality /
# embedding tiers:
#
# * ratio-metric CI — the delta method for revenue-per-order style
#   metrics whose numerator and denominator are correlated per unit
#   (naive SE is wrong there; this is the standard experimentation-
#   platform fix);
# * duplicate transactions — same customer, same amount, within 30
#   days: the double-charge / double-load screen;
# * Mahalanobis outliers — diagonal-covariance standardized distance
#   over the embedding cloud, top-k most anomalous vectors.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "agg_ratio_metrics_ci",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_mktsegment AS seg, c.c_custkey,
             SUM(o.o_totalprice) AS x,
             COUNT(*) AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    st AS (
      SELECT seg,
             COUNT(*) AS n,
             AVG(x) AS mx, AVG(y * 1.0) AS my,
             VAR_SAMP(x) AS vx, VAR_SAMP(y * 1.0) AS vy,
             COVAR_SAMP(x, y * 1.0) AS cxy
      FROM per_cust GROUP BY seg
    )
    SELECT seg,
           CAST(n AS BIGINT) AS n_customers,
           ROUND(mx / my, 4) AS revenue_per_order,
           ROUND(sqrt((vx - 2 * (mx / my) * cxy + (mx / my) * (mx / my) * vy)
                      / n) / my, 4) AS se_delta,
           ROUND(mx / my - 1.96 * sqrt((vx - 2 * (mx / my) * cxy
                 + (mx / my) * (mx / my) * vy) / n) / my, 4) AS ci_lo,
           ROUND(mx / my + 1.96 * sqrt((vx - 2 * (mx / my) * cxy
                 + (mx / my) * (mx / my) * vy) / n) / my, 4) AS ci_hi
    FROM st
    """,
)
def agg_ratio_metrics_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a ratio metric
    (revenue-per-order by segment, unit = customer): because each
    customer contributes to BOTH numerator and denominator, the naive
    per-order SE is wrong; Var(X̄/Ȳ) ≈ (vx - 2r·cov + r²·vy)/(n·Ȳ²)
    is the standard experimentation-platform correction (Deng et al.,
    "Applying the Delta Method in Metric Analytics").

    Shape: one grouped pass to per-unit sufficient statistics, one
    O(units) moment aggregate per segment — the CI math is scalar on
    O(segments) rows. Mergeable moments make this a single-scan
    computation at any scale."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per_cust = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("seg"), "c_custkey")
        .agg(
            F.sum("o_totalprice").alias("x"),
            F.count(F.lit(1)).cast("double").alias("y"),
        )
    )
    st = per_cust.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_samp("x").alias("vx"),
        F.var_samp("y").alias("vy"),
        F.covar_samp("x", "y").alias("cxy"),
    )
    r = F.col("mx") / F.col("my")
    se = (
        F.sqrt(
            (F.col("vx") - 2 * r * F.col("cxy") + r * r * F.col("vy")) / F.col("n")
        )
        / F.col("my")
    )
    return st.select(
        "seg",
        F.col("n").cast("long").alias("n_customers"),
        F.round(r, 4).alias("revenue_per_order"),
        F.round(se, 4).alias("se_delta"),
        F.round(r - 1.96 * se, 4).alias("ci_lo"),
        F.round(r + 1.96 * se, 4).alias("ci_hi"),
    )


# ========================================================================
# from analytics_extras43.py — original batch rationale:
# Analytics extras, batch 43: robust estimation, information rate,
# and vocabulary richness.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * median-of-means — the heavy-tail-robust mean estimator built from
#   k bucketed means (the primitive inside robust streaming
#   estimators).
# * entropy rate — bits per transition of the event-type Markov
#   chain, the compressibility/predictability of the behavior stream.
# * hapax ratio — once-occurring vocabulary share per source, the
#   richness complement of Heaps'-law fitting.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_MOM_K = 16



@register(
    "agg_median_of_means",
    oracle=f"""
    WITH bucketed AS (
      SELECT o_totalprice AS x,
             ('0x' || substr(md5('mom:' || o_orderkey), 1, 8))::BIGINT
               % {_MOM_K} AS b
      FROM orders
    ),
    bm AS (
      SELECT b, AVG(x) AS m, COUNT(*) AS n FROM bucketed GROUP BY b
    )
    SELECT CAST({_MOM_K} AS BIGINT) AS k_buckets,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           ROUND(quantile_cont(m, 0.5), 6) AS median_of_means,
           ROUND(SUM(m * n) / SUM(n), 6) AS plain_mean,
           ROUND(MAX(m) - MIN(m), 6) AS bucket_mean_spread
    FROM bm
    """,
)
def agg_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means: rows are hashed into k=16 buckets, each
    bucket's mean is computed, and the MEDIAN of those means is the
    estimate — the estimator with exponential concentration under
    heavy tails where the plain mean has only Chebyshev (the
    primitive inside robust streaming aggregation). md5 bucketing
    makes the whole construction deterministic and oracle-checked;
    the spread of bucket means is the built-in outlier diagnostic.

    Shape: one scan with map-side combine into k partial means, then
    O(k) scalar math — identical cost to a plain mean at any
    scale."""
    o = load_table(spark, sf_dir, "orders")
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mom:"), F.col("o_orderkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _MOM_K
    )
    bm = (
        o.select(F.col("o_totalprice").alias("x"), b.alias("b"))
        .groupBy("b")
        .agg(F.avg("x").alias("m"), F.count(F.lit(1)).alias("n"))
    )
    return bm.agg(
        F.lit(_MOM_K).cast("long").alias("k_buckets"),
        F.sum("n").cast("long").alias("n_rows"),
        F.round(F.percentile("m", F.lit(0.5)), 6).alias("median_of_means"),
        F.round(F.sum(F.col("m") * F.col("n")) / F.sum("n"), 6).alias(
            "plain_mean"
        ),
        F.round(F.max("m") - F.min("m"), 6).alias("bucket_mean_spread"),
    )


# ========================================================================
# from analytics_extras48.py — original batch rationale:
# Analytics extras, batch 48: boosted stumps, a pinned HyperLogLog,
# and readability scoring.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * gradient-boosted stumps — 3 rounds of L2 boosting with depth-1
#   trees expressed relationally (the XGBoost training loop as a
#   query): residuals -> candidate-split histogram -> argmax gain ->
#   broadcast update, no exploded fact rows, no driver-side model.
# * pinned HyperLogLog — a full 256-register HLL built from md5
#   hashes with integer-only rank extraction, so the DuckDB oracle
#   re-derives every register and the estimate; upgrades the
#   approx-NDV family from contract-tested to value-verified.
# * Flesch readability — words/sentences/syllable-group counts per
#   document via regexp, averaged per source: the classic
#   text-quality signal next to `text_quality`'s ratios.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_HLL_M = 256


def _hll_rank_sql(w: str) -> str:
    # integer-only rank-of-first-one-bit in a 24-bit window:
    # rho = 25 - popcount-of-thresholds; no log2, no bin-string
    terms = " + ".join(
        f"CASE WHEN {w} >= {1 << k} THEN 1 ELSE 0 END" for k in range(24)
    )
    return f"(25 - ({terms}))"



@register(
    "agg_hyperloglog_pinned",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT
        ('0x' || substr(md5('hll:' || o_custkey), 1, 8))::BIGINT AS hv
      FROM orders
    ),
    slots AS (
      SELECT hv // 16777216 AS idx, hv % 16777216 AS w FROM h
    ),
    regs AS (
      SELECT idx, MAX({_hll_rank_sql("w")}) AS m FROM slots GROUP BY idx
    ),
    z AS (
      SELECT SUM(POW(2.0, -m)) + ({_HLL_M} - COUNT(*)) AS zsum,
             {_HLL_M} - COUNT(*) AS v
      FROM regs
    ),
    est AS (
      SELECT (0.7213 / (1.0 + 1.079 / {_HLL_M}))
             * {_HLL_M} * {_HLL_M} / zsum AS raw, v
      FROM z
    ),
    corrected AS (
      -- small-range (linear counting) correction: raw <= 2.5m with
      -- zero registers present => m * ln(m / V)
      SELECT raw,
             CASE WHEN raw <= 2.5 * {_HLL_M} AND v > 0
                  THEN {_HLL_M} * LN({_HLL_M} * 1.0 / v)
                  ELSE raw END AS e,
             v
      FROM est
    )
    SELECT (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
             AS n_exact,
           ROUND(raw, 4) AS hll_raw,
           ROUND(e, 4) AS hll_estimate,
           ROUND(ABS(e - (SELECT COUNT(DISTINCT o_custkey) FROM orders))
                 / (SELECT COUNT(DISTINCT o_custkey) FROM orders), 6)
             AS rel_error,
           CAST(v AS BIGINT) AS n_zero_registers,
           CAST({_HLL_M} AS BIGINT) AS n_registers
    FROM corrected
    """,
)
def agg_hyperloglog_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A COMPLETE HyperLogLog built in the engine with a pinned
    (md5) hash family, so the oracle reproduces every register:
    32-bit hash -> top 8 bits pick one of 256 registers, low 24 bits
    yield the rank via an integer-only threshold popcount (no
    floating log2, no binary-string length — both engines derive
    identical ranks), registers merge with MAX, and the raw estimate
    is alpha_m * m^2 / (sum 2^-M_j + zero registers). Spark's own
    approx_count_distinct is the production tier
    (`agg_approx_distinct`); this query proves the engine can
    EXPRESS the sketch relationally and gets it right to the bit.

    Scale: MAX-merge registers are associative — the same query runs
    over any partitioning with one O(256) shuffle after map-side
    combine, and register tables from disjoint corpus shards union
    and re-MAX to give the sketch of the union (mergeability is the
    entire point of HLL at 100 TB)."""
    o = load_table(spark, sf_dir, "orders")
    h = o.select(
        F.conv(F.substring(F.md5(F.concat(F.lit("hll:"), F.col("o_custkey"))), 1, 8), 16, 10)
        .cast("long")
        .alias("hv")
    ).distinct()
    slots = h.select(
        (F.col("hv") / 16777216).cast("long").alias("idx"),
        (F.col("hv") % 16777216).alias("w"),
    )
    rank = F.lit(25) - sum(
        [
            F.when(F.col("w") >= (1 << k), 1).otherwise(0)
            for k in range(24)
        ],
        F.lit(0),
    )
    regs = slots.select("idx", rank.alias("rho")).groupBy("idx").agg(
        F.max("rho").alias("m")
    )
    z = regs.agg(
        (
            F.sum(F.pow(F.lit(2.0), -F.col("m")))
            + (F.lit(_HLL_M) - F.count(F.lit(1)))
        ).alias("zsum"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).alias("v"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
    est = z.select(
        (F.lit(alpha) * _HLL_M * _HLL_M / F.col("zsum")).alias("raw"), "v"
    ).select(
        "raw",
        # small-range (linear counting) correction, as in the oracle
        F.when(
            (F.col("raw") <= 2.5 * _HLL_M) & (F.col("v") > 0),
            F.lit(float(_HLL_M)) * F.log(F.lit(_HLL_M) * 1.0 / F.col("v")),
        )
        .otherwise(F.col("raw"))
        .alias("e"),
        "v",
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("n_exact"))
    return est.crossJoin(F.broadcast(exact)).select(
        F.col("n_exact").cast("long").alias("n_exact"),
        F.round("raw", 4).alias("hll_raw"),
        F.round("e", 4).alias("hll_estimate"),
        F.round(
            F.abs(F.col("e") - F.col("n_exact")) / F.col("n_exact"), 6
        ).alias("rel_error"),
        F.col("v").cast("long").alias("n_zero_registers"),
        F.lit(_HLL_M).cast("long").alias("n_registers"),
    )


# ========================================================================
# from analytics_extras50.py — original batch rationale:
# Analytics extras, batch 50: data-mixing epoch planning, weighted
# near-dup, a pinned Bloom filter, and time-decay scoring.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * mixture epoch planner — tokens-at-mix and epoch counts per source
#   under a temperature-adjusted sampling mix and a fixed token
#   budget, with the >4-epoch repetition flag (the data-constrained
#   scaling rule of thumb) — the table a pretraining run plans from.
# * IDF-weighted Jaccard — near-dup scoring where rare shingles count
#   more than boilerplate (the weighted upgrade of
#   `dedup_ngram_jaccard`, same posting-list shuffle plan).
# * pinned Bloom filter — a complete m-bit / k-hash Bloom filter
#   built relationally from md5 hashes, with measured-vs-theoretical
#   false-positive rate; completes the sketch family next to the
#   pinned HLL / count-min / linear-counting / KMV.
# * time-decay score — exponentially decayed engagement per user, the
#   classic recency-weighted feature.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_BF_M = 65536


_BF_K = 3


_BF_PROBES = 2000


def _bf_hash_sql(i: int, key: str) -> str:
    return (
        f"('0x' || substr(md5('bf{i}:' || {key}), 1, 8))::BIGINT % {_BF_M}"
    )



@register(
    "agg_bloom_filter_pinned",
    oracle=f"""
    WITH keys AS (SELECT DISTINCT o_custkey AS k FROM orders),
    bits AS (
      SELECT DISTINCT h FROM keys, UNNEST([
        {", ".join(_bf_hash_sql(i, "k") for i in range(_BF_K))}
      ]) AS t(h)
    ),
    probes AS (
      SELECT 10000000 + j AS pk FROM UNNEST(range(0, {_BF_PROBES})) AS t(j)
    ),
    probe_hits AS (
      SELECT p.pk, COUNT(b.h) AS nhit
      FROM probes p,
           UNNEST([
             {", ".join(_bf_hash_sql(i, "p.pk") for i in range(_BF_K))}
           ]) AS t(h)
      LEFT JOIN bits b ON b.h = t.h
      GROUP BY p.pk
    ),
    stats AS (
      SELECT (SELECT COUNT(*) FROM keys) AS n,
             (SELECT COUNT(*) FROM bits) AS nbits,
             (SELECT COUNT(*) FROM probe_hits WHERE nhit = {_BF_K}) AS fp
    )
    SELECT CAST({_BF_M} AS BIGINT) AS m_bits,
           CAST({_BF_K} AS BIGINT) AS k_hashes,
           CAST(n AS BIGINT) AS n_inserted,
           CAST(nbits AS BIGINT) AS n_bits_set,
           ROUND(nbits * 1.0 / {_BF_M}, 6) AS fill_ratio,
           CAST({_BF_PROBES} AS BIGINT) AS n_probes,
           CAST(fp AS BIGINT) AS n_false_positives,
           ROUND(fp * 1.0 / {_BF_PROBES}, 6) AS fpr_measured,
           ROUND(POW(1.0 - EXP(-{_BF_K}.0 * n / {_BF_M}.0), {_BF_K}), 6)
             AS fpr_theory
    FROM stats
    """,
)
def agg_bloom_filter_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A COMPLETE Bloom filter built relationally with a pinned md5
    hash family: k=3 hash positions per key into m=65536 bits, the
    bit set as a distinct-positions table, membership = all k
    positions present, and the measured false-positive rate on 2000
    known non-members next to the (1-e^{{-kn/m}})^k theory value. The
    oracle re-derives every bit and every probe. Production Spark
    uses the built-in bloom for runtime join pruning
    (`join_bloom_prefilter`); this query proves the engine expresses
    the structure itself and gets its statistics right.

    Shape: bit set = one explode(k) + distinct (mergeable across
    shards by unioning position tables — the Bloom OR). Probes join
    the bit set on 8-byte positions. All reduces are map-side
    combined; nothing data-sized shuffles twice."""
    o = load_table(spark, sf_dir, "orders")
    keys = o.select(F.col("o_custkey").alias("k")).distinct()

    def h(i: int, col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"bf{i}:"), col.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _BF_M
        )

    bits = (
        keys.select(
            F.explode(F.array(*[h(i, F.col("k")) for i in range(_BF_K)])).alias(
                "h"
            )
        )
        .distinct()
        .localCheckpoint()
    )
    probes = spark.range(_BF_PROBES).select(
        (F.lit(10_000_000) + F.col("id")).alias("pk")
    )
    ph = probes.select(
        "pk",
        F.explode(F.array(*[h(i, F.col("pk")) for i in range(_BF_K)])).alias(
            "h"
        ),
    )
    probe_hits = (
        ph.join(F.broadcast(bits.withColumnRenamed("h", "bh")),
                F.col("h") == F.col("bh"), "left")
        .groupBy("pk")
        .agg(F.count("bh").alias("nhit"))
    )
    stats = (
        keys.agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(bits.agg(F.count(F.lit(1)).alias("nbits")))
        .crossJoin(
            probe_hits.agg(
                F.sum((F.col("nhit") == _BF_K).cast("long")).alias("fp")
            )
        )
    )
    return stats.select(
        F.lit(_BF_M).cast("long").alias("m_bits"),
        F.lit(_BF_K).cast("long").alias("k_hashes"),
        F.col("n").cast("long").alias("n_inserted"),
        F.col("nbits").cast("long").alias("n_bits_set"),
        F.round(F.col("nbits") * 1.0 / _BF_M, 6).alias("fill_ratio"),
        F.lit(_BF_PROBES).cast("long").alias("n_probes"),
        F.col("fp").cast("long").alias("n_false_positives"),
        F.round(F.col("fp") * 1.0 / _BF_PROBES, 6).alias("fpr_measured"),
        F.round(
            F.pow(
                F.lit(1.0) - F.exp(-F.lit(float(_BF_K)) * F.col("n") / float(_BF_M)),
                _BF_K,
            ),
            6,
        ).alias("fpr_theory"),
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


_DD_GAMMA = 1.02



@register(
    "agg_ddsketch_quantile_pinned",
    oracle=f"""
    WITH pts AS (SELECT o_totalprice AS x FROM orders WHERE o_totalprice > 0),
    buckets AS (
      SELECT CAST(CEIL(LN(x) / LN({_DD_GAMMA})) AS BIGINT) AS b,
             COUNT(*) AS c
      FROM pts GROUP BY 1
    ),
    cum AS (
      SELECT b, c, SUM(c) OVER (ORDER BY b) AS cum,
             SUM(c) OVER () AS n
      FROM buckets
    ),
    est AS (
      SELECT
        (SELECT MIN(b) FROM cum WHERE cum >= CEIL(0.5 * n)) AS b50,
        (SELECT MIN(b) FROM cum WHERE cum >= CEIL(0.9 * n)) AS b90,
        (SELECT MIN(b) FROM cum WHERE cum >= CEIL(0.99 * n)) AS b99,
        (SELECT COUNT(*) FROM buckets) AS n_buckets,
        (SELECT MAX(c) FROM buckets) AS max_bucket
      FROM (SELECT 1)
    ),
    exact AS (
      SELECT quantile_cont(x, 0.5) AS q50,
             quantile_cont(x, 0.9) AS q90,
             quantile_cont(x, 0.99) AS q99
      FROM pts
    )
    SELECT CAST(n_buckets AS BIGINT) AS n_buckets,
           CAST(max_bucket AS BIGINT) AS max_bucket,
           ROUND(2.0 * POW({_DD_GAMMA}, b50) / ({_DD_GAMMA} + 1.0), 4)
             AS p50_sketch,
           ROUND(ABS(2.0 * POW({_DD_GAMMA}, b50) / ({_DD_GAMMA} + 1.0) - q50)
                 / q50, 6) AS p50_rel_err,
           ROUND(2.0 * POW({_DD_GAMMA}, b90) / ({_DD_GAMMA} + 1.0), 4)
             AS p90_sketch,
           ROUND(ABS(2.0 * POW({_DD_GAMMA}, b90) / ({_DD_GAMMA} + 1.0) - q90)
                 / q90, 6) AS p90_rel_err,
           ROUND(2.0 * POW({_DD_GAMMA}, b99) / ({_DD_GAMMA} + 1.0), 4)
             AS p99_sketch,
           ROUND(ABS(2.0 * POW({_DD_GAMMA}, b99) / ({_DD_GAMMA} + 1.0) - q99)
                 / q99, 6) AS p99_rel_err
    FROM est CROSS JOIN exact
    """,
)
def agg_ddsketch_quantile_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A DDSketch-style quantile sketch, fully verified: values map
    to log buckets ceil(ln x / ln gamma) with gamma=1.02, bucket
    counts merge as plain sums (the mergeability that t-digest only
    approximates), and quantile q reads the first bucket whose
    cumulative count reaches ceil(q n); the midpoint estimate
    2 gamma^b/(gamma+1) is then within (gamma-1)/(gamma+1) ~ 1% of
    the true value BY CONSTRUCTION — and this query reports the
    measured relative error against the exact percentiles
    side-by-side. Spark's approx_percentile is the production tier
    (`agg_approx_percentile`, rows-only); this one the engine can
    prove.

    Shape: one map-side-combined groupBy to O(buckets ~ hundreds);
    the cumulative walk and the exact comparison run on that reduced
    table (the exact percentile is the oracle-side luxury — at
    100 TB you'd ship only the sketch)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    lg = math.log(_DD_GAMMA)
    buckets = o.groupBy(
        F.ceil(F.log("o_totalprice") / lg).cast("long").alias("b")
    ).agg(F.count(F.lit(1)).alias("c"))
    cum = buckets.select(
        "b",
        "c",
        F.sum("c").over(Window.orderBy("b")).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )

    def pick(q: float):
        return F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("b"))
        )

    est = cum.agg(
        pick(0.5).alias("b50"),
        pick(0.9).alias("b90"),
        pick(0.99).alias("b99"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("c").alias("max_bucket"),
    )
    exact = o.agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("q50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("q90"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("q99"),
    )

    def sk(b):
        return 2.0 * F.pow(F.lit(_DD_GAMMA), F.col(b)) / (_DD_GAMMA + 1.0)

    j = est.crossJoin(F.broadcast(exact))
    return j.select(
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.col("max_bucket").cast("long").alias("max_bucket"),
        F.round(sk("b50"), 4).alias("p50_sketch"),
        F.round(F.abs(sk("b50") - F.col("q50")) / F.col("q50"), 6).alias(
            "p50_rel_err"
        ),
        F.round(sk("b90"), 4).alias("p90_sketch"),
        F.round(F.abs(sk("b90") - F.col("q90")) / F.col("q90"), 6).alias(
            "p90_rel_err"
        ),
        F.round(sk("b99"), 4).alias("p99_sketch"),
        F.round(F.abs(sk("b99") - F.col("q99")) / F.col("q99"), 6).alias(
            "p99_rel_err"
        ),
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
    "agg_theil_inequality",
    oracle="""
    WITH spend AS (
      SELECT c.c_nationkey AS nationkey, o.o_custkey,
             SUM(o.o_totalprice) AS x,
             SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    mu AS (
      SELECT nationkey, COUNT(*) AS n, AVG(x) AS m,
             CAST(SUM(cents) AS BIGINT) AS tc
      FROM spend GROUP BY 1
    )
    SELECT s.nationkey,
           CAST(mu.n AS BIGINT) AS n_customers,
           (mu.tc * 1.0 / mu.n) / 100.0 AS mean_spend,
           ROUND(SUM((s.x / mu.m) * LN(s.x / mu.m)) / mu.n, 4) AS theil_t
    FROM spend s JOIN mu ON mu.nationkey = s.nationkey
    GROUP BY s.nationkey, mu.n, mu.m, mu.tc
    """,
)
def agg_theil_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T index of customer spend per nation: (1/N) sum (x/mu)
    ln(x/mu) — zero at perfect equality, ln(N) at total
    concentration, and (unlike Gini, already in the registry) EXACTLY
    decomposable into within-group + between-group terms, which is
    why economists report it for segmented populations. Completes
    the inequality family next to `agg_gini_coefficient` and
    `events_lorenz_deciles`.

    Shape: one fact reduce to customer grain, one O(nations) mean
    join back (broadcast), one grouped rollup."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"), "o_custkey")
        .agg(
            F.sum("o_totalprice").alias("x"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("cents"),
        )
    )
    mu = spend.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("m"),
        F.sum("cents").alias("tc"),
    )
    j = spend.join(F.broadcast(mu), "nationkey")
    # mean via the integer-cents ledger and two correctly-rounded
    # IEEE divisions: no decimal ROUND of a float sum, whose .xx5
    # half-cases flip between engines AND between Spark executions
    # (partial-sum order)
    return j.groupBy("nationkey", "n", "m", "tc").agg(
        F.col("n").cast("long").alias("n_customers"),
        ((F.first("tc") * 1.0 / F.first("n")) / 100.0).alias("mean_spend"),
        F.round(
            F.sum((F.col("x") / F.col("m")) * F.log(F.col("x") / F.col("m")))
            / F.first("n"),
            4,
        ).alias("theil_t"),
    ).drop("n", "m", "tc")


# ========================================================================
# from analytics_extras53.py — original batch rationale:
# Analytics extras, batch 53: backfill planning, contribution
# analysis, funnel step latency, and Holm correction.
#
# The backfill planner is the one operator here with a DIRECT
# reference tie: `HiveToMysql.java:270-282` re-imports exactly one
# `ds=` partition per run and trusts the scheduler to know which —
# this query computes which (the gap manifest a scheduler iterates).
# The rest extend SURVEY.md §2.2:
#
# * contribution analysis — year-over-year revenue delta decomposed
#   by nation with share-of-change ranking (the "why did the metric
#   move" BI primitive), integer-cents exact.
# * funnel step latency — median/p90 time between funnel stages from
#   per-user first-touch timestamps.
# * Holm correction — step-down FWER control over the per-metric
#   Welch tests, sibling of `stats_benjamini_hochberg`'s FDR.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "agg_contribution_analysis",
    oracle="""
    WITH per_nation AS (
      SELECT c.c_nationkey AS nationkey,
             SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '1996-01-01'
                       AND o.o_orderdate < TIMESTAMP '1997-01-01'
                      THEN CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                      ELSE 0 END) AS prev_cents,
             SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '1997-01-01'
                       AND o.o_orderdate < TIMESTAMP '1998-01-01'
                      THEN CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                      ELSE 0 END) AS cur_cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1
    ),
    tot AS (
      SELECT SUM(cur_cents - prev_cents) AS total_delta FROM per_nation
    ),
    ranked AS (
      SELECT nationkey,
             CAST(prev_cents AS BIGINT) AS prev_cents,
             CAST(cur_cents AS BIGINT) AS cur_cents,
             CAST(cur_cents - prev_cents AS BIGINT) AS delta_cents,
             ROUND((cur_cents - prev_cents) * 1.0 / tot.total_delta, 4)
               AS share_of_change,
             ROW_NUMBER() OVER (
               ORDER BY ABS(cur_cents - prev_cents) DESC, nationkey
             ) AS rnk
      FROM per_nation CROSS JOIN tot
    )
    SELECT CAST(rnk AS INT) AS rank, nationkey, prev_cents, cur_cents,
           delta_cents, share_of_change
    FROM ranked WHERE rnk <= 10
    """,
)
def agg_contribution_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis ("why did revenue move?"): the
    1996->1997 revenue delta decomposed by nation, ranked by absolute
    contribution, with each nation's share of the total change — the
    metric-tree root-cause primitive every BI platform reimplements.
    Revenue travels as integer cents (associative, bit-exact under
    any partitioning); shares are one rounded division at the end.

    Shape: one conditional-aggregate fact scan to O(nations), a
    1-row broadcast total, an O(nations) rank."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    in_prev = (
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    in_cur = (
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    per_nation = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.sum(F.when(in_prev, cents).otherwise(0)).alias("prev_cents"),
            F.sum(F.when(in_cur, cents).otherwise(0)).alias("cur_cents"),
        )
    )
    tot = per_nation.agg(
        F.sum(F.col("cur_cents") - F.col("prev_cents")).alias("total_delta")
    )
    delta = F.col("cur_cents") - F.col("prev_cents")
    ranked = per_nation.crossJoin(F.broadcast(tot)).select(
        "nationkey",
        F.col("prev_cents").cast("long").alias("prev_cents"),
        F.col("cur_cents").cast("long").alias("cur_cents"),
        delta.cast("long").alias("delta_cents"),
        F.round(delta * 1.0 / F.col("total_delta"), 4).alias(
            "share_of_change"
        ),
        F.row_number()
        .over(Window.orderBy(F.desc(F.abs(delta)), "nationkey"))
        .alias("rnk"),
    )
    return ranked.where(F.col("rnk") <= 10).select(
        F.col("rnk").cast("int").alias("rank"),
        "nationkey",
        "prev_cents",
        "cur_cents",
        "delta_cents",
        "share_of_change",
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



@register(
    "agg_variance_two_level_merge",
    # every double on both engines derives from EXACT decimal sums
    # (x has 2 decimal digits, so SUM(x) / SUM(x*x) as DECIMAL are
    # engine-identical) through a FIXED operation tree: per-shard
    # (m, m2) doubles, then an explicitly ordered shard_0..shard_7
    # fold. A multi-row double SUM would re-associate differently per
    # engine/partitioning — at sf1 that flipped the 4th decimal of a
    # ~1e9 variance (caught by the r8 certification sweep).
    oracle=f"""
    WITH pershard AS (
      SELECT shard, COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM (SELECT o_orderkey % 8 AS shard,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS x
            FROM orders)
      GROUP BY shard
    ),
    stats AS (
      SELECT shard, n, sx / n AS m, sxx - sx * (sx / n) AS m2
      FROM pershard
    ),
    pivoted AS (
      SELECT SUM(n) AS n,
             {", ".join(
                 f"MAX(CASE WHEN shard = {i} THEN n END) AS n_{i}, "
                 f"MAX(CASE WHEN shard = {i} THEN m END) AS m_{i}, "
                 f"MAX(CASE WHEN shard = {i} THEN m2 END) AS m2_{i}"
                 for i in range(8)
             )}
      FROM stats
    ),
    merged AS (
      SELECT n,
             ({" + ".join(f"m2_{i}" for i in range(8))})
             + ({" + ".join(f"n_{i} * m_{i} * m_{i}" for i in range(8))})
             - ({" + ".join(f"n_{i} * m_{i}" for i in range(8))})
               * ({" + ".join(f"n_{i} * m_{i}" for i in range(8))}) / n
               AS m2
      FROM pivoted
    ),
    direct AS (
      SELECT (CAST(SUM(x * x) AS DOUBLE)
              - CAST(SUM(x) AS DOUBLE)
                * (CAST(SUM(x) AS DOUBLE) / COUNT(*)))
             / (COUNT(*) - 1) AS v
      FROM (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS x FROM orders)
    )
    SELECT CAST(merged.n AS BIGINT) AS n_rows,
           CAST(8 AS BIGINT) AS n_shards,
           ROUND(merged.m2 / (merged.n - 1), 4) AS merged_variance,
           ROUND(direct.v, 4) AS direct_variance,
           ABS(merged.m2 / (merged.n - 1) - direct.v) / direct.v < 1e-9
             AS merge_exact
    FROM merged CROSS JOIN direct
    """,
)
def agg_variance_two_level_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chan's parallel variance merge, made explicit: 8 hash shards
    each reduce to (n_i, mean_i, M2_i); the global M2 recombines as
    sum M2_i + sum n_i mean_i^2 - (sum n_i mean_i)^2 / N (the
    between-shard correction), and the result is checked against the
    direct single-pass VAR_SAMP to relative 1e-9. This identity is
    WHY every variance/stddev in this registry is safe under any
    partitioning — here it is computed out loud and verified, the
    same way `agg_hyperloglog_pinned` proves sketch mergeability.

    Shape: one grouped reduce to 8 shard rows, O(1) merge algebra,
    one direct aggregate for the cross-check. Determinization: the
    per-shard (m, m2) doubles derive from EXACT decimal sums (2-digit
    money), and the merge folds the 8 shards in explicit shard order
    — no multi-row double SUM whose re-association order could
    differ between engines or partitionings (at sf1 the old float
    form flipped the 4th decimal of a ~1e9 variance)."""
    o = load_table(spark, sf_dir, "orders")
    xd = F.col("o_totalprice").cast("decimal(18,2)")
    pershard = o.groupBy((F.col("o_orderkey") % 8).alias("shard")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(xd * xd).cast("double").alias("sxx"),
    )
    stats = pershard.select(
        "shard",
        "n",
        (F.col("sx") / F.col("n")).alias("m"),
        (F.col("sxx") - F.col("sx") * (F.col("sx") / F.col("n"))).alias(
            "m2"
        ),
    )
    pivot_cols = [F.sum("n").alias("n")]
    for i in range(8):
        for c in ("n", "m", "m2"):
            pivot_cols.append(
                F.max(F.when(F.col("shard") == i, F.col(c))).alias(
                    f"{c}_{i}"
                )
            )
    pivoted = stats.agg(*pivot_cols)

    def _fold(expr_of_i):
        acc = expr_of_i(0)
        for i in range(1, 8):
            acc = acc + expr_of_i(i)
        return acc

    sum_m2 = _fold(lambda i: F.col(f"m2_{i}"))
    sum_nmm = _fold(lambda i: F.col(f"n_{i}") * F.col(f"m_{i}") * F.col(f"m_{i}"))
    sum_nm = _fold(lambda i: F.col(f"n_{i}") * F.col(f"m_{i}"))
    merged = pivoted.select(
        "n",
        (sum_m2 + sum_nmm - sum_nm * sum_nm / F.col("n")).alias("m2"),
    )
    direct = o.select(xd.alias("x")).agg(
        (
            (
                F.sum(F.col("x") * F.col("x")).cast("double")
                - F.sum("x").cast("double")
                * (F.sum("x").cast("double") / F.count(F.lit(1)))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("v")
    )
    mv = F.col("m2") / (F.col("n") - 1)
    return merged.crossJoin(F.broadcast(direct)).select(
        F.col("n").cast("long").alias("n_rows"),
        F.lit(8).cast("long").alias("n_shards"),
        F.round(mv, 4).alias("merged_variance"),
        F.round("v", 4).alias("direct_variance"),
        (F.abs(mv - F.col("v")) / F.col("v") < 1e-9).alias("merge_exact"),
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
    "agg_share_of_parent",
    oracle="""
    WITH cells AS (
      SELECT c.c_nationkey AS nationkey, o.o_orderpriority AS priority,
             COUNT(*) AS n
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT nationkey, priority,
           CAST(n AS BIGINT) AS n_orders,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY nationkey), 4)
             AS share_of_nation,
           ROUND(SUM(n) OVER (PARTITION BY nationkey) * 1.0
                 / SUM(n) OVER (), 4) AS nation_share_of_total
    FROM cells
    """,
)
def agg_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical share-of-parent: each (nation, priority) cell's
    share within its nation AND the nation's share of the grand
    total — the two ratios every drill-down UI renders beside rollup
    counts, computed as window sums over the reduced cell table (no
    second scan, no self-join; the rollup-with-ratios pattern
    `agg_rollup` alone does not give).

    Shape: one joined reduce to O(cells); both shares are window
    sums over that table."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wn = Window.partitionBy("nationkey")
    wall = Window.partitionBy()
    return cells.select(
        "nationkey",
        "priority",
        F.col("n").cast("long").alias("n_orders"),
        F.round(F.col("n") * 1.0 / F.sum("n").over(wn), 4).alias(
            "share_of_nation"
        ),
        F.round(
            F.sum("n").over(wn) * 1.0 / F.sum("n").over(wall), 4
        ).alias("nation_share_of_total"),
    )


# ========================================================================
# from analytics_extras67.py — original batch rationale:
# Analytics extras, batch 67: empirical-Bayes shrinkage and the
# Simpson/Pielou diversity pair.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * Dirichlet shrinkage — per-source language proportions shrunk
#   toward the corpus prior with pseudo-count m: the small-sample
#   stabilizer (a 5-doc source's raw shares are noise; the shrunk
#   estimate is usable), sibling of the smoothed target encoder but
#   for full distributions.
# * Simpson + Pielou — Simpson's diversity (1 - sum p^2 =
#   P(two draws differ)) and Pielou's evenness (H/ln k) per source,
#   completing the diversity-index trio with the registry's Shannon
#   entropy.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "agg_simpson_evenness",
    oracle="""
    WITH counts AS (
      SELECT source, lang, COUNT(*) AS n
      FROM documents GROUP BY 1, 2
    ),
    shares AS (
      SELECT source, n * 1.0 / SUM(n) OVER (PARTITION BY source) AS p
      FROM counts
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           ROUND(1.0 - SUM(p * p), 4) AS simpson_diversity,
           ROUND(CASE WHEN COUNT(*) = 1 THEN 1.0
                      ELSE -SUM(p * LN(p)) / LN(COUNT(*)) END, 4)
             AS pielou_evenness
    FROM shares GROUP BY source
    """,
)
def agg_simpson_evenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's diversity index (1 - sum p^2: the probability two
    random documents from a source differ in language) and Pielou's
    evenness (Shannon H normalized by ln of the category count —
    how close the mix sits to uniform) per source — completing the
    diversity-index trio with `agg_shannon_entropy`. Simpson weighs
    dominant categories (robust to rare-category noise), evenness
    separates 'many languages' from 'balanced languages' — the two
    axes a corpus-composition review actually asks about.

    Shape: one reduce to O(source x lang), window shares, one
    rollup."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql.window import Window

    p = F.col("n") * 1.0 / F.sum("n").over(Window.partitionBy("source"))
    shares = counts.select("source", p.alias("p"))
    return shares.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_langs"),
        F.round(1.0 - F.sum(F.col("p") * F.col("p")), 4).alias(
            "simpson_diversity"
        ),
        F.round(
            F.when(F.count(F.lit(1)) == 1, 1.0).otherwise(
                -F.sum(F.col("p") * F.log("p")) / F.log(F.count(F.lit(1)))
            ),
            4,
        ).alias("pielou_evenness"),
    )


# ========================================================================
# from analytics_extras70.py — original batch rationale:
# Analytics extras, batch 70: image edge energy and sketch-merge
# proof.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * image edge energy — integer gradient magnitudes over real decoded
#   PPM pixels: the blur/flat-image screen (low edge energy = no
#   detail worth captioning), computed without a single float and
#   pixel-verified by the oracle.
# * DDSketch merge proof — shard sketches merged by bucket-sum equal
#   the whole-data sketch EXACTLY (integer identity, not an
#   approximation claim): the mergeability property that lets
#   quantile sketches roll up across 100 TB partitions, proven the
#   way `agg_variance_two_level_merge` proves moments.
# ========================================================================
import math
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_DM_GAMMA = 1.02



@register(
    "agg_ddsketch_merge_proof",
    oracle=f"""
    WITH pts AS (
      SELECT o_orderkey % 2 AS shard, o_totalprice AS x
      FROM orders WHERE o_totalprice > 0
    ),
    shard_buckets AS (
      SELECT shard, CAST(CEIL(LN(x) / LN({_DM_GAMMA})) AS BIGINT) AS b,
             COUNT(*) AS c
      FROM pts GROUP BY 1, 2
    ),
    merged AS (
      SELECT b, SUM(c) AS c FROM shard_buckets GROUP BY b
    ),
    full_ AS (
      SELECT CAST(CEIL(LN(x) / LN({_DM_GAMMA})) AS BIGINT) AS b,
             COUNT(*) AS c
      FROM pts GROUP BY 1
    ),
    cmp AS (
      SELECT COUNT(*) AS n_cells,
             SUM(CASE WHEN m.c = f.c THEN 1 ELSE 0 END) AS n_equal
      FROM merged m JOIN full_ f ON f.b = m.b
    )
    SELECT CAST((SELECT COUNT(*) FROM merged) AS BIGINT) AS n_buckets_merged,
           CAST((SELECT COUNT(*) FROM full_) AS BIGINT) AS n_buckets_full,
           CAST(cmp.n_cells AS BIGINT) AS n_cells_compared,
           cmp.n_cells = cmp.n_equal
             AND (SELECT COUNT(*) FROM merged)
                 = (SELECT COUNT(*) FROM full_) AS merge_exact
    FROM cmp
    """,
)
def agg_ddsketch_merge_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch mergeability, proven exactly: DDSketch bucket tables
    built independently on two hash shards, merged by bucket-sum,
    compared cell-by-cell against the whole-data bucket table —
    EQUAL, as integers, with no tolerance. This identity (bucket
    counts are plain sums) is WHY `agg_ddsketch_quantile_pinned`'s
    quantiles can roll up across arbitrary partitionings of 100 TB:
    shard sketches union and re-sum into the global sketch with zero
    approximation added by the merge. The companion proof to
    `agg_variance_two_level_merge` (moments) and the HLL register
    MAX-merge (`agg_hyperloglog_pinned`).

    Shape: two map-side-combined bucket reduces and an O(buckets)
    comparison join."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    lg = math.log(_DM_GAMMA)
    pts = o.select(
        (F.col("o_orderkey") % 2).alias("shard"),
        F.ceil(F.log("o_totalprice") / lg).cast("long").alias("b"),
    ).localCheckpoint(eager=False)  # shard and full reduces reuse it
    shard_buckets = pts.groupBy("shard", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    merged = shard_buckets.groupBy("b").agg(F.sum("c").alias("c"))
    full = pts.groupBy("b").agg(F.count(F.lit(1)).alias("fc"))
    cmp = merged.join(full, "b").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum((F.col("c") == F.col("fc")).cast("long")).alias("n_equal"),
    )
    nm = merged.agg(F.count(F.lit(1)).alias("nm"))
    nf = full.agg(F.count(F.lit(1)).alias("nf"))
    return (
        cmp.crossJoin(F.broadcast(nm))
        .crossJoin(F.broadcast(nf))
        .select(
            F.col("nm").cast("long").alias("n_buckets_merged"),
            F.col("nf").cast("long").alias("n_buckets_full"),
            F.col("n_cells").cast("long").alias("n_cells_compared"),
            (
                (F.col("n_cells") == F.col("n_equal"))
                & (F.col("nm") == F.col("nf"))
            ).alias("merge_exact"),
        )
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


_CS_DEPTH = 4


_CS_WIDTH = 64


def _cs_bucket_sql(d: str, key: str) -> str:
    return (
        f"('0x' || substr(md5('csb:' || {d} || ':' || {key}), 1, 8))::BIGINT"
        f" % {_CS_WIDTH}"
    )


def _cs_sign_sql(d: str, key: str) -> str:
    return (
        f"CASE WHEN ('0x' || substr(md5('css:' || {d} || ':' || {key}), 1, 8))"
        f"::BIGINT % 2 = 0 THEN 1 ELSE -1 END"
    )



@register(
    "agg_count_sketch_signed",
    oracle=f"""
    WITH rows_ AS (
      SELECT i.i AS d,
             {_cs_bucket_sql("i.i", "CAST(user_id AS VARCHAR)")} AS b,
             {_cs_sign_sql("i.i", "CAST(user_id AS VARCHAR)")} AS s
      FROM events, UNNEST([0, 1, 2, 3]) AS i(i)
    ),
    sketch AS (
      SELECT d, b, SUM(s) AS cell FROM rows_ GROUP BY 1, 2
    ),
    probes AS (
      SELECT user_id, COUNT(*) AS true_n
      FROM events WHERE user_id < 20 GROUP BY user_id
    ),
    ests AS (
      SELECT p.user_id, p.true_n, i.i AS d,
             {_cs_sign_sql("i.i", "CAST(p.user_id AS VARCHAR)")}
               * sk.cell AS est
      FROM probes p, UNNEST([0, 1, 2, 3]) AS i(i)
      JOIN sketch sk
        ON sk.d = i.i
       AND sk.b = {_cs_bucket_sql("i.i", "CAST(p.user_id AS VARCHAR)")}
    )
    SELECT user_id,
           CAST(true_n AS BIGINT) AS true_count,
           ROUND(median(est), 1) AS cs_estimate,
           ROUND(ABS(median(est) - true_n), 1) AS abs_error
    FROM ests GROUP BY user_id, true_n
    """,
)
def agg_count_sketch_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Sketch frequency estimation (depth 4 x width 64) with
    an md5-pinned hash family: each key hashes to one bucket per
    depth AND carries a pseudo-random sign, so colliding keys cancel
    in expectation and the median-of-depths estimate is UNBIASED —
    where `agg_count_min_sketch`'s min-of-depths only ever
    over-counts. Every sketch cell and probe estimate is
    oracle-verified (the same pinning proof as the CMS/HLL/Bloom/
    DDSketch siblings). Signed cells merge as plain sums, so shard
    sketches roll up exactly.

    Shape: one x4 in-row fan-out, a 256-cell map-side-combined
    reduce, probe lookups against the broadcast-size sketch."""
    ev = load_table(spark, sf_dir, "events")

    def md5u(tag: str, d, key):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(tag),
                        d.cast("string"),
                        F.lit(":"),
                        key.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")

    rows_ = ev.select(
        F.explode(F.array(*[F.lit(i) for i in range(_CS_DEPTH)])).alias("d"),
        F.col("user_id"),
    ).select(
        "d",
        (md5u("csb:", F.col("d"), F.col("user_id")) % _CS_WIDTH).alias("b"),
        F.when(
            md5u("css:", F.col("d"), F.col("user_id")) % 2 == 0, 1
        )
        .otherwise(-1)
        .alias("s"),
    )
    sketch = rows_.groupBy("d", "b").agg(F.sum("s").alias("cell"))
    probes = (
        ev.where(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    pb = probes.select(
        "user_id",
        "true_n",
        F.explode(F.array(*[F.lit(i) for i in range(_CS_DEPTH)])).alias("d"),
    ).select(
        "user_id",
        "true_n",
        "d",
        (md5u("csb:", F.col("d"), F.col("user_id")) % _CS_WIDTH).alias("b"),
        F.when(md5u("css:", F.col("d"), F.col("user_id")) % 2 == 0, 1)
        .otherwise(-1)
        .alias("s"),
    )
    ests = pb.join(F.broadcast(sketch), ["d", "b"]).select(
        "user_id", "true_n", (F.col("s") * F.col("cell")).alias("est")
    )
    return ests.groupBy("user_id", "true_n").agg(
        F.round(F.percentile("est", F.lit(0.5)), 1).alias("cs_estimate"),
        F.round(
            F.abs(F.percentile("est", F.lit(0.5)) - F.col("true_n")), 1
        ).alias("abs_error"),
    ).select(
        "user_id",
        F.col("true_n").cast("long").alias("true_count"),
        "cs_estimate",
        "abs_error",
    )


# ========================================================================
# from analytics_extras75.py — original batch rationale:
# Analytics extras, batch 75: time-domain cycle length and the
# Pythagorean means.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * peak cycle length — mean spacing between local maxima of the
#   daily series: the time-domain cycle estimate that should agree
#   with `timeseries_periodogram`'s frequency-domain winner.
# * Pythagorean means — arithmetic/geometric/harmonic means of unit
#   price per priority class with AM >= GM >= HM certified: harmonic
#   for rate-like averages, geometric for growth-like — using the
#   wrong one is a classic silent analytics bug, and this query makes
#   the three (and their mandatory ordering) visible side by side.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "agg_pythagorean_means",
    oracle="""
    WITH prices AS (
      SELECT o_orderpriority AS priority, o_totalprice AS x
      FROM orders WHERE o_totalprice > 0
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(x), 4) AS arithmetic_mean,
           ROUND(EXP(AVG(LN(x))), 4) AS geometric_mean,
           ROUND(COUNT(*) / SUM(1.0 / x), 4) AS harmonic_mean,
           AVG(x) >= EXP(AVG(LN(x)))
             AND EXP(AVG(LN(x))) >= COUNT(*) / SUM(1.0 / x)
             AS am_gm_hm_holds
    FROM prices GROUP BY priority
    """,
)
def agg_pythagorean_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three Pythagorean means of order value per priority
    class, side by side with the AM >= GM >= HM inequality
    certified: the arithmetic mean answers 'total / count', the
    geometric mean is the right average for growth factors (it IS
    exp of the log-domain mean, cf. `agg_product_log_domain`), and
    the harmonic mean is the right average for rates (mean price per
    unit across equal-spend buckets) — averaging rates
    arithmetically is the classic silent analytics bug this row
    makes visible. All three are single-pass mergeable aggregates
    (sum, sum-of-logs, sum-of-reciprocals).

    Shape: one conditional scan, O(groups) output."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    am = F.avg("o_totalprice")
    gm = F.exp(F.avg(F.log("o_totalprice")))
    hm = F.count(F.lit(1)) / F.sum(1.0 / F.col("o_totalprice"))
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(am, 4).alias("arithmetic_mean"),
        F.round(gm, 4).alias("geometric_mean"),
        F.round(hm, 4).alias("harmonic_mean"),
        ((am >= gm) & (gm >= hm)).alias("am_gm_hm_holds"),
    )
