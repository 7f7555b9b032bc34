"""Analytics extras, batch 6: survival analysis, multiple-testing
correction, Holt-Winters smoothing, differential-privacy counts, KMV
set sketches, watermark-dedup batch twin, bloom-prefiltered join,
distributed connected components, the feature-hashing trick, and a
Poisson rate test.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's statistics / privacy / sketch /
graph tiers:

* Kaplan-Meier — right-censored survival over order→last-ship
  durations (status 'F' = event, else censored);
* Benjamini-Hochberg — step-up FDR adjustment over per-group Welch
  z p-values (logistic CDF approximation, identical in both engines);
* Holt-Winters — level+trend double exponential smoothing, a genuine
  sequential recurrence run as one per-key array fold;
* DP noisy counts — Laplace mechanism with an md5-derived inverse-CDF
  sample, so the noise is deterministic and oracle-checkable;
* KMV sketch — k-minimum-values NDV + Jaccard/intersection estimates
  with exact counterparts side by side;
* watermark dedup — batch twin of Structured Streaming's
  dropDuplicatesWithinWatermark (first event wins per key);
* bloom prefilter — two-phase dim-key pruning (hashed bucket-set
  broadcast, then exact broadcast semi join);
* connected components — iterative min-label propagation on the
  co-purchase graph, oracled by a recursive-CTE closure;
* hashing trick — fixed-width token bucketing (the streaming-safe
  vocabulary-free vectorizer);
* Poisson rate test — conditional two-sample count comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "stats_kaplan_meier",
    oracle="""
    WITH dur AS (
      SELECT o.o_orderkey,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(MAX(l.l_shipdate) AS DATE)) AS t,
             MAX(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ev
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus
    ),
    at_t AS (
      SELECT t, COUNT(*) AS n_at_t, SUM(ev) AS d
      FROM dur GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             SUM(n_at_t) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum_le,
             SUM(n_at_t) OVER () AS total,
             n_at_t
      FROM at_t
    ),
    terms AS (
      SELECT t, d, total - cum_le + n_at_t AS n_risk,
             CASE WHEN d < total - cum_le + n_at_t
                  THEN ln(1.0 - d * 1.0 / (total - cum_le + n_at_t))
                  ELSE NULL END AS term,
             CASE WHEN d = total - cum_le + n_at_t THEN 1 ELSE 0 END AS dead
      FROM risk
    )
    SELECT t,
           CAST(d AS BIGINT) AS d,
           CAST(n_risk AS BIGINT) AS n_risk,
           CASE WHEN MAX(dead) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) = 1 THEN 0.0
                ELSE ROUND(exp(SUM(term) OVER (ORDER BY t ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW)), 6) END AS survival
    FROM terms
    """,
)
def stats_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator over right-censored order
    fulfillment durations: t = days from order date to last line
    shipment, event observed when o_orderstatus = 'F' (fully shipped),
    censored otherwise. S(t) = prod over event times <= t of
    (1 - d_i/n_i) with n_i the at-risk count, computed in the log
    domain (exp of a running sum of ln terms) so the product is an
    associative prefix aggregation, not a sequential multiply.

    Shape: one grouped pass compresses N orders to O(distinct
    durations) rows; every window after that runs on the compressed
    table. The single unpartitioned window is over ~hundreds of rows
    regardless of input scale — the classic sketch-then-finalize
    split that keeps 100 TB out of the ordered stage. Not in the
    reference (HiveToMysql.java computes nothing)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    dur = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderstatus")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.datediff(F.to_date("last_ship"), F.to_date("o_orderdate")).alias("t"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("ev"),
        )
    )
    at_t = dur.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_at_t"), F.sum("ev").alias("d")
    )
    w_all = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = at_t.select(
        "t",
        "d",
        "n_at_t",
        F.sum("n_at_t").over(w_all).alias("cum_le"),
        F.sum("n_at_t").over(Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)).alias("total"),
    )
    n_risk = F.col("total") - F.col("cum_le") + F.col("n_at_t")
    terms = risk.select(
        "t",
        "d",
        n_risk.alias("n_risk"),
        F.when(F.col("d") < n_risk, F.log(1.0 - F.col("d") / n_risk)).alias("term"),
        F.when(F.col("d") == n_risk, 1).otherwise(0).alias("dead"),
    )
    return terms.select(
        "t",
        F.col("d").cast("long").alias("d"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.when(F.max("dead").over(w_all) == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum("term").over(w_all)), 6))
        .alias("survival"),
    )


@register(
    "stats_benjamini_hochberg",
    oracle="""
    WITH g AS (
      SELECT event_type,
             COUNT(*) FILTER (WHERE user_id % 2 = 0) AS n_a,
             COUNT(*) FILTER (WHERE user_id % 2 = 1) AS n_b,
             AVG(value) FILTER (WHERE user_id % 2 = 0) AS m_a,
             AVG(value) FILTER (WHERE user_id % 2 = 1) AS m_b,
             VAR_SAMP(value) FILTER (WHERE user_id % 2 = 0) AS v_a,
             VAR_SAMP(value) FILTER (WHERE user_id % 2 = 1) AS v_b
      FROM events GROUP BY event_type
    ),
    z AS (
      SELECT event_type,
             (m_a - m_b) / sqrt(v_a / n_a + v_b / n_b) AS z
      FROM g
    ),
    p AS (
      SELECT event_type, z,
             2.0 / (1.0 + exp(1.702 * abs(z))) AS p,
             COUNT(*) OVER () AS m,
             ROW_NUMBER() OVER (ORDER BY 2.0 / (1.0 + exp(1.702 * abs(z))),
                                event_type) AS i
      FROM z
    )
    SELECT event_type,
           ROUND(z, 4) AS z,
           ROUND(p, 6) AS p,
           ROUND(MIN(LEAST(1.0, p * m / i)) OVER (
             ORDER BY i ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
           ), 6) AS p_adj,
           CAST(CASE WHEN MIN(LEAST(1.0, p * m / i)) OVER (
             ORDER BY i ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
           ) <= 0.1 THEN 1 ELSE 0 END AS BIGINT) AS reject_q10
    FROM p
    """,
)
def stats_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR correction over the per-
    event-type A/B Welch z-tests: p_(i) is adjusted to
    min_{j>=i}(p_(j)·m/j) capped at 1, the standard multiple-testing
    control when one experiment fans out into many metrics. The
    normal CDF uses the logistic approximation Phi(z) ~
    1/(1+exp(-1.702 z)) — closed-form and bit-identical across
    engines, unlike erf which neither Spark nor DuckDB exposes.

    Shape: one conditional-aggregate scan to O(groups) sufficient
    statistics; the rank and reverse-running-min windows operate on
    the group table only, so the ordered stage is O(metrics), never
    O(rows)."""
    ev = load_table(spark, sf_dir, "events")
    a = F.col("user_id") % 2 == 0
    g = ev.groupBy("event_type").agg(
        F.count(F.when(a, 1)).alias("n_a"),
        F.count(F.when(~a, 1)).alias("n_b"),
        F.avg(F.when(a, F.col("value"))).alias("m_a"),
        F.avg(F.when(~a, F.col("value"))).alias("m_b"),
        F.var_samp(F.when(a, F.col("value"))).alias("v_a"),
        F.var_samp(F.when(~a, F.col("value"))).alias("v_b"),
    )
    z = (F.col("m_a") - F.col("m_b")) / F.sqrt(
        F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    )
    p = 2.0 / (1.0 + F.exp(1.702 * F.abs(z)))
    scored = g.select("event_type", z.alias("z"), p.alias("p"))
    w_rank = Window.orderBy("p", "event_type")
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = scored.select(
        "event_type",
        "z",
        "p",
        F.count(F.lit(1)).over(w_all).alias("m"),
        F.row_number().over(w_rank).alias("i"),
    )
    raw = F.least(F.lit(1.0), F.col("p") * F.col("m") / F.col("i"))
    w_rev = Window.orderBy("i").rowsBetween(0, Window.unboundedFollowing)
    adj = F.min(raw).over(w_rev)
    return ranked.select(
        "event_type",
        F.round("z", 4).alias("z"),
        F.round("p", 6).alias("p"),
        F.round(adj, 6).alias("p_adj"),
        F.when(adj <= 0.1, 1).otherwise(0).cast("long").alias("reject_q10"),
    )


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


@register(
    "privacy_dp_noise_count",
    oracle="""
    WITH g AS (
      SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    ),
    u AS (
      SELECT event_type, n,
             ((('0x' || substr(md5(event_type), 1, 8))::BIGINT % 999983)
              + 0.5) / 999983.0 - 0.5 AS uni
      FROM g
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS true_count,
           ROUND(-1.0 * sign(uni) * ln(1.0 - 2.0 * abs(uni)), 4) AS noise,
           ROUND(n - 1.0 * sign(uni) * ln(1.0 - 2.0 * abs(uni)), 4)
             AS noisy_count
    FROM u
    """,
)
def privacy_dp_noise_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private counts via the Laplace mechanism
    (epsilon=1, sensitivity=1): noise = -b·sign(u)·ln(1-2|u|) is the
    inverse-CDF transform of a uniform u in (-1/2, 1/2). The uniform
    is derived from md5(key) so the release is deterministic and the
    oracle can verify the mechanism end-to-end — a production release
    would swap the hash for a calibrated RNG, everything else
    unchanged.

    Shape: one grouped count plus O(groups) scalar math — the
    mechanism adds zero distributed cost, which is exactly why
    DP-noised aggregate release scales to 100 TB for free."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    h = F.conv(F.substring(F.md5(F.col("event_type")), 1, 8), 16, 10).cast("long")
    uni = ((h % 999983) + 0.5) / 999983.0 - 0.5
    noise = -1.0 * F.signum(uni) * F.log(1.0 - 2.0 * F.abs(uni))
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("true_count"),
        F.round(noise, 4).alias("noise"),
        F.round(F.col("n") + noise, 4).alias("noisy_count"),
    )


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


@register(
    "stream_dedup_batch",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_first,
           ROUND(SUM(value), 2) AS first_value_sum
    FROM ranked WHERE rn = 1
    GROUP BY event_type
    """,
)
def stream_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of Structured Streaming's
    dropDuplicatesWithinWatermark: keep only the first event per
    (user_id, event_type) in event-time order (event_id tie-break),
    then summarize survivors per type. In streaming the same keep-
    first semantics comes from dropDuplicates + a watermark bounding
    key state; this batch form is the convergence target any
    micro-batch slicing must reach.

    Shape: one per-key window (keys are fine-grained, so the shuffle
    is well-spread) feeding an O(types) aggregate. At 100 TB the
    dedup state is the concern, not the compute — in the streaming
    form the watermark caps it; in batch, AQE handles the key-space
    spread."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    firsts = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return firsts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_first"),
        F.round(F.sum("value"), 2).alias("first_value_sum"),
    )


@register(
    "join_bloom_prefilter",
    oracle="""
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
    GROUP BY l.l_returnflag
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase dimension-key pruning: (1) the qualifying supplier
    keys are hashed into a small bucket set (a coarse bloom-filter
    stand-in) and broadcast as ONE array literal the scan filters
    against; (2) the surviving ~1/K of the fact stream is finished
    with an exact broadcast semi join. False positives from phase 1
    are removed by phase 2, so the result is identical to the plain
    join — which is exactly what the oracle checks.

    Scale rationale: at 100 TB the win is that phase 1 is a scan-
    local predicate (no shuffle, pushable beneath the exchange)
    that discards most rows before the join machinery ever sees
    them — the manual form of Spark's runtime bloom-filter /
    dynamic-partition-pruning rewrites, kept explicit here so the
    pruning survives on engines without the optimizer rule."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    dim = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    bucket = lambda c: F.crc32(c.cast("string")) % 4096  # noqa: E731
    bucket_set = dim.select(
        F.array_sort(F.collect_set(bucket(F.col("s_suppkey")))).alias("buckets")
    )
    prefiltered = li.crossJoin(F.broadcast(bucket_set)).where(
        F.array_contains(F.col("buckets"), bucket(F.col("l_suppkey")))
    )
    exact = prefiltered.join(
        F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


_CC_ORACLE = """
    WITH RECURSIVE pr AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_partkey < 300
    ),
    e AS (
      SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      FROM pr a JOIN pr b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
    nodes AS (SELECT DISTINCT a AS n FROM und),
    reach(n, m) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.n, u.b FROM reach r JOIN und u ON u.a = r.m
    ),
    lab AS (SELECT n, MIN(m) AS comp FROM reach GROUP BY n),
    comps AS (SELECT comp, COUNT(*) AS sz FROM lab GROUP BY comp)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_components,
           CAST(SUM(sz) AS BIGINT) AS n_nodes,
           CAST(MAX(sz) AS BIGINT) AS largest_component,
           CAST(MIN(comp) AS BIGINT) AS anchor_node
    FROM comps
    """


def copurchase_component_labels(
    spark: SparkSession,
    sf_dir: str,
    partkey_cap: int | None = None,
    nparts: int | None = None,
) -> DataFrame:
    """Min-label-propagation connected components of the co-purchase
    graph, returned as the full ``(n, comp)`` labeling. The registered
    query caps partkeys (< 300) purely so the recursive-CTE ORACLE
    stays bounded; this helper runs the UNRESTRICTED operator too
    (``partkey_cap=None``), which pytest certifies by asserting the
    labeling is identical under different partition widths and
    label-consistent along every edge (tests/test_analytics_extras6.py).
    ``nparts`` overrides the edge-derived loop width for exactly that
    determinism check."""
    li = load_table(spark, sf_dir, "lineitem")
    if partkey_cap is not None:
        li = li.where(F.col("l_partkey") < partkey_cap)
    # per-order part sets -> in-array pair expansion: ONE shuffle
    # (groupBy orderkey) + one distinct, replacing the
    # distinct/self-join/distinct chain (3 shuffles + a join) — the
    # co-occurrence pairs never leave the row until exploded
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .where(F.size("ps") >= 2)
    )
    pairs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    e = (
        baskets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .distinct()
    )
    und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    und = und.localCheckpoint()
    # size loop partitioning to the GRAPH, not the session default:
    # tiny label tables across 32 shuffle partitions pay ~32 task
    # overheads per round; one partition per ~500k edges (min 4) keeps
    # rounds cheap locally and still spreads a billion-edge graph
    n_edges = und.count()
    # one partition per ~500k edges; a sub-100k-edge graph runs the
    # whole loop in a single partition — each round is then one task
    # instead of four, and at local bench size the loop is pure task
    # overhead (the 100 TB case still spreads across the cluster)
    if nparts is None:
        nparts = max(1 if n_edges < 100_000 else 4, n_edges // 500_000)
    und = und.repartition(nparts, "src").localCheckpoint()
    labels = und.select(F.col("src").alias("n")).distinct().select(
        "n", F.col("n").alias("comp")
    )
    prev_sum = None
    # scope the shuffle width to the graph for the loop's joins and
    # aggregates (restored after) — per-round cost is task overhead,
    # not data, once the label table is this small relative to cores
    saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
    saved_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
    # AQE re-plans every micro-stage of the loop; with the shuffle
    # width already scoped to the graph there is nothing for it to
    # improve, and its per-stage re-optimization latency dominates
    # tiny rounds (restored after)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:

        def jump(lbl):
            # pointer jumping (path halving): follow comp -> label(comp)
            # so diffusion distance compounds geometrically instead of
            # one hop per round — the thing that matters on chain-like
            # co-purchase graphs
            tgt = lbl.select(
                F.col("n").alias("pn"), F.col("comp").alias("pcomp")
            )
            return lbl.join(tgt, lbl["comp"] == tgt["pn"]).select(
                "n", F.col("pcomp").alias("comp")
            )

        def one_round(lbl):
            prop = (
                und.join(lbl, und["src"] == lbl["n"])
                .select(F.col("dst").alias("n"), "comp")
            )
            diffused = (
                lbl.union(prop).groupBy("n").agg(F.min("comp").alias("comp"))
            )
            # two jumps per round: each jump is one tiny O(nodes) join
            # on the already-reduced label table, and the second one
            # measurably shortens the crawling tail on long chains
            # (sf0.1 fixture: 14 rounds -> 8). Three jumps measured
            # SLOWER (10.7s vs 6.8s same-session): the deeper
            # unmaterialized join chain per round costs more than the
            # saved rounds.
            return jump(jump(diffused)).localCheckpoint()

        # adaptive round count with a loud hard cap: min-label
        # propagation converges to the true components at SOME round
        # (label sum strictly decreases until fixpoint), so iterate to
        # the observed fixpoint rather than betting on a fixed cap —
        # the sf0.1 fixture graph needed 14 single-jump rounds where
        # sf0.01 needed 5, and a silently non-converged result is the
        # one failure the oracle gate cannot localize. Each round is
        # two O(nodes) shuffles; 40 rounds bounds diameter ~2^40.
        converged = False
        for it in range(40):
            labels = one_round(labels)
            # probe every SECOND round from round 3 on — a compounding
            # diffusion cannot have converged in the first rounds, and
            # each probe is a driver action; halving the probe count
            # costs at most one extra (cheap) round after the fixpoint
            if it >= 2 and it % 2 == 0:
                cur = labels.agg(F.sum("comp")).collect()[0][0]
                if cur == prev_sum:
                    converged = True
                    break
                prev_sum = cur
        if not converged:
            raise RuntimeError(
                "graph_connected_components: label propagation did "
                "not converge within 40 pointer-jumping rounds "
                f"(label sum still decreasing at {prev_sum}); this "
                "graph's pointer-jumped diameter exceeds the cap"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved_parts)
        spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
    return labels


@register("graph_connected_components", oracle=_CC_ORACLE)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-purchase graph (parts sharing an
    order, restricted to partkey < 300 to keep the oracle's recursive
    closure bounded — the UNRESTRICTED labeling is certified in
    pytest, see :func:`copurchase_component_labels`) by iterative
    min-label propagation: every node starts as its own label; each
    round every node takes the min of its own and its neighbors'
    labels; fixpoint = components labeled by their minimum member.

    Distributed shape: each round is one join (labels x edges) + one
    min-aggregate — all shuffle-partitioned on node id, the standard
    Pregel-on-DataFrames step. Rounds are bounded by graph diameter
    (co-purchase graphs are shallow); localCheckpoint() truncates the
    growing lineage each round, the thing that actually kills
    iterative DataFrame jobs at scale. Convergence is detected by the
    monotonically decreasing label sum. Cf. the alternating
    large-star/small-star optimization (Kiveris et al., "Connected
    Components in MapReduce") for diameter-heavy graphs."""
    labels = copurchase_component_labels(spark, sf_dir, partkey_cap=300)
    comps = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("sz"))
    return comps.agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.sum("sz").cast("long").alias("n_nodes"),
        F.max("sz").cast("long").alias("largest_component"),
        F.min("comp").cast("long").alias("anchor_node"),
    )


_FH_BUCKETS = 32


@register(
    "feature_hashing_trick",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, t.tok
      FROM documents,
           UNNEST(regexp_split_to_array(lower(text), '[^a-z]+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    bucketed AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT % {_FH_BUCKETS} AS b
      FROM toks
    ),
    vec AS (
      SELECT doc_id, b, COUNT(*) AS cnt FROM bucketed GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS nnz,
           ROUND(sqrt(SUM(cnt * cnt)), 4) AS l2_norm,
           CAST(MIN(CASE WHEN cnt = (SELECT MAX(v2.cnt) FROM vec v2
                                     WHERE v2.doc_id = vec.doc_id)
                         THEN b END) AS BIGINT) AS top_bucket
    FROM vec
    GROUP BY doc_id
    """,
)
def feature_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: tokens map to a fixed 32-bucket feature
    vector via md5 — no vocabulary, no fit step, stable across
    streams and retrains, collisions absorbed as in Weinberger et
    al. (ICML'09). Reported per document: token count, non-zero
    buckets, vector L2 norm, and the argmax bucket (smallest bucket
    id on ties, pinned so both engines agree).

    Shape: explode -> hash -> two grouped passes, all narrow except
    the per-(doc,bucket) count whose key space is bounded by
    docs x 32. The bucketed vector (not the token dictionary) is
    what ships to training — the whole point at 100 TB, where a
    vocabulary build is itself a big-data job."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("tok"),
    ).where(F.col("tok") != "")
    b = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long") % _FH_BUCKETS
    vec = toks.select("doc_id", b.alias("b")).groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("doc_id")
    top = F.min(
        F.when(F.col("cnt") == F.max("cnt").over(w), F.col("b"))
    ).over(w)
    return (
        vec.withColumn("top_bucket", top)
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("nnz"),
            F.round(F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))), 4).alias("l2_norm"),
            F.min("top_bucket").cast("long").alias("top_bucket"),
        )
    )


@register(
    "stats_poisson_rate_test",
    oracle="""
    WITH g AS (
      SELECT event_type,
             COUNT(*) FILTER (WHERE user_id % 2 = 0) AS n_a,
             COUNT(*) FILTER (WHERE user_id % 2 = 1) AS n_b
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           ROUND((n_a - n_b) / sqrt(n_a + n_b), 4) AS z_rate
    FROM g
    """,
)
def stats_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional two-sample Poisson rate test per event_type: under
    H0 (equal rates, equal exposure) the A-count given the total is
    Binomial(n, 1/2), giving z = (n_a - n_b)/sqrt(n_a + n_b) — the
    event-count analogue of the mean tests, detecting traffic-rate
    (not value) shifts between the variants.

    Shape: one conditional-count scan to O(groups); nothing ordered,
    nothing wide — the cheapest possible guardrail metric at any
    scale."""
    ev = load_table(spark, sf_dir, "events")
    a = F.col("user_id") % 2 == 0
    g = ev.groupBy("event_type").agg(
        F.count(F.when(a, 1)).alias("n_a"),
        F.count(F.when(~a, 1)).alias("n_b"),
    )
    return g.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(
            (F.col("n_a") - F.col("n_b")) / F.sqrt(F.col("n_a") + F.col("n_b")), 4
        ).alias("z_rate"),
    )
