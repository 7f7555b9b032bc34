"""Miscellaneous analytics suite.

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
    "segment_rfm",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_order,
             COUNT(*) AS frequency,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS monetary
      FROM orders
      GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             date_diff('day', last_order, (SELECT MAX(last_order) FROM base))
               AS recency_days,
             frequency, monetary,
             ntile(4) OVER (ORDER BY date_diff('day', last_order,
                              (SELECT MAX(last_order) FROM base)), o_custkey)
               AS r_score,
             ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
             ntile(4) OVER (ORDER BY monetary DESC, o_custkey)  AS m_score
      FROM base
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CASE WHEN r_score = 1 AND f_score = 1 AND m_score = 1
                  THEN 'champion'
                WHEN r_score >= 3 AND f_score <= 2 THEN 'at_risk'
                WHEN f_score = 1 THEN 'loyal'
                ELSE 'regular' END AS segment
    FROM scored
    """,
)
def segment_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) quartile segmentation of
    customers from their order history. Recency is days since the
    customer's last order relative to the corpus max date; each
    dimension is scored into deterministic quartiles (ntile ordered
    by the metric with o_custkey tie-break — monetary is pre-rounded
    so FP sum noise cannot flip the sort).

    Scale note: ntile over the full customer set is a single-partition
    window. At 100 TB the same scores come from ONE percentile_approx
    pass producing the three quartile boundary arrays (broadcast,
    then a map-side comparison per customer) — the boundaries path is
    what feature_quantile_binning demonstrates; here the exact ntile
    keeps the oracle strict."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("monetary"),
    )
    gmax = base.agg(F.max("last_order").alias("gmax"))
    scored = (
        base.crossJoin(F.broadcast(gmax))
        .withColumn("recency_days", F.datediff("gmax", "last_order"))
        .drop("gmax", "last_order")
    )
    r_w = Window.orderBy("recency_days", "o_custkey")
    f_w = Window.orderBy(F.desc("frequency"), "o_custkey")
    m_w = Window.orderBy(F.desc("monetary"), "o_custkey")
    scored = scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(r_w).alias("r_score"),
        F.ntile(4).over(f_w).alias("f_score"),
        F.ntile(4).over(m_w).alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") == 1) & (F.col("f_score") == 1) & (F.col("m_score") == 1),
            "champion",
        )
        .when((F.col("r_score") >= 3) & (F.col("f_score") <= 2), "at_risk")
        .when(F.col("f_score") == 1, "loyal")
        .otherwise("regular")
    )
    return scored.withColumn("segment", seg)


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


_HUBS = [(37.77, -122.42), (40.71, -74.01), (51.51, -0.13), (35.68, 139.69)]


def _geo_oracle() -> str:
    hub_rows = ", ".join(f"({i}, {lat}, {lon})" for i, (lat, lon) in enumerate(_HUBS))
    return f"""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey * 37 % 1800) / 10.0 - 90.0 AS lat,
             (c_custkey * 91 % 3600) / 10.0 - 180.0 AS lon
      FROM customer
    ),
    hubs(hub_id, hlat, hlon) AS (VALUES {hub_rows}),
    d AS (
      SELECT c_custkey, hub_id,
             2.0 * 6371.0 * asin(sqrt(
               sin((hlat - lat) * pi() / 360.0) * sin((hlat - lat) * pi() / 360.0)
               + cos(lat * pi() / 180.0) * cos(hlat * pi() / 180.0)
               * sin((hlon - lon) * pi() / 360.0) * sin((hlon - lon) * pi() / 360.0)
             )) AS km
      FROM pts CROSS JOIN hubs
    ),
    best AS (
      SELECT c_custkey, MIN(struct_pack(km := km, h := hub_id)) AS b
      FROM d GROUP BY c_custkey
    )
    SELECT b.h AS hub_id,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(b.km), 2) AS avg_km,
           ROUND(MAX(b.km), 2) AS max_km
    FROM best GROUP BY b.h
    """



@register("geo_haversine_nearest_hub", oracle=_geo_oracle())
def geo_haversine_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle nearest-hub assignment: every customer (at a
    deterministic pseudo-coordinate derived from its key — the
    fixtures carry no geo columns, the geometry is what's under
    test) is assigned to the closest of 4 hub cities by the haversine
    formula, reporting per-hub membership and distance spread.

    Shape: the hub table is O(hubs) and broadcast; distance + argmin
    are a map-side cross join + per-key min-struct (pinned tie-break),
    so the customer table is scanned once with no shuffle until the
    O(hubs) rollup — the standard nearest-facility pattern at any
    scale. Note sin/cos/asin must agree bit-wise across engines,
    which libm-backed JVM and C math do for these magnitudes."""
    pi = math.pi
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 37 % 1800) / 10.0 - 90.0).alias("lat"),
        ((F.col("c_custkey") * 91 % 3600) / 10.0 - 180.0).alias("lon"),
    )
    hubs = spark.createDataFrame(
        [(i, lat, lon) for i, (lat, lon) in enumerate(_HUBS)],
        ["hub_id", "hlat", "hlon"],
    )
    dlat_half = (F.col("hlat") - F.col("lat")) * pi / 360.0
    dlon_half = (F.col("hlon") - F.col("lon")) * pi / 360.0
    km = (
        2.0
        * 6371.0
        * F.asin(
            F.sqrt(
                F.sin(dlat_half) * F.sin(dlat_half)
                + F.cos(F.col("lat") * pi / 180.0)
                * F.cos(F.col("hlat") * pi / 180.0)
                * F.sin(dlon_half)
                * F.sin(dlon_half)
            )
        )
    )
    d = pts.crossJoin(F.broadcast(hubs)).select(
        "c_custkey", "hub_id", km.alias("km")
    )
    best = d.groupBy("c_custkey").agg(F.min(F.struct("km", "hub_id")).alias("b"))
    return best.groupBy(F.col("b.hub_id").alias("hub_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(F.avg("b.km"), 2).alias("avg_km"),
        F.round(F.max("b.km"), 2).alias("max_km"),
    )


# ========================================================================
# from analytics_extras16.py — original batch rationale:
# Analytics extras, batch 16: quantile normalization via
# applyInPandas, RFM segment migration, power analysis, and invoice
# reconciliation.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's feature-engineering /
# segmentation / experimentation / data-quality tiers:
#
# * quantile normalization — per-group values mapped onto the global
#   quantile ladder (the omics/feature-pipeline distribution fix),
#   implemented as an Arrow-batched applyInPandas grouped-map with the
#   interpolation oracled in SQL;
# * RFM migration — spend-quartile transition matrix between periods,
#   the segmentation-dynamics view behind "are our best customers
#   downgrading";
# * power analysis — required n per arm for a target lift from
#   observed variance, the pre-experiment sizing formula;
# * invoice reconciliation — header-vs-lines amount audit (and in
#   these fixtures it FINDS the inconsistency: o_totalprice is not
#   derivable from lineitem, which is exactly what the audit is for).
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.operators import ranks
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_QN_POINTS = 101


def _qn_ladder_sql() -> str:
    pts = ", ".join(f"{i / 100.0}" for i in range(_QN_POINTS))
    return f"quantile_cont(value, [{pts}])"



@register(
    "groupedmap_quantile_normalize",
    oracle=f"""
    WITH ladder AS (
      SELECT {_qn_ladder_sql()} AS q FROM events
    ),
    pr AS (
      SELECT event_type, value,
             PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value)
               AS pr
      FROM events
    ),
    norm AS (
      SELECT event_type,
             q[CAST(FLOOR(pr * 100) AS BIGINT) + 1]
             + (pr * 100 - FLOOR(pr * 100))
               * (q[LEAST(CAST(FLOOR(pr * 100) AS BIGINT) + 2,
                          {_QN_POINTS})]
                  - q[CAST(FLOOR(pr * 100) AS BIGINT) + 1]) AS v
      FROM pr CROSS JOIN ladder
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(v), 3) AS mean_norm,
           ROUND(STDDEV_SAMP(v), 3) AS std_norm,
           ROUND(MIN(v), 3) AS min_norm,
           ROUND(MAX(v), 3) AS max_norm
    FROM norm GROUP BY event_type
    """,
)
def groupedmap_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization: each group's values are replaced by the
    GLOBAL value at the same within-group percent-rank (linear
    interpolation on a 101-point global quantile ladder) — after it,
    every event_type has the same marginal distribution, the standard
    cross-batch/cross-array normalization from omics pipelines
    applied to feature columns.

    Until r11 this was a grouped-map applyInPandas keyed by
    event_type — and the r11 pandas-batch audit measured what that
    key cardinality (~5) means: ONE pandas frame of 20,302 rows per
    group at sf0.1, growing 10.07x per 10x data step
    (tools/pandas_batch_audit.py) — one Python worker holding
    O(data/5) rows at 100 TB. The within-group PERCENT_RANK is the
    whole Python dependency, and it is exactly the grouped two-level
    rank: ``ranks.grouped_min_rank`` (global quantile buckets, rank
    within (group, bucket), O(groups x buckets) offsets joined back —
    quantile mode because events.value is right-skewed). The ladder
    interpolation is pure column arithmetic on the O(101) collected
    ladder. No Python worker sees any batch at all now; parallelism
    is groups x buckets instead of groups.

    The oracle reproduces rank + interpolation in UDF-free SQL, so
    the distributed rank's math stays value-checked."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    ladder = (
        ev.agg(
            F.percentile(
                "value", F.array(*[F.lit(i / 100.0) for i in range(_QN_POINTS)])
            ).alias("q")
        ).collect()[0]["q"]
    )
    ladder = [float(x) for x in ladder]

    ranked = ranks.grouped_min_rank(
        ev, ["event_type"], "value", out="__r", bucket_mode="quantile"
    )
    n_g = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("__n"))
    j = ranked.join(n_g, "event_type")
    pr = F.when(F.col("__n") == 1, F.lit(0.0)).otherwise(
        (F.col("__r") - 1.0) / (F.col("__n") - 1.0)
    )
    # same interpolation arithmetic as the SQL oracle: floor index +
    # fractional blend on the 101-point ladder
    arr = F.array(*[F.lit(x) for x in ladder])
    idx = F.floor(pr * 100).cast("int")
    frac = pr * 100 - idx
    lo = F.element_at(arr, idx + F.lit(1))
    hi = F.element_at(arr, F.least(idx + F.lit(2), F.lit(_QN_POINTS)))
    norm = j.select(
        "event_type", (lo + frac * (hi - lo)).alias("v")
    )
    return norm.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("v"), 3).alias("mean_norm"),
        F.round(F.stddev_samp("v"), 3).alias("std_norm"),
        F.round(F.min("v"), 3).alias("min_norm"),
        F.round(F.max("v"), 3).alias("max_norm"),
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
    "promo_day_lift",
    oracle="""
    -- daily rev as an EXACT decimal sum and the averages as
    -- exact-sum/count divisions: float AVG over float SUMs diverged
    -- in the full-precision canon at sf1
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    flagged AS (
      SELECT d, rev,
             ISODOW(d) AS dow,
             CASE WHEN EXTRACT(day FROM d) = 1 THEN 1 ELSE 0 END AS promo
      FROM daily
    ),
    g AS (
      SELECT dow,
             SUM(promo) AS n_promo,
             SUM(1 - promo) AS n_base,
             CAST(SUM(CASE WHEN promo = 1 THEN rev END) AS DOUBLE) AS psum,
             CAST(SUM(CASE WHEN promo = 0 THEN rev END) AS DOUBLE) AS bsum
      FROM flagged GROUP BY dow
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(n_promo AS BIGINT) AS n_promo_days,
           ROUND(psum / NULLIF(n_promo, 0), 2) AS promo_avg,
           ROUND(bsum / NULLIF(n_base, 0), 2) AS baseline_avg,
           ROUND((psum / NULLIF(n_promo, 0))
                 / (bsum / NULLIF(n_base, 0)) - 1.0, 4) AS lift
    FROM g
    """,
)
def promo_day_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo-day lift with seasonal control: first-of-month revenue
    (the stand-in promo calendar) against the same-day-of-week
    non-promo baseline — comparing Mondays to Mondays, so weekly
    seasonality cannot masquerade as lift. The honest version of
    'the promo made +X%', one step before a proper diff-in-diff.

    Shape: N orders compress to O(days) in one pass; everything after
    is a conditional aggregate over the compressed series."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    flagged = daily.select(
        (F.weekday("d") + 1).alias("dow"),
        "rev",
        F.when(F.dayofmonth("d") == 1, 1).otherwise(0).alias("promo"),
    )
    # exact decimal sums / explicit counts instead of float AVG —
    # engine-identical doubles at any scale (see oracle comment)
    grouped = flagged.groupBy("dow").agg(
        F.sum("promo").cast("long").alias("n_promo_days"),
        F.sum(1 - F.col("promo")).cast("long").alias("n_base"),
        F.sum(F.when(F.col("promo") == 1, F.col("rev")))
        .cast("double")
        .alias("psum"),
        F.sum(F.when(F.col("promo") == 0, F.col("rev")))
        .cast("double")
        .alias("bsum"),
    )
    pa = F.col("psum") / F.nullif(F.col("n_promo_days"), F.lit(0))
    ba = F.col("bsum") / F.nullif(F.col("n_base"), F.lit(0))
    return grouped.select(
        F.col("dow").cast("long").alias("dow"),
        "n_promo_days",
        F.round(pa, 2).alias("promo_avg"),
        F.round(ba, 2).alias("baseline_avg"),
        F.round(pa / ba - 1.0, 4).alias("lift"),
    )


# ========================================================================
# from analytics_extras20.py — original batch rationale:
# Analytics extras, batch 20: new-vs-returning revenue and Heaps'
# law vocabulary growth.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); closes out SURVEY.md §2.2's business-analytics / corpus-
# statistics tiers for this round:
#
# * revenue split — monthly revenue decomposed into new-customer vs
#   returning-customer money, the acquisition-vs-retention P&L view;
# * Heaps' law — vocabulary growth V(n) ~ K n^beta fitted by log-log
#   OLS over token-stream checkpoints, the corpus-scaling diagnostic
#   that predicts vocabulary (and tokenizer) size at 100x the data.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "revenue_new_vs_returning",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(CAST(date_trunc('month', CAST(o_orderdate AS DATE))
                      AS TIMESTAMP)) AS first_m
      FROM orders GROUP BY o_custkey
    ),
    tagged AS (
      SELECT CAST(date_trunc('month', CAST(o.o_orderdate AS DATE))
                  AS TIMESTAMP) AS m,
             CASE WHEN CAST(date_trunc('month', CAST(o.o_orderdate AS DATE))
                           AS TIMESTAMP) = f.first_m
                  THEN 1 ELSE 0 END AS is_new,
             o.o_totalprice AS rev
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    )
    SELECT m AS month,
           ROUND(SUM(CASE WHEN is_new = 1 THEN rev ELSE 0 END), 2)
             AS new_revenue,
           ROUND(SUM(CASE WHEN is_new = 0 THEN rev ELSE 0 END), 2)
             AS returning_revenue,
           ROUND(SUM(CASE WHEN is_new = 1 THEN rev ELSE 0 END)
                 / SUM(rev), 4) AS new_share
    FROM tagged GROUP BY m
    """,
)
def revenue_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split into new-customer money (orders in the
    customer's first-ever month) vs returning-customer money — the
    acquisition-vs-retention decomposition behind 'is growth new
    logos or expansion'. A falling new_share with flat totals means
    the base is compounding; the reverse means a leaky bucket.

    Shape: one groupBy for first months, re-joined on custkey (the
    bucketing-friendly fact-to-aggregate join), one monthly rollup."""
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.to_date("o_orderdate"))
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.to_date("o_orderdate"))).alias("first_m")
    )
    tagged = o.join(firsts, "o_custkey").select(
        month.alias("m"),
        F.when(month == F.col("first_m"), 1).otherwise(0).alias("is_new"),
        F.col("o_totalprice").alias("rev"),
    )
    new_rev = F.sum(F.when(F.col("is_new") == 1, F.col("rev")).otherwise(0.0))
    ret_rev = F.sum(F.when(F.col("is_new") == 0, F.col("rev")).otherwise(0.0))
    return tagged.groupBy(F.col("m").alias("month")).agg(
        F.round(new_rev, 2).alias("new_revenue"),
        F.round(ret_rev, 2).alias("returning_revenue"),
        F.round(new_rev / F.sum("rev"), 4).alias("new_share"),
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


_SLO_ERROR_RATE = 0.25



@register(
    "sre_error_budget_burn",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
             COUNT(*) AS n,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errs
      FROM events GROUP BY 1
    ),
    burn AS (
      SELECT d, n, errs,
             (errs * 1.0 / n) / {_SLO_ERROR_RATE} AS burn_rate
      FROM daily
    )
    SELECT d AS day,
           CAST(n AS BIGINT) AS n_events,
           CAST(errs AS BIGINT) AS n_errors,
           ROUND(burn_rate, 4) AS burn_rate,
           CAST(CASE WHEN burn_rate > 1 THEN 1 ELSE 0 END AS BIGINT)
             AS budget_violated
    FROM burn
    """,
)
def sre_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-budget burn per day against a 25% error-rate SLO (the
    fixtures' error share sits near 20%, so the budget is realistic):
    burn_rate = observed_error_rate / SLO — burn > 1 means the day
    consumed more than its share of the monthly budget, the
    multi-window burn-rate arithmetic from the Google SRE workbook
    that modern paging policies alert on.

    Shape: one conditional-count grouped scan to O(days); the SLO
    math is scalar on the compressed series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("errs"),
    )
    burn = (F.col("errs") / F.col("n")) / _SLO_ERROR_RATE
    return daily.select(
        "day",
        F.col("n").cast("long").alias("n_events"),
        F.col("errs").cast("long").alias("n_errors"),
        F.round(burn, 4).alias("burn_rate"),
        F.when(burn > 1, 1).otherwise(0).cast("long").alias("budget_violated"),
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
    "drift_priority_mix_tvd",
    oracle="""
    WITH mix AS (
      SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS TIMESTAMP)
               AS month,
             o_orderpriority AS cat,
             COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    tot AS (
      SELECT month, SUM(n) AS t FROM mix GROUP BY month
    ),
    shares AS (
      SELECT m.month, m.cat, m.n * 1.0 / tot.t AS share
      FROM mix m JOIN tot ON tot.month = m.month
    ),
    paired AS (
      SELECT a.month, a.cat, a.share AS cur,
             COALESCE(b.share, 0.0) AS prev
      FROM shares a
      LEFT JOIN shares b
        ON b.cat = a.cat
       AND b.month = a.month - INTERVAL 1 MONTH
      WHERE EXISTS (SELECT 1 FROM shares s
                    WHERE s.month = a.month - INTERVAL 1 MONTH)
    )
    SELECT month,
           ROUND(SUM(abs(cur - prev)) / 2.0, 4) AS tvd_vs_prev_month,
           CAST(COUNT(*) AS BIGINT) AS n_categories
    FROM paired GROUP BY month
    """,
)
def drift_priority_mix_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical mix-shift monitor: month-over-month total-variation
    distance (half the L1 gap between consecutive months' priority
    shares) — TVD is the tightest bound on how much ANY downstream
    decision rule's behavior can change from the composition shift,
    making it the principled alert threshold for categorical drift
    (the numeric twin is drift_psi_value_distribution).

    Shape: one grouped pass to O(months x categories) shares, a
    self-join on the shifted month, an O(cells) rollup."""
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.to_date("o_orderdate"))
    mix = o.groupBy(month.alias("month"), F.col("o_orderpriority").alias("cat")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = mix.groupBy("month").agg(F.sum("n").alias("t"))
    shares = mix.join(tot, "month").select(
        "month", "cat", (F.col("n") / F.col("t")).alias("share")
    )
    prev = shares.select(
        F.add_months(F.col("month"), 1).alias("pm"),
        F.col("cat").alias("pcat"),
        F.col("share").alias("prev"),
    )
    months_with_prev = shares.select(
        F.add_months(F.col("month"), 1).alias("m2")
    ).distinct()
    paired = (
        shares.join(
            prev,
            (F.col("pm") == F.col("month")) & (F.col("pcat") == F.col("cat")),
            "left",
        )
        .join(months_with_prev, F.col("m2") == F.col("month"), "left_semi")
        .select(
            "month", "cat", F.col("share").alias("cur"),
            F.coalesce("prev", F.lit(0.0)).alias("prev"),
        )
    )
    return paired.groupBy("month").agg(
        F.round(F.sum(F.abs(F.col("cur") - F.col("prev"))) / 2.0, 4).alias(
            "tvd_vs_prev_month"
        ),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
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


_OTIF_DAYS = 30



@register(
    "logistics_otif_rate",
    oracle=f"""
    WITH lagged AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS lag_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN lag_days <= {_OTIF_DAYS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_on_time,
           ROUND(SUM(CASE WHEN lag_days <= {_OTIF_DAYS} THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 4) AS otif_rate,
           ROUND(AVG(lag_days * 1.0), 2) AS avg_lag_days,
           CAST(MAX(lag_days) AS BIGINT) AS worst_lag_days
    FROM lagged GROUP BY priority
    """,
)
def logistics_otif_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-time fulfillment per priority class: the share of lines
    shipped within 30 days of order placement, plus average and worst
    lag — the OTIF KPI that service contracts and carrier scorecards
    are written against. Urgent classes failing to beat low-priority
    ones is the classic broken-SLA smell this surfaces.

    Shape: one fact-to-fact join on orderkey (bucketing removes the
    shuffle at 100 TB) feeding a conditional aggregate to O(classes)
    rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lagged = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "lag_days"
        ),
    )
    on_time = F.sum(F.when(F.col("lag_days") <= _OTIF_DAYS, 1).otherwise(0))
    return lagged.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        on_time.cast("long").alias("n_on_time"),
        F.round(on_time / F.count(F.lit(1)), 4).alias("otif_rate"),
        F.round(F.avg(F.col("lag_days").cast("double")), 2).alias("avg_lag_days"),
        F.max("lag_days").cast("long").alias("worst_lag_days"),
    )
