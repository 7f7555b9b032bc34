"""Analytics extras, batch 53: backfill planning, contribution
analysis, funnel step latency, and Holm correction.

The backfill planner is the one operator here with a DIRECT
reference tie: `HiveToMysql.java:270-282` re-imports exactly one
`ds=` partition per run and trusts the scheduler to know which —
this query computes which (the gap manifest a scheduler iterates).
The rest extend SURVEY.md §2.2:

* contribution analysis — year-over-year revenue delta decomposed
  by nation with share-of-change ranking (the "why did the metric
  move" BI primitive), integer-cents exact.
* funnel step latency — median/p90 time between funnel stages from
  per-user first-touch timestamps.
* Holm correction — step-down FWER control over the per-metric
  Welch tests, sibling of `stats_benjamini_hochberg`'s FDR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "incremental_backfill_planner",
    oracle="""
    WITH src AS (
      SELECT DISTINCT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1996-01-01'
    ),
    tgt AS (
      -- simulated target state: loads failed where md5(ds) % 13 = 0
      SELECT d FROM src
      WHERE ('0x' || substr(md5(strftime(d, '%Y%m%d')), 1, 8))::BIGINT
            % 13 <> 0
    ),
    missing AS (
      SELECT s.d FROM src s LEFT JOIN tgt t ON t.d = s.d
      WHERE t.d IS NULL
    ),
    grouped AS (
      SELECT d,
             d - INTERVAL (ROW_NUMBER() OVER (ORDER BY d)) DAY AS grp
      FROM missing
    )
    SELECT MIN(d) AS range_start,
           MAX(d) AS range_end,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM grouped GROUP BY grp
    """,
)
def incremental_backfill_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill manifest for a ds-partitioned target: compare the
    source's partition calendar against the target's loaded set
    (simulated here by an md5-deterministic failure pattern) and
    emit CONTIGUOUS missing ranges via gaps-and-islands (d minus
    row_number collapses consecutive days to one group). This is the
    planning step above the reference's per-`ds` delete-before-insert
    (`HiveToMysql.java:270-282` re-imports one partition and trusts
    the Tss scheduler to know which); with a manifest, a scheduler
    replays exactly the missing ranges — idempotently, thanks to the
    delete-before-insert sink this engine already provides
    (sinks/jdbc.py).

    Shape: partition calendars are O(days); the anti-join, the
    islands window, and the rollup all run on that reduced set."""
    o = load_table(spark, sf_dir, "orders")
    src = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .select(F.date_trunc("day", "o_orderdate").alias("d"))
        .distinct()
    )
    failed = (
        F.conv(
            F.substring(F.md5(F.date_format("d", "yyyyMMdd")), 1, 8), 16, 10
        ).cast("long")
        % 13
        == 0
    )
    tgt = src.where(~failed).select(F.col("d").alias("td"))
    missing = src.join(tgt, F.col("d") == F.col("td"), "left_anti")
    grp = F.date_sub(
        F.col("d").cast("date"), F.row_number().over(Window.orderBy("d"))
    )
    grouped = missing.select("d", grp.alias("grp"))
    return grouped.groupBy("grp").agg(
        F.min("d").alias("range_start"),
        F.max("d").alias("range_end"),
        F.count(F.lit(1)).alias("n_days"),
    ).drop("grp")


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


@register(
    "events_funnel_step_latency",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    ),
    steps AS (
      SELECT 'signup->click' AS step,
             date_diff('second', t_signup, t_click) AS lat
      FROM firsts
      WHERE t_signup IS NOT NULL AND t_click IS NOT NULL
        AND t_click >= t_signup
      UNION ALL
      SELECT 'click->purchase' AS step,
             date_diff('second', t_click, t_purchase) AS lat
      FROM firsts
      WHERE t_click IS NOT NULL AND t_purchase IS NOT NULL
        AND t_purchase >= t_click
    )
    SELECT step,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(quantile_cont(lat, 0.5) / 60.0, 4) AS p50_minutes,
           ROUND(quantile_cont(lat, 0.9) / 60.0, 4) AS p90_minutes
    FROM steps GROUP BY step
    """,
)
def events_funnel_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-between-funnel-steps: per user, FIRST signup, click, and
    purchase timestamps; per transition, the ordered-latency
    distribution (p50/p90 minutes). The number that tells a growth
    team WHERE the funnel is slow, which `funnel_conversion`'s
    pass-through rates cannot. Latencies are integer seconds, so the
    percentile interpolation is engine-exact.

    Shape: one conditional-aggregate reduce to O(users), a small
    union, one O(steps) percentile rollup."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t_signup"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    s1 = firsts.where(
        F.col("t_signup").isNotNull()
        & F.col("t_click").isNotNull()
        & (F.col("t_click") >= F.col("t_signup"))
    ).select(
        F.lit("signup->click").alias("step"),
        (
            F.unix_timestamp("t_click") - F.unix_timestamp("t_signup")
        ).alias("lat"),
    )
    s2 = firsts.where(
        F.col("t_click").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_click"))
    ).select(
        F.lit("click->purchase").alias("step"),
        (
            F.unix_timestamp("t_purchase") - F.unix_timestamp("t_click")
        ).alias("lat"),
    )
    return s1.unionByName(s2).groupBy("step").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.percentile("lat", F.lit(0.5)) / 60.0, 4).alias(
            "p50_minutes"
        ),
        F.round(F.percentile("lat", F.lit(0.9)) / 60.0, 4).alias(
            "p90_minutes"
        ),
    )


@register(
    "stats_holm_correction",
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
           ROUND(MAX(LEAST(1.0, p * (m - i + 1))) OVER (
             ORDER BY i ROWS UNBOUNDED PRECEDING
           ), 6) AS p_adj,
           CAST(CASE WHEN MAX(LEAST(1.0, p * (m - i + 1))) OVER (
             ORDER BY i ROWS UNBOUNDED PRECEDING
           ) <= 0.05 THEN 1 ELSE 0 END AS BIGINT) AS reject_fwer05
    FROM p
    """,
)
def stats_holm_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-DOWN correction over the per-metric A/B Welch
    z-tests: p_(i) adjusts to the running MAX of (m-i+1)·p_(j) for
    j<=i, capped at 1 — family-wise error control, uniformly more
    powerful than Bonferroni and assumption-free, the conservative
    sibling of `stats_benjamini_hochberg`'s FDR (use Holm when ONE
    false claim is unacceptable, BH when a false-discovery RATE is).
    Same logistic normal-CDF approximation (bit-identical across
    engines).

    Shape: one conditional-aggregate scan to O(metrics); ordered
    windows run on the metric table only."""
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
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = scored.select(
        "event_type",
        "z",
        "p",
        F.count(F.lit(1)).over(w_all).alias("m"),
        F.row_number().over(Window.orderBy("p", "event_type")).alias("i"),
    )
    raw = F.least(F.lit(1.0), F.col("p") * (F.col("m") - F.col("i") + 1))
    w_cum = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    adj = F.max(raw).over(w_cum)
    return ranked.select(
        "event_type",
        F.round("z", 4).alias("z"),
        F.round("p", 6).alias("p"),
        F.round(adj, 6).alias("p_adj"),
        F.when(adj <= 0.05, 1).otherwise(0).cast("long").alias(
            "reject_fwer05"
        ),
    )
