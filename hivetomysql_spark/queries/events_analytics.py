"""Event-stream analytics in batch: funnel conversion, weekly
retention cohorts, event-transition matrix.

The product-analytics workload an events table exists for. All three
aggregate per-user first (shuffle key = user_id, the natural
partitioning of an events table — at 100 TB the table would be
written bucketed/partitioned by user_id so these run shuffle-free),
then reduce the per-user rows to tiny outputs.

events.parquet ts is TIMESTAMP(NANOS); ``load_table`` normalizes it
(see tables.py) so these queries run on any session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "funnel_conversion",
    oracle="""
    WITH stage_ts AS (
      SELECT user_id,
             MIN(ts) FILTER (WHERE event_type = 'view')     AS t_view,
             MIN(ts) FILTER (WHERE event_type = 'click')    AS t_click,
             MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS BIGINT) AS n_view,
           CAST(COUNT(*) FILTER (WHERE t_view < t_click) AS BIGINT)   AS n_click_after_view,
           CAST(COUNT(*) FILTER (WHERE t_view < t_click AND t_click < t_purchase) AS BIGINT)
             AS n_purchase_after_click
    FROM stage_ts
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase ordered funnel: per-user first-touch
    timestamps in one pass (conditional MIN aggregates — no joins, no
    self-unions), then one global reduce. Shuffle carries one row per
    user; the funnel predicate is strictly ordered (<) so a click
    before any view doesn't convert."""
    e = load_table(spark, sf_dir, "events")
    stage = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return stage.agg(
        F.count_if(F.col("t_view").isNotNull()).alias("n_view"),
        F.count_if(F.col("t_view") < F.col("t_click")).alias("n_click_after_view"),
        F.count_if(
            (F.col("t_view") < F.col("t_click"))
            & (F.col("t_click") < F.col("t_purchase"))
        ).alias("n_purchase_after_click"),
    )


@register(
    "retention_weekly",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(DATE_TRUNC('week', MIN(ts)) AS TIMESTAMP)
               AS cohort_week
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS TIMESTAMP)
               AS active_week
      FROM events
    )
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, active_week) / 7 AS INT)
             AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT)    AS n_active
    FROM firsts f JOIN active a USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: cohort = week of first event,
    matrix cell = distinct users from that cohort active N weeks
    later. Both sides aggregate per-user before the join, so the join
    input is |users| rows, not |events| — the difference between a
    shuffle of 100 TB and a shuffle of the user dimension."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = e.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        firsts.join(active, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix (Markov counts): lag over
    (user, time) then count (prev → next) pairs. One shuffle on
    user_id for the window sort, then partial-aggregated counts of a
    25-cell matrix — the window is the whole cost, which is why the
    100 TB layout keeps events clustered by (user_id, ts) on disk."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "sessionize_ids",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM seq
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS session_value,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def sessionize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization WITH session ids (lag + running sum of
    gap flags): unlike session_window aggregation, this keeps a
    joinable session_id on every event, so downstream features can
    attribute rows to sessions. One user-keyed window shuffle does
    both the lag and the cumulative id."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
            > 1800 * 1_000_000,
            1,
        )
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0)
        .alias("new_s"),
    )
    sess = seq.withColumn(
        "session_id",
        F.sum("new_s").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
    )


@register(
    "dedup_keep_latest",
    oracle="""
    SELECT user_id, event_type, event_id AS latest_event_id,
           ROUND(value, 2) AS latest_value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style compaction: keep only the LATEST row per
    (user, event_type) business key — row_number desc over the key
    window. The upsert-log → current-state materialization every
    JDBC-fed warehouse needs; one shuffle on the business key, and at
    100 TB the window is replaceable by max_by aggregates when only
    scalar payloads are kept."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.round("value", 2).alias("latest_value"),
        )
    )


@register(
    "timeseries_ohlc",
    oracle="""
    WITH r AS (
      SELECT event_type,
             CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
             value,
             ROW_NUMBER() OVER (PARTITION BY event_type, DATE_TRUNC('day', ts)
                                ORDER BY ts, event_id)            AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, DATE_TRUNC('day', ts)
                                ORDER BY ts DESC, event_id DESC)  AS rn_d
      FROM events
    )
    SELECT event_type, day,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
           ROUND(MAX(value), 2)                             AS high,
           ROUND(MIN(value), 2)                             AS low,
           ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
           COUNT(*) AS n_ticks
    FROM r
    GROUP BY event_type, day
    """,
)
def timeseries_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling: per event_type per day open/high/low/close.

    open/close use min_by/max_by over a (ts, event_id) struct — a
    single-pass aggregate whose partial states merge associatively,
    so the bar build is one shuffle of O(bars) rows. The window-based
    alternative (row_number twice, as the oracle does) would sort the
    full stream per key; at 100 TB min_by/max_by is the only shape
    that avoids a per-key sort. Tie-break includes event_id so the
    result is deterministic under any partitioning.
    """
    ev = load_table(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.round(F.min_by("value", order_key), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", order_key), 2).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


@register(
    "timeseries_twap",
    oracle="""
    WITH t AS (
      SELECT event_type, value,
             epoch_us(LEAD(ts) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dur_us
      FROM events
    )
    SELECT event_type,
           ROUND(SUM(value * dur_us) / SUM(dur_us), 6) AS twap,
           COUNT(dur_us) AS n_segments
    FROM t
    WHERE dur_us IS NOT NULL
    GROUP BY event_type
    """,
)
def timeseries_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation weighted by how
    long it remained current (micros until the next observation in
    the same series; the open-ended last observation is excluded).

    One grouped two-level LEAD pass (operators/ranks.grouped_lead:
    event_type is bounded at 5 values, so a per-type window would
    sort N/5 rows in one task per type — r11 window audit; the
    bucketed form hash-exchanges on (type, time-bucket) and hands
    each bucket's first timestamp back to the previous bucket's last
    row) feeding one aggregate on the same key. Durations are
    integer microseconds end-to-end — never float seconds — to keep
    the weighting exact and engine-independent. The (ts, event_id)
    order is expressed as (unix_micros(ts), event_id) — identical
    ordering, numeric key for the value buckets.
    """
    from hivetomysql_spark.operators.ranks import grouped_lead

    ev = load_table(spark, sf_dir, "events").withColumn(
        "__tus", F.unix_micros("ts")
    )
    led = grouped_lead(
        ev.select("event_type", "value", "__tus", "event_id"),
        ["event_type"],
        "__tus",
        ["event_id"],
        value="__tus",
        out="__next_us",
    )
    dur = F.col("__next_us") - F.col("__tus")
    return (
        led.select("event_type", "value", dur.alias("dur_us"))
        .where(F.col("dur_us").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 6
            ).alias("twap"),
            F.count("dur_us").alias("n_segments"),
        )
    )


@register(
    "cogroup_asof_attribution",
    oracle="""
    WITH u AS (
      SELECT event_id, user_id, ts, event_type
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    w AS (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id
               ORDER BY ts,
                        CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
                        event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS click_ts
      FROM u
    )
    SELECT event_id AS purchase_id, user_id, click_ts,
           epoch_us(ts) - epoch_us(click_ts) AS lag_us
    FROM w WHERE event_type = 'purchase'
    """,
)
def cogroup_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-applyInPandas as-of join (operators/asof.py): every
    purchase gets the user's most recent click at-or-before it. The
    oracle is the union+window formulation — two mechanisms, one
    contract."""
    from hivetomysql_spark.operators.asof import cogroup_asof_attribution as op

    return op(load_table(spark, sf_dir, "events"))


@register(
    "event_trigram_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1, e2, e3, COUNT(*) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY e1, e2, e3
    ORDER BY n DESC, e1, e2, e3
    LIMIT 15
    """,
)
def event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey trigrams: three-step event sequences per user
    (double LEAD over the standard (ts, event_id) order), counted
    corpus-wide. One user-keyed window shuffle feeds the path count;
    the top-15 is TakeOrderedAndProject with full tie-break. Extends
    event_transitions (bigrams) to path analysis."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(15)
    )


@register(
    "event_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (
               PARTITION BY event_type ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT event_type,
           COUNT(gap_us) AS n_gaps,
           CAST(ROUND(QUANTILE_CONT(gap_us, 0.5), 0) AS BIGINT) AS median_us,
           CAST(ROUND(QUANTILE_CONT(gap_us, 0.95), 0) AS BIGINT) AS p95_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def event_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type (median / p95 /
    max gap in integer micros) — the burstiness profile that sizes
    streaming watermarks and session gaps from the data instead of
    guessing. One grouped two-level LAG pass (operators/ranks
    .grouped_lag — event_type is bounded at 5 values, so the window
    form sorts N/5 rows in one task per type; r11 window audit)
    then percentile aggregation on the same key."""
    from hivetomysql_spark.operators.ranks import grouped_lag

    ev = load_table(spark, sf_dir, "events").withColumn(
        "__tus", F.unix_micros("ts")
    )
    lagged = grouped_lag(
        ev.select("event_type", "__tus", "event_id"),
        ["event_type"],
        "__tus",
        ["event_id"],
        value="__tus",
        out="__prev_us",
    )
    gaps = lagged.select(
        "event_type",
        (F.col("__tus") - F.col("__prev_us")).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(F.percentile("gap_us", F.lit(0.5)), 0)
        .cast("bigint")
        .alias("median_us"),
        F.round(F.percentile("gap_us", F.lit(0.95)), 0)
        .cast("bigint")
        .alias("p95_us"),
        F.max("gap_us").alias("max_us"),
    )


@register(
    "event_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grp AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INT) AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, COUNT(*) AS len FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(MAX(len) AS INT) AS longest_streak,
           CAST(COUNT(*) AS INT) AS n_streaks
    FROM streaks
    GROUP BY user_id
    """,
)
def event_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    date-minus-row_number gaps-and-islands construction at daily
    granularity (sessionize_ids does the same at timestamp
    granularity with a gap threshold). Engagement metric every
    product-analytics stack ships; distinct days first, so the
    window input is one row per user-day."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.select(
        "user_id",
        "d",
        F.date_sub("d", F.row_number().over(w)).alias("anchor"),
    )
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("int").alias("longest_streak"),
        F.count(F.lit(1)).cast("int").alias("n_streaks"),
    )


@register(
    "event_heatmap_dow_hour",
    oracle="""
    SELECT CAST(ISODOW(ts) AS INT) AS iso_dow,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def event_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour activity heatmap — the 7×24 seasonality matrix
    behind capacity planning and anomaly baselines. Bin extraction is
    scan-stage; the shuffle carries at most 168 cells regardless of
    data volume. ISO weekday (Monday=1) for engine-portable
    numbering, same convention as etl_date_dimension."""
    ev = load_table(spark, sf_dir, "events")
    iso_dow = ((F.dayofweek("ts") + 5) % 7) + 1
    return (
        ev.groupBy(
            iso_dow.alias("iso_dow"), F.hour("ts").alias("hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "drift_psi_value_distribution",
    oracle="""
    WITH cut AS (SELECT TIMESTAMP '2024-01-15 00:00:00' AS mid),
    bounds AS (
      SELECT quantile_cont(value, [0.2, 0.4, 0.6, 0.8]) AS bs
      FROM events, cut WHERE ts < cut.mid
    ),
    binned AS (
      SELECT CASE WHEN e.ts < cut.mid THEN 'A' ELSE 'B' END AS period,
             1 + CAST(LEN(list_filter(b.bs, x -> x < e.value)) AS INT) AS bin
      FROM events e, bounds b, cut
    ),
    dist AS (
      SELECT period, bin, COUNT(*) * 1.0
               / SUM(COUNT(*)) OVER (PARTITION BY period) AS p
      FROM binned GROUP BY period, bin
    )
    SELECT ROUND(SUM((a.p - b.p) * LN(a.p / b.p)), 6) + 0 AS psi,
           CAST(COUNT(*) AS INT) AS n_bins
    FROM dist a JOIN dist b ON a.bin = b.bin
    WHERE a.period = 'A' AND b.period = 'B'
    """,
)
def drift_psi_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two time periods: bin edges
    come from the baseline period's quintiles, both periods histogram
    into those bins, and PSI = Σ(pA−pB)·ln(pA/pB) summarizes the
    drift (rule of thumb: >0.2 = retrain). The standard
    feature-drift monitor for models consuming this stream; bin
    boundaries are a 1-row broadcast, so the whole check is one scan
    plus tiny aggregates. +0 normalizes IEEE −0.0."""
    mid = F.lit("2024-01-15 00:00:00").cast("timestamp")
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.where(F.col("ts") < mid).agg(
        F.percentile(
            "value", F.array(*[F.lit(q) for q in (0.2, 0.4, 0.6, 0.8)])
        ).alias("bs")
    )
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("ts") < mid, "A").otherwise("B").alias("period"),
        (
            1 + F.size(F.filter("bs", lambda x: x < F.col("value")))
        ).alias("bin"),
    )
    from pyspark.sql.window import Window

    dist = (
        binned.groupBy("period", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "p",
            F.col("n") * 1.0 / F.sum("n").over(Window.partitionBy("period")),
        )
    )
    a = dist.where(F.col("period") == "A").select(
        "bin", F.col("p").alias("pa")
    )
    b = dist.where(F.col("period") == "B").select(
        F.col("bin").alias("binb"), F.col("p").alias("pb")
    )
    return (
        a.join(b, a.bin == b.binb)
        .agg(
            (
                F.round(
                    F.sum(
                        (F.col("pa") - F.col("pb"))
                        * F.log(F.col("pa") / F.col("pb"))
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("psi"),
            F.count(F.lit(1)).cast("int").alias("n_bins"),
        )
    )


@register(
    "asof_join_nearest",
    oracle="""
    WITH u AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ),
    w AS (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id
               ORDER BY ts, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
                        event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_click,
             MIN(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id
               ORDER BY ts, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
                        event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_click
      FROM u
    )
    SELECT event_id AS purchase_id, user_id,
           CAST(CASE
             WHEN prev_click IS NULL AND next_click IS NULL THEN NULL
             WHEN prev_click IS NULL
               THEN epoch_us(next_click) - epoch_us(ts)
             WHEN next_click IS NULL
               THEN epoch_us(ts) - epoch_us(prev_click)
             ELSE LEAST(epoch_us(ts) - epoch_us(prev_click),
                        epoch_us(next_click) - epoch_us(ts))
           END AS BIGINT) AS nearest_gap_us
    FROM w WHERE event_type = 'purchase'
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of: each purchase's distance to the
    CLOSEST click either side (asof_join_last_click is the
    backward-only variant). Two frames over one union+window pass —
    running max of click time before, running min after — then a
    per-row least(); still one shuffle, no join. The same
    forward+backward trick gap-fills sensor streams by nearest
    reading. Clicks order before purchases at equal instants on both
    engines."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    order_cols = [
        F.col("ts"),
        F.when(F.col("event_type") == "click", 0).otherwise(1),
        F.col("event_id"),
    ]
    back = (
        Window.partitionBy("user_id")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy(*order_cols)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    w = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.max(click_ts).over(back).alias("prev_click"),
        F.min(click_ts).over(fwd).alias("next_click"),
    )
    gap_back = F.unix_micros("ts") - F.unix_micros("prev_click")
    gap_fwd = F.unix_micros("next_click") - F.unix_micros("ts")
    return w.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(
            F.col("prev_click").isNull() & F.col("next_click").isNull(),
            F.lit(None).cast("bigint"),
        )
        .when(F.col("prev_click").isNull(), gap_fwd)
        .when(F.col("next_click").isNull(), gap_back)
        .otherwise(F.least(gap_back, gap_fwd))
        .alias("nearest_gap_us"),
    )
