"""Analytics extras, batch 32: graph traversal, SPC monitoring, and
stateful alerting.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* BFS shortest-path distances — iterative frontier expansion, the
  traversal primitive under "within N hops" features.
* EWMA control chart — statistical process control over the metric
  stream, the alerting layer of every data-quality monitor.
* alert debounce — throttled alerting with a dynamic anchor (next
  alert depends on when the previous one fired), the canonical
  sequential recurrence that plain windows cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "graph_bfs_distances",
    oracle="""
    WITH RECURSIVE op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    epair AS MATERIALIZED (
      SELECT a.p AS u, b.p AS v
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= 2
    ),
    ed AS MATERIALIZED (
      SELECT u, v FROM epair UNION ALL SELECT v, u FROM epair
    ),
    root AS MATERIALIZED (SELECT MIN(u) AS s FROM ed),
    walk AS (
      SELECT s AS n, 0 AS d FROM root
      UNION
      SELECT e.v AS n, walk.d + 1 AS d
      FROM walk JOIN ed e ON e.u = walk.n
      WHERE walk.d < 40
    ),
    best AS (SELECT n, MIN(d) AS d FROM walk GROUP BY n),
    reached AS (
      SELECT d AS distance, COUNT(*) AS n_nodes FROM best GROUP BY d
    ),
    unreachable AS (
      SELECT -1 AS distance, COUNT(*) AS n_nodes
      FROM (SELECT DISTINCT u FROM ed) t
      WHERE u NOT IN (SELECT n FROM best)
      HAVING COUNT(*) > 0
    )
    SELECT CAST(distance AS BIGINT) AS distance,
           CAST(n_nodes AS BIGINT) AS n_nodes
    FROM (SELECT * FROM reached UNION ALL SELECT * FROM unreachable)
    ORDER BY distance
    """,
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS over the support-≥2 co-purchase graph from
    its minimum-id node: per-round frontier expansion until the
    frontier empties, reported as a distance histogram (distance −1 =
    unreachable) — the traversal primitive behind "within N hops"
    recommendation features and blast-radius queries.

    Shape: each round joins the CURRENT FRONTIER (shrinking) against
    the edge list and anti-joins the visited set — per-round cost is
    O(frontier-adjacent edges), the frontier is never data-sized, and
    lineage is truncated per round. Adaptive rounds with a loud
    40-round cap (same policy as `graph_connected_components`); the
    oracle's recursive closure carries the same depth guard."""
    li = load_table(spark, sf_dir, "lineitem")
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint()
    )
    a = op.select("o", F.col("p").alias("u"))
    b = op.select("o", F.col("p").alias("v"))
    epair = (
        a.join(b, "o")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("nco"))
        .where(F.col("nco") >= 2)
        .select("u", "v")
    )
    ed = epair.union(
        epair.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    src = ed.agg(F.min("u")).collect()[0][0]
    dist = spark.createDataFrame([(src, 0)], "n: long, d: int").localCheckpoint()
    frontier = dist
    converged = False
    for it in range(40):
        nxt = (
            ed.join(frontier.select(F.col("n").alias("u"), "d"), "u")
            .select(F.col("v").alias("n"), (F.col("d") + 1).alias("d"))
            .groupBy("n")
            .agg(F.min("d").alias("d"))
            .join(dist.select(F.col("n").alias("seen")),
                  F.col("n") == F.col("seen"), "left_anti")
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            converged = True
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt
    if not converged:
        raise RuntimeError(
            "graph_bfs_distances: frontier still growing after 40 rounds; "
            "graph diameter exceeds the cap"
        )
    reached = dist.groupBy(F.col("d").alias("distance")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    unreachable = (
        ed.select("u").distinct()
        .join(dist.select(F.col("n").alias("u")), "u", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .where(F.col("n_nodes") > 0)
        .select(F.lit(-1).alias("distance"), "n_nodes")
    )
    return (
        reached.unionByName(unreachable)
        .select(
            F.col("distance").cast("long"), F.col("n_nodes").cast("long")
        )
        .orderBy("distance")
    )


_EWMA_LAMBDA = 0.2


@register(
    "dq_control_chart_ewma",
    oracle=f"""
    WITH monthly AS (
      -- CAST, not *1.0: DuckDB's COUNT(*)*1.0 is DECIMAL and the
      -- fold would run in decimal arithmetic, diverging from the
      -- double-precision Spark fold
      SELECT DATE_TRUNC('month', o_orderdate) AS m,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT list(x ORDER BY m) AS xs,
             AVG(x) AS mu, STDDEV_SAMP(x) AS sigma,
             COUNT(*) AS n
      FROM monthly
    ),
    folded AS (
      -- accumulator is the growing list of EWMA values; seed is x_1
      SELECT n, mu, sigma,
             list_reduce(
               list_transform(xs, x -> [x]),
               (acc, e) -> acc ||
                 [{_EWMA_LAMBDA} * e[1]
                  + {1 - _EWMA_LAMBDA} * acc[len(acc)]]
             ) AS ew
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_periods,
           CAST(len(list_filter(ew,
                  z -> ABS(z - mu) > 3.0 * sigma
                       * SQRT({_EWMA_LAMBDA} / (2 - {_EWMA_LAMBDA}))))
                AS BIGINT) AS n_alarms,
           ROUND(list_max(list_transform(ew,
                  z -> ABS(z - mu) / (sigma
                       * SQRT({_EWMA_LAMBDA} / (2 - {_EWMA_LAMBDA}))))),
                 4) AS max_abs_z
    FROM folded
    """,
)
def dq_control_chart_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (λ=0.2, asymptotic 3σ·√(λ/(2−λ)) limits)
    over monthly order volume — the statistical-process-control
    monitor that catches small sustained drifts an individual-point
    Shewhart chart misses. Reports periods, alarm count, and the
    worst standardized excursion.

    Shape: the fact table reduces to O(months) first; the EWMA
    recurrence is a per-series sorted-array fold (same
    sequential-recurrence-as-fold pattern as `timeseries_ema` /
    `timeseries_holt_winters`, here with a growing-list accumulator
    so every intermediate EWMA is flagged against the limits). All
    post-reduce work is O(months)."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        (F.count(F.lit(1)) * 1.0).alias("x")
    )
    s = monthly.agg(
        F.array_sort(F.collect_list(F.struct("m", "x"))).alias("seq"),
        F.avg("x").alias("mu"),
        F.stddev_samp("x").alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )
    xs = F.transform(F.col("seq"), lambda e: e["x"])
    ew = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        F.array(F.element_at(xs, 1)),
        lambda acc, x: F.concat(
            acc,
            F.array(
                _EWMA_LAMBDA * x
                + (1 - _EWMA_LAMBDA) * F.element_at(acc, F.size(acc))
            ),
        ),
    )
    lim = 3.0 * F.col("sigma") * F.sqrt(
        F.lit(_EWMA_LAMBDA / (2 - _EWMA_LAMBDA))
    )
    folded = s.select("n", "mu", "sigma", ew.alias("ew"))
    return folded.select(
        F.col("n").cast("long").alias("n_periods"),
        F.size(
            F.filter(F.col("ew"), lambda z: F.abs(z - F.col("mu")) > lim)
        )
        .cast("long")
        .alias("n_alarms"),
        F.round(
            F.array_max(
                F.transform(
                    F.col("ew"),
                    lambda z: F.abs(z - F.col("mu")) / (lim / 3.0),
                )
            ),
            4,
        ).alias("max_abs_z"),
    )


@register(
    "window_alert_debounce",
    oracle="""
    WITH err AS (
      SELECT user_id, epoch_us(ts) * 1.0 AS t
      FROM events WHERE event_type = 'error'
    ),
    s AS (
      SELECT user_id, list(t ORDER BY t) AS ts_list FROM err
      GROUP BY user_id
    ),
    folded AS (
      -- accumulator [last_alert_t, n_alerts]: an error raises an
      -- alert only if >= 30 min passed since the previous ALERT (a
      -- dynamic anchor — not expressible with fixed-frame windows)
      SELECT user_id, len(ts_list) AS n_errors,
             list_reduce(
               list_transform(ts_list, t -> [t, 0.0]),
               (acc, e) -> CASE
                 WHEN e[1] - acc[1] >= 1800000000.0
                 THEN [e[1], acc[2] + 1.0]
                 ELSE [acc[1], acc[2]] END
             ) AS st
      FROM s
    )
    SELECT user_id,
           CAST(n_errors AS BIGINT) AS n_errors,
           CAST(st[2] + 1 AS BIGINT) AS n_alerts
    FROM folded
    ORDER BY user_id
    """,
)
def window_alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounced alerting over error events: the first error alerts;
    subsequent errors alert only if ≥ 30 minutes have passed since
    the PREVIOUS ALERT (not the previous event) — a dynamic-anchor
    recurrence that fixed-frame windows and gap sessionization
    cannot express, because each decision depends on the fold state.
    Per-user error and alert counts.

    Shape: filter to the error stream, one groupBy(user) collecting
    the sorted timestamp array, one JVM-side fold with [last_alert,
    n] state — O(errors-per-user) state, keys parallelize; the
    streaming twin is applyInPandasWithState with the same update."""
    ev = load_table(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select(
        "user_id", (F.unix_micros("ts") * 1.0).alias("t")
    )
    s = err.groupBy("user_id").agg(
        F.array_sort(F.collect_list("t")).alias("ts_list")
    )
    st = F.aggregate(
        F.slice(
            F.col("ts_list"), 2, F.greatest(F.size("ts_list") - 1, F.lit(0))
        ),
        F.array(F.element_at("ts_list", 1), F.lit(0.0)),
        lambda acc, t: F.when(
            t - F.element_at(acc, 1) >= 1800000000.0,
            F.array(t, F.element_at(acc, 2) + 1.0),
        ).otherwise(acc),
    )
    return s.select(
        "user_id",
        F.size("ts_list").cast("long").alias("n_errors"),
        (F.element_at(st, 2) + 1).cast("long").alias("n_alerts"),
    ).orderBy("user_id")
