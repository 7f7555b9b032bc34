"""Analytics extras, batch 37: clustering initialization, inventory
economics, causal estimation, and intermittent-demand forecasting.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* k-means++ seeding — D²-weighted center selection, the step that
  makes Lloyd's algorithm work; md5-determinized so the sampling
  itself is oracle-checked round by round.
* newsvendor quantile — the critical-fractile stocking level from
  the empirical demand distribution.
* difference-in-differences — the 2×2 causal estimator over a
  pre/post × treat/control split.
* Croston's method — the intermittent-demand forecaster (separate
  EMAs for demand size and inter-demand interval).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_KPP_K = 4


def _kpp_dist_sql(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        f" + list_dot_product({b}, {b}))"
    )


def _kpp_oracle() -> str:
    # round 1: center = vector whose md5(vec_id) hex is minimal
    # rounds 2..k: D^2-weighted pick at an md5 uniform over the
    # cumulative distance mass, ordered by vec_id
    rounds = []
    prev_sel = "s1"
    for r in range(2, _KPP_K + 1):
        rounds.append(f"""d{r} AS (
      SELECT e.vec_id,
             MIN({_kpp_dist_sql("e.x", "c.x")}) AS dmin
      FROM e JOIN e c ON c.vec_id IN (SELECT vec_id FROM {prev_sel})
      GROUP BY e.vec_id
    ),
    cum{r} AS (
      SELECT vec_id, dmin,
             SUM(dmin) OVER (ORDER BY vec_id
                             ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(dmin) OVER () AS tw
      FROM d{r}
    ),
    pick{r} AS (
      SELECT MIN(vec_id) AS vec_id FROM cum{r}
      WHERE cw >= tw * ((('0x' || substr(md5('kpp{r}'), 1, 8))::BIGINT
                         % 999983) + 0.5) / 999983.0
    ),
    s{r} AS (
      SELECT vec_id FROM {prev_sel} UNION ALL SELECT vec_id FROM pick{r}
    )""")
        prev_sel = f"s{r}"
    return f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
    ),
    s1 AS (
      SELECT vec_id FROM e
      ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 1
    ),
    {",".join(rounds)},
    final_d AS (
      SELECT e.vec_id, MIN({_kpp_dist_sql("e.x", "c.x")}) AS dmin
      FROM e JOIN e c ON c.vec_id IN (SELECT vec_id FROM s{_KPP_K})
      GROUP BY e.vec_id
    )
    SELECT CAST({_KPP_K} AS BIGINT) AS k,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_vectors,
           CAST((SELECT MIN(vec_id) FROM s1) AS BIGINT) AS seed_center,
           CAST((SELECT SUM(vec_id) FROM s{_KPP_K}) AS BIGINT)
             AS centers_id_sum,
           ROUND(AVG(dmin), 4) AS avg_d2_to_nearest
    FROM final_d
    """


@register("ml_kmeans_plusplus_seeding", oracle=_kpp_oracle())
def ml_kmeans_plusplus_seeding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means++ seeding (Arthur & Vassilvitskii 2007): the first
    center is the md5-minimal vector; each subsequent center is drawn
    with probability ∝ D² (squared distance to the nearest chosen
    center), sampled by inverting the cumulative D² mass at an
    md5-derived uniform — deterministic, so the oracle re-executes
    the SAMPLING itself round by round (a production run swaps in a
    seeded RNG; the k scans stay identical). Output: chosen-center
    fingerprint + the resulting average D² (the quantity k-means++
    provably bounds within O(log k) of optimal).

    Shape: k-1 rounds of [broadcast chosen centers → one scan
    computing per-row min distance → O(1) cumulative pick]; each
    round is one data-sized scan, no pairwise blowup — exactly how
    MLlib's kmeans|| generalizes this to oversampled parallel
    rounds."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("x"),
    ).localCheckpoint()
    n_vectors = e.count()

    def d2(a, b):
        dot = lambda p, q: F.aggregate(  # noqa: E731
            F.zip_with(p, q, lambda u, v: u * v),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return dot(a, a) - 2 * dot(a, b) + dot(b, b)

    first = (
        e.select("vec_id", F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h")
        .limit(1)
        .collect()[0]
        .vec_id
    )
    centers = [int(first)]
    from pyspark.sql.window import Window

    for r in range(2, _KPP_K + 1):
        csel = e.where(F.col("vec_id").isin(centers)).select(
            F.col("x").alias("cx")
        )
        dmin = (
            e.crossJoin(F.broadcast(csel))
            .groupBy("vec_id")
            .agg(F.min(d2(F.col("x"), F.col("cx"))).alias("dmin"))
        )
        cum = dmin.select(
            "vec_id",
            F.sum("dmin")
            .over(
                Window.orderBy("vec_id").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("cw"),
            F.sum("dmin").over(Window.partitionBy()).alias("tw"),
        )
        h = F.conv(F.substring(F.md5(F.lit(f"kpp{r}")), 1, 8), 16, 10).cast(
            "long"
        )
        uni = ((h % 999983) + 0.5) / 999983.0
        pick = (
            cum.where(F.col("cw") >= F.col("tw") * uni)
            .agg(F.min("vec_id"))
            .collect()[0][0]
        )
        centers.append(int(pick))
    csel = e.where(F.col("vec_id").isin(centers)).select(
        F.col("x").alias("cx")
    )
    final_d = (
        e.crossJoin(F.broadcast(csel))
        .groupBy("vec_id")
        .agg(F.min(d2(F.col("x"), F.col("cx"))).alias("dmin"))
    )
    return final_d.agg(
        F.lit(_KPP_K).cast("long").alias("k"),
        F.lit(n_vectors).cast("long").alias("n_vectors"),
        F.lit(centers[0]).cast("long").alias("seed_center"),
        F.lit(sum(centers)).cast("long").alias("centers_id_sum"),
        F.round(F.avg("dmin"), 4).alias("avg_d2_to_nearest"),
    )


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
    "event_diff_in_diff",
    oracle="""
    WITH split AS (
      SELECT user_id % 2 = 0 AS treated,
             ts >= (SELECT quantile_cont(epoch_us(ts), 0.5) FROM events)
               AS post,
             value
      FROM (SELECT user_id, epoch_us(ts) AS ts, value FROM events)
    ),
    cell AS (
      SELECT treated, post, AVG(value) AS m, COUNT(*) AS n
      FROM split GROUP BY treated, post
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_events,
           ROUND(MAX(CASE WHEN treated AND post THEN m END)
                 - MAX(CASE WHEN treated AND NOT post THEN m END), 6)
             AS treat_delta,
           ROUND(MAX(CASE WHEN NOT treated AND post THEN m END)
                 - MAX(CASE WHEN NOT treated AND NOT post THEN m END), 6)
             AS control_delta,
           ROUND((MAX(CASE WHEN treated AND post THEN m END)
                  - MAX(CASE WHEN treated AND NOT post THEN m END))
                 - (MAX(CASE WHEN NOT treated AND post THEN m END)
                    - MAX(CASE WHEN NOT treated AND NOT post THEN m END)),
                 6) AS did_effect
    FROM cell
    """,
)
def event_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the 2×2 causal estimator — (treated
    post − treated pre) − (control post − control pre) — over a
    deterministic treatment split (even user ids) and the median
    timestamp as the intervention point. On this fixture the true
    effect is 0 by construction, so the estimate doubles as an A/A
    validity check of the pipeline (the same property experimentation
    platforms continuously assert).

    Shape: one median pass, one 4-cell conditional aggregate — two
    scans at any scale, the parallel-trends diagnostics (per-period
    cell means) fall out of the same groupBy."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.agg(
        F.percentile(F.unix_micros("ts"), F.lit(0.5)).alias("cut")
    )
    split = ev.crossJoin(F.broadcast(med)).select(
        (F.col("user_id") % 2 == 0).alias("treated"),
        (F.unix_micros("ts") >= F.col("cut")).alias("post"),
        "value",
    )
    cell = split.groupBy("treated", "post").agg(
        F.avg("value").alias("m"), F.count(F.lit(1)).alias("n")
    )
    tp = F.max(F.when(F.col("treated") & F.col("post"), F.col("m")))
    tq = F.max(F.when(F.col("treated") & ~F.col("post"), F.col("m")))
    cp = F.max(F.when(~F.col("treated") & F.col("post"), F.col("m")))
    cq = F.max(F.when(~F.col("treated") & ~F.col("post"), F.col("m")))
    return cell.agg(
        F.sum("n").cast("long").alias("n_events"),
        F.round(tp - tq, 6).alias("treat_delta"),
        F.round(cp - cq, 6).alias("control_delta"),
        F.round((tp - tq) - (cp - cq), 6).alias("did_effect"),
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
