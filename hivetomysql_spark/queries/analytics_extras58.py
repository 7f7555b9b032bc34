"""Analytics extras, batch 58: bandit allocation, count-model
goodness of fit, and the parallel-trends check.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* Thompson allocation — P(arm is best) via md5-determinized Beta
  posterior draws per event-type arm: the allocation table a bandit
  serves from, extending `stats_bayesian_ab`'s two-arm posterior to
  the k-arm decision.
* Poisson GOF — items-per-order dispersion index and chi-square fit
  against the Poisson hypothesis: the test that says whether a
  count model (or the `stats_poisson_rate_test` machinery) applies.
* parallel trends — pre-period slope gap between treatment proxies,
  the validity check `event_diff_in_diff` silently assumes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_TS_DRAWS = 64


def _beta_draw_sql(tag: str, alpha: str, beta: str) -> str:
    """Approximate Beta(a,b) draw via the Wilson-Hilferty-style
    normal approximation: mean + z * sqrt(var), clamped to (0,1) —
    adequate for posterior-probability ESTIMATION at these counts
    (a,b in the hundreds) and exactly reproducible on both engines.
    z is Box-Muller from md5-derived uniforms."""
    u1 = (
        f"(('0x' || substr(md5({tag} || ':u1:' || d.d), 1, 8))::BIGINT + 0.5)"
        " / 4294967296.0"
    )
    u2 = (
        f"(('0x' || substr(md5({tag} || ':u2:' || d.d), 1, 8))::BIGINT + 0.5)"
        " / 4294967296.0"
    )
    a, b = alpha, beta
    mean = f"({a} * 1.0 / ({a} + {b}))"
    var = f"({a} * 1.0 * {b} / (({a} + {b}) * ({a} + {b}) * ({a} + {b} + 1)))"
    z = f"(SQRT(-2.0 * LN({u1})) * COS(2.0 * PI() * {u2}))"
    return (
        f"LEAST(GREATEST({mean} + {z} * SQRT({var}), 1e-9), 1.0 - 1e-9)"
    )


@register(
    "ml_thompson_sampling_allocation",
    oracle=f"""
    WITH arms AS (
      SELECT event_type,
             1 + SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS a,
             1 + SUM(CASE WHEN value > 50 THEN 0 ELSE 1 END) AS b,
             COUNT(*) AS n
      FROM events GROUP BY event_type
    ),
    draws AS (
      SELECT arms.event_type, arms.n, arms.a, arms.b, d.d,
             {_beta_draw_sql("arms.event_type", "arms.a", "arms.b")} AS x
      FROM arms, UNNEST(range(0, {_TS_DRAWS})) AS d(d)
    ),
    winners AS (
      SELECT d, event_type,
             ROW_NUMBER() OVER (PARTITION BY d
                                ORDER BY x DESC, event_type) AS rnk
      FROM draws
    ),
    wins AS (
      SELECT event_type, COUNT(*) AS w
      FROM winners WHERE rnk = 1 GROUP BY event_type
    )
    SELECT arms.event_type,
           CAST(arms.n AS BIGINT) AS n_obs,
           ROUND(arms.a * 1.0 / (arms.a + arms.b), 4) AS posterior_mean,
           CAST(COALESCE(wins.w, 0) AS BIGINT) AS n_wins,
           ROUND(COALESCE(wins.w, 0) * 1.0 / {_TS_DRAWS}, 4) AS allocation
    FROM arms LEFT JOIN wins ON wins.event_type = arms.event_type
    """,
)
def ml_thompson_sampling_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thompson-sampling allocation across k arms (event types, with
    'value > 50' as the success proxy): Beta(1+s, 1+f) posteriors,
    64 md5-determinized posterior draws per arm, allocation = share
    of draws where the arm wins — the table a bandit routes traffic
    from, generalizing `stats_bayesian_ab`'s pairwise P(A beats B)
    to the k-arm decision. Draws use the normal approximation to the
    Beta (counts are in the hundreds, where it is excellent) so the
    mechanism is engine-reproducible and fully oracled; production
    swaps a seeded sampler, nothing else changes.

    Shape: one conditional-aggregate scan to O(arms); the draw table
    is arms x 64 rows; argmax per draw is an O(arms) window."""
    ev = load_table(spark, sf_dir, "events")
    arms = ev.groupBy("event_type").agg(
        (1 + F.sum((F.col("value") > 50).cast("long"))).alias("a"),
        (1 + F.sum((F.col("value") <= 50).cast("long"))).alias("b"),
        F.count(F.lit(1)).alias("n"),
    )
    grid = arms.crossJoin(
        F.broadcast(spark.range(_TS_DRAWS).select(F.col("id").alias("d")))
    )

    def unif(part: str):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("event_type"),
                            F.lit(f":{part}:"),
                            F.col("d").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            + 0.5
        ) / 4294967296.0

    mean = F.col("a") * 1.0 / (F.col("a") + F.col("b"))
    var = (
        F.col("a")
        * 1.0
        * F.col("b")
        / (
            (F.col("a") + F.col("b"))
            * (F.col("a") + F.col("b"))
            * (F.col("a") + F.col("b") + 1)
        )
    )
    z = F.sqrt(-2.0 * F.log(unif("u1"))) * F.cos(
        2.0 * F.lit(float(math.pi)) * unif("u2")
    )
    x = F.least(
        F.greatest(mean + z * F.sqrt(var), F.lit(1e-9)), F.lit(1.0 - 1e-9)
    )
    draws = grid.select("event_type", "n", "a", "b", "d", x.alias("x"))
    winners = draws.select(
        "d",
        "event_type",
        F.row_number()
        .over(Window.partitionBy("d").orderBy(F.desc("x"), "event_type"))
        .alias("rnk"),
    ).where(F.col("rnk") == 1)
    wins = winners.groupBy("event_type").agg(F.count(F.lit(1)).alias("w"))
    return (
        arms.join(wins, "event_type", "left")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_obs"),
            F.round(mean, 4).alias("posterior_mean"),
            F.coalesce(F.col("w"), F.lit(0)).cast("long").alias("n_wins"),
            F.round(
                F.coalesce(F.col("w"), F.lit(0)) * 1.0 / _TS_DRAWS, 4
            ).alias("allocation"),
        )
    )


@register(
    "stats_poisson_gof",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey, COUNT(*) AS k FROM lineitem GROUP BY l_orderkey
    ),
    stats AS (
      SELECT COUNT(*) AS n, AVG(k) AS lam, VAR_SAMP(k) AS v FROM per_order
    ),
    hist AS (
      SELECT LEAST(k, 10) AS kb, COUNT(*) AS obs FROM per_order GROUP BY 1
    ),
    expected AS (
      -- Poisson pmf via exp(k ln lam - lam - ln k!) with ln k! as a
      -- literal prefix sum (k <= 9); bucket 10 takes the tail mass
      SELECT kb, obs,
             CASE WHEN kb < 10 THEN
               stats.n * EXP(kb * LN(stats.lam) - stats.lam
                 - CASE kb WHEN 0 THEN 0.0 WHEN 1 THEN 0.0
                   WHEN 2 THEN LN(2.0) WHEN 3 THEN LN(6.0)
                   WHEN 4 THEN LN(24.0) WHEN 5 THEN LN(120.0)
                   WHEN 6 THEN LN(720.0) WHEN 7 THEN LN(5040.0)
                   WHEN 8 THEN LN(40320.0) ELSE LN(362880.0) END)
             ELSE NULL END AS exp_n
      FROM hist CROSS JOIN stats
    ),
    tail AS (
      SELECT SUM(obs) AS tot_obs, SUM(exp_n) AS head_exp
      FROM expected
    ),
    fixed AS (
      SELECT e.kb, e.obs,
             COALESCE(e.exp_n, (SELECT n FROM stats) - t.head_exp) AS exp_n
      FROM expected e CROSS JOIN tail t
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM stats) AS n_orders,
           ROUND((SELECT lam FROM stats), 4) AS lambda_hat,
           ROUND((SELECT v / lam FROM stats), 4) AS dispersion_index,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           ROUND(SUM((obs - exp_n) * (obs - exp_n) / exp_n), 4)
             AS chi_square
    FROM fixed
    """,
)
def stats_poisson_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson goodness of fit for items-per-order: the dispersion
    index Var/Mean (1 under Poisson; >1 overdispersed -> negative
    binomial territory) plus a chi-square against the fitted pmf
    over buckets 0-9 with the tail pooled at 10+ — the check that
    decides whether Poisson-based machinery (rate tests, bootstrap
    weights, M/M/1-style queue math) is even applicable to this
    count distribution. The pmf is computed in closed form with
    ln k! as literals, identical on both engines.

    Shape: one fact reduce to order grain, an O(buckets) histogram,
    scalar math."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("k")
    ).localCheckpoint(eager=False)  # stats + histogram reuse it
    stats = per_order.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("k").alias("lam"),
        F.var_samp("k").alias("v"),
    )
    hist = per_order.groupBy(
        F.least(F.col("k"), F.lit(10)).alias("kb")
    ).agg(F.count(F.lit(1)).alias("obs"))
    lnfact = F.when(F.col("kb") <= 1, 0.0)
    for kk, v in [(2, 2.0), (3, 6.0), (4, 24.0), (5, 120.0), (6, 720.0),
                  (7, 5040.0), (8, 40320.0), (9, 362880.0)]:
        lnfact = lnfact.when(F.col("kb") == kk, float(math.log(v)))
    expected = hist.crossJoin(F.broadcast(stats)).select(
        "kb",
        "obs",
        F.when(
            F.col("kb") < 10,
            F.col("n")
            * F.exp(
                F.col("kb") * F.log("lam") - F.col("lam") - lnfact
            ),
        ).alias("exp_n"),
        "n",
        "lam",
        "v",
    )
    head = expected.agg(F.sum("exp_n").alias("head_exp"))
    fixed = expected.crossJoin(F.broadcast(head)).select(
        "kb",
        "obs",
        F.coalesce(
            F.col("exp_n"), F.col("n") - F.col("head_exp")
        ).alias("exp_n"),
        "n",
        "lam",
        "v",
    )
    return fixed.agg(
        F.first("n").cast("long").alias("n_orders"),
        F.round(F.first("lam"), 4).alias("lambda_hat"),
        F.round(F.first("v") / F.first("lam"), 4).alias("dispersion_index"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.round(
            F.sum(
                (F.col("obs") - F.col("exp_n"))
                * (F.col("obs") - F.col("exp_n"))
                / F.col("exp_n")
            ),
            4,
        ).alias("chi_square"),
    )


@register(
    "events_did_parallel_trends",
    oracle="""
    WITH daily AS (
      SELECT user_id % 2 = 0 AS treated,
             date_trunc('day', ts) AS d,
             COUNT(*) AS y
      FROM events
      WHERE ts < TIMESTAMP '2024-01-20'
      GROUP BY 1, 2
    ),
    idx AS (
      SELECT treated, CAST(date_diff('day', TIMESTAMP '2024-01-01', d)
                           AS DOUBLE) AS t, CAST(y AS DOUBLE) AS y
      FROM daily
    ),
    slopes AS (
      SELECT treated,
             COUNT(*) AS n,
             (SUM(t * y) - COUNT(*) * AVG(t) * AVG(y))
             / (SUM(t * t) - COUNT(*) * AVG(t) * AVG(t)) AS slope,
             (SUM(t * t) - COUNT(*) * AVG(t) * AVG(t)) AS sxx,
             VAR_SAMP(y) AS vy
      FROM idx GROUP BY treated
    )
    SELECT ROUND((SELECT slope FROM slopes WHERE treated), 4)
             AS treated_slope,
           ROUND((SELECT slope FROM slopes WHERE NOT treated), 4)
             AS control_slope,
           ROUND((SELECT slope FROM slopes WHERE treated)
                 - (SELECT slope FROM slopes WHERE NOT treated), 4)
             AS slope_gap,
           ROUND(((SELECT slope FROM slopes WHERE treated)
                  - (SELECT slope FROM slopes WHERE NOT treated))
                 / SQRT((SELECT vy / sxx FROM slopes WHERE treated)
                        + (SELECT vy / sxx FROM slopes WHERE NOT treated)),
                 4) AS approx_z
    FROM (SELECT 1)
    """,
)
def events_did_parallel_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parallel-trends validity check behind every
    difference-in-differences estimate (`event_diff_in_diff` assumes
    it silently): fit pre-period OLS trends separately for the
    treatment proxy (even user_ids) and control, and report the
    slope gap with an approximate z — a material gap here means the
    DiD identification fails BEFORE any effect estimate is read. On
    these A/A fixtures the gap correctly reads as noise.

    Shape: one reduce to (arm, day), two closed-form OLS fits over
    the reduced series, scalar assembly."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts") < F.lit("2024-01-20").cast("timestamp")
    )
    daily = ev.groupBy(
        (F.col("user_id") % 2 == 0).alias("treated"),
        F.date_trunc("day", "ts").alias("d"),
    ).agg(F.count(F.lit(1)).alias("y"))
    idx = daily.select(
        "treated",
        (
            F.unix_timestamp("d")
            - F.unix_timestamp(F.lit("2024-01-01").cast("timestamp"))
        ).cast("double").alias("secs"),
        F.col("y").cast("double").alias("y"),
    ).select("treated", (F.col("secs") / 86400.0).alias("t"), "y")
    idx = idx.localCheckpoint(eager=False)  # both arms' fits reuse it
    slopes = idx.groupBy("treated").agg(
        F.count(F.lit(1)).alias("n"),
        (
            (
                F.sum(F.col("t") * F.col("y"))
                - F.count(F.lit(1)) * F.avg("t") * F.avg("y")
            )
            / (
                F.sum(F.col("t") * F.col("t"))
                - F.count(F.lit(1)) * F.avg("t") * F.avg("t")
            )
        ).alias("slope"),
        (
            F.sum(F.col("t") * F.col("t"))
            - F.count(F.lit(1)) * F.avg("t") * F.avg("t")
        ).alias("sxx"),
        F.var_samp("y").alias("vy"),
    )
    tr = slopes.where("treated").select(
        F.col("slope").alias("ts_"), (F.col("vy") / F.col("sxx")).alias("tv")
    )
    ct = slopes.where(~F.col("treated")).select(
        F.col("slope").alias("cs_"), (F.col("vy") / F.col("sxx")).alias("cv")
    )
    j = tr.crossJoin(F.broadcast(ct))
    gap = F.col("ts_") - F.col("cs_")
    return j.select(
        F.round("ts_", 4).alias("treated_slope"),
        F.round("cs_", 4).alias("control_slope"),
        F.round(gap, 4).alias("slope_gap"),
        F.round(
            gap / F.sqrt(F.col("tv") + F.col("cv")), 4
        ).alias("approx_z"),
    )
