"""Analytics extras, batch 9: classical seasonal decomposition, DP
histograms with contribution bounding, full-batch logistic
regression, and haversine hub assignment.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's time-series / privacy / ML / geo
tiers:

* classical decomposition — centered-MA trend, day-of-week seasonal
  indexes, remainder spread (the pre-STL workhorse);
* DP histogram — per-user contribution capping (bounded sensitivity)
  before Laplace noise, the step naive DP counts miss;
* logistic regression — three full-batch gradient-descent rounds on
  sufficient statistics, every round oracled via unrolled CTEs;
* haversine hubs — great-circle nearest-hub assignment over
  deterministic pseudo-coordinates.
"""

from __future__ import annotations

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


_DP_CAP = 3


@register(
    "privacy_dp_histogram",
    oracle=f"""
    WITH capped AS (
      SELECT event_type FROM (
        SELECT event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn <= {_DP_CAP}
    ),
    g AS (
      SELECT e.event_type,
             (SELECT COUNT(*) FROM capped c
              WHERE c.event_type = e.event_type) AS capped_n,
             COUNT(*) AS true_n
      FROM events e GROUP BY e.event_type
    ),
    u AS (
      SELECT event_type, capped_n, true_n,
             ((('0x' || substr(md5('hist:' || event_type), 1, 8))::BIGINT
               % 999983) + 0.5) / 999983.0 - 0.5 AS uni
      FROM g
    )
    SELECT event_type,
           CAST(true_n AS BIGINT) AS true_count,
           CAST(capped_n AS BIGINT) AS capped_count,
           ROUND(capped_n - {_DP_CAP}.0 * sign(uni) * ln(1.0 - 2.0 * abs(uni)),
                 4) AS dp_count
    FROM u
    """,
)
def privacy_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram done right: each user's
    contribution per cell is CAPPED at 3 events first (bounding the
    L1 sensitivity a single user can have), THEN Laplace(b =
    cap/epsilon) noise is added — the contribution-bounding step that
    separates a correct user-level-DP release from naive count+noise
    (cf. Wilson et al., "Differentially Private SQL"). Noise is
    md5-derived (deterministic) so the full mechanism is
    oracle-checkable; swap the hash for a calibrated RNG to deploy.

    Shape: the cap is one per-(user,cell) ranked window (fine-grained
    keys, well-spread shuffle); the noisy release is O(cells) scalar
    math on top."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    capped = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _DP_CAP)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("capped_n"))
    )
    true_n = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_n"))
    g = true_n.join(F.broadcast(capped), "event_type")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hist:"), F.col("event_type"))), 1, 8),
        16,
        10,
    ).cast("long")
    uni = ((h % 999983) + 0.5) / 999983.0 - 0.5
    noise = -float(_DP_CAP) * F.signum(uni) * F.log(1.0 - 2.0 * F.abs(uni))
    return g.select(
        "event_type",
        F.col("true_n").cast("long").alias("true_count"),
        F.col("capped_n").cast("long").alias("capped_count"),
        F.round(F.col("capped_n") + noise, 4).alias("dp_count"),
    )


_LR_ITERS = 3
_LR_LR = 1.0


def _lr_oracle() -> str:
    # features: x0 = 1 (bias), x1 = l_quantity / 50, x2 = l_discount * 10
    # label: y = (l_returnflag = 'R')
    sql = """
    WITH pts AS (
      SELECT l_quantity / 50.0 AS x1,
             l_discount * 10.0 AS x2,
             CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
      FROM lineitem
    ),
    n AS (SELECT COUNT(*)::DOUBLE AS n FROM pts),
    it0 AS (SELECT 0.0::DOUBLE AS w0, 0.0::DOUBLE AS w1, 0.0::DOUBLE AS w2)
    """
    prev = "it0"
    for k in range(1, _LR_ITERS + 1):
        sql += f"""
    , g{k} AS (
      SELECT SUM((1.0 / (1.0 + exp(-({prev}.w0 + {prev}.w1 * x1
                                     + {prev}.w2 * x2))) - y)) AS g0,
             SUM((1.0 / (1.0 + exp(-({prev}.w0 + {prev}.w1 * x1
                                     + {prev}.w2 * x2))) - y) * x1) AS g1,
             SUM((1.0 / (1.0 + exp(-({prev}.w0 + {prev}.w1 * x1
                                     + {prev}.w2 * x2))) - y) * x2) AS g2
      FROM pts CROSS JOIN {prev}
    ),
    it{k} AS (
      SELECT {prev}.w0 - {_LR_LR} * g{k}.g0 / n.n AS w0,
             {prev}.w1 - {_LR_LR} * g{k}.g1 / n.n AS w1,
             {prev}.w2 - {_LR_LR} * g{k}.g2 / n.n AS w2
      FROM {prev} CROSS JOIN g{k} CROSS JOIN n
    )
        """
        prev = f"it{k}"
    sql += f"""
    , loss AS (
      SELECT AVG(-(y * ln(1.0 / (1.0 + exp(-({prev}.w0 + {prev}.w1 * x1
                                            + {prev}.w2 * x2))))
                   + (1.0 - y) * ln(1.0 - 1.0 / (1.0 + exp(-({prev}.w0
                       + {prev}.w1 * x1 + {prev}.w2 * x2)))))) AS ll
      FROM pts CROSS JOIN {prev}
    )
    SELECT CAST(n.n AS BIGINT) AS n_points,
           ROUND({prev}.w0, 5) AS w0,
           ROUND({prev}.w1, 5) AS w1,
           ROUND({prev}.w2, 5) AS w2,
           ROUND(loss.ll, 5) AS log_loss
    FROM {prev} CROSS JOIN loss CROSS JOIN n
    """
    return sql


@register("ml_logistic_regression_gd", oracle=_lr_oracle())
def ml_logistic_regression_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch logistic regression by gradient descent: three
    rounds of w <- w - lr * (1/n) X^T(sigmoid(Xw) - y) predicting
    returned lines from quantity and discount. Each round is ONE
    aggregate over the fact table producing 3 gradient sums; the
    weight vector is O(features) driver state broadcast into the next
    round — the exact shape MLlib's LogisticRegression runs per
    iteration (treeAggregate of per-partition gradient partials).

    Oracled end-to-end: the DuckDB side unrolls all three
    matrix-free rounds plus the final log-loss as chained CTEs over
    the same sigmoid algebra, so the optimizer math — not just the
    data prep — is verified."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        (F.col("l_quantity") / 50.0).alias("x1"),
        (F.col("l_discount") * 10.0).alias("x2"),
        F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias("y"),
    )
    pts = pts.localCheckpoint()  # scanned once per round: cut lineage
    n = pts.count()
    w = [0.0, 0.0, 0.0]
    for _ in range(_LR_ITERS):
        z = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
        resid = 1.0 / (1.0 + F.exp(-z)) - F.col("y")
        g = pts.agg(
            F.sum(resid).alias("g0"),
            F.sum(resid * F.col("x1")).alias("g1"),
            F.sum(resid * F.col("x2")).alias("g2"),
        ).collect()[0]
        w = [
            w[0] - _LR_LR * g["g0"] / n,
            w[1] - _LR_LR * g["g1"] / n,
            w[2] - _LR_LR * g["g2"] / n,
        ]
    zf = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
    p = 1.0 / (1.0 + F.exp(-zf))
    ll = pts.agg(
        F.avg(-(F.col("y") * F.log(p) + (1.0 - F.col("y")) * F.log(1.0 - p))).alias(
            "ll"
        )
    ).collect()[0]["ll"]
    return spark.range(1).select(
        F.lit(n).cast("long").alias("n_points"),
        F.round(F.lit(w[0]), 5).alias("w0"),
        F.round(F.lit(w[1]), 5).alias("w1"),
        F.round(F.lit(w[2]), 5).alias("w2"),
        F.round(F.lit(ll), 5).alias("log_loss"),
    )


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
