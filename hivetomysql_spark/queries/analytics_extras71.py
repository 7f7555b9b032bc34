"""Analytics extras, batch 71: the Count-Sketch and the price-index
trio.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* Count-Sketch — the SIGNED frequency sketch (Charikar et al.):
  random-sign hashing makes collision noise cancel in expectation,
  so estimates are unbiased where count-min only over-counts;
  md5-pinned like `agg_count_min_sketch`, every cell and estimate
  oracle-verified.
* Fisher index — Laspeyres (base basket), Paasche (current basket),
  and their geometric mean: the index-number trio whose spread
  brackets substitution bias; completes batch 64's single-index
  query.
"""

from __future__ import annotations

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


_FI_BASE = 1995


@register(
    "finance_price_index_fisher",
    oracle=f"""
    WITH pq AS (
      SELECT EXTRACT(year FROM l_shipdate) AS yr, l_partkey,
             SUM(l_quantity) AS q,
             SUM(l_extendedprice) / SUM(l_quantity) AS p
      FROM lineitem
      WHERE EXTRACT(year FROM l_shipdate) BETWEEN {_FI_BASE}
            AND {_FI_BASE + 3}
      GROUP BY 1, 2
    ),
    base AS (
      SELECT l_partkey, q AS q0, p AS p0 FROM pq WHERE yr = {_FI_BASE}
    ),
    joined AS (
      SELECT pq.yr, pq.p, pq.q, base.p0, base.q0
      FROM pq JOIN base ON base.l_partkey = pq.l_partkey
    )
    SELECT CAST(yr AS INT) AS year,
           ROUND(SUM(p * q0) / SUM(p0 * q0), 6) AS laspeyres,
           ROUND(SUM(p * q) / SUM(p0 * q), 6) AS paasche,
           ROUND(SQRT((SUM(p * q0) / SUM(p0 * q0))
                      * (SUM(p * q) / SUM(p0 * q))), 6) AS fisher
    FROM joined GROUP BY yr
    """,
)
def finance_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index-number trio: Laspeyres (base-year basket, overstates
    inflation under substitution), Paasche (current basket,
    understates it), and Fisher's ideal index — their geometric mean,
    the one that satisfies the time-reversal test and the form
    national statistics agencies actually publish. The L-P spread is
    the measured substitution bias. Extends
    `finance_price_index_laspeyres` to the complete family from the
    same (year, part) reduce.

    Shape: identical to the single-index query — one fact reduce,
    one base-slice join, one O(years) rollup now carrying both
    baskets."""
    li = load_table(spark, sf_dir, "lineitem")
    pq = (
        li.where(F.year("l_shipdate").between(_FI_BASE, _FI_BASE + 3))
        .groupBy(F.year("l_shipdate").alias("yr"), "l_partkey")
        .agg(
            F.sum("l_quantity").alias("q"),
            (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p"),
        )
        .localCheckpoint(eager=False)
    )
    base = pq.where(F.col("yr") == _FI_BASE).select(
        F.col("l_partkey").alias("bpk"),
        F.col("q").alias("q0"),
        F.col("p").alias("p0"),
    )
    joined = pq.join(F.broadcast(base), F.col("l_partkey") == F.col("bpk"))
    lasp = F.sum(F.col("p") * F.col("q0")) / F.sum(F.col("p0") * F.col("q0"))
    paas = F.sum(F.col("p") * F.col("q")) / F.sum(F.col("p0") * F.col("q"))
    return joined.groupBy(F.col("yr").cast("int").alias("year")).agg(
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )
