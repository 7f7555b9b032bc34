"""Analytics extras, batch 47: image perceptual hashing, state-space
filtering, variance-homogeneity testing, and l-diversity auditing.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* perceptual hash — block-mean 64-bit image signatures over real PPM
  pixels, the image-dedup analogue of `dedup_simhash` (signatures
  feed the same banded Hamming self-join at scale).
* Kalman local-level filter — the simplest state-space model over
  the daily order series, the principled successor to the EMA/Holt
  smoothers already in the registry.
* Brown-Forsythe (robust Levene) — variance-homogeneity test, the
  gate statistic before pooled-variance tests like `stats_anova_f`.
* l-diversity — per-quasi-identifier-group distinct-sensitive-value
  audit, the release gate that `privacy_k_anonymity` alone misses
  (a k-anonymous group with one sensitive value still leaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.operators import multimodal as M
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


def _phash_oracle() -> str:
    # weight of bit j within its byte (bit 0 of the byte = MSB)
    w = ("CASE bi % 8 WHEN 0 THEN 128 WHEN 1 THEN 64 WHEN 2 THEN 32 "
         "WHEN 3 THEN 16 WHEN 4 THEN 8 WHEN 5 THEN 4 WHEN 6 THEN 2 "
         "ELSE 1 END")
    return f"""
    WITH img AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 1),
    px AS (
      SELECT doc_id, p,
             ('0x' || substr(md5('ppm:' || doc_id || ':' || (p // 16)),
                             2 * (p % 16) + 1, 2))::INT AS b
      FROM img, UNNEST(generate_series(0, 767)) AS g(p)
    ),
    luma AS (
      SELECT doc_id, p // 3 AS pix,
             SUM(CASE p % 3 WHEN 0 THEN 299 * b
                            WHEN 1 THEN 587 * b
                            ELSE 114 * b END) AS l1000
      FROM px GROUP BY 1, 2
    ),
    blocks AS (
      SELECT doc_id,
             ((pix // 16) // 2) * 8 + ((pix % 16) // 2) AS bi,
             SUM(l1000) AS bs
      FROM luma GROUP BY 1, 2
    ),
    bits AS (
      SELECT doc_id, bi,
             CASE WHEN 64 * bs > SUM(bs) OVER (PARTITION BY doc_id)
                  THEN 1 ELSE 0 END AS bit
      FROM blocks
    ),
    bytes_ AS (
      SELECT doc_id, bi // 8 AS k, CAST(SUM(bit * {w}) AS INT) AS byteval
      FROM bits GROUP BY 1, 2
    ),
    sig AS (
      SELECT doc_id,
             string_agg(
               substr('0123456789abcdef', byteval // 16 + 1, 1) ||
               substr('0123456789abcdef', byteval % 16 + 1, 1),
               '' ORDER BY k) AS phash
      FROM bytes_ GROUP BY doc_id
    ),
    pop AS (
      SELECT doc_id, CAST(SUM(bit) AS BIGINT) AS n_bright
      FROM bits GROUP BY doc_id
    )
    SELECT s.doc_id, s.phash, p.n_bright
    FROM sig s JOIN pop p ON p.doc_id = s.doc_id
    """


@register("multimodal_phash", oracle=_phash_oracle())
def multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-mean perceptual hash over REAL decoded PPM pixels: 8x8
    block luma sums, bit set iff the block outshines the image mean,
    compared entirely in integers (64*block > total — no float ever).
    The DuckDB twin re-synthesizes every md5-derived pixel byte in
    SQL and re-derives all 64 bits, so the whole decode->luma->
    block->threshold->pack path is value-verified cross-engine.

    Scale: signatures are 8 bytes/image; near-dup detection joins
    them with the banded-bucket plan of `dedup_simhash` (4x16-bit
    bands), so image payloads never shuffle — only the hashes do.
    Decode runs Arrow-batched in mapInPandas
    (operators/multimodal.py:phash_payloads)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 4 == 1
    )
    binary = M.attach_multimodal_payload(docs, "doc_id", "text")
    return M.phash_payloads(binary)


_KQ, _KR, _KP0 = 10.0, 100.0, 1000.0


@register(
    "timeseries_kalman_local_level",
    oracle=f"""
    WITH d AS (
      SELECT date_trunc('day', o_orderdate) AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM orders GROUP BY 1
    ),
    s AS (SELECT list(y ORDER BY d) AS vals FROM d),
    f AS (
      SELECT len(vals) AS n,
             list_reduce(
               list_transform(
                 vals, x -> [x, {_KP0}::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE]),
               (acc, e) -> [
                 acc[1] + ((acc[2] + {_KQ}) / (acc[2] + {_KQ} + {_KR}))
                          * (e[1] - acc[1]),
                 (1.0 - (acc[2] + {_KQ}) / (acc[2] + {_KQ} + {_KR}))
                 * (acc[2] + {_KQ}),
                 acc[3] + (e[1] - acc[1]) * (e[1] - acc[1]),
                 (acc[2] + {_KQ}) / (acc[2] + {_KQ} + {_KR})
               ]
             ) AS st
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(st[1], 4) AS level,
           ROUND(st[2], 6) AS variance,
           ROUND(st[4], 6) AS final_gain,
           ROUND(SQRT(st[3] / (n - 1)), 4) AS innovation_rms
    FROM f
    """,
)
def timeseries_kalman_local_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-level (random-walk-plus-noise) Kalman filter over the
    daily order-count series: predict P+=Q, gain K=P/(P+R), update
    x+=K*(y-x), P*=(1-K) — the minimal state-space model whose
    steady-state gain the EMA alpha only approximates. Observations
    are integer counts (exact on both engines); the recurrence is a
    per-series sorted-array fold (same pattern as `timeseries_ema` /
    `timeseries_holt_winters`) with a 4-component [x, P, sum_innov2,
    K] accumulator, written in the identical float op order as the
    DuckDB list_reduce twin so the fold matches bit for bit before
    rounding. Innovation RMS doubles as the model-fit diagnostic.

    Scale: the fact table reduces to O(days) rows first; the fold is
    one task over a ~2.5k-element array. Per-key variants (one filter
    per series) parallelize across keys; unbounded streams run the
    identical update in applyInPandasWithState."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    s = daily.agg(
        F.array_sort(F.collect_list(F.struct("d", "y"))).alias("seq")
    )
    ys = F.transform(F.col("seq"), lambda e: e["y"])
    init = F.struct(
        F.element_at(ys, 1).alias("x"),
        F.lit(_KP0).alias("p"),
        F.lit(0.0).alias("ss"),
        F.lit(0.0).alias("k"),
    )

    def step(acc, y):
        # identical inline float op order as the oracle lambda
        k = (acc["p"] + _KQ) / (acc["p"] + _KQ + _KR)
        return F.struct(
            (acc["x"] + k * (y - acc["x"])).alias("x"),
            ((F.lit(1.0) - k) * (acc["p"] + _KQ)).alias("p"),
            (acc["ss"] + (y - acc["x"]) * (y - acc["x"])).alias("ss"),
            k.alias("k"),
        )

    st = F.aggregate(
        F.slice(ys, 2, F.greatest(F.size(ys) - 1, F.lit(0))), init, step
    )
    return s.select(
        F.size(ys).cast("long").alias("n_days"),
        F.round(st["x"], 4).alias("level"),
        F.round(st["p"], 6).alias("variance"),
        F.round(st["k"], 6).alias("final_gain"),
        F.round(
            F.sqrt(st["ss"] / (F.size(ys) - F.lit(1))), 4
        ).alias("innovation_rms"),
    )


@register(
    "stats_levene_brown_forsythe",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority AS g, median(o_totalprice) AS med
      FROM orders GROUP BY 1
    ),
    z AS (
      SELECT o.o_orderpriority AS g,
             ABS(o.o_totalprice - m.med) AS z
      FROM orders o JOIN med m ON m.g = o.o_orderpriority
    ),
    grp AS (
      SELECT g, COUNT(*) AS n, SUM(z) AS sz, SUM(z * z) AS szz
      FROM z GROUP BY g
    ),
    tot AS (
      -- expanded between-group sum of squares (single-level
      -- aggregates only): sum n_j(m_j - zbar)^2
      --   = sum(sz^2/n) - (sum sz)^2 / sum n
      SELECT COUNT(*) AS k, CAST(SUM(n) AS DOUBLE) AS n_total,
             SUM(sz * sz / n) - SUM(sz) * SUM(sz) / CAST(SUM(n) AS DOUBLE)
               AS num,
             SUM(szz - sz * sz / n) AS den
      FROM grp
    )
    SELECT CAST(k AS BIGINT) AS k_groups,
           CAST(n_total AS BIGINT) AS n_total,
           CAST(k - 1 AS BIGINT) AS df1,
           CAST(n_total - k AS BIGINT) AS df2,
           ROUND(((n_total - k) * 1.0 / (k - 1)) * num / den, 4) AS w_stat
    FROM tot
    """,
)
def stats_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe robust Levene test: are order-price variances
    homogeneous across priority classes? z_ij = |x_ij - median_j|
    (group MEDIAN, not mean — the robust variant), then the one-way
    ANOVA F statistic on the z's: W = ((N-k)/(k-1)) * sum n_j(z̄_j -
    z̄)^2 / sum(z_ij - z̄_j)^2. This is the assumption gate in front
    of pooled-variance tests (`stats_anova_f` assumes what this
    tests). Two passes: group medians (one percentile aggregate),
    then sufficient statistics (n, sum z, sum z^2) per group — W
    assembles from O(k) scalars, no row ever revisited.

    Scale: medians per group are one approx/exact percentile shuffle;
    at 100 TB swap percentile for percentile_approx and the test is
    unchanged to its published robustness. Everything downstream of
    the two scans is O(groups)."""
    o = load_table(spark, sf_dir, "orders")
    med = o.groupBy(F.col("o_orderpriority").alias("g")).agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("med")
    )
    z = (
        o.join(F.broadcast(med), o.o_orderpriority == med.g)
        .select(
            "g", F.abs(F.col("o_totalprice") - F.col("med")).alias("z")
        )
    )
    grp = z.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    # expanded between-group sum of squares — single-level aggregates
    # only (Spark forbids nested aggregate expressions):
    # sum n_j(m_j - zbar)^2 = sum(sz^2/n) - (sum sz)^2 / sum n
    tot = grp.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").cast("double").alias("n_total"),
        (
            F.sum(F.col("sz") * F.col("sz") / F.col("n"))
            - F.sum("sz") * F.sum("sz") / F.sum("n").cast("double")
        ).alias("num"),
        F.sum(F.col("szz") - F.col("sz") * F.col("sz") / F.col("n")).alias(
            "den"
        ),
    )
    return tot.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("n_total").cast("long").alias("n_total"),
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("n_total") - F.col("k")).cast("long").alias("df2"),
        F.round(
            ((F.col("n_total") - F.col("k")) * F.lit(1.0) / (F.col("k") - 1))
            * F.col("num")
            / F.col("den"),
            4,
        ).alias("w_stat"),
    )


@register(
    "privacy_l_diversity",
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           c.c_mktsegment AS segment,
           COUNT(DISTINCT c.c_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o.o_orderpriority) AS l_distinct,
           COUNT(DISTINCT o.o_orderpriority) >= 3 AS meets_l3
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: for each quasi-identifier group (nation x
    market segment) count DISTINCT values of the sensitive attribute
    (order priority). A group can be k-anonymous yet carry a single
    sensitive value — homogeneity attack — which
    `privacy_k_anonymity` cannot see; this is the companion release
    gate (Machanavajjhala et al.'s distinct-l in its simplest form).

    Scale: one join on the customer key (broadcast the dimension if
    it fits, shuffle otherwise) + one groupBy with two
    count-distincts over low-cardinality groups — Spark plans
    count-distinct via expand, still one shuffle on the group key."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_orderpriority").alias("l_distinct"),
        )
        .withColumn("meets_l3", F.col("l_distinct") >= 3)
    )
