"""Analytics extras, batch 62: image near-dup candidates, forecast
tournament, and share-of-parent rollups.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* pHash dedup pairs — the banded-Hamming candidate join over the
  64-bit image signatures from `multimodal_phash`: the image
  counterpart of `dedup_simhash`'s text plan, summarized so the
  result is stable on a corpus of independent images.
* backtest tournament — naive vs seasonal-naive vs EMA one-step
  forecasts raced on the same monthly series by MAPE: the
  model-selection table above the individual backtests.
* share-of-parent — each (nation, priority) cell's share of its
  nation and each nation's share of total: the hierarchical ratio
  every drill-down UI renders next to rollup counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


def _phash_sig_cte() -> str:
    # byte-weight expression for bit bi within its byte
    w = ("CASE bi % 8 WHEN 0 THEN 128 WHEN 1 THEN 64 WHEN 2 THEN 32 "
         "WHEN 3 THEN 16 WHEN 4 THEN 8 WHEN 5 THEN 4 WHEN 6 THEN 2 "
         "ELSE 1 END")
    return f"""
    img AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 1),
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
    words AS (
      -- four 16-bit band words per image (bits 0..15 per band,
      -- first bit most significant)
      SELECT doc_id, bi // 16 AS band,
             SUM(bit * ({w}) * CASE WHEN (bi % 16) < 8 THEN 256 ELSE 1 END)
               AS word
      FROM bits GROUP BY doc_id, bi // 16
    )"""


@register(
    "multimodal_phash_dedup_pairs",
    oracle=f"""
    WITH {_phash_sig_cte()},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM words a JOIN words b
        ON a.band = b.band AND a.word = b.word AND a.doc_id < b.doc_id
    ),
    sigs AS (
      SELECT doc_id, band, word FROM words
    ),
    dists AS (
      SELECT c.id_a, c.id_b,
             SUM(bit_count(CAST(xor(sa.word, sb.word) AS BIGINT))) AS hamming
      FROM cand c
      JOIN sigs sa ON sa.doc_id = c.id_a
      JOIN sigs sb ON sb.doc_id = c.id_b AND sb.band = sa.band
      GROUP BY c.id_a, c.id_b
    )
    SELECT CAST((SELECT COUNT(*) FROM img) AS BIGINT) AS n_images,
           CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST(COALESCE(SUM(CASE WHEN hamming <= 10 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_near_dups,
           CAST(MIN(hamming) AS BIGINT) AS min_hamming
    FROM dists
    """,
)
def multimodal_phash_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate CANDIDATES from the banded perceptual
    hash: each 64-bit pHash (from `multimodal_phash`'s pipeline)
    splits into four 16-bit bands; images colliding on any band pair
    up, and candidates verify by full Hamming distance — exactly
    `dedup_simhash`'s text plan applied to images (payload bytes
    never join; only 2-byte band words shuffle). The corpus here is
    independent md5-noise images, so the summary correctly reports
    (close to) zero near-dups from (close to) zero candidates —
    the selectivity that makes banding linear-cost at 100 TB.

    Shape: signatures via Arrow decode; band words one reduce; the
    candidate join touches only band-collided pairs."""
    from hivetomysql_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 4 == 1
    )
    binary = M.attach_multimodal_payload(docs, "doc_id", "text")
    # 16-bit band words straight from the hex signature: bands
    # partition the 64 bits, so total Hamming = sum of band XOR
    # popcounts — and no 64-bit parse that would overflow a signed
    # long for signatures with the high bit set
    words = M.phash_payloads(binary).select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.conv(
                            F.substring("phash", 4 * b + 1, 4), 16, 10
                        ).cast("long").alias("word"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bw"),
    ).select(
        "doc_id", F.col("bw.band").alias("band"), F.col("bw.word").alias("word")
    ).localCheckpoint(eager=False)
    a = words.select(
        F.col("doc_id").alias("id_a"), "band", F.col("word").alias("wa")
    )
    b = words.select(
        F.col("doc_id").alias("id_b"),
        F.col("band").alias("band_b"),
        F.col("word").alias("wb"),
    )
    cand = (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("wa") == F.col("wb"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    wa = words.select(
        F.col("doc_id").alias("id_a"),
        F.col("band").alias("ba"),
        F.col("word").alias("worda"),
    )
    wb = words.select(
        F.col("doc_id").alias("id_b2"),
        F.col("band").alias("bb"),
        F.col("word").alias("wordb"),
    )
    dists = (
        cand.join(F.broadcast(wa), "id_a")
        .join(
            F.broadcast(wb),
            (F.col("id_b") == F.col("id_b2")) & (F.col("bb") == F.col("ba")),
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.bit_count(F.col("worda").bitwiseXOR(F.col("wordb")))
            ).alias("hamming")
        )
    )
    n_images = binary.agg(F.count(F.lit(1)).alias("ni"))
    summary = dists.agg(
        F.count(F.lit(1)).alias("nc"),
        F.coalesce(
            F.sum((F.col("hamming") <= 10).cast("long")), F.lit(0)
        ).alias("nd"),
        F.min("hamming").alias("mh"),
    )
    return summary.crossJoin(F.broadcast(n_images)).select(
        F.col("ni").cast("long").alias("n_images"),
        F.col("nc").cast("long").alias("n_candidates"),
        F.col("nd").cast("long").alias("n_near_dups"),
        F.col("mh").cast("long").alias("min_hamming"),
    )


@register(
    "timeseries_backtest_tournament",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT y, ROW_NUMBER() OVER (ORDER BY m) AS t FROM monthly
    ),
    ema AS (
      SELECT t, y,
             -- one-step-ahead EMA forecast: fold over the strict
             -- prefix (alpha = 0.3)
             (SELECT list_reduce(list(i.y ORDER BY i.t),
                                 (acc, x) -> acc * 0.7 + x * 0.3)
              FROM idx i WHERE i.t < idx.t) AS ema_prev
      FROM idx
    ),
    joined AS (
      SELECT a.t, a.y,
             n.y AS naive_f,
             s.y AS snaive_f,
             e.ema_prev AS ema_f
      FROM idx a
      JOIN idx n ON n.t = a.t - 1
      JOIN idx s ON s.t = a.t - 12
      JOIN ema e ON e.t = a.t
      WHERE a.t >= 13
    ),
    scores AS (
      SELECT 'naive' AS method,
             AVG(ABS(y - naive_f) / y) AS mape FROM joined
      UNION ALL
      SELECT 'snaive', AVG(ABS(y - snaive_f) / y) FROM joined
      UNION ALL
      SELECT 'ema03', AVG(ABS(y - ema_f) / y) FROM joined
    )
    SELECT method,
           ROUND(mape, 6) AS mape,
           CAST(ROW_NUMBER() OVER (ORDER BY mape, method) AS INT) AS rank
    FROM scores
    """,
)
def timeseries_backtest_tournament(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-method tournament on the monthly order series: naive
    (last month), seasonal-naive (12 months back), and EMA(0.3)
    one-step-ahead forecasts raced by MAPE over the common evaluation
    window (t >= 13) — the model-selection table that sits above
    `timeseries_backtest_snaive`'s single-method report. The EMA
    forecast for month t folds over the STRICT prefix (a growing-
    array fold, same machinery as `dq_control_chart_ewma`), so no
    forecast sees its own month.

    Shape: everything runs on the O(months) reduce; the prefix folds
    are months^2 scalar ops at worst — trivial against any fact
    scan."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    idx = monthly.select(
        "y", F.row_number().over(Window.orderBy("m")).alias("t")
    ).localCheckpoint(eager=False)
    # growing-list EMA trace: element k = EMA of the first k values
    seq = idx.agg(
        F.array_sort(F.collect_list(F.struct("t", "y"))).alias("s")
    )
    ys = F.transform(F.col("s"), lambda e: e["y"])
    trace = F.aggregate(
        F.slice(ys, 2, F.greatest(F.size(ys) - 1, F.lit(0))),
        F.array(F.element_at(ys, 1)),
        lambda acc, x: F.concat(
            acc, F.array(F.element_at(acc, F.size(acc)) * 0.7 + x * 0.3)
        ),
    )
    ema = seq.select(F.posexplode(trace).alias("t0", "ema_at"))
    ema_prev = ema.select(
        (F.col("t0") + 2).alias("te"), F.col("ema_at").alias("ema_f")
    )  # trace[k] (1-based k=t0+1) is EMA through month k -> forecast for k+1
    n_ = idx.select(F.col("t").alias("tn"), F.col("y").alias("naive_f"))
    s_ = idx.select(F.col("t").alias("ts"), F.col("y").alias("snaive_f"))
    joined = (
        idx.join(n_, F.col("tn") == F.col("t") - 1)
        .join(s_, F.col("ts") == F.col("t") - 12)
        .join(F.broadcast(ema_prev), F.col("te") == F.col("t"))
        .where(F.col("t") >= 13)
    )
    scores = (
        joined.agg(
            F.lit("naive").alias("method"),
            F.avg(F.abs(F.col("y") - F.col("naive_f")) / F.col("y")).alias(
                "mape"
            ),
        )
        .unionByName(
            joined.agg(
                F.lit("snaive").alias("method"),
                F.avg(
                    F.abs(F.col("y") - F.col("snaive_f")) / F.col("y")
                ).alias("mape"),
            )
        )
        .unionByName(
            joined.agg(
                F.lit("ema03").alias("method"),
                F.avg(F.abs(F.col("y") - F.col("ema_f")) / F.col("y")).alias(
                    "mape"
                ),
            )
        )
    )
    return scores.select(
        "method",
        F.round("mape", 6).alias("mape"),
        F.row_number()
        .over(Window.orderBy("mape", "method"))
        .cast("int")
        .alias("rank"),
    )


@register(
    "agg_share_of_parent",
    oracle="""
    WITH cells AS (
      SELECT c.c_nationkey AS nationkey, o.o_orderpriority AS priority,
             COUNT(*) AS n
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT nationkey, priority,
           CAST(n AS BIGINT) AS n_orders,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY nationkey), 4)
             AS share_of_nation,
           ROUND(SUM(n) OVER (PARTITION BY nationkey) * 1.0
                 / SUM(n) OVER (), 4) AS nation_share_of_total
    FROM cells
    """,
)
def agg_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical share-of-parent: each (nation, priority) cell's
    share within its nation AND the nation's share of the grand
    total — the two ratios every drill-down UI renders beside rollup
    counts, computed as window sums over the reduced cell table (no
    second scan, no self-join; the rollup-with-ratios pattern
    `agg_rollup` alone does not give).

    Shape: one joined reduce to O(cells); both shares are window
    sums over that table."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wn = Window.partitionBy("nationkey")
    wall = Window.partitionBy()
    return cells.select(
        "nationkey",
        "priority",
        F.col("n").cast("long").alias("n_orders"),
        F.round(F.col("n") * 1.0 / F.sum("n").over(wn), 4).alias(
            "share_of_nation"
        ),
        F.round(
            F.sum("n").over(wn) * 1.0 / F.sum("n").over(wall), 4
        ).alias("nation_share_of_total"),
    )
