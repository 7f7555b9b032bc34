"""Analytics extras, batch 70: image edge energy and sketch-merge
proof.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* image edge energy — integer gradient magnitudes over real decoded
  PPM pixels: the blur/flat-image screen (low edge energy = no
  detail worth captioning), computed without a single float and
  pixel-verified by the oracle.
* DDSketch merge proof — shard sketches merged by bucket-sum equal
  the whole-data sketch EXACTLY (integer identity, not an
  approximation claim): the mergeability property that lets
  quantile sketches roll up across 100 TB partitions, proven the
  way `agg_variance_two_level_merge` proves moments.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


def _edge_oracle() -> str:
    pix = (
        "('0x' || substr(md5('ppm:' || doc_id || ':' || (p // 16)),"
        " 2 * (p % 16) + 1, 2))::INT"
    )
    return f"""
    WITH img AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 1),
    px AS (
      SELECT doc_id, p, {pix} AS b
      FROM img, UNNEST(generate_series(0, 767)) AS g(p)
    ),
    luma AS (
      SELECT doc_id, (p // 3) % 16 AS x, (p // 3) // 16 AS y,
             SUM(CASE p % 3 WHEN 0 THEN 299 * b
                            WHEN 1 THEN 587 * b
                            ELSE 114 * b END) AS l
      FROM px GROUP BY 1, 2, 3
    ),
    grads AS (
      SELECT c.doc_id,
             ABS(r.l - lf.l) + ABS(d.l - u.l) AS g
      FROM luma c
      JOIN luma r  ON r.doc_id = c.doc_id AND r.x = c.x + 1 AND r.y = c.y
      JOIN luma lf ON lf.doc_id = c.doc_id AND lf.x = c.x - 1 AND lf.y = c.y
      JOIN luma d  ON d.doc_id = c.doc_id AND d.x = c.x AND d.y = c.y + 1
      JOIN luma u  ON u.doc_id = c.doc_id AND u.x = c.x AND u.y = c.y - 1
      WHERE c.x BETWEEN 1 AND 14 AND c.y BETWEEN 1 AND 14
    )
    SELECT doc_id,
           CAST(SUM(g) AS BIGINT) AS edge_energy_millis,
           ROUND(SUM(g) / (196.0 * 1000.0), 4) AS mean_gradient
    FROM grads GROUP BY doc_id
    """


@register("multimodal_image_edge_energy", oracle=_edge_oracle())
def multimodal_image_edge_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge energy over REAL decoded PPM pixels: central-difference
    gradient |l(x+1)-l(x-1)| + |l(y+1)-l(y-1)| summed over the 14x14
    interior, all in integer luma millis (no float until the final
    mean) — the detail/blur screen an image-corpus pipeline runs
    before spending caption or embedding compute on flat assets
    (near-zero edge energy = synthetic fill or defocus). The DuckDB
    twin re-synthesizes every pixel and re-joins the four-neighbor
    grid, verifying decode -> luma -> gradient -> reduce end to end.

    Shape: Arrow decode per asset with executor-local gradient
    accumulation (the grid never leaves the Python worker as rows);
    O(assets) output."""
    from hivetomysql_spark.operators import multimodal as M

    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 4 == 1
    )
    binary = M.attach_multimodal_payload(docs, "doc_id", "text")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("edge_energy_millis", LongType()),
            StructField("mean_gradient", DoubleType()),
        ]
    )

    def batches(it):
        for pdf in it:
            ids, en, mg = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = M.decode_ppm(payload)
                l = [
                    299 * rgb[3 * i] + 587 * rgb[3 * i + 1] + 114 * rgb[3 * i + 2]
                    for i in range(w * h)
                ]
                total = 0
                for y in range(1, h - 1):
                    for x in range(1, w - 1):
                        gx = abs(l[y * w + x + 1] - l[y * w + x - 1])
                        gy = abs(l[(y + 1) * w + x] - l[(y - 1) * w + x])
                        total += gx + gy
                ids.append(doc_id)
                en.append(total)
                mg.append(
                    M._round_half_up(total / ((w - 2) * (h - 2) * 1000.0), 4)
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "edge_energy_millis": en,
                    "mean_gradient": mg,
                }
            )

    return binary.mapInPandas(batches, schema=schema)


_DM_GAMMA = 1.02


@register(
    "agg_ddsketch_merge_proof",
    oracle=f"""
    WITH pts AS (
      SELECT o_orderkey % 2 AS shard, o_totalprice AS x
      FROM orders WHERE o_totalprice > 0
    ),
    shard_buckets AS (
      SELECT shard, CAST(CEIL(LN(x) / LN({_DM_GAMMA})) AS BIGINT) AS b,
             COUNT(*) AS c
      FROM pts GROUP BY 1, 2
    ),
    merged AS (
      SELECT b, SUM(c) AS c FROM shard_buckets GROUP BY b
    ),
    full_ AS (
      SELECT CAST(CEIL(LN(x) / LN({_DM_GAMMA})) AS BIGINT) AS b,
             COUNT(*) AS c
      FROM pts GROUP BY 1
    ),
    cmp AS (
      SELECT COUNT(*) AS n_cells,
             SUM(CASE WHEN m.c = f.c THEN 1 ELSE 0 END) AS n_equal
      FROM merged m JOIN full_ f ON f.b = m.b
    )
    SELECT CAST((SELECT COUNT(*) FROM merged) AS BIGINT) AS n_buckets_merged,
           CAST((SELECT COUNT(*) FROM full_) AS BIGINT) AS n_buckets_full,
           CAST(cmp.n_cells AS BIGINT) AS n_cells_compared,
           cmp.n_cells = cmp.n_equal
             AND (SELECT COUNT(*) FROM merged)
                 = (SELECT COUNT(*) FROM full_) AS merge_exact
    FROM cmp
    """,
)
def agg_ddsketch_merge_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch mergeability, proven exactly: DDSketch bucket tables
    built independently on two hash shards, merged by bucket-sum,
    compared cell-by-cell against the whole-data bucket table —
    EQUAL, as integers, with no tolerance. This identity (bucket
    counts are plain sums) is WHY `agg_ddsketch_quantile_pinned`'s
    quantiles can roll up across arbitrary partitionings of 100 TB:
    shard sketches union and re-sum into the global sketch with zero
    approximation added by the merge. The companion proof to
    `agg_variance_two_level_merge` (moments) and the HLL register
    MAX-merge (`agg_hyperloglog_pinned`).

    Shape: two map-side-combined bucket reduces and an O(buckets)
    comparison join."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    lg = math.log(_DM_GAMMA)
    pts = o.select(
        (F.col("o_orderkey") % 2).alias("shard"),
        F.ceil(F.log("o_totalprice") / lg).cast("long").alias("b"),
    ).localCheckpoint(eager=False)  # shard and full reduces reuse it
    shard_buckets = pts.groupBy("shard", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    merged = shard_buckets.groupBy("b").agg(F.sum("c").alias("c"))
    full = pts.groupBy("b").agg(F.count(F.lit(1)).alias("fc"))
    cmp = merged.join(full, "b").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum((F.col("c") == F.col("fc")).cast("long")).alias("n_equal"),
    )
    nm = merged.agg(F.count(F.lit(1)).alias("nm"))
    nf = full.agg(F.count(F.lit(1)).alias("nf"))
    return (
        cmp.crossJoin(F.broadcast(nm))
        .crossJoin(F.broadcast(nf))
        .select(
            F.col("nm").cast("long").alias("n_buckets_merged"),
            F.col("nf").cast("long").alias("n_buckets_full"),
            F.col("n_cells").cast("long").alias("n_cells_compared"),
            (
                (F.col("n_cells") == F.col("n_equal"))
                & (F.col("nm") == F.col("nf"))
            ).alias("merge_exact"),
        )
    )
