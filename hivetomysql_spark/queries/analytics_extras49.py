"""Analytics extras, batch 49: kNN classification, random-walk
sampling, DP top-k release, and image entropy.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* kNN classifier — label prediction from top-5 cosine neighbors with
  deterministic majority vote: the classifier a retrieval stack gets
  for free once similarity search exists.
* random-walk visit sampling — md5-determinized walkers over the
  co-purchase graph (the node2vec/DeepWalk corpus-generation step,
  expressed as unrolled neighbor-table joins).
* DP top-k — one-shot Gumbel-noise top-k, equivalent to peeling the
  exponential mechanism (Durfee & Rogers 2019), md5-determinized so
  the oracle verifies the mechanism itself.
* image entropy — 16-bin luma histogram entropy over real decoded
  PPM pixels, integer bins end-to-end, fully pixel-oracled.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_KNN_QUERIES = 25
_KNN_K = 5

_COS_SQL = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@register(
    "ml_knn_classifier",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS x, label FROM embeddings
    ),
    q AS (
      SELECT vec_id AS qid, x AS qx, label AS true_label
      FROM e WHERE vec_id < {_KNN_QUERIES}
    ),
    scored AS (
      SELECT q.qid, q.true_label, e.label,
             ROW_NUMBER() OVER (
               PARTITION BY q.qid
               ORDER BY {_COS_SQL.format(a="e.x", b="q.qx")} DESC, e.vec_id
             ) AS rnk
      FROM e JOIN q ON e.vec_id >= {_KNN_QUERIES}
    ),
    votes AS (
      SELECT qid, true_label, label, COUNT(*) AS v
      FROM scored WHERE rnk <= {_KNN_K}
      GROUP BY qid, true_label, label
    ),
    pred AS (
      SELECT qid, true_label, label AS pred_label, v,
             ROW_NUMBER() OVER (
               PARTITION BY qid ORDER BY v DESC, label
             ) AS pr
      FROM votes
    )
    SELECT qid AS query_id,
           CAST(true_label AS INT) AS true_label,
           CAST(pred_label AS INT) AS pred_label,
           CAST(v AS BIGINT) AS n_votes,
           true_label = pred_label AS is_correct
    FROM pred WHERE pr = 1
    """,
)
def ml_knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor classification over the embedding table:
    the first 25 vectors are queries, the rest the labeled reference
    set; each query takes the majority label of its top-5 cosine
    neighbors (ties -> more votes first, then smaller label — fully
    deterministic). The classifier every retrieval stack gets for
    free once ANN exists; the exact tier here is the oracle/verify
    path for an LSH/IVF-accelerated production tier (the candidate
    generation swaps, the vote does not).

    Shape: queries broadcast against one scan of the reference side;
    per-query ranking is a window over the scored pass; votes and
    argmax are O(queries x k). Nothing data-sized shuffles."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("x"),
        "label",
    )
    q = e.where(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("x").alias("qx"),
        F.col("label").alias("true_label"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda p, r: p * r),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cos = dot(F.col("x"), F.col("qx")) / (
        F.sqrt(dot(F.col("x"), F.col("x")))
        * F.sqrt(dot(F.col("qx"), F.col("qx")))
    )
    scored = (
        e.where(F.col("vec_id") >= _KNN_QUERIES)
        .crossJoin(F.broadcast(q))
        .select(
            "qid",
            "true_label",
            "label",
            F.row_number()
            .over(
                Window.partitionBy("qid").orderBy(F.desc(cos), "vec_id")
            )
            .alias("rnk"),
        )
        .where(F.col("rnk") <= _KNN_K)
    )
    votes = scored.groupBy("qid", "true_label", "label").agg(
        F.count(F.lit(1)).alias("v")
    )
    pred = votes.select(
        "qid",
        "true_label",
        F.col("label").alias("pred_label"),
        "v",
        F.row_number()
        .over(Window.partitionBy("qid").orderBy(F.desc("v"), "label"))
        .alias("pr"),
    ).where(F.col("pr") == 1)
    return pred.select(
        F.col("qid").alias("query_id"),
        F.col("true_label").cast("int").alias("true_label"),
        F.col("pred_label").cast("int").alias("pred_label"),
        F.col("v").cast("long").alias("n_votes"),
        (F.col("true_label") == F.col("pred_label")).alias("is_correct"),
    )


_RW_STEPS = 6
_RW_MAXPART = 200


def _rw_oracle() -> str:
    steps = []
    prev = "w0"
    for t in range(1, _RW_STEPS + 1):
        steps.append(f"""w{t} AS MATERIALIZED (
      SELECT p.walker,
             nb.nbrs[CAST(('0x' || substr(md5('rw:' || p.walker || ':' || {t}),
                                          1, 8))::BIGINT
                          % len(nb.nbrs) AS INT) + 1] AS node
      FROM {prev} p JOIN nbrs nb ON nb.u = p.node
    )""")
        prev = f"w{t}"
    visits = "\n      UNION ALL ".join(
        f"SELECT node FROM w{t}" for t in range(_RW_STEPS + 1)
    )
    return f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      FROM lineitem WHERE l_partkey < {_RW_MAXPART}
    ),
    epair AS (
      SELECT a.p AS u, b.p AS v, COUNT(*) AS nco
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    ed AS (
      SELECT u, v FROM epair
      UNION ALL SELECT v AS u, u AS v FROM epair
    ),
    nbrs AS MATERIALIZED (
      SELECT u, list(v ORDER BY v) AS nbrs FROM ed GROUP BY u
    ),
    w0 AS MATERIALIZED (
      SELECT u AS walker, u AS node FROM nbrs
    ),
    {",".join(steps)},
    allv AS ({visits})
    SELECT node AS part, CAST(COUNT(*) AS BIGINT) AS n_visits
    FROM allv GROUP BY node
    HAVING COUNT(*) >= 2
    """


@register("graph_random_walk_visits", oracle=_rw_oracle())
def graph_random_walk_visits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random walks over the support-≥2 co-purchase
    graph — the corpus-generation step of DeepWalk/node2vec: one
    walker starts at every node, takes 6 steps, and each step picks
    neighbor index md5(walker, step) mod degree from the SORTED
    neighbor list (pinned hash family, so the oracle replays every
    walk exactly). Output: per-node visit counts, the raw material
    for skip-gram windows / PPR-style proximity features.

    Shape: the neighbor-list table is one groupBy to O(nodes) rows
    of adjacency arrays; each step is one join of the O(walkers)
    frontier against it — at 100 TB walkers partition by current
    node, so a step is a co-partitioned shuffle join, never a
    broadcast of the graph. Steps are unrolled (no convergence
    probe); visit counting is one final O(walkers x steps) rollup."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_partkey") < _RW_MAXPART
    )
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
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
    )
    nbrs = ed.groupBy("u").agg(F.sort_array(F.collect_list("v")).alias("nbrs"))
    nbrs = nbrs.localCheckpoint()  # reused by all 6 steps
    frontier = nbrs.select(F.col("u").alias("walker"), F.col("u").alias("node"))
    visits = [frontier.select("node")]
    for t in range(1, _RW_STEPS + 1):
        idx = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("rw:"),
                            F.col("walker").cast("string"),
                            F.lit(f":{t}"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.size("nbrs")
        ).cast("int")
        # explicit broadcast: a localCheckpoint carries no stats, so
        # the planner otherwise assumes the adjacency table is huge
        # and shuffles BOTH sides on every step (43 exchanges for 6
        # steps). When the graph outgrows broadcast, drop the hint
        # and the same plan runs as co-partitioned shuffle joins.
        frontier = frontier.join(
            F.broadcast(nbrs), frontier["node"] == nbrs["u"]
        ).select(
            "walker",
            F.element_at("nbrs", idx + 1).alias("node"),
        )
        visits.append(frontier.select("node"))
    allv = visits[0]
    for v in visits[1:]:
        allv = allv.unionByName(v)
    return (
        allv.groupBy(F.col("node").alias("part"))
        .agg(F.count(F.lit(1)).alias("n_visits"))
        .where(F.col("n_visits") >= 2)
    )


_DPK_K = 5
_DPK_EPS = 1.0


@register(
    "privacy_dp_topk",
    oracle=f"""
    WITH counts AS (
      SELECT p_brand AS brand, COUNT(*) AS n FROM part GROUP BY 1
    ),
    noisy AS (
      -- one-shot Gumbel top-k == peeling exponential mechanism
      -- (Durfee & Rogers 2019); u from the pinned md5 family
      SELECT brand, n,
             ({_DPK_EPS} / 2.0) * n
             - LN(-LN(
                 (('0x' || substr(md5('dpk:' || brand), 1, 8))::BIGINT + 0.5)
                 / 4294967296.0
               )) AS score
      FROM counts
    ),
    ranked AS (
      SELECT brand, n, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, brand) AS rnk
      FROM noisy
    )
    SELECT CAST(rnk AS INT) AS rank, brand,
           CAST(n AS BIGINT) AS true_count,
           ROUND(score, 6) AS noisy_score
    FROM ranked WHERE rnk <= {_DPK_K}
    """,
)
def privacy_dp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially private top-k categories: add Gumbel(2/eps)
    noise to each category's count and take the k highest noisy
    scores — provably equivalent to k rounds of the exponential
    mechanism (so one scan + one O(categories) rank replaces k
    peeling passes). The Gumbel draw is the double-log inverse-CDF
    of an md5-derived uniform, so the oracle verifies the mechanism
    itself; true counts appear in the output only for the utility
    audit (a release would drop them). Completes the DP family:
    count, histogram, quantile, and now selection.

    Shape: one map-side-combined groupBy to O(categories), O(cats)
    noise + rank. Nothing else touches data."""
    p = load_table(spark, sf_dir, "part")
    counts = p.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).alias("n")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dpk:"), F.col("brand"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 4294967296.0
    score = (_DPK_EPS / 2.0) * F.col("n") - F.log(-F.log(u))
    ranked = counts.select(
        "brand", "n", score.alias("score")
    ).select(
        "brand",
        "n",
        "score",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "brand"))
        .alias("rnk"),
    )
    return ranked.where(F.col("rnk") <= _DPK_K).select(
        F.col("rnk").cast("int").alias("rank"),
        "brand",
        F.col("n").cast("long").alias("true_count"),
        F.round("score", 6).alias("noisy_score"),
    )


_IE_BINS = 16


def _image_entropy_oracle() -> str:
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
      SELECT doc_id, p // 3 AS pix_i,
             SUM(CASE p % 3 WHEN 0 THEN 299 * b
                            WHEN 1 THEN 587 * b
                            ELSE 114 * b END) AS l1000
      FROM px GROUP BY 1, 2
    ),
    binned AS (
      SELECT doc_id, CAST(l1000 // 16000 AS INT) AS bin, COUNT(*) AS c
      FROM luma GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INT) AS n_bins_used,
           ROUND(-SUM((c / 256.0) * LN(c / 256.0)) / LN(2), 6) AS entropy_bits
    FROM binned GROUP BY doc_id
    """


@register("multimodal_image_entropy", oracle=_image_entropy_oracle())
def multimodal_image_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luma-histogram entropy per image over REAL decoded PPM pixels:
    integer luma millis -> 16 equal-width bins (integer division, no
    float until the final entropy) -> Shannon entropy in bits. The
    flat/low-entropy screen an image-corpus pipeline runs before
    spending decode/caption compute on blank or synthetic-fill
    assets; the DuckDB twin re-synthesizes every pixel byte and
    recomputes the histogram, so decode->luma->bin->entropy is
    value-verified cross-engine.

    Shape: Arrow mapInPandas decode (1:N pixel fan-out stays inside
    the executor as plain Python ints), one (doc, bin) reduce, one
    per-doc rollup."""
    from hivetomysql_spark.operators import multimodal as M
    from pyspark.sql.types import (
        IntegerType,
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
            StructField("bin", IntegerType()),
            StructField("c", LongType()),
        ]
    )

    def batches(it):
        for pdf in it:
            ids, bins, cs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = M.decode_ppm(payload)
                hist: dict[int, int] = {}
                for i in range(w * h):
                    l1000 = (
                        299 * rgb[3 * i]
                        + 587 * rgb[3 * i + 1]
                        + 114 * rgb[3 * i + 2]
                    )
                    b = l1000 // 16000
                    hist[b] = hist.get(b, 0) + 1
                for b, c in hist.items():
                    ids.append(doc_id)
                    bins.append(b)
                    cs.append(c)
            yield pd.DataFrame({"doc_id": ids, "bin": bins, "c": cs})

    binned = binary.mapInPandas(batches, schema=schema)
    p = F.col("c") / 256.0
    return binned.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_bins_used"),
        F.round(
            -F.sum(p * F.log(p)) / float(math.log(2)), 6
        ).alias("entropy_bits"),
    )
