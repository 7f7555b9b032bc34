"""Feature-engineering / dataset-construction operators: equi-depth
histograms, deterministic mode, quantile binning, and bucketed
negative-pair mining for contrastive training sets.

Not in the reference (hiveToMysql computes nothing — HiveToMysql.java
is a copy pipeline); these extend the LLM-data-pipeline tier of
SURVEY.md §2.2 toward feature/dataset prep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "agg_equidepth_histogram",
    oracle="""
    SELECT event_type,
           list_transform(quantile_cont(value, [0.25, 0.5, 0.75]),
                          x -> ROUND(x, 4)) AS quartiles,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) histogram: the quartile boundaries of
    value per event_type, computed in ONE aggregate call with an
    array of percentiles — one per-group sort amortized across all
    cut points, instead of one pass per percentile. (At 100 TB the
    same call with approx_percentile is the sketch path; this is the
    exact baseline.)"""
    ev = load_table(spark, sf_dir, "events")
    qs = F.percentile("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return ev.groupBy("event_type").agg(
        F.transform(qs, lambda x: F.round(x, 4)).alias("quartiles"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    WITH counts AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      FROM orders
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT o_orderstatus, o_orderpriority, cnt,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY cnt DESC, o_orderpriority) AS rn
      FROM counts
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
    FROM ranked WHERE rn = 1
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: the most frequent order priority per
    status, ties broken by priority value. Built as count → top-1
    window rather than the built-in mode() because a distributed
    engine must pin tie-breaks explicitly (mode() picks an arbitrary
    tied winner, which is a silent nondeterminism under shuffle
    re-ordering). The window input is O(groups), not O(rows)."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("cnt"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "cnt",
        )
    )


@register(
    "feature_quantile_binning",
    oracle="""
    WITH bounds AS (
      SELECT quantile_cont(c_acctbal,
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
      FROM customer
    ),
    binned AS (
      SELECT c_acctbal,
             1 + CAST(LEN(list_filter(bs, b -> b < c_acctbal)) AS INT)
               AS decile
      FROM customer, bounds
    )
    SELECT decile, COUNT(*) AS n,
           ROUND(MIN(c_acctbal), 2) AS lo,
           ROUND(MAX(c_acctbal), 2) AS hi,
           ROUND(AVG(c_acctbal), 4) AS mean
    FROM binned
    GROUP BY decile
    """,
)
def feature_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretization (decile binning) of account balance —
    the feature-prep step before bucketized embeddings or monotonic
    binning.

    NOT an NTILE window: a global ORDER BY window plans as Exchange
    SinglePartition — every row through one task, the canonical
    scale killer (verified on the executed plan). Instead the nine
    decile boundaries come from ONE percentile-array aggregate
    (tiny result, broadcast), and each row bins itself by counting
    boundaries strictly below its value — scan-local, no sort
    anywhere. Equal values always share a bin (cleaner than NTILE's
    tie-splitting for features); boundary-equal values go up.
    """
    c = load_table(spark, sf_dir, "customer")
    bounds = c.agg(
        F.percentile(
            "c_acctbal", F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
        ).alias("bs")
    )
    binned = c.join(F.broadcast(bounds)).select(
        "c_acctbal",
        (
            1 + F.size(F.filter("bs", lambda b: b < F.col("c_acctbal")))
        ).alias("decile"),
    )
    return binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("c_acctbal"), 2).alias("lo"),
        F.round(F.max("c_acctbal"), 2).alias("hi"),
        F.round(F.avg("c_acctbal"), 4).alias("mean"),
    )


@register(
    "pairs_negative_mining",
    oracle="""
    WITH nb AS (
      SELECT GREATEST(1, COUNT(*) // 250) AS n_buckets FROM documents
    ),
    b AS (
      SELECT doc_id, doc_id % nb.n_buckets AS bucket FROM documents, nb
    ),
    cand AS (
      SELECT a.doc_id AS doc_id, n.doc_id AS neg_id,
             ROW_NUMBER() OVER (
               PARTITION BY a.doc_id
               ORDER BY md5(CAST(a.doc_id AS VARCHAR) || '-' ||
                            CAST(n.doc_id AS VARCHAR))
             ) AS rk
      FROM b a JOIN b n
        ON a.bucket = n.bucket AND a.doc_id <> n.doc_id
    )
    SELECT doc_id, neg_id, CAST(rk AS INT) AS rk
    FROM cand WHERE rk <= 2
    """,
)
def pairs_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-pair mining for contrastive training: 2 pseudo-random
    negatives per document, chosen by an md5 rank so the sample is
    deterministic and engine-independent (never rand(), which breaks
    retries and replays).

    The candidate join is WITHIN hash buckets, never a full cross
    join, and the bucket count scales with the corpus (one bucket per
    ~250 docs, from a metadata-only count) so per-bucket candidate
    volume stays CONSTANT as data grows — total work O(n·250),
    measured linear across sf0.001→0.1 (a fixed bucket count scaled
    4.4x per 10x). Each bucket's join is an equi-join shuffled by
    bucket; top-k per doc is a window over bucket-local candidates."""
    raw = load_table(spark, sf_dir, "documents")
    n_buckets = max(1, raw.count() // 250)
    docs = raw.select(
        "doc_id", (F.col("doc_id") % n_buckets).alias("bucket")
    )
    a = docs.alias("a")
    n = docs.alias("n")
    cand = a.join(
        n,
        (F.col("a.bucket") == F.col("n.bucket"))
        & (F.col("a.doc_id") != F.col("n.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("n.doc_id").alias("neg_id"),
    )
    rank_key = F.md5(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit("-"),
            F.col("neg_id").cast("string"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(rank_key)
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 2)
        .select("doc_id", "neg_id", "rk")
    )


_PROJ_DIM = 8
_EMB_DIM = 64


def _proj_row(j: int) -> list[int]:
    # deterministic ±1 sign matrix (sparse random projection entries)
    return [1 if ((j * 31 + k * 7) % 2) == 0 else -1 for k in range(_EMB_DIM)]


def _projection_oracle() -> str:
    cols = ",\n           ".join(
        "ROUND(list_dot_product(embedding::DOUBLE[], "
        f"[{', '.join(str(v) + '.0' for v in _proj_row(j))}]), 6) AS p{j}"
        for j in range(_PROJ_DIM)
    )
    return f"""
    SELECT vec_id,
           {cols}
    FROM embeddings
    """


@register("embedding_random_projection", oracle=_projection_oracle())
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection: 64-d embeddings down
    to 8-d with a deterministic ±1 sign matrix (Achlioptas-style —
    the matrix is a pure function of (row, col), so executors
    materialize it as literals and no matrix is broadcast or joined).

    Each output component is one zip_with·aggregate dot product in
    the scan stage — zero shuffles, and at 100 TB the projection cost
    is embarrassingly parallel map work. The standard cheap
    pre-filter before expensive exact cosine (project, bucket, refine
    within buckets).
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.transform("embedding", lambda x: x.cast("double"))
    out = [F.col("vec_id")]
    for j in range(_PROJ_DIM):
        row = F.array(*[F.lit(float(v)) for v in _proj_row(j)])
        dot = F.aggregate(
            F.zip_with(emb, row, lambda x, r: x * r),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out.append(F.round(dot, 6).alias(f"p{j}"))
    return e.select(*out)


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
               AS maxabs
      FROM embeddings
    )
    SELECT vec_id,
           ROUND(127.0 / maxabs, 6) AS scale,
           list_transform(v, x -> CAST(ROUND(x * 127.0 / maxabs) AS INT))
             AS q
    FROM s
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization: each vector scaled by
    127/max|x| and rounded — the storage/bandwidth prep before
    shipping embeddings to an ANN index (4x smaller than float32,
    dot products stay proportional within a vector). Per-row scale
    means no global pass; everything is scan-stage expression work.
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.transform("embedding", lambda x: x.cast("double"))
    d = e.select("vec_id", emb.alias("v")).select(
        "vec_id",
        "v",
        F.array_max(F.transform("v", F.abs)).alias("maxabs"),
    )
    scale = 127.0 / F.col("maxabs")
    return d.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        F.transform("v", lambda x: F.round(x * scale).cast("int")).alias("q"),
    )


@register(
    "embedding_label_centroids",
    oracle="""
    SELECT label,
           CAST(i - 1 AS INT) AS pos,
           ROUND(AVG(embedding[i]), 6) AS centroid_val
    FROM (
      SELECT label, embedding::DOUBLE[] AS embedding,
             UNNEST(generate_series(1, 64)) AS i
      FROM embeddings
    ) t
    GROUP BY label, i
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors (the class prototypes IVF training,
    nearest-centroid classification, and drift monitoring all need),
    computed relationally: posexplode to (label, dim, value) rows and
    average per cell — partial aggregation means the shuffle carries
    one partial per (label, dim) per partition, never raw vectors.
    The array column is materialized in a named projection before
    the generator (the measured recompute trap)."""
    e = load_table(spark, sf_dir, "embeddings")
    proj = e.select(
        "label", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    exploded = proj.select("label", F.posexplode("v").alias("pos", "x"))
    return exploded.groupBy("label", "pos").agg(
        F.round(F.avg("x"), 6).alias("centroid_val")
    )
