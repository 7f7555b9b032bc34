"""Similarity search over embedding columns (``array<float>``).

Two paths (SURVEY.md §2.2 "LLM-data-pipeline ops"):

* :func:`cosine_topk_bruteforce` — exact top-k: broadcast the query
  set against all candidates, cosine entirely in JVM higher-order
  functions (zip_with + aggregate), rank with a per-query window.
  Exact and embarrassingly parallel, but O(Q·N) — the baseline and
  the correctness oracle.
* :func:`lsh_cosine_topk` — random-hyperplane (sign) LSH: hash every
  vector to a bit-bucket; only same-bucket pairs are scored. At
  100 TB this turns O(Q·N) into O(Q·N/2^bits) expected, at a recall
  cost measured in tests against the brute-force path. Hyperplanes
  are derived deterministically from md5 so plans are reproducible
  across runs/engines (no RNG state on executors).

No Python UDFs in either path — all expression-level.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column | None = None,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: for each query row (``query_pred``), the k
    nearest other vectors. Returns (query_id, neighbor_id, rank,
    cosine).

    The query side is broadcast, so the candidate scan never
    shuffles; ranking shuffles only (query, candidate-score) pairs.
    """
    base = embeddings.select(
        F.col(id_col).alias("__id"), _as_double(vec_col).alias("__v")
    ).withColumn("__n", _norm("__v"))
    queries = base.where(
        query_pred if query_pred is not None else F.lit(True)
    ).select(
        F.col("__id").alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__n").alias("__qn"),
    )
    cos = _dot("__qv", "__v") / (F.col("__qn") * F.col("__n"))
    scored = (
        F.broadcast(queries)
        .crossJoin(base)
        .where(F.col("__id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("__id").alias("neighbor_id"),
            cos.alias("__cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("__cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("__cos", 6).alias("cosine"),
        )
    )


def hyperplanes(dim: int, n_planes: int, seed: str = "spark-graft") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim.

    Each coefficient is derived from md5(seed, plane, dim-index) —
    reproducible everywhere, no RNG service needed on executors.
    """
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()
            (u,) = struct.unpack("<I", h[:4])
            row.append(u / 2**31 - 1.0)  # [-1, 1)
        planes.append(row)
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit b = (v · plane_b) >= 0."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(vec_col, lit_plane) >= 0, 1).otherwise(0).cast("long")
        bucket = bucket + F.shiftleft(bit, b)
    return bucket


def lsh_cosine_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column | None = None,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k via multi-table sign-LSH.

    ``n_tables`` independent bucketings of ``n_planes`` bits each; a
    candidate is scored if it collides with the query in ANY table
    (the standard OR-construction). Recall for neighbors at angle θ is
    ``1 - (1 - (1-θ/π)^planes)^tables`` — more tables buy recall, more
    planes cut candidates. The candidate join is equi on
    (table, bucket), so at 100 TB the scan cost is
    ~N·tables/2^planes scored pairs instead of N·Q.

    Same output shape as :func:`cosine_topk_bruteforce`; recall vs the
    exact path is measured in tests/test_llm_ops.py.
    """
    all_planes = hyperplanes(dim, n_planes * n_tables)
    tables = [
        all_planes[t * n_planes : (t + 1) * n_planes] for t in range(n_tables)
    ]
    base = embeddings.select(
        F.col(id_col).alias("__id"), _as_double(vec_col).alias("__v")
    ).withColumn("__n", _norm("__v"))

    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket("__v", tables[t]).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    hashed = base.withColumn("__tb", F.explode(buckets)).select(
        "__id", "__v", "__n", "__tb.table", "__tb.bucket"
    )
    queries = hashed.where(
        query_pred if query_pred is not None else F.lit(True)
    ).select(
        F.col("__id").alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__n").alias("__qn"),
        "table",
        "bucket",
    )
    candidates = (
        F.broadcast(queries)
        .join(hashed, ["table", "bucket"])
        .where(F.col("__id") != F.col("query_id"))
        .select("query_id", "__qv", "__qn", F.col("__id").alias("neighbor_id"), "__v", "__n")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = _dot("__qv", "__v") / (F.col("__qn") * F.col("__n"))
    scored = candidates.select(
        "query_id", "neighbor_id", cos.alias("__cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round("__cos", 6).alias("cosine")
        )
    )
