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

from hivetomysql_spark.operators.parallelism import spread_for_compute
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
    base = spread_for_compute(embeddings).select(
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


def _sql_double_array(vec: list[float]) -> str:
    """A literal double array as ONE SQL fragment. Embedding a 64-dim
    plane as ``F.array(*[F.lit(x) ...])`` costs 64 py4j round trips;
    32 planes cost ~2000 — measured seconds of driver latency per
    query build. A single expr string is one round trip and one JVM
    parse. ``repr(float)`` round-trips exactly; the D suffix keeps
    the literal DoubleType."""
    return "array(" + ",".join(f"{x!r}D" for x in vec) + ")"


def lsh_bucket(vec_col: str, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit b = (v · plane_b) >= 0.

    Built as one SQL expression string (see :func:`_sql_double_array`
    — the plane matrix is driver-side constant data, not per-row
    state, so it belongs in the plan as folded literals)."""
    dot = (
        lambda arr: f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> x * y),"
        " 0.0D, (acc, x) -> acc + x)"
    )
    terms = " + ".join(
        f"shiftleft(CAST((CASE WHEN {dot(_sql_double_array(p))} >= 0.0D"
        f" THEN 1 ELSE 0 END) AS BIGINT), {b})"
        for b, p in enumerate(planes)
    )
    return F.expr(terms)


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "__v",
    out_col: str = "cell",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each row to its ``nprobe`` nearest coarse centroids.

    ``centroids`` is a small driver-side list (cell_id, vector) —
    embedded as literals so the assignment is pure JVM expression
    work: no shuffle, no UDF, and at 100 TB it runs map-side inside
    whole-stage codegen over the scan.
    """
    cents = F.expr(
        "array("
        + ",".join(
            f"named_struct('cell', {int(cid)}, 'cv', {_sql_double_array(vec)})"
            for cid, vec in centroids
        )
        + ")"
    )
    # score every centroid, keep the nprobe best (driver-bounded C,
    # so sort_array over C structs is O(C log C) per row, C small)
    scored = F.transform(
        cents,
        lambda c: F.struct(
            (-_dot(F.col(vec_col), c["cv"])).alias("negdot"),
            c["cell"].alias("cell"),
        ),
    )
    best = F.slice(F.array_sort(scored), 1, nprobe)
    return embeddings.withColumn(
        out_col, F.transform(best, lambda s: s["cell"])
    )


def ivf_cosine_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column | None = None,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) coarse
    quantizer — the standard ANN layout (FAISS IVF-Flat) re-expressed
    relationally.

    * **Train**: coarse centroids are data-drawn — the ``n_cells``
      rows with the lowest ids (deterministic; a production run would
      swap in MLlib ``KMeans`` centroids, the assignment plan below
      is identical either way).
    * **Index**: every vector is assigned map-side to its nearest
      centroid → the "inverted file" is just a DataFrame keyed by
      ``cell``; at 100 TB you'd ``repartition(cell)`` + sort within
      partitions once and reuse it across query batches.
    * **Search**: queries probe their ``nprobe`` nearest cells and
      equi-join on ``cell`` — candidates drop from N per query to
      ~N·nprobe/n_cells, and the join is broadcast (query side is
      small) so the index never shuffles.

    Recall vs :func:`cosine_topk_bruteforce` is measured in
    tests/test_llm_ops.py.
    """
    base = spread_for_compute(embeddings).select(
        F.col(id_col).alias("__id"), _as_double(vec_col).alias("__v")
    ).withColumn("__n", _norm("__v"))
    cent_rows = (
        base.orderBy("__id").limit(n_cells).select("__id", "__v").collect()
    )
    centroids = [(i, list(r["__v"])) for i, r in enumerate(cent_rows)]

    indexed = ivf_assign(base, centroids, nprobe=1).select(
        "__id", "__v", "__n", F.element_at("cell", 1).alias("cell")
    )
    queries = ivf_assign(
        base.where(query_pred if query_pred is not None else F.lit(True)),
        centroids,
        nprobe=nprobe,
    ).select(
        F.col("__id").alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__n").alias("__qn"),
        F.explode("cell").alias("cell"),
    )
    cos = _dot("__qv", "__v") / (F.col("__qn") * F.col("__n"))
    scored = (
        F.broadcast(queries)
        .join(indexed, "cell")
        .where(F.col("__id") != F.col("query_id"))
        .select("query_id", F.col("__id").alias("neighbor_id"), cos.alias("__cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round("__cos", 6).alias("cosine")
        )
    )


def ivf_cosine_topk_sweep(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column | None = None,
    k: int = 5,
    n_cells: int = 16,
    probes: tuple[int, ...] = (1, 2, 4),
) -> list[tuple[int, DataFrame]]:
    """:func:`ivf_cosine_topk` at several ``nprobe`` settings sharing
    ONE index build (r13) — the recall/latency tuning sweep.

    Per-point results are identical to independent calls because the
    ``nprobe`` prefix is exact: :func:`ivf_assign` ranks cells by
    ``slice(array_sort(...), 1, nprobe)``, so probing ``p`` cells is
    the first ``p`` entries of the max-probe assignment, the same
    dot products either way. Independent calls re-train, re-assign
    and re-scan the corpus per point (the r13 before-plan: 24 parquet
    scans / 60 exchanges for a 3-point sweep); here the centroid
    collect runs once, the inverted file materializes once
    (localCheckpoint — exactly the "build the index once, reuse it
    across query batches" layout the ivf docstring prescribes at
    100 TB), and each sweep point is one broadcast join against it.
    """
    max_p = max(probes)
    base = spread_for_compute(embeddings).select(
        F.col(id_col).alias("__id"), _as_double(vec_col).alias("__v")
    ).withColumn("__n", _norm("__v"))
    cent_rows = (
        base.orderBy("__id").limit(n_cells).select("__id", "__v").collect()
    )
    centroids = [(i, list(r["__v"])) for i, r in enumerate(cent_rows)]
    indexed = ivf_assign(base, centroids, nprobe=1).select(
        "__id", "__v", "__n", F.element_at("cell", 1).alias("cell")
    ).localCheckpoint()
    queries_all = ivf_assign(
        base.where(query_pred if query_pred is not None else F.lit(True)),
        centroids,
        nprobe=max_p,
    ).select(
        F.col("__id").alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__n").alias("__qn"),
        F.col("cell").alias("cells"),
    ).localCheckpoint()
    cos = _dot("__qv", "__v") / (F.col("__qn") * F.col("__n"))
    out: list[tuple[int, DataFrame]] = []
    for p in probes:
        queries = queries_all.select(
            "query_id",
            "__qv",
            "__qn",
            F.explode(F.slice("cells", 1, p)).alias("cell"),
        )
        scored = (
            F.broadcast(queries)
            .join(indexed, "cell")
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
        out.append(
            (
                p,
                scored.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select(
                    "query_id",
                    "neighbor_id",
                    "rank",
                    F.round("__cos", 6).alias("cosine"),
                ),
            )
        )
    return out


def embedding_cosine_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """Exact embedding near-duplicate pairs: all (a, b), a < b, with
    cosine ≥ threshold. O(N²) upper-triangle self-join — the
    correctness baseline the LSH/IVF paths are measured against; at
    100 TB the same verify step runs on LSH-bucketed candidates
    (:func:`lsh_cosine_topk`'s join) instead of the full cross
    product.
    """
    base = spread_for_compute(embeddings).select(
        F.col(id_col).alias("__id"), _as_double(vec_col).alias("__v")
    ).withColumn("__n", _norm("__v"))
    left = base.select(
        F.col("__id").alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    cos = _dot("__va", "__v") / (F.col("__na") * F.col("__n"))
    return (
        left.crossJoin(base)
        .where(F.col("id_a") < F.col("__id"))
        .select(
            "id_a",
            F.col("__id").alias("id_b"),
            cos.alias("__cos"),
        )
        .where(F.col("__cos") >= threshold)
        .select("id_a", "id_b", F.round("__cos", 4).alias("cosine"))
    )


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
    base = spread_for_compute(embeddings).select(
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
