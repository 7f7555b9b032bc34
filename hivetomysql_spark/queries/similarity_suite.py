"""Embedding similarity / ANN suite.

Folded from the round-build batch modules (analytics_extras*): every
query whose name matches this domain moved here verbatim together
with its batch-local helpers, so related operators read side by side.
Section banners record the source batch; helpers shared across
domains were duplicated module-private; colliding private names carry
a _b<batch> suffix.
"""

from __future__ import annotations



# ========================================================================
# from analytics_extras.py — original batch rationale:
# Analytics extras: robust statistics, customer segmentation,
# sequential recurrences, pinned-hash sketches, containment dedup, and
# one-pass centroid assignment.
#
# Not in the reference (hiveToMysql computes nothing — the single class
# `HiveToMysql.java:1-641` only copies rows); these widen the extension
# tiers of SURVEY.md §2.2 with operator shapes a production analytics /
# training-data stack runs daily:
#
# * MAD outlier flags — the robust anomaly screen (3·1.4826·MAD rule);
# * RFM segmentation — the classic marketing cohort cut;
# * per-key EMA — a *sequential recurrence*, the one aggregation class
#   a parallel engine cannot express as a commutative fold;
# * count-min sketch — with the hash family pinned to md5 so the sketch
#   itself (not just its contract) is oracle-checkable in DuckDB;
# * n-gram containment — the asymmetric near-dup signal for
#   quoted/sub-document duplication (Jaccard misses short-inside-long);
# * k-means assignment — the map-side step of Lloyd's / IVF coarse
#   quantization, as one broadcast join.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.operators import dedup as D
from hivetomysql_spark.operators import powerpca
from hivetomysql_spark.operators.similarity import _as_double, _dot, _norm
from hivetomysql_spark.queries import register
from hivetomysql_spark.queries.llm import _SHINGLES_CTE
from hivetomysql_spark.operators.parallelism import spread_for_compute
from hivetomysql_spark.tables import load_table



@register(
    "embedding_kmeans_assign",
    oracle="""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
      SELECT e.vec_id, c.cid,
             list_dot_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[])
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.cvec::DOUBLE[], c.cvec::DOUBLE[]))) AS cos,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[])
                          / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                             * sqrt(list_dot_product(c.cvec::DOUBLE[], c.cvec::DOUBLE[]))) DESC,
                        c.cid
             ) AS rn
      FROM embeddings e CROSS JOIN cents c
    )
    SELECT cid,
           COUNT(*) AS n_members,
           ROUND(AVG(cos), 4) AS avg_cosine,
           MIN(vec_id) AS min_member
    FROM scored WHERE rn = 1
    GROUP BY cid
    """,
)
def embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd's-iteration assignment step: every vector scores the 8
    seeded centroids (vec_id < 8) in-row and takes its arg-max cosine
    centroid (cid tie-break), and per-cluster membership stats come
    back in one aggregate. This is exactly the map-side shape of
    distributed k-means AND of IVF coarse quantization: centroids are
    O(k·dim) broadcast state, the corpus is scanned once, and the only
    shuffle carries O(k) partial aggregates.

    The argmax runs over a packed centroid array
    (operators/packed.py): ``array_max`` over (cos, -cid) structs IS
    the ``row_number() OVER (ORDER BY cos DESC, cid) = 1`` winner —
    the r13 rewrite that dropped the N×k-row window exchange the
    crossJoin + window form paid per assignment (the shuffle this
    docstring always claimed to avoid)."""
    from hivetomysql_spark.operators.packed import attach_packed, pack_structs

    emb = spread_for_compute(load_table(spark, sf_dir, "embeddings"))
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    e = emb.select("vec_id", _as_double("embedding").alias("v")).withColumn(
        "nv", _norm("v")
    )
    c = cents.select("cid", _as_double("cvec").alias("cv")).withColumn(
        "nc", _norm("cv")
    )
    j = attach_packed(e, pack_structs(c, "cid", "cv", "nc"))
    scored = F.transform(
        F.col("cs"),
        lambda ct: F.struct(
            (_dot(F.col("v"), ct["cv"]) / (F.col("nv") * ct["nc"])).alias(
                "cos"
            ),
            (-ct["cid"]).alias("ncid"),
        ),
    )
    # b referenced twice below — CollapseProject keeps multi-referenced
    # aliases un-inlined, so the k-way scoring runs once per row
    best = j.select("vec_id", F.array_max(scored).alias("b"))
    assigned = best.select(
        "vec_id",
        (-F.col("b.ncid")).alias("cid"),
        F.col("b.cos").alias("cos"),
    )
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("cos"), 4).alias("avg_cosine"),
        F.min("vec_id").alias("min_member"),
    )



@register(
    "sample_diverse_per_cluster",
    oracle="""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
      SELECT e.vec_id, c.cid,
             list_dot_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[])
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.cvec::DOUBLE[], c.cvec::DOUBLE[]))) AS cos,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[])
                          / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                             * sqrt(list_dot_product(c.cvec::DOUBLE[], c.cvec::DOUBLE[]))) DESC,
                        c.cid
             ) AS rn
      FROM embeddings e CROSS JOIN cents c
    ),
    assigned AS (SELECT vec_id, cid, cos FROM scored WHERE rn = 1)
    SELECT cid, vec_id, CAST(pick AS INT) AS pick, ROUND(cos, 4) AS cosine
    FROM (
      SELECT cid, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY cid ORDER BY cos DESC, vec_id)
               AS pick
      FROM assigned
    )
    WHERE pick <= 2
    """,
)
def sample_diverse_per_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-capped sampling in embedding space: assign every
    vector to its nearest seed centroid (the embedding_kmeans_assign
    step), then keep the top-2 most-central members per cluster — a
    deterministic coreset whose size is O(k), not O(corpus). This is
    the training-mix shape that prevents one dense semantic region
    from dominating a sample: the cap is per-cluster, so coverage is
    spread across all k regions. Per-cluster top-k is a bounded
    window (k clusters × small k'), never a global sort.

    The assignment argmax runs in-row over a packed centroid array
    (operators/packed.py, r13 — the same rewrite as
    embedding_kmeans_assign): no N×k window exchange; the only
    shuffle left is the per-cluster top-2 window, which
    WindowGroupLimit bounds at 2 rows per map partition per cid."""
    from hivetomysql_spark.operators.packed import attach_packed, pack_structs

    emb = spread_for_compute(load_table(spark, sf_dir, "embeddings"))
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    e = emb.select("vec_id", _as_double("embedding").alias("v")).withColumn(
        "nv", _norm("v")
    )
    c = cents.select("cid", _as_double("cvec").alias("cv")).withColumn(
        "nc", _norm("cv")
    )
    j = attach_packed(e, pack_structs(c, "cid", "cv", "nc"))
    scored_arr = F.transform(
        F.col("cs"),
        lambda ct: F.struct(
            (_dot(F.col("v"), ct["cv"]) / (F.col("nv") * ct["nc"])).alias(
                "cos"
            ),
            (-ct["cid"]).alias("ncid"),
        ),
    )
    # b referenced twice below — CollapseProject keeps multi-referenced
    # aliases un-inlined, so the k-way scoring runs once per row
    assigned = j.select(
        "vec_id", F.array_max(scored_arr).alias("b")
    ).select(
        "vec_id",
        (-F.col("b.ncid")).alias("cid"),
        F.col("b.cos").alias("cos"),
    )
    w_pick = Window.partitionBy("cid").orderBy(F.desc("cos"), "vec_id")
    return (
        assigned.withColumn("pick", F.row_number().over(w_pick))
        .where(F.col("pick") <= 2)
        .select("cid", "vec_id", "pick", F.round("cos", 4).alias("cosine"))
    )


# ========================================================================
# from analytics_extras7.py — original batch rationale:
# Analytics extras, batch 7: LLM-corpus curation and embedding
# infrastructure — weighted reservoir sampling, a staged quality
# funnel, tokenizer vocabulary coverage, product quantization, and
# PCA by power iteration.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's training-data / embedding tiers:
#
# * importance sampling — Efraimidis-Spirakis exponential-key weighted
#   reservoir, the one-pass mergeable way to draw a weighted sample;
# * quality funnel — Gopher-style staged document filters with
#   per-stage survivor accounting;
# * vocab coverage — top-K corpus vocabulary + per-source OOV rates,
#   the tokenizer-fit diagnostic;
# * product quantization — 2x32-dim subspace codebook assignment with
#   quantization-error accounting, the ANN index building block;
# * PCA power iteration — dominant covariance eigenvector via three
#   matrix-free broadcast-vector passes.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_PQ_M = 4  # centroids per subspace (taken from vec_id 0..3)


_PQ_HALF = 32


def _pq_dist_sql(xs: str, cs: str) -> str:
    """L2^2 via the dot-product identity, identical algebra on both
    engines: x.x - 2 x.c + c.c."""
    return (
        f"(list_dot_product({xs}, {xs}) - 2 * list_dot_product({xs}, {cs})"
        f" + list_dot_product({cs}, {cs}))"
    )



@register(
    "embedding_pq_codebook",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS cid,
             x[1:{_PQ_HALF}] AS c1,
             x[{_PQ_HALF + 1}:{2 * _PQ_HALF}] AS c2
      FROM e WHERE vec_id < {_PQ_M}
    ),
    scored AS (
      SELECT e.vec_id, c.cid,
             {_pq_dist_sql(f"e.x[1:{_PQ_HALF}]", "c.c1")} AS d1,
             {_pq_dist_sql(f"e.x[{_PQ_HALF + 1}:{2 * _PQ_HALF}]", "c.c2")} AS d2
      FROM e CROSS JOIN cents c
    ),
    best AS (
      SELECT vec_id,
             MIN(struct_pack(d := d1, c := cid)) AS b1,
             MIN(struct_pack(d := d2, c := cid)) AS b2
      FROM scored GROUP BY vec_id
    )
    SELECT b1.c AS code1, b2.c AS code2,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(AVG(b1.d + b2.d), 4) AS avg_quant_err
    FROM best GROUP BY b1.c, b2.c
    """,
)
def embedding_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: the 64-dim embedding splits into two
    32-dim subspaces, each assigned independently to its nearest of 4
    codebook centroids (vectors 0..3, deterministic stand-ins for
    trained centroids) — the cell (code1, code2) is the PQ code, and
    avg quantization error per cell is the index-quality metric. PQ
    is how billion-scale ANN indexes compress vectors (Jegou et al.,
    TPAMI'11): distances to 2x4 centroids replace 64-dim math.

    Shape: the codebook (M x K rows) broadcasts; assignment is a
    map-side cross join + per-vector argmin (pinned tie-break on
    centroid id), so the embedding table is scanned once and never
    shuffled until the O(K^2)-cell rollup."""
    e = spread_for_compute(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    half = _PQ_HALF
    cents = (
        e.where(F.col("vec_id") < _PQ_M)
        .select(
            F.col("vec_id").alias("cid"),
            F.slice("x", 1, half).alias("c1"),
            F.slice("x", half + 1, half).alias("c2"),
        )
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
        )

    def d2(xs, cs):
        return dot(xs, xs) - 2 * dot(xs, cs) + dot(cs, cs)

    x1 = F.slice(F.col("x"), 1, half)
    x2 = F.slice(F.col("x"), half + 1, half)
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cid",
        d2(x1, F.col("c1")).alias("d1"),
        d2(x2, F.col("c2")).alias("d2"),
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("d1", "cid")).alias("b1"),
        F.min(F.struct("d2", "cid")).alias("b2"),
    )
    return (
        best.select(
            F.col("b1.cid").alias("code1"),
            F.col("b2.cid").alias("code2"),
            (F.col("b1.d1") + F.col("b2.d2")).alias("err"),
        )
        .groupBy("code1", "code2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.round(F.avg("err"), 4).alias("avg_quant_err"),
        )
    )


_PCA_DIM = 64


_PCA_ITERS = 3

# Test hook (tests/test_pca_dispatch.py): True forces both PCA power-
# iteration queries onto the distributed per-round loop regardless of
# the operators/powerpca.py matrix bound.
_PCA_FORCE_DISTRIBUTED = False


def _pca_oracle() -> str:
    v0 = "[" + ", ".join(["0.125"] * _PCA_DIM) + "]::DOUBLE[]"
    sql = f"""
    WITH e AS (
      SELECT embedding::DOUBLE[] AS x FROM embeddings
    ),
    dims AS (SELECT i FROM generate_series(1, {_PCA_DIM}) t(i)),
    mu AS (
      SELECT list(m ORDER BY i) AS mu FROM (
        SELECT i, AVG(x[i]) AS m FROM e, dims GROUP BY i
      )
    ),
    v0 AS (SELECT {v0} AS v)
    """
    prev = "v0"
    for it in range(1, _PCA_ITERS + 1):
        sql += f"""
    , dots{it} AS (
      SELECT x,
             list_dot_product(x, v) - list_dot_product(mu, v) AS d
      FROM e CROSS JOIN {prev} CROSS JOIN mu
    ),
    s{it} AS (
      SELECT i, SUM(x[i] * d) - MIN(mu[i]) * SUM(d) AS s
      FROM dots{it} CROSS JOIN mu, dims GROUP BY i
    ),
    n{it} AS (SELECT sqrt(SUM(s * s)) AS nrm FROM s{it}),
    v{it} AS (
      SELECT list(s / nrm ORDER BY i) AS v
      FROM s{it} CROSS JOIN n{it}
    )
        """
        prev = f"v{it}"
    last = _PCA_ITERS
    sql += f"""
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_vectors,
           ROUND(nrm / ((SELECT COUNT(*) FROM e) - 1), 3) AS lambda_1,
           ROUND(v[1], 4) AS v_1,
           ROUND(v[2], 4) AS v_2,
           ROUND(v[3], 4) AS v_3,
           ROUND(v[4], 4) AS v_4
    FROM v{last} CROSS JOIN n{last}
    """
    return sql



@register("embedding_pca_power_iteration", oracle=_pca_oracle())
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component of the embedding cloud by
    matrix-free power iteration: v <- normalize(sum_rows (x-mu)
    ((x-mu)·v)), three fixed rounds from the uniform start vector.
    Never materializes the 64x64 covariance — each round is one scan
    computing a per-row scalar projection plus a 64-bucket
    sum-by-index, with the current v broadcast as a literal (the
    collect between rounds moves 64 doubles, the PageRank-loop
    pattern). lambda_1 = |Cv|/(n-1) is the top explained variance.

    Scale: rounds are O(scan) each with O(dim) driver state —
    the textbook large-scale PCA when dim is small and rows are
    billions. Deterministic: fixed start, fixed round count, both
    engines share the s_i = SUM(x_i d) - mu_i SUM(d) algebra.

    Measured dispatch (operators/powerpca.py, r13): each round builds
    a FRESH plan (the current v rides in as literals), so at bench
    scale the loop cost is per-round analysis + codegen + scheduling,
    not data. When the matrix fits the driver bound the fixed rounds
    replay in NumPy off one Arrow collect — same algebra, same
    starts; both arms meet at the ROUND output contract, and the
    driver-vs-loop gate pins row equality at three SFs. Larger
    corpora take the distributed loop below unchanged."""
    e = spread_for_compute(load_table(spark, sf_dir, "embeddings")).select(
        F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    e = e.localCheckpoint()  # reused by every round: cut re-scan lineage
    dim = _PCA_DIM
    n = e.count()
    if not _PCA_FORCE_DISTRIBUTED and powerpca.matrix_fits(n, dim):
        _, wv, nrm = powerpca.power_top(powerpca.collect_matrix(e), _PCA_ITERS)
        v = [float(c) for c in wv]
        nrm = float(nrm)
    else:
        mu_rows = (
            e.select(F.posexplode("x").alias("i", "val"))
            .groupBy("i")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        mu = [0.0] * dim
        for r in mu_rows:
            mu[r["i"]] = r["m"]
        v = [1.0 / 8.0] * dim
        for _ in range(_PCA_ITERS):
            mudotv = sum(m * vi for m, vi in zip(mu, v))
            vlit = F.array(*[F.lit(c) for c in v])
            dots = e.select(
                "x",
                (
                    F.aggregate(
                        F.zip_with(F.col("x"), vlit, lambda p, q: p * q),
                        F.lit(0.0),
                        lambda acc, z: acc + z,
                    )
                    - F.lit(mudotv)
                ).alias("d"),
            )
            sums = (
                dots.select(F.posexplode("x").alias("i", "val"), "d")
                .groupBy("i")
                .agg(
                    F.sum(F.col("val") * F.col("d")).alias("sx"),
                    F.sum("d").alias("sd"),
                )
                .collect()
            )
            s = [0.0] * dim
            for r in sums:
                s[r["i"]] = r["sx"] - mu[r["i"]] * r["sd"]
            nrm = sum(si * si for si in s) ** 0.5
            v = [si / nrm for si in s]
    lam = nrm / (n - 1)
    return spark.range(1).select(
        F.lit(n).cast("long").alias("n_vectors"),
        F.round(F.lit(lam), 3).alias("lambda_1"),
        F.round(F.lit(v[0]), 4).alias("v_1"),
        F.round(F.lit(v[1]), 4).alias("v_2"),
        F.round(F.lit(v[2]), 4).alias("v_3"),
        F.round(F.lit(v[3]), 4).alias("v_4"),
    )


# ========================================================================
# from analytics_extras10.py — original batch rationale:
# Analytics extras, batch 10: retrieval end-to-end, embedding
# compression trade-offs, volume anomaly alerts, and cohort LTV.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's similarity-search / embedding /
# data-quality / finance tiers:
#
# * semantic search e2e — query vector -> cosine top-k -> metadata
#   join, the full retrieval path in one plan;
# * Matryoshka truncation — recall@10 of prefix-16-dim cosine against
#   full 64-dim ranking (the MRL trade-off, measured);
# * binary quantization — sign-bit signatures + Hamming ranking vs
#   exact cosine, recall@10 per query;
# * volume spike — trailing-window z-score day alerts;
# * cohort LTV — first-order cohorts x age, cumulative spend per
#   customer (the retention-triangle economics view).
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
    )


_COS_SQL = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)



@register(
    "similarity_semantic_search_e2e",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    q AS (SELECT x AS qx FROM e WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id,
             {_COS_SQL.format(a="e.x", b="q.qx")} AS cos
      FROM e CROSS JOIN q WHERE e.vec_id <> 0
    ),
    ranked AS (
      SELECT vec_id, cos,
             ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS rank
      FROM scored
    )
    SELECT CAST(r.rank AS INT) AS rank,
           r.vec_id AS doc_id,
           ROUND(r.cos, 4) AS cosine,
           d.lang, d.source
    FROM ranked r JOIN documents d ON d.doc_id = r.vec_id
    WHERE r.rank <= 10
    """,
)
def similarity_semantic_search_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete semantic-search path in one plan: take document
    0's embedding as the query, rank every other vector by cosine,
    keep the top 10, and join back to the documents table for the
    human-facing metadata — retrieval as a user would ship it, not
    just the distance kernel.

    Shape: the query vector is one broadcast row; scoring is a
    map-side pass over the embedding table; top-k compiles to
    TakeOrderedAndProject (per-partition heaps, k-row driver merge —
    no global sort); only the 10 survivors hit the metadata join,
    which broadcasts them against documents. At 100 TB the scan
    dominates and nothing else grows."""
    e = spread_for_compute(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    q = e.where(F.col("vec_id") == 0).select(F.col("x").alias("qx"))
    cos = _dot(F.col("x"), F.col("qx")) / (
        F.sqrt(_dot(F.col("x"), F.col("x"))) * F.sqrt(_dot(F.col("qx"), F.col("qx")))
    )
    scored = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cos.alias("cos"))
    )
    ranked = scored.select(
        "vec_id",
        "cos",
        F.row_number().over(Window.orderBy(F.desc("cos"), "vec_id")).alias("rank"),
    ).where(F.col("rank") <= 10)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return (
        F.broadcast(ranked)
        .join(docs, ranked["vec_id"] == docs["doc_id"])
        .select(
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            F.round("cos", 4).alias("cosine"),
            "lang",
            "source",
        )
    )


_MRL_PREFIX = 16


_MRL_QUERIES = 20



@register(
    "embedding_matryoshka_truncation",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    q AS (SELECT vec_id AS qid, x AS qx FROM e WHERE vec_id < {_MRL_QUERIES}),
    full_rank AS (
      SELECT q.qid, e.vec_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.qid
               ORDER BY {_COS_SQL.format(a="e.x", b="q.qx")} DESC, e.vec_id
             ) AS rank
      FROM e JOIN q ON e.vec_id <> q.qid
    ),
    pre_rank AS (
      SELECT q.qid, e.vec_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.qid
               ORDER BY {_COS_SQL.format(a=f"e.x[1:{_MRL_PREFIX}]",
                                         b=f"q.qx[1:{_MRL_PREFIX}]")} DESC,
                        e.vec_id
             ) AS rank
      FROM e JOIN q ON e.vec_id <> q.qid
    )
    SELECT f.qid AS query_id,
           CAST(COUNT(p.vec_id) AS BIGINT) AS n_common,
           ROUND(COUNT(p.vec_id) / 10.0, 2) AS recall_at_10
    FROM (SELECT * FROM full_rank WHERE rank <= 10) f
    LEFT JOIN (SELECT * FROM pre_rank WHERE rank <= 10) p
      ON p.qid = f.qid AND p.vec_id = f.vec_id
    GROUP BY f.qid
    """,
)
def embedding_matryoshka_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation trade-off, measured: for each of
    20 query vectors, rank neighbors by full 64-dim cosine and by
    prefix-16-dim cosine, then report recall@10 of the truncated
    ranking against the full one — the number that tells you whether
    a 4x cheaper index is safe (cf. Kusupati et al., MRL).

    Shape: queries broadcast (tiny side), both rankings are per-query
    windows over one scored pass each; the recall join touches only
    the 2x10xQ survivors. At scale this is exactly how you'd A/B an
    index compression before rebuilding it."""
    e = spread_for_compute(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    q = e.where(F.col("vec_id") < _MRL_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("x").alias("qx")
    )
    j = e.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("qid"))

    def cos(a, b):
        return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))

    w = Window.partitionBy("qid")
    full10 = (
        j.select(
            "qid",
            "vec_id",
            F.row_number()
            .over(w.orderBy(F.desc(cos(F.col("x"), F.col("qx"))), "vec_id"))
            .alias("rank"),
        )
        .where(F.col("rank") <= 10)
    )
    xp = F.slice(F.col("x"), 1, _MRL_PREFIX)
    qp = F.slice(F.col("qx"), 1, _MRL_PREFIX)
    pre10 = (
        j.select(
            "qid",
            "vec_id",
            F.row_number()
            .over(w.orderBy(F.desc(cos(xp, qp)), "vec_id"))
            .alias("rank"),
        )
        .where(F.col("rank") <= 10)
        .select(F.col("qid").alias("pqid"), F.col("vec_id").alias("pvid"))
    )
    joined = full10.join(
        pre10,
        (F.col("pqid") == F.col("qid")) & (F.col("pvid") == F.col("vec_id")),
        "left",
    )
    return joined.groupBy(F.col("qid").alias("query_id")).agg(
        F.count("pvid").cast("long").alias("n_common"),
        F.round(F.count("pvid") / 10.0, 2).alias("recall_at_10"),
    )


def _sign_bits_sql(x: str, lo: int) -> str:
    """SQL for a 32-bit sign signature of dims [lo, lo+31] (1-based)."""
    return (
        "("
        + " + ".join(
            f"(CASE WHEN {x}[{lo + i}] > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(32)
        )
        + ")::BIGINT"
    )



@register(
    "embedding_binary_quantization",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS x,
             {_sign_bits_sql("(embedding::DOUBLE[])", 1)} AS h1,
             {_sign_bits_sql("(embedding::DOUBLE[])", 33)} AS h2
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, x AS qx, h1 AS qh1, h2 AS qh2
          FROM e WHERE vec_id < {_MRL_QUERIES}),
    ham_rank AS (
      SELECT q.qid, e.vec_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.qid
               ORDER BY bit_count(xor(e.h1, q.qh1))
                        + bit_count(xor(e.h2, q.qh2)), e.vec_id
             ) AS rank,
             bit_count(xor(e.h1, q.qh1)) + bit_count(xor(e.h2, q.qh2)) AS ham
      FROM e JOIN q ON e.vec_id <> q.qid
    ),
    cos_rank AS (
      SELECT q.qid, e.vec_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.qid
               ORDER BY {_COS_SQL.format(a="e.x", b="q.qx")} DESC, e.vec_id
             ) AS rank
      FROM e JOIN q ON e.vec_id <> q.qid
    )
    SELECT c.qid AS query_id,
           CAST(COUNT(h.vec_id) AS BIGINT) AS n_common,
           ROUND(COUNT(h.vec_id) / 10.0, 2) AS recall_at_10,
           CAST(MIN(hm.min_ham) AS BIGINT) AS min_hamming
    FROM (SELECT * FROM cos_rank WHERE rank <= 10) c
    LEFT JOIN (SELECT * FROM ham_rank WHERE rank <= 10) h
      ON h.qid = c.qid AND h.vec_id = c.vec_id
    JOIN (SELECT qid, MIN(ham) AS min_ham FROM ham_rank GROUP BY qid) hm
      ON hm.qid = c.qid
    GROUP BY c.qid
    """,
)
def embedding_binary_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary quantization benchmark: embeddings compress to 64 sign
    bits (two 32-bit words, so the arithmetic stays in exact BIGINT
    range on both engines); candidates rank by Hamming distance
    (XOR + popcount) and are scored by recall@10 against the exact
    cosine ranking per query — the 32x memory / ~100x speed trade
    modern vector stores (FAISS binary, pgvector bit) offer, with the
    quality cost made visible.

    Shape: signatures are computed in the scan projection; Hamming
    ranking shuffles only (query x candidate) pairs of two longs, not
    vectors. At 100 TB the binary index fits where floats cannot."""
    e = spread_for_compute(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )

    def sign_bits(col, lo):
        acc = F.lit(0).cast("long")
        for i in range(32):
            acc = acc + F.when(
                F.element_at(col, lo + i) > 0, F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return acc

    sig = e.select(
        "vec_id",
        "x",
        sign_bits(F.col("x"), 1).alias("h1"),
        sign_bits(F.col("x"), 33).alias("h2"),
    )
    q = sig.where(F.col("vec_id") < _MRL_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("x").alias("qx"),
        F.col("h1").alias("qh1"),
        F.col("h2").alias("qh2"),
    )
    j = sig.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("qid"))
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("qh1"))) + F.bit_count(
        F.col("h2").bitwiseXOR(F.col("qh2"))
    )
    w = Window.partitionBy("qid")
    ham_ranked = j.select(
        "qid",
        "vec_id",
        ham.alias("ham"),
        F.row_number().over(w.orderBy(ham, "vec_id")).alias("rank"),
    )
    ham10 = ham_ranked.where(F.col("rank") <= 10).select(
        F.col("qid").alias("hqid"), F.col("vec_id").alias("hvid")
    )
    min_ham = ham_ranked.groupBy("qid").agg(F.min("ham").alias("min_ham"))
    cos = _dot(F.col("x"), F.col("qx")) / (
        F.sqrt(_dot(F.col("x"), F.col("x"))) * F.sqrt(_dot(F.col("qx"), F.col("qx")))
    )
    cos10 = (
        j.select(
            "qid",
            "vec_id",
            F.row_number().over(w.orderBy(F.desc(cos), "vec_id")).alias("rank"),
        )
        .where(F.col("rank") <= 10)
    )
    joined = cos10.join(
        ham10,
        (F.col("hqid") == F.col("qid")) & (F.col("hvid") == F.col("vec_id")),
        "left",
    ).join(F.broadcast(min_ham), "qid")
    return joined.groupBy(F.col("qid").alias("query_id")).agg(
        F.count("hvid").cast("long").alias("n_common"),
        F.round(F.count("hvid") / 10.0, 2).alias("recall_at_10"),
        F.min("min_ham").cast("long").alias("min_hamming"),
    )


# ========================================================================
# from analytics_extras15.py — original batch rationale:
# Analytics extras, batch 15: ratio-metric confidence intervals,
# duplicate-transaction detection, and embedding outliers.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's statistics / data-quality /
# embedding tiers:
#
# * ratio-metric CI — the delta method for revenue-per-order style
#   metrics whose numerator and denominator are correlated per unit
#   (naive SE is wrong there; this is the standard experimentation-
#   platform fix);
# * duplicate transactions — same customer, same amount, within 30
#   days: the double-charge / double-load screen;
# * Mahalanobis outliers — diagonal-covariance standardized distance
#   over the embedding cloud, top-k most anomalous vectors.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_MAH_TOP = 10



@register(
    "embedding_outlier_mahalanobis",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    dims AS (SELECT i FROM generate_series(1, 64) t(i)),
    st AS (
      SELECT i, AVG(x[i]) AS mu, VAR_SAMP(x[i]) AS v
      FROM e, dims GROUP BY i
    ),
    d AS (
      SELECT e.vec_id,
             SUM((e.x[st.i] - st.mu) * (e.x[st.i] - st.mu) / st.v) AS d2
      FROM e, st GROUP BY e.vec_id
    )
    SELECT vec_id,
           ROUND(sqrt(d2), 3) AS mahalanobis,
           CAST(ROW_NUMBER() OVER (ORDER BY d2 DESC, vec_id) AS INT) AS rank
    FROM d
    ORDER BY d2 DESC, vec_id
    LIMIT {_MAH_TOP}
    """,
)
def embedding_outlier_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cloud outliers by diagonal-covariance Mahalanobis
    distance: each dimension is standardized by its own mean and
    variance, d² = Σ (x_i - mu_i)²/v_i, and the 10 most anomalous
    vectors are reported — the screen that catches corrupted or
    out-of-distribution embeddings before they poison an ANN index
    or a training mix. Diagonal covariance is the honest choice at
    scale: the full 64x64 inverse is cheap here but O(dim²) state
    everywhere, and the diagonal captures per-dim scale drift.

    Shape: per-dim moments via one posexplode aggregate (64 groups),
    broadcast back; the distance is a map-side zip over each vector;
    top-k is TakeOrdered. One scan, one tiny shuffle."""
    e = spread_for_compute(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    st = (
        e.select("vec_id", F.posexplode("x").alias("i", "val"))
        .groupBy("i")
        .agg(F.avg("val").alias("mu"), F.var_samp("val").alias("v"))
    )
    ex = e.select("vec_id", F.posexplode("x").alias("i", "val"))
    d = (
        ex.join(F.broadcast(st), "i")
        .groupBy("vec_id")
        .agg(
            F.sum(
                (F.col("val") - F.col("mu"))
                * (F.col("val") - F.col("mu"))
                / F.col("v")
            ).alias("d2")
        )
    )
    ranked = d.select(
        "vec_id",
        F.round(F.sqrt("d2"), 3).alias("mahalanobis"),
        F.row_number().over(Window.orderBy(F.desc("d2"), "vec_id")).alias("rank"),
    )
    return ranked.where(F.col("rank") <= _MAH_TOP)


# ========================================================================
# from analytics_extras30.py — original batch rationale:
# Analytics extras, batch 30: iterative graph core, diversified
# retrieval, resampling-free uncertainty, embedding normalization.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * k-core decomposition — iterative degree peeling, the classic
#   "dense engagement subgraph" extraction.
# * MMR re-ranking — maximal marginal relevance diversified top-k,
#   the retrieval-stage de-duplication of semantic search results.
# * jackknife ratio SE — delete-one variance of a RATIO estimator
#   from sufficient statistics (no resampling pass).
# * per-dimension embedding standardization — corpus-level feature
#   scaling (diagonal whitening) as a broadcast join.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.operators.similarity import _as_double, _dot, _norm
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_MMR_LAMBDA = 0.7


_MMR_CAND = 12


_MMR_K = 5


def _mmr_greedy(cand_rows, sim_rows):
    """Greedy MMR selection over the COLLECTED candidate matrix — the
    O(K·N) driver finisher on the ≤ ``_MMR_CAND``-row frame (r13).
    The former per-round DataFrame jobs each collected their 1-row
    winner anyway; this replaces 5 join+sort+collect scheduler rounds
    with one pass over 12 rel rows + 132 sim cells. Arithmetic is the
    identical Spark expression, term for term:
    ``_MMR_LAMBDA * rel - (1 - _MMR_LAMBDA) * max_sim_to_picked``
    (same Python-float literals the Catalyst expression embedded, one
    multiply/subtract per cell; max is order-insensitive), ties
    broken by ascending id. Returns [(pick, id, rel), ...]."""
    sim = {}
    for a, b, s in sim_rows:
        sim[(a, b)] = s
    first = max(cand_rows, key=lambda t: (t[1], -t[0]))
    picked = [(1, first[0], first[1])]
    chosen = {first[0]}
    for r in range(2, _MMR_K + 1):
        best = None
        for cid, rel in cand_rows:
            if cid in chosen:
                continue
            ms = max(sim[(cid, p)] for p in chosen)
            score = _MMR_LAMBDA * rel - (1 - _MMR_LAMBDA) * ms
            key = (score, -cid)
            if best is None or key > best[0]:
                best = (key, cid, rel)
        picked.append((r, best[1], best[2]))
        chosen.add(best[1])
    return picked


def _mmr_oracle() -> str:
    sel = """s1 AS (
      SELECT id, rel, 1 AS pick FROM cand ORDER BY rel DESC, id LIMIT 1
    )"""
    parts = [sel]
    for r in range(2, _MMR_K + 1):
        p = f"s{r - 1}all"
        prev_union = (
            "s1"
            if r == 2
            else f"s{r - 1}all"
        )
        # accumulated selection through round r-1
        if r == 2:
            parts.append("s1all AS (SELECT * FROM s1)")
            prev_union = "s1all"
        parts.append(
            f"""p{r} AS (
      SELECT c.id, c.rel, MAX(s.sim) AS ms
      FROM cand c
      JOIN sims s ON s.a = c.id AND s.b IN (SELECT id FROM {prev_union})
      WHERE c.id NOT IN (SELECT id FROM {prev_union})
      GROUP BY c.id, c.rel
    ),
    s{r} AS (
      SELECT id, rel, {r} AS pick FROM p{r}
      ORDER BY {_MMR_LAMBDA} * rel - {1 - _MMR_LAMBDA:.1f} * ms DESC, id
      LIMIT 1
    ),
    s{r}all AS (SELECT * FROM {prev_union} UNION ALL SELECT * FROM s{r})"""
        )
    return f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv,
             sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])) AS qn
      FROM embeddings WHERE vec_id = 0
    ),
    cand AS (
      SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v,
             list_dot_product(e.embedding::DOUBLE[], q.qv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                        e.embedding::DOUBLE[])) * q.qn)
               AS rel
      FROM embeddings e, q
      WHERE e.vec_id <> 0
      ORDER BY rel DESC, e.vec_id
      LIMIT {_MMR_CAND}
    ),
    sims AS (
      SELECT x.id AS a, y.id AS b,
             list_dot_product(x.v, y.v)
               / (sqrt(list_dot_product(x.v, x.v))
                  * sqrt(list_dot_product(y.v, y.v))) AS sim
      FROM cand x JOIN cand y ON x.id <> y.id
    ),
    {",".join(parts)}
    SELECT pick, CAST(id AS BIGINT) AS neighbor_id,
           ROUND(rel, 6) AS relevance
    FROM s{_MMR_K}all
    ORDER BY pick
    """



@register("similarity_mmr_rerank", oracle=_mmr_oracle())
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): from the query's top-12 cosine candidates, greedily pick 5
    maximizing λ·relevance − (1−λ)·max-similarity-to-already-picked
    (λ=0.7, id-ascending tie-break) — the standard retrieval-stage
    diversification that stops semantic search returning five copies
    of the same near-duplicate passage.

    Shape: stage 1 (data-sized) is the brute-force/ANN top-N scan —
    distributed exactly like `similarity_cosine_topk`; stage 2
    operates on the O(N²)=144-cell candidate similarity matrix, so
    the greedy loop runs as N tiny DataFrame rounds whose inputs
    never exceed the candidate set — at 100 TB stage 2's cost is
    unchanged because the candidate set is k-bounded, not
    data-bounded."""
    emb = spread_for_compute(load_table(spark, sf_dir, "embeddings"))
    base = emb.select(
        F.col("vec_id").alias("id"), _as_double("embedding").alias("v")
    ).withColumn("n", _norm("v"))
    q = base.where("id = 0").select(
        F.col("v").alias("qv"), F.col("n").alias("qn")
    )
    cand = (
        base.where("id <> 0")
        .crossJoin(F.broadcast(q))
        .select(
            "id", "v", "n", (_dot("v", "qv") / (F.col("n") * F.col("qn"))).alias("rel")
        )
        .orderBy(F.desc("rel"), "id")
        .limit(_MMR_CAND)
        .localCheckpoint()
    )
    sims = (
        cand.select(F.col("id").alias("a"), F.col("v").alias("va"), F.col("n").alias("na"))
        .crossJoin(
            cand.select(
                F.col("id").alias("b"), F.col("v").alias("vb"), F.col("n").alias("nb")
            )
        )
        .where(F.col("a") != F.col("b"))
        .select(
            "a", "b", (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("sim")
        )
        .localCheckpoint()
    )
    # the former loop ran 5 join+sort scheduler rounds on this
    # k-bounded frame, collecting each 1-row winner; collect the
    # whole ≤12-row matrix once and finish on the driver (r13)
    crows = [(row["id"], float(row["rel"])) for row in cand.select("id", "rel").collect()]
    srows = [
        (row["a"], row["b"], float(row["sim"])) for row in sims.collect()
    ]
    picked = _mmr_greedy(crows, srows)
    out = spark.createDataFrame(
        [(p, int(i), float(rl)) for p, i, rl in picked],
        "pick: int, neighbor_id: long, relevance: double",
    )
    return out.select(
        "pick", "neighbor_id", F.round("relevance", 6).alias("relevance")
    ).orderBy("pick")


_STD_DIMS = 8


def _standardize_oracle() -> str:
    # "+ 0" canonicalizes IEEE negative zero: DuckDB ROUND(-1e-9, 4)
    # returns -0.0 where Spark returns +0.0, and the driver's canon
    # renders them differently (caught at sf1)
    cols = ",\n           ".join(
        f"ROUND((embedding[{j + 1}]::DOUBLE - s.m{j}) / s.sd{j}, 4) + 0"
        f" AS z{j}"
        for j in range(_STD_DIMS)
    )
    # stats rounded to 6 decimals on BOTH engines before the z apply:
    # AVG/STDDEV over 100k rows differ between engines in the last
    # bits (summation order), which flipped ROUND(z, 4) half-cases at
    # sf1 — rounding the aggregate first makes the z inputs identical
    stats = ", ".join(
        f"ROUND(AVG(embedding[{j + 1}]::DOUBLE), 6) AS m{j}, "
        f"ROUND(STDDEV_SAMP(embedding[{j + 1}]::DOUBLE), 6) AS sd{j}"
        for j in range(_STD_DIMS)
    )
    return f"""
    WITH s AS (SELECT {stats} FROM embeddings)
    SELECT vec_id,
           {cols}
    FROM embeddings, s
    """



@register("embedding_standardize_dims", oracle=_standardize_oracle())
def embedding_standardize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization of the embedding matrix
    (diagonal whitening, first 8 dims reported as columns): corpus
    mean/std per dimension, then (x−μ)/σ per vector — the feature
    scaling step before distance-based ops (k-means, Mahalanobis)
    whose skipping silently degrades every downstream similarity.

    Shape: the stats pass is ONE aggregate producing 2·d scalars
    (map-side combined over in-row array access — no explode, no
    shuffle of element rows); the apply pass is a broadcast of those
    scalars into scan-stage arithmetic. Two scans, zero data-sized
    shuffles at 100 TB."""
    e = spread_for_compute(load_table(spark, sf_dir, "embeddings"))
    el = [F.element_at("embedding", j + 1).cast("double") for j in range(_STD_DIMS)]
    # stats rounded to 6 decimals before the apply (both engines) —
    # see oracle comment: un-rounded float aggregates flip z half-
    # cases at scale
    stats = e.agg(
        *[F.round(F.avg(el[j]), 6).alias(f"m{j}") for j in range(_STD_DIMS)],
        *[
            F.round(F.stddev_samp(el[j]), 6).alias(f"sd{j}")
            for j in range(_STD_DIMS)
        ],
    )
    out = [F.col("vec_id")]
    for j in range(_STD_DIMS):
        out.append(
            (F.round((el[j] - F.col(f"m{j}")) / F.col(f"sd{j}"), 4) + 0)
            .alias(f"z{j}")
        )
    return e.crossJoin(F.broadcast(stats)).select(*out)


# ========================================================================
# from analytics_extras33.py — original batch rationale:
# Analytics extras, batch 33: model evaluation metrics and the PQ
# search path.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * exact ROC-AUC — rank-sum (Mann-Whitney) formulation with tie
#   averaging, one pass after ranking.
# * calibration / reliability bins — per-decile predicted-vs-observed
#   gap, the input to ECE and calibration plots.
# * PQ asymmetric-distance search — the query-time half of product
#   quantization (lookup-table distances over codes).
# * tokenizer fertility — subword tokens per word by language, the
#   standard tokenizer-quality metric for multilingual corpora.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table
from hivetomysql_spark.operators.text import BPE_PRETOKEN_RE as _BPE_REGEX


_PQ_M_b33 = 4


_PQ_HALF_b33 = 32


def _dot_sql(a: str, b: str) -> str:
    return f"list_dot_product({a}, {b})"


def _pq_adc_oracle() -> str:
    d = _dot_sql
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS cid,
             x[1:{_PQ_HALF_b33}] AS c1, x[{_PQ_HALF_b33 + 1}:{2 * _PQ_HALF_b33}] AS c2
      FROM e WHERE vec_id < {_PQ_M_b33}
    ),
    codes AS (
      SELECT e.vec_id,
             MIN(struct_pack(
               d := {d(f"e.x[1:{_PQ_HALF_b33}]", "e.x[1:" + str(_PQ_HALF_b33) + "]")}
                    - 2 * {d(f"e.x[1:{_PQ_HALF_b33}]", "c.c1")}
                    + {d("c.c1", "c.c1")},
               c := c.cid)).c AS code1,
             MIN(struct_pack(
               d := {d(f"e.x[{_PQ_HALF_b33 + 1}:{2 * _PQ_HALF_b33}]",
                       f"e.x[{_PQ_HALF_b33 + 1}:{2 * _PQ_HALF_b33}]")}
                    - 2 * {d(f"e.x[{_PQ_HALF_b33 + 1}:{2 * _PQ_HALF_b33}]", "c.c2")}
                    + {d("c.c2", "c.c2")},
               c := c.cid)).c AS code2
      FROM e CROSS JOIN cents c
      GROUP BY e.vec_id
    ),
    q AS (
      SELECT x[1:{_PQ_HALF_b33}] AS q1, x[{_PQ_HALF_b33 + 1}:{2 * _PQ_HALF_b33}] AS q2
      FROM e WHERE vec_id = 0
    ),
    lut AS (
      SELECT c.cid,
             {d("q.q1", "q.q1")} - 2 * {d("q.q1", "c.c1")}
               + {d("c.c1", "c.c1")} AS dq1,
             {d("q.q2", "q.q2")} - 2 * {d("q.q2", "c.c2")}
               + {d("c.c2", "c.c2")} AS dq2
      FROM cents c, q
    ),
    adc AS (
      SELECT co.vec_id, l1.dq1 + l2.dq2 AS adc_dist
      FROM codes co
      JOIN lut l1 ON l1.cid = co.code1
      JOIN lut l2 ON l2.cid = co.code2
      WHERE co.vec_id <> 0
    ),
    exact AS (
      SELECT e.vec_id,
             {d("e.x", "e.x")} - 2 * {d("e.x", "q0.x")}
               + {d("q0.x", "q0.x")} AS ex
      FROM e, (SELECT x FROM e WHERE vec_id = 0) q0
      WHERE e.vec_id <> 0
    ),
    exact_top AS (
      SELECT vec_id FROM exact ORDER BY ex, vec_id LIMIT 10
    )
    SELECT ROW_NUMBER() OVER (ORDER BY adc.adc_dist, adc.vec_id) AS rank,
           CAST(adc.vec_id AS BIGINT) AS vec_id,
           ROUND(adc.adc_dist, 4) AS adc_dist,
           CAST(CASE WHEN adc.vec_id IN (SELECT vec_id FROM exact_top)
                     THEN 1 ELSE 0 END AS BIGINT) AS in_exact_top10
    FROM adc
    ORDER BY adc.adc_dist, adc.vec_id
    LIMIT 10
    """



@register("embedding_pq_adc_search", oracle=_pq_adc_oracle())
def embedding_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC search — the query-time half of PQ
    (Jegou et al., TPAMI'11) completing `embedding_pq_codebook`:
    every vector is stored only as its (code1, code2) cell; at query
    time a 2×4 lookup table of query-to-centroid distances is built
    and each candidate's distance is the SUM OF TWO TABLE LOOKUPS —
    no per-candidate vector math. Returns the ADC top-10 with a flag
    against the exact-L2 top-10 (the measured recall of the
    compressed index).

    Shape: codes are computed in one broadcast-codebook scan (as in
    the codebook query); the LUT is O(M·K) and broadcast; ranking
    shuffles only (id, scalar) pairs. At 100 TB the vectors
    themselves are never touched at query time — that is the entire
    point of PQ."""
    e = spread_for_compute(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("x"),
    )
    half = _PQ_HALF_b33

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def d2(xs, cs):
        return dot(xs, xs) - 2 * dot(xs, cs) + dot(cs, cs)

    cents = e.where(F.col("vec_id") < _PQ_M_b33).select(
        F.col("vec_id").alias("cid"),
        F.slice("x", 1, half).alias("c1"),
        F.slice("x", half + 1, half).alias("c2"),
    )
    x1, x2 = F.slice(F.col("x"), 1, half), F.slice(F.col("x"), half + 1, half)
    codes = (
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "cid",
            d2(x1, F.col("c1")).alias("d1"),
            d2(x2, F.col("c2")).alias("d2"),
        )
        .groupBy("vec_id")
        .agg(
            F.min(F.struct("d1", "cid")).alias("b1"),
            F.min(F.struct("d2", "cid")).alias("b2"),
        )
        .select(
            "vec_id",
            F.col("b1.cid").alias("code1"),
            F.col("b2.cid").alias("code2"),
        )
    )
    q = e.where("vec_id = 0").select(
        F.slice("x", 1, half).alias("q1"),
        F.slice("x", half + 1, half).alias("q2"),
    )
    lut = cents.crossJoin(F.broadcast(q)).select(
        "cid",
        d2(F.col("q1"), F.col("c1")).alias("dq1"),
        d2(F.col("q2"), F.col("c2")).alias("dq2"),
    )
    adc = (
        codes.where("vec_id <> 0")
        .join(
            F.broadcast(lut.select(F.col("cid").alias("code1"), "dq1")),
            "code1",
        )
        .join(
            F.broadcast(lut.select(F.col("cid").alias("code2"), "dq2")),
            "code2",
        )
        .select("vec_id", (F.col("dq1") + F.col("dq2")).alias("adc_dist"))
    )
    q0 = e.where("vec_id = 0").select(F.col("x").alias("qx"))
    exact = (
        e.where("vec_id <> 0")
        .crossJoin(F.broadcast(q0))
        .select("vec_id", d2(F.col("x"), F.col("qx")).alias("ex"))
    )
    exact_top = (
        exact.orderBy("ex", "vec_id")
        .limit(10)
        .select("vec_id")
        .withColumn("hit", F.lit(1))
    )
    w = Window.orderBy("adc_dist", "vec_id")
    return (
        adc.join(exact_top, "vec_id", "left")
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            F.col("vec_id").cast("long"),
            F.round("adc_dist", 4).alias("adc_dist"),
            F.coalesce(F.col("hit"), F.lit(0))
            .cast("long")
            .alias("in_exact_top10"),
        )
        .orderBy("rank")
        .limit(10)
    )


# ========================================================================
# from analytics_extras35.py — original batch rationale:
# Analytics extras, batch 35: targeting economics, embedding drift,
# heavy tails, and graph mixing structure.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * cumulative gains / lift table — the decile targeting-economics
#   view every campaign model ships with.
# * embedding centroid drift — per-label centroid displacement between
#   two corpus halves, the embedding-space drift monitor.
# * Hill tail index — the heavy-tail exponent estimator for revenue /
#   latency distributions.
# * degree assortativity — do hubs link to hubs? The Pearson degree
#   correlation over edges.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_DRIFT_DIMS = 64



@register(
    "embedding_drift_centroids",
    oracle=f"""
    WITH halves AS (
      SELECT label, vec_id < 250 AS is_a, embedding::DOUBLE[] AS x
      FROM embeddings
    ),
    cents AS (
      SELECT label, is_a,
             [{", ".join(f"AVG(x[{j + 1}])" for j in range(_DRIFT_DIMS))}]
               AS c,
             COUNT(*) AS n
      FROM halves GROUP BY label, is_a
    ),
    paired AS (
      SELECT a.label, a.n AS n_a, b.n AS n_b,
             sqrt(list_dot_product(
               list_transform(range(1, {_DRIFT_DIMS + 1}),
                              i -> a.c[i] - b.c[i]),
               list_transform(range(1, {_DRIFT_DIMS + 1}),
                              i -> a.c[i] - b.c[i]))) AS shift
      FROM cents a JOIN cents b ON a.label = b.label
      WHERE a.is_a AND NOT b.is_a
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(shift, 6) AS centroid_shift
    FROM paired
    ORDER BY label
    """,
)
def embedding_drift_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: per-label centroid displacement (L2)
    between two corpus halves (vec_id < 250 vs rest — standing in for
    'last week vs this week') — the cheapest meaningful detector for
    embedding-space drift after a model or pipeline change; a large
    shift on one label flags re-embedding or upstream data change.

    Shape: one scan computing 64 per-dimension means per (label,
    half) — map-side combined, O(labels·dims) output — then O(labels)
    vector math. No explode, no shuffle of vectors."""
    e = spread_for_compute(load_table(spark, sf_dir, "embeddings")).select(
        "label",
        (F.col("vec_id") < 250).alias("is_a"),
        F.transform("embedding", lambda v: v.cast("double")).alias("x"),
    )
    cents = e.groupBy("label", "is_a").agg(
        F.array(
            *[F.avg(F.element_at("x", j + 1)) for j in range(_DRIFT_DIMS)]
        ).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    a = cents.where("is_a").select(
        "label", F.col("c").alias("ca"), F.col("n").alias("n_a")
    )
    b = cents.where("NOT is_a").select(
        "label", F.col("c").alias("cb"), F.col("n").alias("n_b")
    )
    diff = F.zip_with("ca", "cb", lambda p, q: p - q)
    shift = F.sqrt(
        F.aggregate(
            F.transform(diff, lambda d: d * d),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        a.join(b, "label")
        .select(
            F.col("label").cast("long"),
            F.col("n_a").cast("long"),
            F.col("n_b").cast("long"),
            F.round(shift, 6).alias("centroid_shift"),
        )
        .orderBy("label")
    )


# ========================================================================
# from analytics_extras36.py — original batch rationale:
# Analytics extras, batch 36: watermark economics, distributed
# linear algebra, and spectral audio features.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * late-data accounting — how many events each watermark delay would
#   drop per window, the number that PICKS the watermark.
# * Gram matrix — X^T X over the embedding matrix as a relational
#   aggregate, the kernel under PCA/covariance/linear probes.
# * DFT band energies — real 4-bin spectral features over decoded WAV
#   PCM, cross-engine verified against re-synthesized samples.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_GRAM_DIMS = 8



@register(
    "embedding_gram_matrix",
    oracle=f"""
    WITH e AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
    cells AS (
      SELECT i, j, SUM(x[i] * x[j]) AS v
      FROM e,
           UNNEST(generate_series(1, {_GRAM_DIMS})) AS a(i),
           UNNEST(generate_series(1, {_GRAM_DIMS})) AS b(j)
      WHERE i <= j
      GROUP BY i, j
    )
    SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           ROUND(v, 4) AS gram
    FROM cells
    ORDER BY i, j
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram matrix X^T X over the embedding matrix (upper triangle of
    the first 8 dimensions) as a pure relational aggregate: each row
    contributes its outer-product cells, summed with map-side
    combine — the kernel computation under covariance, PCA, ridge
    regression normal equations, and linear probes, shaped so a
    1000-executor cluster computes it in one pass with O(d²) output.

    Shape: per-row fan-out is the fixed d(d+1)/2 cell list (in-row
    explode), then ONE groupBy((i,j)) — no vector shuffles, no
    driver-side matrix; at 64 dims full the fan-out is 2080 cells/row,
    still bounded and combiner-friendly."""
    e = spread_for_compute(load_table(spark, sf_dir, "embeddings")).select(
        F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    idx = [(i, j) for i in range(1, _GRAM_DIMS + 1) for j in range(i, _GRAM_DIMS + 1)]
    cells = e.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.lit(j).alias("j"),
                        (
                            F.element_at("x", i) * F.element_at("x", j)
                        ).alias("v"),
                    )
                    for i, j in idx
                ]
            )
        ).alias("c")
    ).select("c.i", "c.j", "c.v")
    return (
        cells.groupBy("i", "j")
        .agg(F.round(F.sum("v"), 4).alias("gram"))
        .select(F.col("i").cast("long"), F.col("j").cast("long"), "gram")
        .orderBy("i", "j")
    )


# ========================================================================
# from analytics_extras39.py — original batch rationale:
# Analytics extras, batch 39: revenue retention, reliability
# metrics, distribution divergence, and metric-learning data prep.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * NRR / GRR — net and gross revenue retention year over year, the
#   SaaS board metrics, as two cohort aggregates.
# * MTBF / MTTR — mean time between failures and to recovery from the
#   error stream, the reliability pair under every SLO.
# * Jensen-Shannon divergence — per-source token-distribution
#   distance from the corpus, the symmetric bounded drift measure.
# * semi-hard triplet mining — the batch data-prep step of metric
#   learning (FaceNet-style): negatives inside the (d_ap, d_ap+margin)
#   band per anchor.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_TRIP_MARGIN = 0.2


_TRIP_ANCHORS = 20


def _trip_dist_sql(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        f" + list_dot_product({b}, {b}))"
    )



@register(
    "embedding_triplet_mining",
    oracle=f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, label, embedding::DOUBLE[] AS x FROM embeddings
    ),
    anchors AS (SELECT * FROM e WHERE vec_id < {_TRIP_ANCHORS}),
    pos AS (
      SELECT a.vec_id AS anchor_id,
             MIN(struct_pack(
               d := {_trip_dist_sql("a.x", "p.x")},
               i := p.vec_id)) AS best
      FROM anchors a JOIN e p
        ON p.label = a.label AND p.vec_id <> a.vec_id
      GROUP BY a.vec_id
    ),
    neg AS (
      SELECT a.vec_id AS anchor_id,
             SUM(CASE WHEN {_trip_dist_sql("a.x", "n.x")} > pos.best.d
                       AND {_trip_dist_sql("a.x", "n.x")}
                           < pos.best.d + {_TRIP_MARGIN}
                      THEN 1 ELSE 0 END) AS n_semihard,
             SUM(CASE WHEN {_trip_dist_sql("a.x", "n.x")} <= pos.best.d
                      THEN 1 ELSE 0 END) AS n_hard
      FROM anchors a
      JOIN pos ON pos.anchor_id = a.vec_id
      JOIN e n ON n.label <> a.label
      GROUP BY a.vec_id
    )
    SELECT CAST(pos.anchor_id AS BIGINT) AS anchor_id,
           CAST(pos.best.i AS BIGINT) AS positive_id,
           ROUND(pos.best.d, 4) AS d_ap,
           CAST(neg.n_semihard AS BIGINT) AS n_semihard,
           CAST(neg.n_hard AS BIGINT) AS n_hard
    FROM pos JOIN neg ON neg.anchor_id = pos.anchor_id
    ORDER BY anchor_id
    """,
)
def embedding_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-hard triplet mining (FaceNet, Schroff et al. 2015): for
    each anchor (first 20 vectors), the nearest same-label positive
    and the count of negatives in the semi-hard band
    (d_ap < d_an < d_ap + margin) plus hard negatives (d_an ≤ d_ap)
    — the batch statistics that decide whether a metric-learning
    epoch has usable triplets or the margin needs retuning.

    Shape: anchors broadcast against the embedding scan twice (one
    positive argmin, one negative band count) — candidate work is
    O(anchors·N) scan-side with no shuffle of vectors; at 100 TB the
    anchor set is the mini-batch and the scan is the reference pool,
    exactly the production mining layout."""
    e = spread_for_compute(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda v: v.cast("double")).alias("x"),
    ).localCheckpoint()

    def d2(a, b):
        dot = lambda p, q: F.aggregate(  # noqa: E731
            F.zip_with(p, q, lambda u, v: u * v),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return dot(a, a) - 2 * dot(a, b) + dot(b, b)

    anchors = e.where(F.col("vec_id") < _TRIP_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("alabel"),
        F.col("x").alias("ax"),
    )
    pos = (
        F.broadcast(anchors)
        .join(
            e,
            (e["label"] == F.col("alabel"))
            & (e["vec_id"] != F.col("anchor_id")),
        )
        .groupBy("anchor_id")
        .agg(
            F.min(
                F.struct(
                    d2(F.col("ax"), F.col("x")).alias("d"),
                    F.col("vec_id").alias("i"),
                )
            ).alias("best")
        )
        .select(
            "anchor_id",
            F.col("best.d").alias("d_ap"),
            F.col("best.i").alias("positive_id"),
        )
    )
    neg = (
        F.broadcast(anchors.join(pos, "anchor_id"))
        .join(e, e["label"] != F.col("alabel"))
        .groupBy("anchor_id", "positive_id", "d_ap")
        .agg(
            F.sum(
                F.when(
                    (d2(F.col("ax"), F.col("x")) > F.col("d_ap"))
                    & (
                        d2(F.col("ax"), F.col("x"))
                        < F.col("d_ap") + _TRIP_MARGIN
                    ),
                    1,
                ).otherwise(0)
            ).alias("n_semihard"),
            F.sum(
                F.when(d2(F.col("ax"), F.col("x")) <= F.col("d_ap"), 1).otherwise(
                    0
                )
            ).alias("n_hard"),
        )
    )
    return neg.select(
        F.col("anchor_id").cast("long"),
        F.col("positive_id").cast("long"),
        F.round("d_ap", 4).alias("d_ap"),
        F.col("n_semihard").cast("long"),
        F.col("n_hard").cast("long"),
    ).orderBy("anchor_id")


# ========================================================================
# from analytics_extras40.py — original batch rationale:
# Analytics extras, batch 40: ANN index tuning, experimentation
# variance reduction, and composite supplier scoring.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * ANN recall sweep — recall@5 of the IVF index at nprobe 1/2/4 vs
#   exact, the tuning curve that picks the latency/recall operating
#   point.
# * CUPED — pre-period covariate adjustment, the standard
#   experimentation variance-reduction; θ and the measured variance
#   drop from sufficient statistics.
# * supplier scorecard — min-max-normalized composite of on-time
#   rate, price consistency, and volume share.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.operators import similarity as S
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_SWEEP_PROBES = (1, 2, 4)


def _ann_sweep_oracle() -> str:
    blocks = []
    for p in _SWEEP_PROBES:
        blocks.append(f"""cand{p} AS (
      SELECT q.query_id, i.vec_id AS neighbor_id
      FROM (SELECT vec_id AS query_id, cell FROM assign
            WHERE prank <= {p} AND vec_id < 10) q
      JOIN indexed i ON i.cell = q.cell AND i.vec_id <> q.query_id
    ),
    top{p} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT cand{p}.query_id, cand{p}.neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY cand{p}.query_id
                 ORDER BY list_dot_product(qa.v, ca.v)
                          / (qa.nrm * ca.nrm) DESC, cand{p}.neighbor_id
               ) AS rank
        FROM cand{p}
        JOIN base qa ON qa.vec_id = cand{p}.query_id
        JOIN base ca ON ca.vec_id = cand{p}.neighbor_id
      ) WHERE rank <= 5
    ),
    rec{p} AS (
      SELECT {p} AS nprobe,
             COUNT(*) * 1.0 / 50.0 AS recall_at_5,
             COUNT(DISTINCT t.query_id) AS n_queries
      FROM top{p} t
      JOIN exact e ON e.query_id = t.query_id
                  AND e.neighbor_id = t.neighbor_id
    )""")
    unions = " UNION ALL ".join(f"SELECT * FROM rec{p}" for p in _SWEEP_PROBES)
    return f"""
    WITH base AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      FROM embeddings
    ),
    cent AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
      FROM (SELECT vec_id, v FROM base ORDER BY vec_id LIMIT 16)
    ),
    assign AS MATERIALIZED (
      SELECT b.vec_id, c.cell,
             ROW_NUMBER() OVER (
               PARTITION BY b.vec_id
               ORDER BY list_dot_product(b.v, c.cv) DESC, c.cell
             ) AS prank
      FROM base b CROSS JOIN cent c
    ),
    indexed AS MATERIALIZED (
      SELECT vec_id, cell FROM assign WHERE prank = 1
    ),
    exact AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.v, b.v)
                          / (q.nrm * b.nrm) DESC, b.vec_id
               ) AS rank
        FROM base q JOIN base b ON b.vec_id <> q.vec_id
        WHERE q.vec_id < 10
      ) WHERE rank <= 5
    ),
    {",".join(blocks)}
    SELECT CAST(nprobe AS BIGINT) AS nprobe,
           CAST(n_queries AS BIGINT) AS n_queries,
           ROUND(recall_at_5, 4) AS recall_at_5
    FROM ({unions})
    ORDER BY nprobe
    """



@register("embedding_ann_recall_sweep", oracle=_ann_sweep_oracle())
def embedding_ann_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN tuning curve: recall@5 of the IVF index (16 cells) at
    nprobe ∈ {{1, 2, 4}} against exact brute force, for 10 query
    vectors — the measurement that picks the operating point on the
    latency/recall frontier BEFORE deploying an index config. Fully
    oracled because the coarse quantizer is deterministic (lowest-id
    centroids, argmax-dot assignment).

    Shape: the assignment table is computed once and reused across
    probe settings; each sweep point re-ranks only its candidate set.
    At 100 TB this is the offline eval job every vector store runs
    per index build — candidates ~ N·nprobe/n_cells per query, never
    all-pairs (the exact side runs on a sampled query set, as
    here)."""
    emb = spread_for_compute(load_table(spark, sf_dir, "embeddings"))
    # the exact ground truth is consumed by all three sweep points;
    # un-materialized, the whole brute-force subtree re-ran per point
    # (24 parquet scans / 60 exchanges in the r13 before-plan, zero
    # ReusedExchange). Checkpointing the <= 10*k-row result pays ONE
    # brute-force pass and turns each sweep join's probe side into a
    # 50-row local scan (§2.4: cheapest shuffle is the one not run).
    exact = (
        S.cosine_topk_bruteforce(emb, query_pred=F.col("__id") < 10, k=5)
        .select("query_id", "neighbor_id")
        .localCheckpoint()
    )
    rows = None
    # one shared index build for all three sweep points (r13; see
    # ivf_cosine_topk_sweep — per-point plans identical to the former
    # independent ivf_cosine_topk calls, nprobe prefix is exact)
    sweep = dict(
        S.ivf_cosine_topk_sweep(
            emb,
            query_pred=F.col("__id") < 10,
            k=5,
            n_cells=16,
            probes=tuple(_SWEEP_PROBES),
        )
    )
    for p in _SWEEP_PROBES:
        ivf = sweep[p].select("query_id", "neighbor_id")
        rec = (
            ivf.join(exact, ["query_id", "neighbor_id"])
            .agg(
                F.lit(p).cast("long").alias("nprobe"),
                F.countDistinct("query_id").cast("long").alias("n_queries"),
                F.round(F.count(F.lit(1)) / 50.0, 4).alias("recall_at_5"),
            )
        )
        rows = rec if rows is None else rows.unionByName(rec)
    return rows.orderBy("nprobe")


# ========================================================================
# from analytics_extras41.py — original batch rationale:
# Analytics extras, batch 41: seasonal smoothing, corpus
# dispersion, and embedding-space geometry.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * seasonal Holt-Winters — additive triple exponential smoothing with
#   a 7-slot day-of-week seasonal state, completing the EMA → Holt →
#   Holt-Winters smoothing family as array folds.
# * token dispersion — Gries' DP: how unevenly a token spreads across
#   corpus parts (beyond raw frequency).
# * embedding isotropy — mean pairwise cosine WITHOUT a pairwise join
#   (sufficient-statistics identity), the embedding-quality metric
#   behind "all my vectors point the same way" bugs.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_ISO_DIMS = 64



@register(
    "embedding_isotropy",
    oracle=f"""
    WITH e AS (
      SELECT list_transform(embedding::DOUBLE[],
               x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                              embedding::DOUBLE[])))
               AS u
      FROM embeddings
    ),
    sums AS (
      SELECT COUNT(*) * 1.0 AS n,
             [{", ".join(f"SUM(u[{j + 1}])" for j in range(_ISO_DIMS))}]
               AS sv
      FROM e
    )
    SELECT CAST(n AS BIGINT) AS n_vectors,
           ROUND((list_dot_product(sv, sv) - n) / (n * (n - 1)), 6)
             AS mean_pairwise_cosine,
           ROUND(sqrt(list_dot_product(sv, sv)) / n, 6)
             AS mean_vector_norm
    FROM sums
    """,
)
def embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy check WITHOUT a pairwise join: with unit
    vectors û, the mean pairwise cosine is (‖Σû‖² − N)/(N(N−1)) —
    a sufficient-statistics identity that turns an O(N²) computation
    into one scan of per-dimension sums. High values mean the space
    has a dominant common direction (the anisotropy bug that cripples
    cosine retrieval; cf. Mu & Viswanath 2018 "All-but-the-Top"), and
    the companion mean-vector norm is the fraction of that common
    mass.

    Shape: one aggregate of 64 sums — map-side combined, O(d) bytes
    shuffled at ANY corpus size; the naive all-pairs form this
    replaces is the textbook example of a scale-killer."""
    e = spread_for_compute(load_table(spark, sf_dir, "embeddings")).select(
        F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform("x", lambda v: v * v),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    u = e.select(F.transform("x", lambda v: v / nrm).alias("u"))
    sums = u.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[
            F.sum(F.element_at("u", j + 1)).alias(f"s{j}")
            for j in range(_ISO_DIMS)
        ],
    )
    sv2 = None
    for j in range(_ISO_DIMS):
        term = F.col(f"s{j}") * F.col(f"s{j}")
        sv2 = term if sv2 is None else sv2 + term
    return sums.select(
        F.col("n").cast("long").alias("n_vectors"),
        F.round((sv2 - F.col("n")) / (F.col("n") * (F.col("n") - 1)), 6).alias(
            "mean_pairwise_cosine"
        ),
        F.round(F.sqrt(sv2) / F.col("n"), 6).alias("mean_vector_norm"),
    )


# ========================================================================
# from analytics_extras42.py — original batch rationale:
# Analytics extras, batch 42: tail risk, cluster quality, and
# sequential-testing discipline.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * VaR / CVaR — historical value-at-risk and expected shortfall of
#   daily revenue changes.
# * simplified silhouette — per-cluster cohesion vs nearest-other-
#   centroid separation for the k-means assignment.
# * peeking bias — how often a naive daily-checked A/A "experiment"
#   crosses z=1.96 at least once, the number that justifies
#   sequential corrections.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_SIL_K = 8


def _sil_dist_sql(a: str, b: str) -> str:
    return (
        f"sqrt(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        f" + list_dot_product({b}, {b}))"
    )



@register(
    "embedding_cluster_silhouette",
    oracle=f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
    ),
    cents AS MATERIALIZED (
      SELECT vec_id AS cid, x AS cx FROM e WHERE vec_id < {_SIL_K}
    ),
    dists AS (
      SELECT e.vec_id, c.cid, {_sil_dist_sql("e.x", "c.cx")} AS d
      FROM e CROSS JOIN cents c
    ),
    ranked AS (
      SELECT vec_id, cid, d,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid)
               AS rk
      FROM dists
    ),
    ab AS (
      SELECT a.vec_id, a.cid AS cluster, a.d AS a_dist, b.d AS b_dist
      FROM ranked a JOIN ranked b
        ON b.vec_id = a.vec_id AND a.rk = 1 AND b.rk = 2
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(AVG((b_dist - a_dist)
                     / GREATEST(a_dist, b_dist)), 6) AS avg_silhouette,
           ROUND(AVG(a_dist), 4) AS avg_intra_dist
    FROM ab
    GROUP BY cluster
    ORDER BY cluster
    """,
)
def embedding_cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette for the k-means
    assignment used by `embedding_kmeans_assign` (centroids = vectors
    0..7): per point, a = distance to its own centroid, b = distance
    to the nearest OTHER centroid, silhouette = (b−a)/max(a,b);
    averaged per cluster — the standard "are these clusters real"
    report (near 0 ⇒ overlapping, the honest answer for random-ish
    fixtures), at O(N·k) cost instead of exact silhouette's O(N²).

    Shape: broadcast centroids × one scan, a per-point top-2 rank
    over k distances (in-row work), one O(k) aggregate — the exact
    evaluation layout MLlib's ClusteringEvaluator uses. The top-2 is
    literally in-row since r13 (operators/packed.py):
    ``array_sort`` over (d, cid) structs IS the ``ORDER BY d, cid``
    ranking, so the rk=1/rk=2 pair reads as elements 1 and 2 of the
    sorted array — the crossJoin + window + rank self-join form this
    replaced shuffled the N×k scored rows AND re-joined them on
    vec_id."""
    from hivetomysql_spark.operators.packed import attach_packed, pack_structs

    e = spread_for_compute(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("x"),
    )
    cents = e.where(F.col("vec_id") < _SIL_K).select(
        F.col("vec_id").alias("cid"), F.col("x").alias("cx")
    )

    def dist(a, b):
        dot = lambda p, q: F.aggregate(  # noqa: E731
            F.zip_with(p, q, lambda u, v: u * v),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.sqrt(dot(a, a) - 2 * dot(a, b) + dot(b, b))

    j = attach_packed(e, pack_structs(cents, "cid", "cx"))
    ranked_arr = F.array_sort(
        F.transform(
            F.col("cs"),
            lambda c: F.struct(
                dist(F.col("x"), c["cx"]).alias("d"), c["cid"].alias("cid")
            ),
        )
    )
    # the rk=2 inner join dropped points with <2 centroids; element_at
    # would instead yield NULLs — keep the filter for exact semantics
    ab = (
        j.where(F.size("cs") >= 2)
        .select("vec_id", ranked_arr.alias("rk"))
        .select(
            "vec_id",
            F.col("rk")[0]["cid"].alias("cluster"),
            F.col("rk")[0]["d"].alias("a_dist"),
            F.col("rk")[1]["d"].alias("b_dist"),
        )
    )
    return (
        ab.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.round(
                F.avg(
                    (F.col("b_dist") - F.col("a_dist"))
                    / F.greatest("a_dist", "b_dist")
                ),
                6,
            ).alias("avg_silhouette"),
            F.round(F.avg("a_dist"), 4).alias("avg_intra_dist"),
        )
        .select(
            F.col("cluster").cast("long"),
            "n_members",
            "avg_silhouette",
            "avg_intra_dist",
        )
        .orderBy("cluster")
    )


# ========================================================================
# from analytics_extras63.py — original batch rationale:
# Analytics extras, batch 63: pseudo-relevance feedback and Haar
# wavelet energy.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * PRF re-query — Rocchio-style pseudo-relevance feedback over the
#   embedding table: query -> top-5 -> centroid-blended query ->
#   re-rank; reports how the result set moved. Completes the
#   retrieval stack (exact/LSH/IVF/PQ/MMR/kNN) with the classic
#   second-pass refinement.
# * Haar energy — 3-level Haar wavelet decomposition of the daily
#   series with per-level detail energies: the multi-resolution
#   complement of the single-scale periodogram.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_COS_SQL_b63 = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


_PRF_ALPHA = 0.5



@register(
    "similarity_prf_requery",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    q0 AS (SELECT x AS qx FROM e WHERE vec_id = 7),
    r1 AS (
      SELECT e.vec_id, e.x,
             ROW_NUMBER() OVER (
               ORDER BY {_COS_SQL_b63.format(a="e.x", b="q0.qx")} DESC, e.vec_id
             ) AS rnk
      FROM e CROSS JOIN q0 WHERE e.vec_id <> 7
    ),
    fb AS (
      SELECT list_transform(range(1, 65),
                            d -> AVG_d.avs[d]) AS cx
      FROM (
        SELECT list(av ORDER BY d) AS avs
        FROM (
          SELECT dd.d AS d, AVG(x[dd.d]) AS av
          FROM r1, UNNEST(range(1, 65)) AS dd(d)
          WHERE rnk <= 5 GROUP BY dd.d
        )
      ) AVG_d
    ),
    q1 AS (
      SELECT list_transform(range(1, 65),
                            d -> {_PRF_ALPHA} * q0.qx[d]
                                 + {1 - _PRF_ALPHA} * fb.cx[d]) AS qx
      FROM q0 CROSS JOIN fb
    ),
    r2 AS (
      SELECT e.vec_id,
             ROW_NUMBER() OVER (
               ORDER BY {_COS_SQL_b63.format(a="e.x", b="q1.qx")} DESC, e.vec_id
             ) AS rnk
      FROM e CROSS JOIN q1 WHERE e.vec_id <> 7
    ),
    top1 AS (SELECT vec_id FROM r1 WHERE rnk <= 10),
    top2 AS (SELECT vec_id FROM r2 WHERE rnk <= 10)
    SELECT CAST((SELECT COUNT(*) FROM top1 JOIN top2 USING (vec_id))
                AS BIGINT) AS n_common,
           CAST((SELECT COUNT(*) FROM top2 WHERE vec_id NOT IN
                 (SELECT vec_id FROM top1)) AS BIGINT) AS n_new,
           ROUND((SELECT COUNT(*) FROM top1 JOIN top2 USING (vec_id))
                 / 10.0, 2) AS overlap_at_10
    """,
)
def similarity_prf_requery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback (Rocchio, alpha=0.5): take vector 7
    as the query, retrieve top-5 by cosine, blend the query with the
    centroid of those pseudo-relevant results, re-rank, and report
    how much of the top-10 survived vs was newly pulled in — the
    classic zero-supervision second pass that improves recall when
    the corpus clusters, and the last missing stage of this
    registry's retrieval stack (exact -> LSH/IVF/PQ -> MMR -> kNN ->
    PRF). Both passes and the centroid blend are re-derived by the
    oracle.

    Shape: two broadcast-query scoring scans and one O(5 x d)
    centroid reduce — PRF costs one extra scan, never a shuffle of
    the corpus."""
    e = spread_for_compute(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("x"),
    ).localCheckpoint(eager=False)

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def cos(a, b):
        return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))

    def rank_against(qdf):
        j = e.where(F.col("vec_id") != 7).crossJoin(F.broadcast(qdf))
        return j.select(
            "vec_id",
            "x",
            F.row_number()
            .over(Window.orderBy(F.desc(cos(F.col("x"), F.col("qx"))), "vec_id"))
            .alias("rnk"),
        )

    q0 = e.where(F.col("vec_id") == 7).select(F.col("x").alias("qx"))
    r1 = rank_against(q0).localCheckpoint(eager=False)
    fb = (
        r1.where(F.col("rnk") <= 5)
        .select(F.posexplode("x").alias("d", "v"))
        .groupBy("d")
        .agg(F.avg("v").alias("av"))
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "av"))),
                lambda s: s["av"],
            ).alias("cx")
        )
    )
    q1 = q0.crossJoin(F.broadcast(fb)).select(
        F.zip_with(
            "qx", "cx", lambda q, c: _PRF_ALPHA * q + (1 - _PRF_ALPHA) * c
        ).alias("qx")
    )
    r2 = rank_against(q1)
    top1 = r1.where(F.col("rnk") <= 10).select("vec_id")
    top2 = r2.where(F.col("rnk") <= 10).select(
        F.col("vec_id").alias("v2")
    )
    common = top1.join(top2, F.col("vec_id") == F.col("v2")).count()
    # assemble as a single-row DataFrame without driver-side math on
    # data-sized inputs (counts are scalars)
    return (
        top2.agg(F.count(F.lit(1)).alias("n2"))
        .select(
            F.lit(common).cast("long").alias("n_common"),
            (F.col("n2") - F.lit(common)).cast("long").alias("n_new"),
            F.round(F.lit(common) / 10.0, 2).alias("overlap_at_10"),
        )
    )


# ========================================================================
# from analytics_extras65.py — original batch rationale:
# Analytics extras, batch 65: the second principal component by
# deflation.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); SURVEY.md §2.2 extension-tier entry:
#
# * PCA second component — power iteration with v1 projected out
#   after every matrix-vector product (Hotelling deflation): the step
#   that turns `embedding_pca_power_iteration`'s top direction into a
#   usable 2-D projection basis, with the orthogonality and
#   eigenvalue-ordering invariants reported (and asserted in tests).
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_P2_DIM = 64


_P2_ITERS = 3


def _pca2_oracle() -> str:
    v0 = "[" + ", ".join(["0.125"] * _P2_DIM) + "]::DOUBLE[]"
    w0 = (
        "["
        + ", ".join("0.125" if i % 2 == 0 else "-0.125" for i in range(_P2_DIM))
        + "]::DOUBLE[]"
    )
    sql = f"""
    WITH e AS (
      SELECT embedding::DOUBLE[] AS x FROM embeddings
    ),
    dims AS (SELECT i FROM generate_series(1, {_P2_DIM}) t(i)),
    mu AS (
      SELECT list(m ORDER BY i) AS mu FROM (
        SELECT i, AVG(x[i]) AS m FROM e, dims GROUP BY i
      )
    ),
    v0 AS (SELECT {v0} AS v)
    """
    prev = "v0"
    for it in range(1, _P2_ITERS + 1):
        sql += f"""
    , adots{it} AS (
      SELECT x,
             list_dot_product(x, v) - list_dot_product(mu, v) AS d
      FROM e CROSS JOIN {prev} CROSS JOIN mu
    ),
    as{it} AS (
      SELECT i, SUM(x[i] * d) - MIN(mu[i]) * SUM(d) AS s
      FROM adots{it} CROSS JOIN mu, dims GROUP BY i
    ),
    an{it} AS (SELECT sqrt(SUM(s * s)) AS nrm FROM as{it}),
    v{it} AS (
      SELECT list(s / nrm ORDER BY i) AS v
      FROM as{it} CROSS JOIN an{it}
    )
        """
        prev = f"v{it}"
    v1 = f"v{_P2_ITERS}"
    sql += f"""
    , w0raw AS (SELECT {w0} AS w),
    w0 AS (
      -- deflate the start: w <- w - (w.v1) v1
      SELECT list_transform(range(1, {_P2_DIM} + 1),
               i -> w[i] - list_dot_product(w, v) * v[i]) AS w
      FROM w0raw CROSS JOIN {v1}
    )
    """
    prevw = "w0"
    for it in range(1, _P2_ITERS + 1):
        sql += f"""
    , bdots{it} AS (
      SELECT x,
             list_dot_product(x, w) - list_dot_product(mu, w) AS d
      FROM e CROSS JOIN {prevw} CROSS JOIN mu
    ),
    bs{it} AS (
      SELECT i, SUM(x[i] * d) - MIN(mu[i]) * SUM(d) AS s
      FROM bdots{it} CROSS JOIN mu, dims GROUP BY i
    ),
    braw{it} AS (
      SELECT list(s ORDER BY i) AS s FROM bs{it}
    ),
    bdef{it} AS (
      -- Hotelling deflation after every product
      SELECT list_transform(range(1, {_P2_DIM} + 1),
               i -> s[i] - list_dot_product(s, v) * v[i]) AS s
      FROM braw{it} CROSS JOIN {v1}
    ),
    bn{it} AS (
      SELECT sqrt(list_dot_product(s, s)) AS nrm FROM bdef{it}
    ),
    w{it} AS (
      SELECT list_transform(s, z -> z / nrm) AS w
      FROM bdef{it} CROSS JOIN bn{it}
    )
        """
        prevw = f"w{it}"
    w_last, bn_last, an_last = f"w{_P2_ITERS}", f"bn{_P2_ITERS}", f"an{_P2_ITERS}"
    sql += f"""
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_vectors,
           ROUND({an_last}.nrm / ((SELECT COUNT(*) FROM e) - 1), 3)
             AS lambda_1,
           ROUND({bn_last}.nrm / ((SELECT COUNT(*) FROM e) - 1), 3)
             AS lambda_2,
           ROUND(({bn_last}.nrm) / ({an_last}.nrm), 4) AS lambda_ratio,
           ROUND(ABS(list_dot_product({w_last}.w, {v1}.v)), 6)
             AS ortho_check,
           ROUND({w_last}.w[1], 4) AS w_1,
           ROUND({w_last}.w[2], 4) AS w_2
    FROM {w_last} CROSS JOIN {v1} CROSS JOIN {bn_last} CROSS JOIN {an_last}
    """
    return sql



@register("embedding_pca_second_component", oracle=_pca2_oracle())
def embedding_pca_second_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second principal component by Hotelling deflation: run the
    same matrix-free power iteration as
    `embedding_pca_power_iteration` for v1, then iterate again from
    an alternating start with v1 PROJECTED OUT after every
    matrix-vector product (s <- s - (s.v1)v1) — the deflation that
    makes the iteration converge to the second eigenvector instead
    of drifting back to the first. Reports lambda_2, the
    lambda_2/lambda_1 spectrum ratio, and |v1.v2| (must be ~0) — the
    invariants that certify the 2-D projection basis a scatter-plot
    or whitening stage would use. On these near-isotropic random
    embeddings the ratio correctly reads ~1 (flat spectrum: there IS
    no dominant direction to find, and the query says so rather than
    inventing one).

    Scale: identical round shape to the first-component query — each
    round is one scan + a 64-bucket reduce with O(dim) driver state;
    deflation is O(dim) scalar math between rounds. Deterministic:
    fixed starts, fixed round counts, shared algebra with the
    oracle.

    Measured dispatch (operators/powerpca.py, r13): the 6 rounds each
    build a fresh literal-embedding plan — 8 sequential tiny jobs,
    ~2.5 s of scheduler/codegen at sf0.1 over a 1 MB matrix. Within
    the driver matrix bound the rounds replay in NumPy off one Arrow
    collect (same algebra, same starts, deflation included); the
    driver-vs-loop gate pins row equality at three SFs. Larger
    corpora take the distributed loop below unchanged."""
    e = spread_for_compute(load_table(spark, sf_dir, "embeddings")).select(
        F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    e = e.localCheckpoint()
    dim = _P2_DIM
    n = e.count()
    if not _PCA_FORCE_DISTRIBUTED and powerpca.matrix_fits(n, dim):
        v1, nrm1, wv, nrm2, ortho = powerpca.power_second(
            powerpca.collect_matrix(e), _P2_ITERS
        )
        w = [float(c) for c in wv]
        nrm1, nrm2, ortho = float(nrm1), float(nrm2), float(ortho)
        return spark.range(1).select(
            F.lit(n).cast("long").alias("n_vectors"),
            F.round(F.lit(nrm1 / (n - 1)), 3).alias("lambda_1"),
            F.round(F.lit(nrm2 / (n - 1)), 3).alias("lambda_2"),
            F.round(F.lit(nrm2 / nrm1), 4).alias("lambda_ratio"),
            F.round(F.lit(ortho), 6).alias("ortho_check"),
            F.round(F.lit(w[0]), 4).alias("w_1"),
            F.round(F.lit(w[1]), 4).alias("w_2"),
        )
    mu_rows = (
        e.select(F.posexplode("x").alias("i", "val"))
        .groupBy("i")
        .agg(F.avg("val").alias("m"))
        .collect()
    )
    mu = [0.0] * dim
    for r in mu_rows:
        mu[r["i"]] = r["m"]

    def mat_vec(v):
        """One C*v product: returns the un-normalized image s."""
        mudotv = sum(m * vi for m, vi in zip(mu, v))
        vlit = F.array(*[F.lit(c) for c in v])
        dots = e.select(
            "x",
            (
                F.aggregate(
                    F.zip_with(F.col("x"), vlit, lambda p, q: p * q),
                    F.lit(0.0),
                    lambda acc, z: acc + z,
                )
                - F.lit(mudotv)
            ).alias("d"),
        )
        sums = (
            dots.select(F.posexplode("x").alias("i", "val"), "d")
            .groupBy("i")
            .agg(
                F.sum(F.col("val") * F.col("d")).alias("sx"),
                F.sum("d").alias("sd"),
            )
            .collect()
        )
        s = [0.0] * dim
        for r in sums:
            s[r["i"]] = r["sx"] - mu[r["i"]] * r["sd"]
        return s

    # first component
    v = [1.0 / 8.0] * dim
    for _ in range(_P2_ITERS):
        s = mat_vec(v)
        nrm1 = sum(si * si for si in s) ** 0.5
        v = [si / nrm1 for si in s]
    # second component: alternating start, deflate start and every image
    w = [0.125 if i % 2 == 0 else -0.125 for i in range(dim)]
    wd = sum(a * b for a, b in zip(w, v))
    w = [a - wd * b for a, b in zip(w, v)]
    for _ in range(_P2_ITERS):
        s = mat_vec(w)
        sd = sum(a * b for a, b in zip(s, v))
        s = [a - sd * b for a, b in zip(s, v)]
        nrm2 = sum(si * si for si in s) ** 0.5
        w = [si / nrm2 for si in s]
    ortho = abs(sum(a * b for a, b in zip(w, v)))
    return spark.range(1).select(
        F.lit(n).cast("long").alias("n_vectors"),
        F.round(F.lit(nrm1 / (n - 1)), 3).alias("lambda_1"),
        F.round(F.lit(nrm2 / (n - 1)), 3).alias("lambda_2"),
        F.round(F.lit(nrm2 / nrm1), 4).alias("lambda_ratio"),
        F.round(F.lit(ortho), 6).alias("ortho_check"),
        F.round(F.lit(w[0]), 4).alias("w_1"),
        F.round(F.lit(w[1]), 4).alias("w_2"),
    )
