"""Analytics extras, batch 7: LLM-corpus curation and embedding
infrastructure — weighted reservoir sampling, a staged quality
funnel, tokenizer vocabulary coverage, product quantization, and
PCA by power iteration.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's training-data / embedding tiers:

* importance sampling — Efraimidis-Spirakis exponential-key weighted
  reservoir, the one-pass mergeable way to draw a weighted sample;
* quality funnel — Gopher-style staged document filters with
  per-stage survivor accounting;
* vocab coverage — top-K corpus vocabulary + per-source OOV rates,
  the tokenizer-fit diagnostic;
* product quantization — 2x32-dim subspace codebook assignment with
  quantization-error accounting, the ANN index building block;
* PCA power iteration — dominant covariance eigenvector via three
  matrix-free broadcast-vector passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_RES_K = 20


@register(
    "sample_importance_weighted",
    oracle=f"""
    WITH keyed AS (
      SELECT o_orderkey, o_totalprice,
             -ln((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                  ::BIGINT % 999983 + 0.5) / 999983.0) / o_totalprice AS k
      FROM orders
    ),
    ranked AS (
      SELECT o_orderkey, o_totalprice, k,
             ROW_NUMBER() OVER (ORDER BY k, o_orderkey) AS rn
      FROM keyed
    )
    SELECT CAST(rn AS BIGINT) AS rn, o_orderkey,
           ROUND(o_totalprice, 2) AS weight,
           ROUND(k * 1e6, 6) AS key_x1e6
    FROM ranked WHERE rn <= {_RES_K}
    """,
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling (Efraimidis-Spirakis A-ES): each
    row draws an exponential key -ln(u)/w from a deterministic
    md5-derived uniform; the k smallest keys ARE a weighted-without-
    replacement sample. One pass, no resampling, and the reservoir is
    mergeable — partial top-k reservoirs union and re-truncate, which
    is what makes the scheme work as a map-side combine at 100 TB
    (Spark compiles the sort+limit to TakeOrderedAndProject — per-
    partition top-k then a k-sized driver merge, never a global
    sort). Weight = order value, so big orders are proportionally
    overrepresented, the usual importance design for value-weighted
    audits."""
    o = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = ((h % 999983) + 0.5) / 999983.0
    keyed = o.select(
        "o_orderkey",
        "o_totalprice",
        (-F.log(u) / F.col("o_totalprice")).alias("k"),
    )
    ranked = keyed.select(
        "o_orderkey",
        "o_totalprice",
        "k",
        F.row_number().over(Window.orderBy("k", "o_orderkey")).alias("rn"),
    ).where(F.col("rn") <= _RES_K)
    return ranked.select(
        F.col("rn").cast("long").alias("rn"),
        "o_orderkey",
        F.round("o_totalprice", 2).alias("weight"),
        F.round(F.col("k") * 1e6, 6).alias("key_x1e6"),
    )


@register(
    "corpus_quality_funnel",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t.tok
      FROM documents,
           UNNEST(regexp_split_to_array(lower(text), '[^a-z]+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
    ),
    m AS (
      SELECT doc_id,
             SUM(c) AS n_tok,
             SUM(LENGTH(tok) * c) * 1.0 / SUM(c) AS mean_len,
             COUNT(*) * 1.0 / SUM(c) AS uniq_ratio,
             MAX(c) * 1.0 / SUM(c) AS top_ratio
      FROM tf GROUP BY doc_id
    ),
    flags AS (
      SELECT d.doc_id,
             CASE WHEN d.n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END AS f1,
             CASE WHEN m.mean_len BETWEEN 3 AND 12 THEN 1 ELSE 0 END AS f2,
             CASE WHEN m.uniq_ratio >= 0.3 THEN 1 ELSE 0 END AS f3,
             CASE WHEN m.top_ratio <= 0.2 THEN 1 ELSE 0 END AS f4
      FROM documents d JOIN m ON m.doc_id = d.doc_id
    ),
    stages(stage, ord) AS (
      VALUES ('0_all', 0), ('1_length', 1), ('2_word_len', 2),
             ('3_uniq', 3), ('4_repetition', 4)
    ),
    surv AS (
      SELECT s.stage, s.ord,
             SUM(CASE s.ord
                   WHEN 0 THEN 1
                   WHEN 1 THEN f1
                   WHEN 2 THEN f1 * f2
                   WHEN 3 THEN f1 * f2 * f3
                   ELSE f1 * f2 * f3 * f4 END) AS n
      FROM stages s CROSS JOIN flags
      GROUP BY s.stage, s.ord
    )
    SELECT stage,
           CAST(n AS BIGINT) AS survivors,
           CAST(LAG(n, 1, n) OVER (ORDER BY ord) - n AS BIGINT)
             AS dropped_here,
           ROUND(n * 1.0 / MAX(n) OVER (), 4) AS pass_rate
    FROM surv
    """,
)
def corpus_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style staged quality funnel with per-stage
    accounting: length bounds, mean-word-length bounds, unique-token
    ratio, and a top-token repetition screen applied cumulatively,
    reporting survivors / dropped / cumulative pass-rate per stage —
    the report a corpus-curation run ships with so each rule's cost
    is visible (cf. Gopher's table of per-filter removal rates).

    Shape: one tokenize+count pass to per-doc metrics (the only
    O(corpus) work), then a constant-size stage table crossed with
    the flags — adding stages costs nothing at scale. All flags are
    computed once, so a doc failing stage 1 is still measured for
    stages 2-4 (cumulative semantics, matching the funnel product
    f1*f2*...)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("tok"),
    ).where(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    m = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"),
        (F.sum(F.length("tok") * F.col("c")) / F.sum("c")).alias("mean_len"),
        (F.count(F.lit(1)) / F.sum("c")).alias("uniq_ratio"),
        (F.max("c") / F.sum("c")).alias("top_ratio"),
    )
    flags = docs.join(m, "doc_id").select(
        F.col("n_chars").between(100, 2000).cast("int").alias("f1"),
        F.col("mean_len").between(3, 12).cast("int").alias("f2"),
        (F.col("uniq_ratio") >= 0.3).cast("int").alias("f3"),
        (F.col("top_ratio") <= 0.2).cast("int").alias("f4"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("f1").alias("n1"),
        F.sum(F.col("f1") * F.col("f2")).alias("n2"),
        F.sum(F.col("f1") * F.col("f2") * F.col("f3")).alias("n3"),
        F.sum(F.col("f1") * F.col("f2") * F.col("f3") * F.col("f4")).alias("n4"),
    )
    stages = agg.select(
        F.explode(
            F.array(
                F.struct(F.lit("0_all").alias("stage"), F.lit(0).alias("ord"), F.col("n0").alias("n")),
                F.struct(F.lit("1_length").alias("stage"), F.lit(1).alias("ord"), F.col("n1").alias("n")),
                F.struct(F.lit("2_word_len").alias("stage"), F.lit(2).alias("ord"), F.col("n2").alias("n")),
                F.struct(F.lit("3_uniq").alias("stage"), F.lit(3).alias("ord"), F.col("n3").alias("n")),
                F.struct(F.lit("4_repetition").alias("stage"), F.lit(4).alias("ord"), F.col("n4").alias("n")),
            )
        ).alias("s")
    ).select("s.stage", "s.ord", "s.n")
    w = Window.orderBy("ord")
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return stages.select(
        "stage",
        F.col("n").cast("long").alias("survivors"),
        (F.lag("n", 1, None).over(w).cast("long") - F.col("n"))
        .cast("long")
        .alias("dropped_here"),
        F.round(F.col("n") / F.max("n").over(w_all), 4).alias("pass_rate"),
    ).withColumn(
        "dropped_here", F.coalesce(F.col("dropped_here"), F.lit(0).cast("long"))
    )


_VOCAB_K = 100


@register(
    "tokenizer_vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT d.doc_id, d.source, t.tok
      FROM documents d,
           UNNEST(regexp_split_to_array(lower(d.text), '[^a-z]+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rn
        FROM toks GROUP BY tok
      ) WHERE rn <= {_VOCAB_K}
    ),
    per_doc AS (
      SELECT t.doc_id, t.source,
             COUNT(*) AS n_tok,
             SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
      GROUP BY t.doc_id, t.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(n_oov * 1.0 / n_tok), 4) AS avg_oov_rate,
           ROUND(MAX(n_oov * 1.0 / n_tok), 4) AS max_oov_rate
    FROM per_doc GROUP BY source
    """,
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fit diagnostic: build the top-100 corpus vocabulary
    (frequency-desc, lexical tie-break — StringIndexer order), then
    report per-source out-of-vocabulary token rates. High OOV on one
    source means the tokenizer/vocab was fit on a different
    distribution — the check that catches domain shift before
    training does.

    Shape: one token count (the vocabulary is a tiny top-k off an
    aggregate), broadcast back against the token stream as a left
    join — at 100 TB the vocab side is k rows, so coverage scoring
    stays a broadcast map-side pass, never a shuffle of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("tok"),
    ).where(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        counts.select(
            "tok",
            F.row_number().over(Window.orderBy(F.desc("c"), "tok")).alias("rn"),
        )
        .where(F.col("rn") <= _VOCAB_K)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    scored = toks.join(F.broadcast(vocab), "tok", "left")
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    rate = F.col("n_oov") / F.col("n_tok")
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg(rate), 4).alias("avg_oov_rate"),
        F.round(F.max(rate), 4).alias("max_oov_rate"),
    )


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
    e = load_table(spark, sf_dir, "embeddings").select(
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
    engines share the s_i = SUM(x_i d) - mu_i SUM(d) algebra."""
    e = load_table(spark, sf_dir, "embeddings").select(
        F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    e = e.localCheckpoint()  # reused by every round: cut re-scan lineage
    dim = _PCA_DIM
    mu_rows = (
        e.select(F.posexplode("x").alias("i", "val"))
        .groupBy("i")
        .agg(F.avg("val").alias("m"))
        .collect()
    )
    mu = [0.0] * dim
    for r in mu_rows:
        mu[r["i"]] = r["m"]
    n = e.count()
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
            .agg(F.sum(F.col("val") * F.col("d")).alias("sx"), F.sum("d").alias("sd"))
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
