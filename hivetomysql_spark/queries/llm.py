"""LLM-data-pipeline tier: dedup, similarity search, text analysis,
multimodal plumbing (SURVEY.md §2.2 last row; BASELINE.json north
star).

Oracle-checked where SQL-expressible — including the approximate
paths whose hash families are deterministically pinned: SimHash
(md5 token hashes), sign-LSH ANN (md5-derived hyperplanes embedded
as oracle literals), IVF ANN (lowest-id centroids), and MinHash LSH
(md5-pinned signature hashes — the oracle re-derives signatures,
band collisions, and agreement estimates end-to-end); recall vs the
exact Jaccard path is additionally asserted in tests/test_llm_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.operators import dedup as D
from hivetomysql_spark.operators import multimodal as M
from hivetomysql_spark.operators import similarity as S
from hivetomysql_spark.operators import text as T
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table, table_row_count

# shared oracle CTE: whitespace-normalized 3-gram shingles
_SHINGLES_CTE = """
words AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM words, UNNEST(generate_series(1, greatest(len(w) - 2, 1))) AS t(i)
)
"""


@register(
    "dedup_exact",
    oracle="""
    WITH crawl AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
    )
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM crawl
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup over a simulated re-crawl (corpus ∪ copy of
    itself): md5-hash groupBy, deterministic min-id survivor. The
    shuffle key is the 32-byte digest — document bodies never move."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    recrawl = docs.unionByName(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return D.exact_dedup_groups(recrawl, content_col="text", id_col="doc_id")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs (threshold 0.2) via
    inverted-index self-join — the ground truth the approximate dedup
    tiers are measured against."""
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)


# Stop-shingle cap = max(_NGRAM_CAP_FLOOR, ceil(_NGRAM_CAP_FRAC ×
# corpus docs)): a shingle is "boilerplate" when it appears in more
# than 1% of DOCUMENTS, not more than a fixed count — the fixed cap 5
# silently zeroed every match above sf0.01 (the sf0.1 fixture's
# near-dup clusters span up to 25 docs, all > 5, so the round-7 sf1
# differential matched at 0 rows on both engines). The fraction keeps
# the cap scale-invariant: at the driver gate scale (sf0.01, 500
# docs) it still resolves to exactly 5 — binding on ~30 boilerplate
# shingles while the 25 true pairs survive, byte-identical to the old
# behavior — and at sf0.1/sf1 the duplicate-cluster shingles stay
# under 1% so the match path is exercised at every scale.
_NGRAM_CAP_FLOOR = 5
_NGRAM_CAP_FRAC = 0.01


@register(
    "dedup_ngram_jaccard_capped",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    cap AS (
      SELECT GREATEST({_NGRAM_CAP_FLOOR},
                      CAST(CEIL({_NGRAM_CAP_FRAC} * COUNT(*)) AS BIGINT))
             AS v
      FROM documents
    ),
    kept AS (
      SELECT shingle FROM sh GROUP BY shingle
      HAVING COUNT(*) > 1 AND COUNT(*) <= (SELECT v FROM cap)
    ),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM sh a
      JOIN kept k ON k.shingle = a.shingle
      JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.2
    """,
)
def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION configuration of n-gram Jaccard dedup: posting
    lists capped at a document-frequency fraction of the corpus (the
    stop-shingle filter — a shingle shared by more than ~1% of
    documents is boilerplate, not signal, and would emit quadratic
    pairs; floor 5 so the filter still engages on tiny corpora). This
    is the only configuration anyone should run at 100 TB; the
    uncapped twin (``dedup_ngram_jaccard``) exists as the exact
    ground truth at test scale. The oracle applies the identical
    stop-shingle filter (doc-count per shingle in 2..cap, cap derived
    from the same COUNT over documents) so the capped path — the one
    that actually ships — is itself value-gated, not taken on faith
    from the uncapped row. Jaccard denominators keep FULL shingle
    counts; only intersection counts lose boilerplate shingles
    (a documented under-approximation, C4/Gopher-style). The corpus
    count is a one-scalar driver probe (parquet metadata count), not
    a data collect.
    """
    import math

    docs = load_table(spark, sf_dir, "documents")
    # parquet-footer count: keeps query construction action-free
    # (no Spark job for plan-only consumers like freeze_plans or
    # the plan-budget gate)
    cap = max(
        _NGRAM_CAP_FLOOR,
        math.ceil(_NGRAM_CAP_FRAC * table_row_count(sf_dir, "documents")),
    )
    return D.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.2,
        max_posting_len=cap,
    )


def _minhash_hs_expr() -> str:
    # ONE 60-bit md5 base value per shingle (computed once, shared by
    # every signature position) — mirrors the Spark-side hs array
    return (
        "list_transform(shs, s_ -> "
        "('0x' || substr(md5(s_), 1, 15))::BIGINT)"
    )


def _minhash_sig_exprs(num_hashes: int = 32) -> str:
    # Carter-Wegman affine mixes of the base value's 30-bit halves
    # mod 2^31-1 — the exact pinned family
    # minhash_signatures(hash_family="md5") computes; constants come
    # from the same md5 derivation on both sides
    from hivetomysql_spark.operators.dedup import MH_MOD, mh_mix_consts

    parts = []
    for i in range(num_hashes):
        k1, k2, c = mh_mix_consts(i)
        parts.append(
            f"list_min(list_transform(hs, h_ -> "
            f"((h_ // 1073741824) * {k1} + (h_ % 1073741824) * {k2} "
            f"+ {c}) % {MH_MOD}))"
        )
    return "[" + ", ".join(parts) + "]"


@register(
    "dedup_minhash_lsh",
    # fully oracled: the md5-pinned hash family (hash_family="md5")
    # makes signatures, band buckets, candidate generation, and the
    # agreement estimate all engine-reproducible — same technique as
    # dedup_simhash / agg_count_min_sketch
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ),
    shl AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 1)),
               i -> array_to_string(w[i:i+2], ' '))) AS shs
      FROM words
    ),
    hsl AS (
      SELECT doc_id, {_minhash_hs_expr()} AS hs FROM shl
    ),
    sigs AS (
      SELECT doc_id, {_minhash_sig_exprs(32)} AS sig FROM hsl
    ),
    bands AS (
      SELECT doc_id, sig, b,
             array_to_string(sig[b*4+1:b*4+4], '#') AS bucket
      FROM sigs, range(8) r(b)
      QUALIFY COUNT(*) OVER (PARTITION BY b, bucket) <= 1000
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
             a.sig AS sa, c.sig AS sb
      FROM bands a JOIN bands c
        ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b,
           ROUND(len(list_filter(range(1, 33), i -> sa[i] = sb[i]))
                 / 32.0, 4) AS est_jaccard
    FROM cand
    WHERE len(list_filter(range(1, 33), i -> sa[i] = sb[i])) / 32.0 >= 0.2
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (32 hashes) + banded LSH (8 bands × 4 rows) candidate
    pairs with estimated Jaccard ≥ 0.2 — the linear-cost 100 TB dedup
    path. Recall vs the exact Jaccard query is asserted in
    tests/test_llm_ops.py.

    The gate instance pins the hash family to md5
    (``hash_family="md5"``) so the DuckDB oracle re-derives identical
    signatures and band collisions — verifying the LSH mechanism
    itself, not just row counts; production at 100 TB flips back to
    the murmur3 default (same plan, faster hash)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=32, bands=8, threshold=0.2,
        hash_family="md5",
    )


# md5-pinned 60-bit SimHash fingerprints, re-derivable in DuckDB:
# same token hash (first 15 md5 hex chars), same ±1 per-bit votes,
# same bit-majority pack — shared by the fingerprint query and the
# banded near-pair query's exact oracle
_SIMHASH_FP_CTE = """
    toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ), th AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 15))::BIGINT AS th
      FROM toks
    ), votes AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM th, range(60) r(b)
      GROUP BY doc_id, b
    ), fp AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM votes
      GROUP BY doc_id
    )
"""


@register(
    "dedup_simhash",
    # fully oracled: the md5-pinned token hash makes the whole
    # fingerprint engine-reproducible
    oracle=f"WITH {_SIMHASH_FP_CTE} SELECT doc_id, simhash FROM fp",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprint per document (md5-derived token
    hashes, bit-majority vote) — constant-size near-dup sketch."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash(docs, "doc_id", "text")


# radius 4 = 5 bands of 12 bits (4096 buckets/band). The radius sets
# the BAND WIDTH (k+1 bands over 60 bits), and band width sets the
# accidental-collision rate: radius 8 would need 9 bands of ~6.7 bits
# (≤128 buckets), whose buckets go quadratic — measured 80 s at the
# derived sf1 vs ~4 s for this configuration (SCALING.md). Radius 3-4
# is also where production 64-bit SimHash systems operate (Manku et
# al., WWW'07).
_SIMHASH_MAX_HAMMING = 4


@register(
    "dedup_simhash_pairs",
    # the banded join's recall is GUARANTEED 100% for hamming ≤ k
    # (pigeonhole over k+1 bands), so the exact quadratic hamming
    # join IS the oracle — any banding miss is a hash mismatch
    oracle=f"""
    WITH {_SIMHASH_FP_CTE}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SIMHASH_MAX_HAMMING}
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming ≤ 4 via banded blocking with
    the pigeonhole full-recall guarantee (5 disjoint 12-bit bands of
    the 60-bit fingerprint: ≤ 4 differing bits cannot touch all 5
    bands, so every true pair collides somewhere). The oracle runs
    the exact all-pairs hamming join — equality certifies the banding
    loses nothing, which is precisely the operator's contract. At
    100 TB only the banded path runs; the quadratic check stays
    test-scale. See the radius/band-width cost note above
    ``_SIMHASH_MAX_HAMMING``.
    """
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_pairs(
        docs, "doc_id", "text", max_hamming=_SIMHASH_MAX_HAMMING
    )


@register(
    "similarity_cosine_topk",
    oracle="""
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
    FROM (
      SELECT a.vec_id AS query_id,
             b.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                        / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                           * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) DESC,
                        b.vec_id
             ) AS rank,
             ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cosine
      FROM embeddings a
      JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < 10
    )
    WHERE rank <= 5
    """,
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 neighbors for 10 query vectors —
    broadcast queries × candidate scan, JVM-side zip_with/aggregate
    dot products, per-query window ranking."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk_bruteforce(
        emb, query_pred=F.col("__id") < 10, k=5
    )


def _lsh_oracle_sql(n_planes: int = 4, n_tables: int = 8, dim: int = 64) -> str:
    """Reproduce the sign-LSH bucketing in DuckDB: the hyperplanes are
    md5-derived constants (operators/similarity.py:hyperplanes), so
    the exact plane matrix is embedded as SQL literals and the oracle
    recomputes identical buckets, the identical any-table collision
    candidate set, and the identical cosine ranking."""
    planes = S.hyperplanes(dim, n_planes * n_tables)

    def lit(p: list[float]) -> str:
        return "[" + ",".join(repr(x) for x in p) + "]"

    def bucket(t: int) -> str:
        return " + ".join(
            "(CASE WHEN list_dot_product(v, "
            + lit(planes[t * n_planes + b])
            + f") >= 0.0 THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
            for b in range(n_planes)
        )

    bks = ", ".join(bucket(t) for t in range(n_tables))
    return f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      FROM embeddings
    ), b AS (
      SELECT vec_id, v, nrm, [{bks}] AS bks FROM base
    ), h AS (
      SELECT vec_id, tbl, bks[tbl + 1] AS bucket
      FROM b, range({n_tables}) r(tbl)
    ), cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM h q JOIN h c
        ON c.tbl = q.tbl AND c.bucket = q.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    ), scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             list_dot_product(qa.v, ca.v) / (qa.nrm * ca.nrm) AS cos
      FROM cand
      JOIN b qa ON qa.vec_id = cand.query_id
      JOIN b ca ON ca.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           ROUND(cos, 6) AS cosine
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id
      ) AS rank
      FROM scored
    )
    WHERE rank <= 5
    """


@register("similarity_lsh_topk", oracle=_lsh_oracle_sql())
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table sign-LSH approximate top-5 — the 100 TB ANN path
    (8 tables × 4-bit buckets; only colliding pairs scored). Recall
    vs brute force asserted in tests/test_llm_ops.py. Fully oracled:
    the md5-derived hyperplanes are embedded in the oracle SQL as
    literals, so DuckDB reproduces buckets, candidates, and ranking
    exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.lsh_cosine_topk(
        emb, query_pred=F.col("__id") < 10, k=5, n_planes=4, n_tables=8, dim=64
    )


@register(
    "similarity_ivf_topk",
    # fully oracled: centroids are the n_cells lowest-id vectors and
    # assignment is argmax-dot with cell-id tie-break — both exactly
    # reproducible relationally in DuckDB
    oracle="""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      FROM embeddings
    ), cent AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
      FROM (SELECT vec_id, v FROM base ORDER BY vec_id LIMIT 16)
    ), assign AS (
      SELECT b.vec_id, c.cell,
             ROW_NUMBER() OVER (
               PARTITION BY b.vec_id
               ORDER BY list_dot_product(b.v, c.cv) DESC, c.cell
             ) AS prank
      FROM base b CROSS JOIN cent c
    ), indexed AS (
      SELECT vec_id, cell FROM assign WHERE prank = 1
    ), qprobe AS (
      SELECT vec_id AS query_id, cell
      FROM assign WHERE prank <= 4 AND vec_id < 10
    ), cand AS (
      SELECT q.query_id, i.vec_id AS neighbor_id
      FROM qprobe q JOIN indexed i
        ON i.cell = q.cell AND i.vec_id <> q.query_id
    ), scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             list_dot_product(qa.v, ca.v) / (qa.nrm * ca.nrm) AS cos
      FROM cand
      JOIN base qa ON qa.vec_id = cand.query_id
      JOIN base ca ON ca.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           ROUND(cos, 6) AS cosine
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id
      ) AS rank
      FROM scored
    )
    WHERE rank <= 5
    """,
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-5 — FAISS's coarse-quantizer
    layout done relationally: map-side cell assignment against
    broadcast centroids, equi-join on cell, candidates cut to
    ~nprobe/n_cells of the corpus. Recall vs brute force asserted in
    tests/test_llm_ops.py. Fully oracled: the deterministic
    lowest-id-rows centroids and argmax-dot assignment are
    re-derived relationally in DuckDB."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivf_cosine_topk(
        emb, query_pred=F.col("__id") < 10, k=5, n_cells=16, nprobe=4
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cosine
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
             * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.45
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.45), exact
    upper-triangle comparison — the semantic-dedup correctness
    baseline; the LSH bucket join is the 100 TB candidate generator
    for the same verify expression."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.embedding_cosine_pairs(emb, threshold=0.45)


@register(
    "text_token_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks,
             text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INT)   AS n_tokens,
           CAST(length(text) AS INT) AS n_chars,
           CAST(strlen(text) AS INT) AS n_bytes,
           ROUND(list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks), 4)
             AS avg_token_len,
           ROUND(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS ttr
    FROM t
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics (token/char/byte counts, mean
    token length, type-token ratio) — pure column expressions."""
    docs = load_table(spark, sf_dir, "documents")
    return T.token_stats(docs, "doc_id", "text")


@register(
    "text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             len(toks) AS n,
             len(list_filter(toks, x -> list_contains({T.STOPWORDS!r}, x))) AS n_stop,
             len(list_distinct(toks)) AS n_dist
      FROM t
    )
    SELECT doc_id,
           CAST(n AS INT) AS n_tokens,
           ROUND(n_stop * 1.0 / n + 1e-9, 4) AS stopword_ratio,
           ROUND(1.0 - n_dist * 1.0 / n + 1e-9, 4) AS repetition,
           ROUND(0.4 * least(n / 200.0, 1.0)
                 + 0.3 * least(n_stop * 1.0 / n * 5, 1.0)
                 + 0.3 * (1.0 - (1.0 - n_dist * 1.0 / n)) + 1e-9, 4) AS quality
    FROM s
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style cheap quality score: length saturation +
    stopword ratio + repetition penalty."""
    docs = load_table(spark, sf_dir, "documents")
    return T.quality_score(docs, "doc_id", "text")


def _langid_oracle() -> str:
    score_exprs = []
    for lang, words in sorted(T.LANG_MARKERS.items()):
        score_exprs.append(
            f"len(list_filter(toks, x -> list_contains({words!r}, x))) AS s_{lang}"
        )
    scores = ",\n             ".join(score_exprs)
    # mirror Spark greatest(struct(score, lang)): max score, ties →
    # lexicographically larger lang code
    return f"""
    WITH t AS (
      SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, lang,
             {scores}
      FROM t
    ), m AS (
      SELECT *, greatest(s_de, s_en, s_es, s_fr) AS best FROM s
    )
    SELECT doc_id,
           lang AS lang_declared,
           CAST(best AS INT) AS marker_hits,
           CASE WHEN best = 0 THEN 'und'
                WHEN s_fr = best THEN 'fr'
                WHEN s_es = best THEN 'es'
                WHEN s_en = best THEN 'en'
                ELSE 'de' END AS lang_predicted
    FROM m
    """


@register("text_langid", oracle=_langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word-vote language ID (deterministic argmax) — the
    Spark shape of a real fastText/CLD3 classifier stage."""
    docs = load_table(spark, sf_dir, "documents")
    return T.language_id(docs, "doc_id", "text")


@register(
    "text_fingerprint",
    oracle="""
    WITH n AS (
      SELECT doc_id,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
      FROM documents
    )
    SELECT doc_id,
           fp AS fp_md5,
           CAST(list_sum(list_transform(generate_series(1, 15), i ->
             (strpos('0123456789abcdef', substr(fp, i, 1)) - 1)::BIGINT
               << (4 * (15 - i)))) AS BIGINT) AS fp_prefix60
    FROM n
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content md5 fingerprint + 60-bit numeric prefix
    (shard/bucket key)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.fingerprint(docs, "doc_id", "text")


def _mm_byte(expr: str, j: str) -> str:
    # byte j (0-based) of an md5 digest, from its hex string
    return f"('0x' || substr(md5({expr}), 2 * ({j}) + 1, 2))::INT"


def _mm_features_oracle() -> str:
    """Re-derive the ENTIRE multimodal feature pipeline in SQL: the
    payload synthesizers are deterministic (md5-seeded sine for WAV,
    md5-chunk pixels for PPM/video), so DuckDB regenerates the same
    samples/pixels and recomputes every feature — cross-engine proof
    that the Arrow mapInPandas decode computes what it claims."""
    # txt stub: 8 little-endian uint32 slices of sha256(payload)/2^32
    txt_f = ", ".join(
        "ROUND(('0x' || substr(sha256(text), {b3}, 2)"
        " || substr(sha256(text), {b2}, 2)"
        " || substr(sha256(text), {b1}, 2)"
        " || substr(sha256(text), {b0}, 2))::BIGINT"
        " / 4294967296.0, 6) AS f{i}".format(
            i=i, b0=8 * i + 1, b1=8 * i + 3, b2=8 * i + 5, b3=8 * i + 7
        )
        for i in range(8)
    )
    pix = _mm_byte("'ppm:' || img_id || ':' || (p // 16)", "p % 16")
    return f"""
    WITH base AS (
      SELECT doc_id, text, doc_id % 4 AS m, length(text) AS tlen
      FROM documents
    ),
    txt_out AS (
      SELECT doc_id, 'txt' AS format, CAST(strlen(text) AS BIGINT) AS n_bytes,
             {txt_f}
      FROM base WHERE m = 3
    ),
    wav_meta AS (
      SELECT doc_id,
             200.0 + {_mm_byte("'wav:' || doc_id", "0")} * 4.0 AS freq,
             160 + least(tlen, 1440) AS n
      FROM base WHERE m = 0
    ),
    wav_samp AS (
      SELECT doc_id, n, t,
             trunc(0.3 * 32767 * sin(2 * pi() * freq * t / 8000.0)) / 32768.0
               AS x,
             n // 4 AS seg
      FROM wav_meta, UNNEST(generate_series(0, n - 1)) AS g(t)
    ),
    wav_sgn AS (
      SELECT doc_id, n, t, x, seg,
             LAG(x) OVER (PARTITION BY doc_id ORDER BY t) AS px
      FROM wav_samp
    ),
    wav_out AS (
      SELECT doc_id, 'wav' AS format,
             CAST(44 + 2 * MAX(n) AS BIGINT) AS n_bytes,
             ROUND(MAX(n) / 8000.0, 6) AS f0,
             ROUND(SQRT(SUM(x * x) / MAX(n)), 6) AS f1,
             ROUND(MAX(ABS(x)), 6) AS f2,
             ROUND(SUM(CASE WHEN t >= 1 AND (x < 0) <> (px < 0)
                            THEN 1 ELSE 0 END) * 1.0 / (MAX(n) - 1), 6)
               AS f3,
             ROUND(SUM(CASE WHEN t // seg = 0 THEN ABS(x) ELSE 0 END)
                   / MAX(seg), 6) AS f4,
             ROUND(SUM(CASE WHEN t // seg = 1 THEN ABS(x) ELSE 0 END)
                   / MAX(seg), 6) AS f5,
             ROUND(SUM(CASE WHEN t // seg = 2 THEN ABS(x) ELSE 0 END)
                   / MAX(seg), 6) AS f6,
             ROUND(SUM(CASE WHEN t // seg = 3 THEN ABS(x) ELSE 0 END)
                   / MAX(seg), 6) AS f7
      FROM wav_sgn GROUP BY doc_id
    ),
    img_meta AS (
      SELECT doc_id, m,
             CASE WHEN m = 1 THEN doc_id ELSE doc_id * 1000 END AS img_id
      FROM base WHERE m IN (1, 2)
    ),
    img_px AS (
      SELECT doc_id, m, p, p % 3 AS ch, p // 3 AS pix_i,
             {pix} AS b
      FROM img_meta, UNNEST(generate_series(0, 767)) AS g(p)
    ),
    img_luma AS (
      -- exact integer luma millis: matches the operator's
      -- cancellation-free path (k/256000 halves round identically)
      SELECT doc_id, m, pix_i,
             SUM(CASE ch WHEN 0 THEN 299 * b
                         WHEN 1 THEN 587 * b
                         ELSE 114 * b END) AS l1000
      FROM img_px GROUP BY doc_id, m, pix_i
    ),
    img_lstat AS (
      SELECT doc_id, m, SUM(l1000) / 256000.0 AS lmean,
             SQRT(SUM((l1000 / 1000.0 - lm) * (l1000 / 1000.0 - lm))
                  / 256.0) AS lstd
      FROM (SELECT doc_id, m, pix_i, l1000,
                   SUM(l1000) OVER (PARTITION BY doc_id) / 256000.0 AS lm
            FROM img_luma)
      GROUP BY doc_id, m
    ),
    img_out AS (
      SELECT c.doc_id,
             CASE c.m WHEN 1 THEN 'ppm' ELSE 'ppmvid' END AS format,
             CAST(CASE c.m WHEN 1 THEN 781 ELSE 2343 END AS BIGINT)
               AS n_bytes,
             16.0 AS f0, 16.0 AS f1,
             ROUND(c.rs, 6) AS f2, ROUND(c.gs, 6) AS f3,
             ROUND(c.bs, 6) AS f4,
             ROUND(l.lmean, 6) AS f5, ROUND(l.lstd, 6) AS f6,
             1.0 AS f7
      FROM (
        SELECT doc_id, m,
               SUM(CASE WHEN ch = 0 THEN b ELSE 0 END) / 256.0 AS rs,
               SUM(CASE WHEN ch = 1 THEN b ELSE 0 END) / 256.0 AS gs,
               SUM(CASE WHEN ch = 2 THEN b ELSE 0 END) / 256.0 AS bs
        FROM img_px GROUP BY doc_id, m
      ) c JOIN img_lstat l ON l.doc_id = c.doc_id
    )
    SELECT * FROM txt_out
    UNION ALL SELECT * FROM wav_out
    UNION ALL SELECT * FROM img_out
    """


@register("multimodal_features", oracle=_mm_features_oracle())
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction end-to-end over a mixed-modality
    asset table: real RIFF/WAV PCM features (duration/RMS/peak/ZCR/
    band energies), real PPM pixel statistics (RGB means, luma
    moments), and the deterministic txt stub — all decoded in pure
    stdlib Python inside Arrow-batched mapInPandas (see
    operators/multimodal.py).

    FULLY ORACLED: the asset synthesizers are deterministic, so the
    DuckDB twin re-synthesizes the WAV sine samples and PPM pixel
    bytes IN SQL and recomputes every feature — the decode path is
    value-verified cross-engine, not just contract-shaped. (The only
    fp hazard is trunc() at an exact integer boundary of sin(), which
    has measure ~0.)"""
    docs = load_table(spark, sf_dir, "documents")
    binary = M.attach_multimodal_payload(docs, "doc_id", "text")
    feats = M.extract_features(binary)
    # Project the feature vector to scalar columns for the harness
    # (array cells break the driver's canonical sort); the operator
    # itself still returns the full array<float> plus a sha1 digest.
    return feats.select(
        "doc_id",
        "format",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        *[
            F.round(F.element_at("feature", i + 1).cast("double"), 6).alias(
                f"f{i}"
            )
            for i in range(M.FEATURE_DIM)
        ],
    )


@register(
    "multimodal_resize",
    # FULL CONTENT equality: the oracle reconstructs the resized
    # payload BYTES as a hex string — the P6 header plus the exact
    # nearest-neighbor-sampled pixel bytes (md5-chunk synthesis), and
    # the decimated text bytes — and compares against Spark's
    # hex(payload). Every output byte is cross-engine verified.
    oracle="""
    WITH base AS (
      SELECT doc_id, text, strlen(text) AS n FROM documents
      WHERE doc_id % 4 IN (1, 3)
    ),
    ppm_px AS (
      -- resized 8x8 pixel byte k (0..191): source pixel at
      -- (sy,sx) = (2*(k/24), 2*((k%24)/3)), channel k%3; source byte
      -- index p feeds the md5-chunk lookup of the synthesizer
      SELECT doc_id, k,
             ((2 * (k // 24)) * 16 + 2 * ((k % 24) // 3)) * 3 + (k % 3) AS p
      FROM base, UNNEST(generate_series(0, 191)) AS g(k)
      WHERE doc_id % 4 = 1
    ),
    ppm_hex AS (
      SELECT doc_id,
             string_agg(
               upper(substr(md5('ppm:' || doc_id || ':' || (p // 16)),
                            2 * (p % 16) + 1, 2)),
               '' ORDER BY k) AS px_hex
      FROM ppm_px GROUP BY doc_id
    ),
    ppm_out AS (
      SELECT doc_id, 'ppm' AS format, CAST(203 AS BIGINT) AS n_bytes,
             CAST(64 AS BIGINT) AS target_px,
             hex('P6' || chr(10) || '8 8' || chr(10) || '255' || chr(10))
               || px_hex AS payload_hex
      FROM ppm_hex
    ),
    txt_small AS (
      SELECT doc_id, 'txt' AS format, CAST(n AS BIGINT) AS n_bytes,
             CAST(64 AS BIGINT) AS target_px, hex(text) AS payload_hex
      FROM base WHERE doc_id % 4 = 3 AND n <= 64
    ),
    txt_big AS (
      -- decimation stub: byte i of output = input[int(i * n/64.0)],
      -- float arithmetic matching Python's int(i * step)
      SELECT doc_id, 'txt' AS format, CAST(64 AS BIGINT) AS n_bytes,
             CAST(64 AS BIGINT) AS target_px,
             string_agg(
               hex(substr(text,
                          CAST(trunc(i * (n / 64.0)) AS INT) + 1, 1)),
               '' ORDER BY i) AS payload_hex
      FROM base, UNNEST(generate_series(0, 63)) AS g(i)
      WHERE doc_id % 4 = 3 AND n > 64
      GROUP BY doc_id, n
    )
    SELECT * FROM ppm_out
    UNION ALL SELECT * FROM txt_small
    UNION ALL SELECT * FROM txt_big
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize stage: REAL nearest-neighbor PPM resize (valid P6
    out, 8×8 from 16×16) for image assets, decimation stub for text
    payloads — Arrow-batched 1:1 binary→binary with bounded output
    size. The oracle rebuilds the resized payload byte-for-byte in
    SQL (P6 header + nearest-neighbor-sampled md5-chunk pixels /
    decimated text bytes) and compares hex strings — full content
    equality, not just geometry."""
    docs = load_table(spark, sf_dir, "documents")
    binary = M.attach_multimodal_payload(docs, "doc_id", "text").where(
        F.col("format").isin("ppm", "txt")
    )
    return M.resize_payloads(binary, target_px=64).select(
        "doc_id",
        "format",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("target_px").cast("long").alias("target_px"),
        F.hex("payload").alias("payload_hex"),
    )


@register(
    "multimodal_frame_sample",
    # the frame CONTENT digest is sha1 (not SQL-reproducible), but the
    # sampling geometry — which frames are taken and their exact byte
    # sizes — is pure arithmetic on the deterministic payloads, so the
    # oracle re-derives every (doc, frame_idx, frame_bytes) row
    oracle="""
    WITH base AS (
      SELECT doc_id, strlen(text) AS n FROM documents
    ),
    vid AS (
      -- 3-frame concatenated P6 stream: frames are 781 bytes each
      SELECT doc_id, f AS frame_idx, CAST(781 AS BIGINT) AS frame_bytes
      FROM base, UNNEST(generate_series(0, 2)) AS g(f)
      WHERE doc_id % 4 = 2
    ),
    txt AS (
      SELECT doc_id, f AS frame_idx,
             CAST(least(256, n - f * (n // greatest(1, least(4, n // 256))))
                  AS BIGINT) AS frame_bytes
      FROM base,
           UNNEST(generate_series(0,
             greatest(1, least(4, n // 256)) - 1)) AS g(f)
      WHERE doc_id % 4 = 3
    )
    SELECT doc_id, frame_idx, frame_bytes FROM vid
    UNION ALL SELECT doc_id, frame_idx, frame_bytes FROM txt
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: REAL frame-boundary walking of
    concatenated-P6 streams (the ffmpeg image2pipe ppm format) for
    video assets — up to 4 evenly-spaced actual frames per payload —
    plus the byte-slicing stub for text. Row-expanding (1:N, N ≤ 4)
    mapInPandas with bounded fan-out. The oracle re-derives the
    sampling geometry (frame indexes and exact byte sizes) from the
    deterministic payload synthesis; the sha1 content digest stays in
    the operator output for the pytest round-trip checks."""
    docs = load_table(spark, sf_dir, "documents")
    binary = M.attach_multimodal_payload(docs, "doc_id", "text").where(
        F.col("format").isin("ppmvid", "txt")
    )
    return M.sample_frames(binary, every_n_bytes=256, max_frames=4).select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("frame_bytes").cast("long").alias("frame_bytes"),
    )


def _clean_ctes() -> str:
    """Shared oracle prefix: dedup -> tokenize -> langid -> quality
    CTE chain (WITH-body through ``q``), reused by the corpus-clean
    and training-mix composites."""
    score_exprs = []
    for lang, words in sorted(T.LANG_MARKERS.items()):
        score_exprs.append(
            f"len(list_filter(toks, x -> list_contains({words!r}, x))) AS s_{lang}"
        )
    scores = ",\n             ".join(score_exprs)
    return f"""
    keep AS (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ), kept AS (
      SELECT d.* FROM documents d JOIN keep USING (doc_id)
    ), t AS (
      SELECT doc_id, source,
             string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM kept
    ), s AS (
      SELECT doc_id, source, toks,
             {scores}
      FROM t
    ), lang_en AS (
      SELECT doc_id, source, toks
      FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr) AS best FROM s)
      WHERE best > 0 AND s_en = best AND s_fr <> best AND s_es <> best
    ), q AS (
      SELECT doc_id, source,
             CAST(len(toks) AS INT) AS n_tokens,
             ROUND(0.4 * least(len(toks) / 200.0, 1.0)
                   + 0.3 * least(len(list_filter(toks,
                         x -> list_contains({T.STOPWORDS!r}, x))) * 1.0
                         / len(toks) * 5, 1.0)
                   + 0.3 * (len(list_distinct(toks)) * 1.0 / len(toks))
                   + 1e-9, 4)
               AS quality
      FROM lang_en
    )
    """


def _corpus_clean_oracle() -> str:
    """Composite oracle: the dedup/langid/quality CTEs chained the
    same way the Spark pipeline chains the operators."""
    return f"""
    WITH {_clean_ctes()}
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(quality), 4) AS avg_quality
    FROM q
    WHERE quality >= 0.5
    GROUP BY source
    """


def _training_mix_oracle() -> str:
    return f"""
    WITH {_clean_ctes()},
    mix AS (
      SELECT doc_id, source, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
      FROM q WHERE quality >= 0.5
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM((n_tokens - 1) // 16 + 1) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tokens) // 256 AS BIGINT) AS n_full_bins
    FROM mix WHERE rk <= 30
    GROUP BY source
    """


@register("pipeline_corpus_clean", oracle=_corpus_clean_oracle())
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end C4-style corpus cleaning: exact dedup (min-id
    survivor) → language filter (predicted 'en') → quality threshold
    (≥ 0.5) → per-source corpus summary. The composition is the
    point: every stage is the same operator the standalone queries
    expose, chained lazily so Catalyst fuses the narrow stages into
    one pass over the corpus; the only shuffles are the dedup
    groupBy and the final tiny aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    keep = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = docs.join(keep.select("doc_id"), "doc_id")
    # one linear chain — lang and quality are narrow projections that
    # CARRY the columns the next stage needs, instead of three
    # self-joins back to `kept` (which tripled the corpus scans and
    # took the plan from 3 shuffles to 14)
    lang = T.language_id(kept, "doc_id", "text", carry=("source", "text")).where(
        F.col("lang_predicted") == "en"
    )
    cleaned = T.quality_score(lang, "doc_id", "text", carry=("source",)).where(
        F.col("quality") >= 0.5
    )
    return cleaned.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )


@register(
    "text_bpe_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s'']+'
           )) AS INT) AS n_bpe_tokens,
           CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT)
             AS n_words,
           ROUND(len(regexp_extract_all(text,
             '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s'']+'
           )) * 1.0 / len(string_split_regex(trim(lower(text)), '\\s+')), 4)
             AS tokens_per_word
    FROM documents
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-token counting (GPT-2 pretokenizer shape, minus
    lookahead) vs whitespace words — the corpus token-budget
    estimator, identical regex on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    return T.bpe_token_stats(docs, "doc_id", "text")


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.2
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
    FROM reach GROUP BY a
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components (cluster_id = min doc id
    per component) via iterative min-label propagation — the step
    that turns pairwise similarity into keep/drop decisions. The
    DuckDB oracle computes the same components with a recursive CTE,
    so the iterative Spark path is value-checked against a closed-form
    transitive closure."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    return D.connected_components(pairs)


@register(
    "pipeline_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.2
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    clusters AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (
             WHERE c.doc_id IS NOT NULL AND c.cluster_id <> c.doc_id
           ) AS BIGINT) AS n_dropped
    FROM documents d LEFT JOIN clusters c USING (doc_id)
    GROUP BY d.source
    """,
)
def pipeline_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup sweep outcome: pairs → components →
    per-source kept/dropped counts (drop = any doc that is not its
    cluster's min-id survivor). This is the number a curation run
    reports — 'dedup removed X% of source Y'. The left join keeps
    never-paired docs as survivors for free."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    clusters = D.connected_components(pairs)
    joined = docs.select("doc_id", "source").join(clusters, "doc_id", "left")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(
            F.col("cluster_id").isNotNull()
            & (F.col("cluster_id") != F.col("doc_id"))
        ).alias("n_dropped"),
    )


@register(
    "text_winnow_fingerprint",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ),
    kg AS (
      SELECT doc_id, i AS pos,
             CAST(list_sum(list_transform(generate_series(1, 15), j ->
               (strpos('0123456789abcdef',
                       substr(md5(array_to_string(w[i+1:i+3], ' ')), j, 1)) - 1)::BIGINT
                 << (4 * (15 - j)))) AS BIGINT) AS h
      FROM toks, UNNEST(generate_series(0, len(w) - 3)) AS t(i)
    ),
    winmin AS (
      SELECT doc_id, pos,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
             MAX(pos) OVER (PARTITION BY doc_id) AS maxpos
      FROM kg
    ),
    fps AS (
      SELECT DISTINCT doc_id, fp FROM winmin WHERE pos <= maxpos - 3
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_fps,
           CAST(SUM(fp % 2147483648) % 2147483648 AS BIGINT) AS fp_checksum
    FROM fps
    GROUP BY doc_id
    """,
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) rolling-hash fingerprints over 3-gram md5
    hashes, window 4 — per-doc fingerprint-set size + checksum, with
    the DuckDB oracle computing bit-identical fingerprints."""
    docs = load_table(spark, sf_dir, "documents")
    return T.winnow_fingerprints(docs, "doc_id", "text", k=3, window=4)


@register(
    "multimodal_audio_windows",
    # fully value-oracled minus the sha1 content digest: DuckDB
    # re-synthesizes the PCM sine samples and recomputes every
    # window's true RMS level (and every text window's mean byte)
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text, strlen(text) AS n FROM documents
    ),
    wav_meta AS (
      SELECT doc_id,
             200.0 + {{wavbyte}} * 4.0 AS freq,
             160 + least(n, 1440) AS ns
      FROM base WHERE doc_id % 4 = 0
    ),
    wav_samp AS (
      SELECT doc_id, ns, t,
             trunc(0.3 * 32767 * sin(2 * pi() * freq * t / 8000.0))
               / 32768.0 AS x
      FROM wav_meta, UNNEST(generate_series(0, ns - 1)) AS g(t)
    ),
    wav_assign AS (
      -- overlapping windows: sample t belongs to windows floor(t/50)
      -- and floor(t/50)-1 (100-sample window, 50-sample hop)
      SELECT doc_id, ns, t, x, w
      FROM wav_samp, UNNEST([t // 50, t // 50 - 1]) AS a(w)
      WHERE w >= 0 AND w * 50 <= t AND t < w * 50 + 100 AND w * 50 < ns
    ),
    wav_out AS (
      SELECT doc_id, CAST(w AS BIGINT) AS win_idx,
             CAST(w * 100 AS BIGINT) AS start_byte,
             ROUND(SQRT(SUM(x * x) / COUNT(*)), 4) AS level
      FROM wav_assign GROUP BY doc_id, w
    ),
    txt_assign AS (
      -- byte j (1-based char, ascii corpus) belongs to windows
      -- floor((j-1)/100) and floor((j-1)/100)-1 (200-byte window,
      -- 100-byte hop)
      SELECT doc_id, n, j, unicode(substr(text, j, 1)) AS b, w
      FROM base, UNNEST(generate_series(1, n)) AS g(j),
           UNNEST([(j - 1) // 100, (j - 1) // 100 - 1]) AS a(w)
      WHERE doc_id % 4 = 3
        AND w >= 0 AND w * 100 <= j - 1 AND j - 1 < w * 100 + 200
        AND w * 100 < n
    ),
    txt_out AS (
      SELECT doc_id, CAST(w AS BIGINT) AS win_idx,
             CAST(w * 100 AS BIGINT) AS start_byte,
             ROUND(SUM(b) * 1.0 / COUNT(*), 4) AS level
      FROM txt_assign GROUP BY doc_id, w
    )
    SELECT * FROM wav_out UNION ALL SELECT * FROM txt_out
    """.format(
        wavbyte="('0x' || substr(md5('wav:' || doc_id), 1, 2))::INT"
    ),
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing: REAL decoded-PCM sliding windows (100-sample
    windows, 50-sample hop, true RMS level) over RIFF/WAV assets,
    byte-window stub over text — overlapping 1:N mapInPandas (frames
    are evenly spaced, windows overlap; see
    operators/multimodal.py:window_audio). The oracle re-synthesizes
    the PCM samples in SQL and recomputes every window's RMS — the
    windowing arithmetic and the level math are cross-engine
    verified; the sha1 content digest stays in the operator output
    for pytest round-trips."""
    docs = load_table(spark, sf_dir, "documents")
    binary = M.attach_multimodal_payload(docs, "doc_id", "text").where(
        F.col("format").isin("wav", "txt")
    )
    return M.window_audio(binary).select(
        "doc_id",
        F.col("win_idx").cast("long").alias("win_idx"),
        F.col("start_byte").cast("long").alias("start_byte"),
        "level",
    )


_HH_DEPTH = 4
_HH_WIDTH = 512
_HH_SUPPORT = 0.15


def _hh_bucket_sql(i: str, key: str) -> str:
    return (
        f"('0x' || substr(md5('hh' || {i} || ':' || {key}), 1, 8))::BIGINT"
        f" % {_HH_WIDTH}"
    )


@register(
    "agg_heavy_hitters",
    oracle=f"""
    WITH hashed AS (
      SELECT i AS d,
             {_hh_bucket_sql("i::VARCHAR", "event_type")} AS b
      FROM events, UNNEST([0, 1, 2, 3]) AS t(i)
    ),
    cms AS (SELECT d, b, COUNT(*) AS cnt FROM hashed GROUP BY 1, 2),
    total AS (SELECT COUNT(*) AS n FROM events),
    cand AS (SELECT DISTINCT event_type FROM events),
    pb AS (
      SELECT event_type, i AS d,
             {_hh_bucket_sql("i::VARCHAR", "event_type")} AS b
      FROM cand, UNNEST([0, 1, 2, 3]) AS t(i)
    ),
    est AS (
      SELECT event_type, MIN(cnt) AS cms_est
      FROM pb JOIN cms USING (d, b) GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, COUNT(*) AS exact_n FROM events GROUP BY 1
    )
    SELECT est.event_type,
           CAST(est.cms_est AS BIGINT) AS cms_est,
           CAST(exact.exact_n AS BIGINT) AS exact_n,
           CAST(total.n AS BIGINT) AS n_total
    FROM est JOIN exact USING (event_type) CROSS JOIN total
    WHERE est.cms_est > {_HH_SUPPORT} * total.n
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via an md5-pinned count-min sketch (depth 4 ×
    width 512): report every event_type whose CMS estimate exceeds
    support·N. Because CMS never under-counts, every truly frequent
    item is GUARANTEED present (possibly with collision-inflated
    false positives) — the Misra-Gries contract, delivered by the
    one sketch in the family whose contents are order-independent
    and therefore exactly reproducible by the DuckDB oracle.
    (``df.stat.freqItems``'s counter state is merge-order-dependent,
    which is why it was replaced: a distributed engine cannot pin
    its false-positive set.) Exact counts ride along as the audit
    column.

    100 TB shape: the counter table is 2048 cells regardless of
    stream size, mergeable by addition across shards/days; the
    candidate set here is the distinct keys (cheap for enum-like
    columns), at scale a sampled candidate pass probes the sketch
    instead. One explode + one map-side-combined groupBy."""
    ev = load_table(spark, sf_dir, "events")

    def bucket(i: int, key: F.Column) -> F.Column:
        h = F.md5(F.concat(F.lit(f"hh{i}:"), key))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _HH_WIDTH

    hashed = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        bucket(i, F.col("event_type")).alias("b"),
                    )
                    for i in range(_HH_DEPTH)
                ]
            )
        ).alias("h")
    )
    cms = hashed.groupBy(F.col("h.d").alias("d"), F.col("h.b").alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = ev.agg(F.count(F.lit(1)).alias("n"))
    cand = ev.select("event_type").distinct()
    pb = cand.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        bucket(i, F.col("event_type")).alias("b"),
                    )
                    for i in range(_HH_DEPTH)
                ]
            )
        ).alias("h"),
    ).select("event_type", F.col("h.d").alias("d"), F.col("h.b").alias("b"))
    est = (
        pb.join(F.broadcast(cms), ["d", "b"])
        .groupBy("event_type")
        .agg(F.min("cnt").alias("cms_est"))
    )
    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_n"))
    return (
        est.join(exact, "event_type")
        .crossJoin(F.broadcast(total))
        .where(F.col("cms_est") > _HH_SUPPORT * F.col("n"))
        .select(
            "event_type",
            F.col("cms_est").cast("long").alias("cms_est"),
            F.col("exact_n").cast("long").alias("exact_n"),
            F.col("n").cast("long").alias("n_total"),
        )
    )


@register("pipeline_training_mix", oracle=_training_mix_oracle())
def pipeline_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-mix construction, end to end: exact dedup →
    language filter (en) → quality gate (≥ 0.5) → per-source
    contribution cap (30 docs, md5-deterministic) → chunk/pack
    accounting (32-token windows at stride 16; 256-token bins).

    The capstone composite: every stage is the operator the
    standalone queries expose, chained as ONE linear carry-column
    flow — the corpus is scanned once, the dedup groupBy, the
    per-source cap window, and the final per-source aggregate are the
    only shuffles, and the cap window's partitioning feeds the
    aggregate on the same key. This is the job a 100 TB corpus
    actually runs nightly; everything else in the LLM tier exists to
    serve it."""
    docs = load_table(spark, sf_dir, "documents")
    keep = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = docs.join(keep.select("doc_id"), "doc_id")
    lang = T.language_id(kept, "doc_id", "text", carry=("source", "text")).where(
        F.col("lang_predicted") == "en"
    )
    cleaned = T.quality_score(lang, "doc_id", "text", carry=("source",)).where(
        F.col("quality") >= 0.5
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string"))
    )
    mix = cleaned.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= 30
    )
    return mix.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum(F.floor((F.col("n_tokens") - 1) / 16) + 1)
        .cast("bigint")
        .alias("n_chunks"),
        F.floor(F.sum("n_tokens") / 256).cast("bigint").alias("n_full_bins"),
    )


@register(
    "multimodal_dedup_assets",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, sha256(substring(text, 1, 40)) AS payload_sha
      FROM documents
    )
    SELECT payload_sha,
           COUNT(*) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_id
    FROM hashed
    GROUP BY payload_sha
    HAVING COUNT(*) > 1
    """,
)
def multimodal_dedup_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-asset dedup by content-prefix hash: the first 40 bytes
    of each payload (the header region — magic bytes + metadata for
    real jpegs/wavs) hash JVM-side with sha2; only the 32-byte digest
    moves to the groupBy, which is what makes content-dedup of a
    100 TB media corpus IO-bound rather than network-bound. Prefix
    hashing also catches re-encoded copies that share headers —
    full-content sha is the strict variant (same plan, longer input).
    Min-id canonical survivor, duplicate groups only."""
    docs = load_table(spark, sf_dir, "documents")
    binary = M.attach_binary_payload(docs, "doc_id", "text")
    return (
        binary.select(
            "doc_id",
            F.sha2(F.substring("payload", 1, 40), 256).alias("payload_sha"),
        )
        .groupBy("payload_sha")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_id"),
        )
        .where(F.col("n_copies") > 1)
    )


def text_compression_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw per-document zlib compression ratios (the quality signal
    itself). Un-registered: no oracle engine ships zlib, so the raw
    ratio can't be value-checked by DuckDB; the registered
    ``text_compression_quality`` wraps this with the checkable bound
    contract, and pytest pins the ratio ordering invariants
    (spam ≪ prose) on this helper."""
    from pyspark.sql.functions import udf

    @udf(returnType="double", useArrow=True)
    def compression_ratio(text: str) -> float:
        import zlib

        raw = (text or "").encode()
        if not raw:
            return 1.0
        return round(len(zlib.compress(raw, 6)) / len(raw), 4)

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        compression_ratio("text").alias("zlib_ratio"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )


@register(
    "text_compression_quality",
    oracle="""
    SELECT doc_id, source,
           CAST(n_chars AS BIGINT) AS n_chars,
           TRUE AS ratio_in_bounds
    FROM documents
    """,
)
def text_compression_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility as a quality signal: zlib-compressed size over
    raw size per document — template spam and repeated boilerplate
    compress far better than natural prose, making this one of the
    cheapest gibberish/dup-adjacent detectors in corpus cleaning
    (used alongside text_quality's stopword/repetition heuristics).
    Arrow-batched scalar UDF (zlib is stdlib; the bytes never leave
    the executor).

    Driver-checkable contract: no oracle engine ships zlib, so the
    raw ratio lives in the un-registered ``text_compression_ratios``
    helper and the gate row asserts the DEFLATE bound instead —
    0 < ratio ≤ 1.2 for any text ≥ 64 chars (zlib's worst-case
    expansion is 11 bytes + 0.03%, far under the 1.2 slack), trivially
    true below 64 where header overhead dominates. The UDF still runs
    end-to-end; only the float is projected out of the hash."""
    ratios = text_compression_ratios(spark, sf_dir)
    in_bounds = (F.col("n_chars") < 64) | (
        (F.col("zlib_ratio") > 0.0) & (F.col("zlib_ratio") <= 1.2)
    )
    return ratios.select(
        "doc_id", "source", "n_chars", in_bounds.alias("ratio_in_bounds")
    )
