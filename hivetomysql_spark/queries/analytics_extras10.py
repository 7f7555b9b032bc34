"""Analytics extras, batch 10: retrieval end-to-end, embedding
compression trade-offs, volume anomaly alerts, and cohort LTV.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's similarity-search / embedding /
data-quality / finance tiers:

* semantic search e2e — query vector -> cosine top-k -> metadata
  join, the full retrieval path in one plan;
* Matryoshka truncation — recall@10 of prefix-16-dim cosine against
  full 64-dim ranking (the MRL trade-off, measured);
* binary quantization — sign-bit signatures + Hamming ranking vs
  exact cosine, recall@10 per query;
* volume spike — trailing-window z-score day alerts;
* cohort LTV — first-order cohorts x age, cumulative spend per
  customer (the retention-triangle economics view).
"""

from __future__ import annotations

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
    e = load_table(spark, sf_dir, "embeddings").select(
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
    e = load_table(spark, sf_dir, "embeddings").select(
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
    e = load_table(spark, sf_dir, "embeddings").select(
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


@register(
    "dq_anomaly_volume_spike",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    scored AS (
      SELECT d, n,
             AVG(n) OVER (ORDER BY d ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)
               AS mu,
             STDDEV_SAMP(n) OVER (ORDER BY d ROWS BETWEEN 28 PRECEDING
                                  AND 1 PRECEDING) AS sigma,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN 28 PRECEDING
                            AND 1 PRECEDING) AS wn
      FROM daily
    )
    SELECT day, n_events, z FROM (
      SELECT d AS day,
             CAST(n AS BIGINT) AS n_events,
             ROUND((n - mu) / sigma, 2) AS z,
             ROW_NUMBER() OVER (ORDER BY abs((n - mu) / sigma) DESC, d) AS rk
      FROM scored
      WHERE wn = 28 AND sigma > 0
    ) WHERE rk <= 5
    """,
)
def dq_anomaly_volume_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume anomaly alerts: each day's event count is scored
    against the trailing 28 days (mean/stddev, current day excluded),
    and the 5 most anomalous days are reported — the pipeline-health
    monitor that catches double-loads and silent drops before
    consumers do.

    Shape: N events compress to O(days) in one grouped pass; the
    trailing window runs on the compressed series. Self-exclusion
    (ROWS ... 1 PRECEDING) matters: a spike must not inflate its own
    baseline."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.orderBy("d").rowsBetween(-28, -1)
    scored = daily.select(
        "d",
        "n",
        F.avg("n").over(wt).alias("mu"),
        F.stddev_samp("n").over(wt).alias("sigma"),
        F.count(F.lit(1)).over(wt).alias("wn"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    flagged = scored.where((F.col("wn") == 28) & (F.col("sigma") > 0)).select(
        F.col("d").alias("day"),
        F.col("n").cast("long").alias("n_events"),
        F.round(z, 2).alias("z"),
        F.row_number().over(Window.orderBy(F.desc(F.abs(z)), "d")).alias("rk"),
    )
    return flagged.where(F.col("rk") <= 5).drop("rk")


@register(
    "finance_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             CAST(date_trunc('month', MIN(CAST(o_orderdate AS DATE)))
                  AS TIMESTAMP) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    sized AS (
      SELECT cohort, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort
    ),
    spend AS (
      SELECT f.cohort,
             date_diff('month', f.cohort,
                       CAST(date_trunc('month', CAST(o.o_orderdate AS DATE))
                            AS TIMESTAMP)) AS age,
             -- integer cents: float partial-sum order would make the
             -- cumulative total differ in the last bit across engines
             CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT s.cohort, s.age,
             SUM(s.rev_cents) OVER (PARTITION BY s.cohort ORDER BY s.age
                              ROWS UNBOUNDED PRECEDING) AS cum_cents,
             z.cohort_size
      FROM spend s JOIN sized z ON z.cohort = s.cohort
    )
    SELECT cohort, CAST(age AS BIGINT) AS age_months,
           CAST(cohort_size AS BIGINT) AS cohort_size,
           ROUND(cum_cents / (100.0 * cohort_size), 2) AS cum_ltv_per_customer
    FROM cum WHERE age <= 6
    """,
)
def finance_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers cohort by first-order
    month; revenue accumulates per cohort across age-in-months; the
    output is cumulative LTV per customer for ages 0-6 — the
    retention-economics view (does a newer cohort monetize faster?)
    that sits one step past retention_weekly's activity matrix.

    Shape: firsts is one groupBy on custkey, re-joined to orders on
    the same key (co-partitioned at scale via bucketing); the
    age-ordered running sum operates on the O(cohorts x ages)
    aggregate, not on orders."""
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min(F.to_date("o_orderdate"))).alias("cohort")
    )
    sized = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    month = F.date_trunc("month", F.to_date("o_orderdate"))
    spend = (
        o.join(firsts, "o_custkey")
        .select(
            "cohort",
            F.months_between(month, F.col("cohort")).cast("long").alias("age"),
            # integer cents: exact associative partial sums (see oracle)
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("cohort", "age")
        .agg(F.sum("cents").alias("rev_cents"))
    )
    wc = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = spend.join(F.broadcast(sized), "cohort").select(
        "cohort",
        "age",
        "cohort_size",
        F.sum("rev_cents").over(wc).alias("cum_cents"),
    )
    return cum.where(F.col("age") <= 6).select(
        "cohort",
        F.col("age").cast("long").alias("age_months"),
        F.col("cohort_size").cast("long").alias("cohort_size"),
        F.round(F.col("cum_cents") / (100.0 * F.col("cohort_size")), 2).alias(
            "cum_ltv_per_customer"
        ),
    )
