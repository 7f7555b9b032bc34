"""Analytics extras, batch 33: model evaluation metrics and the PQ
search path.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* exact ROC-AUC — rank-sum (Mann-Whitney) formulation with tie
  averaging, one pass after ranking.
* calibration / reliability bins — per-decile predicted-vs-observed
  gap, the input to ECE and calibration plots.
* PQ asymmetric-distance search — the query-time half of product
  quantization (lookup-table distances over codes).
* tokenizer fertility — subword tokens per word by language, the
  standard tokenizer-quality metric for multilingual corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "ml_roc_auc",
    oracle="""
    WITH scored AS (
      SELECT o_totalprice AS s,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    ranked AS (
      SELECT y,
             RANK() OVER (ORDER BY s)
               + (COUNT(*) OVER (PARTITION BY s) - 1) / 2.0 AS r
      FROM scored
    )
    SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(SUM(1 - y) AS BIGINT) AS n_neg,
           ROUND((SUM(CASE WHEN y = 1 THEN r ELSE 0 END)
                  - SUM(y) * (SUM(y) + 1.0) / 2.0)
                 / (SUM(y) * SUM(1 - y)), 6) AS auc
    FROM ranked
    """,
)
def ml_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC by the Mann-Whitney rank-sum identity:
    AUC = (Σ ranks of positives − n₊(n₊+1)/2) / (n₊·n₋) with
    tie-averaged (fractional) ranks — the trapezoidal-ROC value
    without materializing a curve, and the identity every
    distributed ML eval uses because it needs ONE rank pass instead
    of threshold sweeps. (Order value vs finished status is
    uninformative by construction, so the fixture's AUC ≈ 0.5 — the
    metric itself is what's verified.)

    Shape: one global rank window over the score (at 100 TB: the
    two-level range-partitioned prefix-sum rank, as in
    `etl_surrogate_keys`) and one scalar aggregate."""
    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        F.col("o_totalprice").alias("s"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    r = (
        F.rank().over(Window.orderBy("s"))
        + (F.count(F.lit(1)).over(Window.partitionBy("s")) - 1) / 2.0
    )
    ranked = scored.select("y", r.alias("r"))
    return ranked.agg(
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("long").alias("n_neg"),
        F.round(
            (
                F.sum(F.when(F.col("y") == 1, F.col("r")).otherwise(0.0))
                - F.sum("y") * (F.sum("y") + 1.0) / 2.0
            )
            / (F.sum("y") * F.sum(1 - F.col("y"))),
            6,
        ).alias("auc"),
    )


@register(
    "ml_calibration_bins",
    oracle="""
    WITH scored AS (
      SELECT PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey) AS p,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    binned AS (
      SELECT least(CAST(FLOOR(p * 10) AS INT), 9) AS bin, p, y
      FROM scored
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(p), 6) AS mean_score,
           ROUND(AVG(y * 1.0), 6) AS frac_pos,
           ROUND(ABS(AVG(p) - AVG(y * 1.0)), 6) AS abs_gap
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability / calibration table: the model score (here the
    deterministic percent-rank of order value standing in for a
    predicted probability) is cut into 10 equal-width bins; each bin
    reports mean predicted score vs observed positive rate and their
    gap — the per-bin terms of Expected Calibration Error and the
    bars of every reliability diagram.

    Shape: one rank window (range-partitionable at scale), one
    map-side-combined groupBy(bin) — the eval is two passes however
    large the scored table is."""
    o = load_table(spark, sf_dir, "orders")
    p = F.percent_rank().over(Window.orderBy("o_totalprice", "o_orderkey"))
    scored = o.select(
        p.alias("p"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    binned = scored.select(
        F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9)).alias("bin"),
        "p",
        "y",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("p"), 6).alias("mean_score"),
            F.round(F.avg(F.col("y") * 1.0), 6).alias("frac_pos"),
            F.round(F.abs(F.avg("p") - F.avg(F.col("y") * 1.0)), 6).alias(
                "abs_gap"
            ),
        )
        .select(F.col("bin").cast("long"), "n", "mean_score", "frac_pos", "abs_gap")
        .orderBy("bin")
    )


_PQ_M = 4
_PQ_HALF = 32


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
             x[1:{_PQ_HALF}] AS c1, x[{_PQ_HALF + 1}:{2 * _PQ_HALF}] AS c2
      FROM e WHERE vec_id < {_PQ_M}
    ),
    codes AS (
      SELECT e.vec_id,
             MIN(struct_pack(
               d := {d(f"e.x[1:{_PQ_HALF}]", "e.x[1:" + str(_PQ_HALF) + "]")}
                    - 2 * {d(f"e.x[1:{_PQ_HALF}]", "c.c1")}
                    + {d("c.c1", "c.c1")},
               c := c.cid)).c AS code1,
             MIN(struct_pack(
               d := {d(f"e.x[{_PQ_HALF + 1}:{2 * _PQ_HALF}]",
                       f"e.x[{_PQ_HALF + 1}:{2 * _PQ_HALF}]")}
                    - 2 * {d(f"e.x[{_PQ_HALF + 1}:{2 * _PQ_HALF}]", "c.c2")}
                    + {d("c.c2", "c.c2")},
               c := c.cid)).c AS code2
      FROM e CROSS JOIN cents c
      GROUP BY e.vec_id
    ),
    q AS (
      SELECT x[1:{_PQ_HALF}] AS q1, x[{_PQ_HALF + 1}:{2 * _PQ_HALF}] AS q2
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
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("x"),
    )
    half = _PQ_HALF

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def d2(xs, cs):
        return dot(xs, xs) - 2 * dot(xs, cs) + dot(cs, cs)

    cents = e.where(F.col("vec_id") < _PQ_M).select(
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


from hivetomysql_spark.operators.text import BPE_PRETOKEN_RE as _BPE_REGEX


@register(
    "text_tokenizer_fertility",
    oracle="""
    WITH per_doc AS (
      SELECT lang,
             len(regexp_extract_all(text,
               '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s'']+'
             )) * 1.0 AS n_tok,
             len(string_split_regex(trim(lower(text)), '\\s+')) * 1.0
               AS n_words
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(n_tok / n_words), 4) AS avg_fertility,
           ROUND(SUM(n_tok) / SUM(n_words), 4) AS corpus_fertility
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: BPE-ish subword tokens per
    whitespace word (same GPT-2-style pre-tokenizer regex as
    `text_bpe_tokens`), per-doc averaged and corpus-weighted — THE
    metric for how fairly a tokenizer treats each language (high
    fertility = more tokens per word = higher serving cost and worse
    effective context for that language; cf. multilingual tokenizer
    papers).

    Shape: two regexp counts per row in the scan stage, one
    groupBy(lang) — zero-shuffle except the O(langs) aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        (F.regexp_count("text", F.lit(_BPE_REGEX)) * 1.0).alias("n_tok"),
        (F.size(F.split(F.trim(F.lower("text")), r"\s+")) * 1.0).alias(
            "n_words"
        ),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg(F.col("n_tok") / F.col("n_words")), 4).alias(
                "avg_fertility"
            ),
            F.round(F.sum("n_tok") / F.sum("n_words"), 4).alias(
                "corpus_fertility"
            ),
        )
        .orderBy("lang")
    )
