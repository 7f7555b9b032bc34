"""Second LLM-data-pipeline batch: benchmark-contamination screening,
intra-document repetition signals, unigram-LM quality scoring, and
temperature-based source rebalancing.

Extension tier (SURVEY.md §2.2 "LLM-data-pipeline ops") — the
reference (HiveToMysql.java:1-641) has no text analytics at all.
These four are the standard pre-training corpus-curation steps that
sit between dedup and training-mix assembly:

* contamination: drop/flag training docs that share long n-grams with
  an evaluation benchmark (the GPT-3/PaLM 13-gram decontamination
  protocol, here 8-grams against the ``src0`` slice);
* repetition: Gopher-style within-document duplication ratios — the
  strongest single heuristic for machine-generated spam;
* unigram-LM surprisal: cheap corpus-relative "perplexity" proxy —
  outlier docs (too predictable = boilerplate, too surprising =
  noise/garbled encoding) get gated;
* temperature sampling: per-group acceptance rates ∝ n^α rebalance
  skewed source/language distributions without replacement (the
  multilingual-corpus standard, α = 0.5 here).

Scale notes: the contamination benchmark side is vocabulary-bounded
and broadcast — candidate grams are hashed and never shuffled; the
repetition ratios are pure array expressions inside the scan stage
(zero shuffles); LM scoring shuffles O(tokens) once for the vocab and
once for per-doc means; temperature rates are an O(groups) broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.operators.parallelism import spread_for_compute
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"


def _w(df: DataFrame) -> DataFrame:
    return df.select(
        "doc_id",
        "source",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w"),
    )


def _grams(n: int):
    """Distinct word n-grams of token array ``w`` (empty if < n tokens).

    Guarded by ``when`` because ``sequence(1, 0)`` DESCENDS ([1, 0])
    rather than producing an empty sequence — the empty-array branch
    keeps short documents gram-free, matching the oracle's
    ``generate_series`` semantics."""
    idx = F.sequence(F.lit(1), F.size("w") - (n - 1))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice("w", i, n)))
    )
    return F.when(F.size("w") >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


@register(
    "text_contamination_check",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS} AS w FROM documents),
    starts AS (
      SELECT doc_id, source, w,
             UNNEST(generate_series(1, GREATEST(CAST(len(w) AS INT) - 7, 0)))
               AS i
      FROM toks
    ),
    grams AS (
      SELECT DISTINCT doc_id, source,
             array_to_string(list_slice(w, i, i + 7), ' ') AS g
      FROM starts
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0')
    SELECT doc_id, CAST(COUNT(DISTINCT g) AS BIGINT) AS shared_grams
    FROM grams
    WHERE source <> 'src0' AND g IN (SELECT g FROM bench)
    GROUP BY doc_id
    """,
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (source ≠ src0) that
    share ≥1 8-gram with the benchmark slice (source = src0), with
    the count of distinct shared grams.

    The benchmark gram set is the small side — unhinted (in the
    fixtures it is DERIVED from documents and scales with them, so a
    forced broadcast is an OOM promise; a real eval set stays KB–MB
    and AQE broadcasts it on its measured runtime size). The only
    shuffle beyond the join is the per-doc count of the (rare)
    collisions — candidates stream map-side whenever the benchmark
    side fits, which is the
    published decontamination pipelines (GPT-3 appendix C) are this
    exact shape with a Bloom filter standing in for the exact set.
    """
    docs = _w(spread_for_compute(load_table(spark, sf_dir, "documents")))
    grams = docs.select(
        "doc_id", "source", F.explode_outer(_grams(8)).alias("g")
    ).where(F.col("g").isNotNull())
    bench = (
        grams.where(F.col("source") == "src0").select("g").distinct()
    )
    return (
        grams.where(F.col("source") != "src0")
        .join(bench, "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("shared_grams"))
    )


@register(
    "text_repetition_ratio",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    tri AS (
      SELECT doc_id, w,
             list_transform(
               range(1, GREATEST(CAST(len(w) AS INT) - 1, 1)),
               i -> array_to_string(list_slice(w, i, i + 2), ' ')
             ) AS g
      FROM toks
    )
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           ROUND(len(list_distinct(w)) * 1.0 / len(w), 4) AS uniq_token_ratio,
           ROUND(1.0 - len(list_distinct(g)) * 1.0 / GREATEST(len(g), 1), 4)
             AS dup_trigram_ratio
    FROM tri
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition: token-level uniqueness
    and duplicate-trigram fraction per document.

    Pure array expressions over the scan — zero shuffles at any
    scale; the wide text column is consumed in the same stage it is
    read, so nothing but (doc_id, 3 numbers) leaves the scan.
    """
    docs = spread_for_compute(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w")
    )
    tri_idx = F.sequence(F.lit(1), F.greatest(F.size("w") - 2, F.lit(1)))
    tri = F.transform(tri_idx, lambda i: F.concat_ws(" ", F.slice("w", i, 3)))
    return docs.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_tokens"),
        F.round(F.size(F.array_distinct("w")) / F.size("w"), 4).alias(
            "uniq_token_ratio"
        ),
        F.round(
            1.0
            - F.size(F.array_distinct(tri))
            / F.greatest(F.size(tri), F.lit(1)),
            4,
        ).alias("dup_trigram_ratio"),
    )


@register(
    "text_lm_unigram_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST({_TOKS}) AS term FROM documents
    ),
    vocab AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
    total AS (SELECT SUM(cnt) AS n FROM vocab)
    SELECT t.doc_id,
           ROUND(AVG(LN(total.n / v.cnt)), 4) AS lm_surprisal
    FROM tok t JOIN vocab v ON v.term = t.term CROSS JOIN total
    GROUP BY t.doc_id
    """,
)
def text_lm_unigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative unigram-LM surprisal per document: mean over
    token instances of −ln p(token), p = corpus unigram frequency.
    The cheap perplexity proxy quality gates use before any neural
    scorer — boilerplate scores low, garbled text scores high.

    Two aggregates over one tokenization: vocab counts (O(vocab),
    broadcast back) and the per-doc mean (shuffle keyed on doc_id).
    The corpus total folds into the broadcast side; at 100 TB the
    vocab table is the classic Zipf-bounded small side (≪ corpus).
    """
    tok = (
        spread_for_compute(load_table(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
                "term"
            ),
        )
    )
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    return (
        tok.join(F.broadcast(vocab), "term")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(F.round(F.avg(F.log(F.col("n") / F.col("cnt"))), 4).alias("lm_surprisal"))
    )


@register(
    "sample_temperature_mix",
    oracle="""
    WITH stats AS (
      SELECT lang, COUNT(*) AS n_docs, SQRT(COUNT(*)) AS w
      FROM documents GROUP BY lang
    ),
    rates AS (
      SELECT lang, n_docs,
             LEAST(1.0,
                   0.5 * (SELECT SUM(n_docs) FROM stats)
                       * (w / (SELECT SUM(w) FROM stats)) / n_docs) AS rate
      FROM stats
    )
    SELECT d.lang,
           CAST(r.n_docs AS BIGINT) AS n_docs,
           ROUND(r.rate, 4) AS rate,
           CAST(SUM(CASE WHEN
                 CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
                      AS INT) / 65536.0 < r.rate
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents d JOIN rates r ON r.lang = d.lang
    GROUP BY d.lang, r.n_docs, r.rate
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (α = 0.5, target = 50%
    of the corpus): per-language acceptance rate ∝ √n, renormalized,
    applied by deterministic md5 fraction — no RNG, identical sample
    on re-run (the multilingual pre-training mix recipe; α < 1
    upsamples tail languages relative to their share).

    The rate table is O(languages) — computed in one tiny aggregate
    and broadcast; the accept/reject decision is a stateless
    row-local expression, so the sampler itself adds zero shuffles
    at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    stats = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    totals = stats.agg(
        F.sum("n_docs").alias("n_total"),
        F.sum(F.sqrt("n_docs")).alias("w_total"),
    )
    rates = (
        stats.join(F.broadcast(totals))
        .select(
            "lang",
            "n_docs",
            F.least(
                F.lit(1.0),
                0.5
                * F.col("n_total")
                * (F.sqrt("n_docs") / F.col("w_total"))
                / F.col("n_docs"),
            ).alias("rate"),
        )
    )
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        / 65536.0
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .groupBy("lang", "n_docs", "rate")
        .agg(
            F.sum(F.when(frac < F.col("rate"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_sampled")
        )
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.round("rate", 4).alias("rate"),
            "n_sampled",
        )
    )
