"""Analytics extras, batch 74: the corpus release gate.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); SURVEY.md §2.2 extension-tier entry:

* release gate — the ship/no-ship checklist as ONE query: exact-dup
  rate, held-out trigram novelty, language coverage,
  documents<->embeddings integrity, and length sanity, each as a
  (check, value, passed) row with its threshold. The pass/fail
  capstone over `pipeline_dataset_card`'s descriptive table — what
  a data-release review actually signs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "pipeline_release_gate",
    oracle="""
    WITH dups AS (
      SELECT COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dup,
             COUNT(*) AS n FROM documents
    ),
    toks AS (
      SELECT doc_id, source, doc_id % 2 = 0 AS is_train,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    tris AS (
      SELECT is_train, array_to_string(w[i:i+2], ' ') AS g
      FROM toks, UNNEST(generate_series(1, greatest(len(w) - 2, 1))) AS t(i)
    ),
    novelty AS (
      SELECT SUM(CASE WHEN ts.g IS NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
               AS nov
      FROM (SELECT g FROM tris WHERE NOT is_train) e
      LEFT JOIN (SELECT DISTINCT g FROM tris WHERE is_train) ts
        ON ts.g = e.g
    ),
    langs AS (SELECT COUNT(DISTINCT lang) AS nl FROM documents),
    emb AS (
      SELECT SUM(CASE WHEN e.vec_id IS NULL THEN 1 ELSE 0 END) AS missing,
             SUM(CASE WHEN e.vec_id IS NOT NULL AND len(e.embedding) <> 64
                      THEN 1 ELSE 0 END) AS wrong_dim
      FROM documents d
      LEFT JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    lens AS (
      SELECT AVG(len(list_filter(
               regexp_split_to_array(lower(trim(text)), '\\s+'),
               x -> x <> ''))) AS mean_toks
      FROM documents
    )
    SELECT * FROM (
      SELECT 'exact_dup_rate' AS check_name,
             ROUND(n_dup * 1.0 / n, 6) AS value,
             n_dup * 1.0 / n < 0.25 AS passed
      FROM dups
      UNION ALL
      SELECT 'heldout_trigram_novelty', ROUND(nov, 6), nov > 0.1
      FROM novelty
      UNION ALL
      SELECT 'language_coverage', CAST(nl AS DOUBLE), nl >= 5 FROM langs
      UNION ALL
      SELECT 'docs_missing_embedding', CAST(missing AS DOUBLE), missing = 0
      FROM emb
      UNION ALL
      SELECT 'embeddings_wrong_dim', CAST(wrong_dim AS DOUBLE), wrong_dim = 0
      FROM emb
      UNION ALL
      SELECT 'mean_tokens_in_band', ROUND(mean_toks, 6),
             mean_toks BETWEEN 20 AND 500
      FROM lens
    )
    """,
)
def pipeline_release_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus release gate as one query: six (check, value,
    passed) rows — exact-duplicate rate under 25%, held-out trigram
    novelty above 10% (a corpus that only repeats itself teaches
    nothing), full language coverage, zero documents without
    embeddings, zero wrong-dimension vectors, mean document length
    in the trainable band. This is the pass/fail capstone over
    `pipeline_dataset_card`'s descriptive stats: the card describes,
    the gate DECIDES, and a release pipeline blocks on any false in
    the passed column. Each signal has a full-strength sibling in
    the registry (dedup tiers, novelty, embedding coverage audit);
    the gate runs their cheap forms in one pass so it can gate every
    ingest, not just quarterly reviews.

    Shape: three scans (documents twice — hash+tokens and lengths
    fold into one; embeddings once) reduced to scalars; the novelty
    join is trigram-hash sized."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    w = F.filter(
        F.split(F.trim(F.lower("text")), r"\s+"), lambda x: x != ""
    )
    base = d.select(
        "doc_id",
        "lang",
        F.md5("text").alias("h"),
        w.alias("w"),
        (F.col("doc_id") % 2 == 0).alias("is_train"),
    ).localCheckpoint(eager=False)
    dups = base.agg(
        (
            (F.count(F.lit(1)) - F.countDistinct("h"))
            * 1.0
            / F.count(F.lit(1))
        ).alias("dup_rate"),
        F.countDistinct("lang").alias("nl"),
        F.avg(F.size("w")).alias("mean_toks"),
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("w") - 2, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(F.col("w"), i, 3)),
    )
    tris = base.select("is_train", F.explode(grams).alias("g"))
    train_set = (
        tris.where("is_train").select("g").distinct().select(
            F.col("g").alias("tg")
        )
    )
    novelty = (
        tris.where(~F.col("is_train"))
        .join(F.broadcast(train_set), F.col("g") == F.col("tg"), "left")
        .agg(
            (
                F.sum(F.col("tg").isNull().cast("long"))
                * 1.0
                / F.count(F.lit(1))
            ).alias("nov")
        )
    )
    emb = (
        d.select("doc_id")
        .join(
            e.select("vec_id", F.size("embedding").alias("dim")),
            d["doc_id"] == e["vec_id"],
            "left",
        )
        .agg(
            F.sum(F.col("vec_id").isNull().cast("long")).alias("missing"),
            F.sum(
                (
                    F.col("vec_id").isNotNull() & (F.col("dim") != 64)
                ).cast("long")
            ).alias("wrong_dim"),
        )
    )
    j = dups.crossJoin(F.broadcast(novelty)).crossJoin(F.broadcast(emb))

    def row(name, value, passed):
        return j.select(
            F.lit(name).alias("check_name"),
            F.round(value, 6).cast("double").alias("value"),
            passed.alias("passed"),
        )

    return (
        row("exact_dup_rate", F.col("dup_rate"), F.col("dup_rate") < 0.25)
        .unionByName(
            row("heldout_trigram_novelty", F.col("nov"), F.col("nov") > 0.1)
        )
        .unionByName(
            row(
                "language_coverage",
                F.col("nl").cast("double"),
                F.col("nl") >= 5,
            )
        )
        .unionByName(
            row(
                "docs_missing_embedding",
                F.col("missing").cast("double"),
                F.col("missing") == 0,
            )
        )
        .unionByName(
            row(
                "embeddings_wrong_dim",
                F.col("wrong_dim").cast("double"),
                F.col("wrong_dim") == 0,
            )
        )
        .unionByName(
            row(
                "mean_tokens_in_band",
                F.col("mean_toks"),
                F.col("mean_toks").between(20, 500),
            )
        )
    )
