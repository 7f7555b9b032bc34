"""Analytics extras, batch 67: empirical-Bayes shrinkage and the
Simpson/Pielou diversity pair.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* Dirichlet shrinkage — per-source language proportions shrunk
  toward the corpus prior with pseudo-count m: the small-sample
  stabilizer (a 5-doc source's raw shares are noise; the shrunk
  estimate is usable), sibling of the smoothed target encoder but
  for full distributions.
* Simpson + Pielou — Simpson's diversity (1 - sum p^2 =
  P(two draws differ)) and Pielou's evenness (H/ln k) per source,
  completing the diversity-index trio with the registry's Shannon
  entropy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_DS_M = 20.0  # prior pseudo-count


@register(
    "stats_dirichlet_shrinkage",
    oracle=f"""
    WITH counts AS (
      SELECT source, lang, COUNT(*) AS n
      FROM documents GROUP BY 1, 2
    ),
    src_tot AS (SELECT source, SUM(n) AS ns FROM counts GROUP BY 1),
    prior AS (
      SELECT lang, SUM(n) * 1.0 / (SELECT SUM(n) FROM counts) AS p
      FROM counts GROUP BY 1
    ),
    grid AS (
      SELECT st.source, pr.lang, st.ns, pr.p,
             COALESCE(c.n, 0) AS n
      FROM src_tot st CROSS JOIN prior pr
      LEFT JOIN counts c ON c.source = st.source AND c.lang = pr.lang
    )
    SELECT source, lang,
           CAST(n AS BIGINT) AS n_docs,
           ROUND(n * 1.0 / ns, 4) AS raw_share,
           ROUND((n + {_DS_M} * p) / (ns + {_DS_M}), 4) AS shrunk_share
    FROM grid
    """,
)
def stats_dirichlet_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-source language mixes toward
    the corpus prior: theta = (n_sl + m*p_l) / (n_s + m) with
    pseudo-count m=20 — the Dirichlet-multinomial posterior mean that
    keeps a 5-document source from reporting '100% French' on one
    coincidence. Zero-count (source, lang) cells appear explicitly
    (shrunk toward the prior, never exactly zero) — the property raw
    shares lack that makes shrunk shares safe to take logs of or
    rank by. The distribution-valued sibling of
    `feature_target_encoding_smooth`.

    Shape: one reduce to O(source x lang) cells, a tiny domain cross
    join, scalar math."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    counts = counts.localCheckpoint(eager=False)  # 3 consumers below
    src_tot = counts.groupBy("source").agg(F.sum("n").alias("ns"))
    total = counts.agg(F.sum("n").alias("tot"))
    prior = (
        counts.groupBy("lang")
        .agg(F.sum("n").alias("nl"))
        .crossJoin(F.broadcast(total))
        .select("lang", (F.col("nl") * 1.0 / F.col("tot")).alias("p"))
    )
    grid = (
        src_tot.crossJoin(F.broadcast(prior))
        .join(counts, ["source", "lang"], "left")
        .select(
            "source",
            "lang",
            "ns",
            "p",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )
    return grid.select(
        "source",
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        F.round(F.col("n") * 1.0 / F.col("ns"), 4).alias("raw_share"),
        F.round(
            (F.col("n") + _DS_M * F.col("p")) / (F.col("ns") + _DS_M), 4
        ).alias("shrunk_share"),
    )


@register(
    "agg_simpson_evenness",
    oracle="""
    WITH counts AS (
      SELECT source, lang, COUNT(*) AS n
      FROM documents GROUP BY 1, 2
    ),
    shares AS (
      SELECT source, n * 1.0 / SUM(n) OVER (PARTITION BY source) AS p
      FROM counts
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           ROUND(1.0 - SUM(p * p), 4) AS simpson_diversity,
           ROUND(CASE WHEN COUNT(*) = 1 THEN 1.0
                      ELSE -SUM(p * LN(p)) / LN(COUNT(*)) END, 4)
             AS pielou_evenness
    FROM shares GROUP BY source
    """,
)
def agg_simpson_evenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's diversity index (1 - sum p^2: the probability two
    random documents from a source differ in language) and Pielou's
    evenness (Shannon H normalized by ln of the category count —
    how close the mix sits to uniform) per source — completing the
    diversity-index trio with `agg_shannon_entropy`. Simpson weighs
    dominant categories (robust to rare-category noise), evenness
    separates 'many languages' from 'balanced languages' — the two
    axes a corpus-composition review actually asks about.

    Shape: one reduce to O(source x lang), window shares, one
    rollup."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql.window import Window

    p = F.col("n") * 1.0 / F.sum("n").over(Window.partitionBy("source"))
    shares = counts.select("source", p.alias("p"))
    return shares.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_langs"),
        F.round(1.0 - F.sum(F.col("p") * F.col("p")), 4).alias(
            "simpson_diversity"
        ),
        F.round(
            F.when(F.count(F.lit(1)) == 1, 1.0).otherwise(
                -F.sum(F.col("p") * F.log("p")) / F.log(F.count(F.lit(1)))
            ),
            4,
        ).alias("pielou_evenness"),
    )
