"""Analytics extras, batch 45: the dataset datasheet and engagement
inequality.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* dataset card — the "datasheets for datasets" statistics table
  (Gebru et al.): size, composition, duplication, length profile,
  concentration — one query, release-ready numbers.
* engagement Lorenz deciles — cumulative share of events held by
  each user decile, the inequality curve behind "1% of users
  generate X% of traffic".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "pipeline_dataset_card",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, lang, source, n_chars,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tok,
             md5(text) AS h
      FROM documents
    ),
    m AS (
      SELECT COUNT(*) * 1.0 AS n_docs,
             SUM(n_tok) * 1.0 AS total_tokens,
             COUNT(DISTINCT lang) * 1.0 AS n_langs,
             COUNT(DISTINCT source) * 1.0 AS n_sources,
             1.0 - COUNT(DISTINCT h) * 1.0 / COUNT(*) AS exact_dup_rate,
             AVG(n_chars) AS mean_chars,
             quantile_cont(n_tok, 0.5) AS median_tokens,
             MAX(src_share) AS top_source_share,
             MAX(lang_share) AS top_lang_share
      FROM (
        SELECT *,
               COUNT(*) OVER (PARTITION BY source) * 1.0
                 / COUNT(*) OVER () AS src_share,
               COUNT(*) OVER (PARTITION BY lang) * 1.0
                 / COUNT(*) OVER () AS lang_share
        FROM base
      )
    )
    SELECT metric, ROUND(value, 6) AS value FROM (
      SELECT 'n_docs' AS metric, n_docs AS value FROM m
      UNION ALL SELECT 'total_tokens', total_tokens FROM m
      UNION ALL SELECT 'n_langs', n_langs FROM m
      UNION ALL SELECT 'n_sources', n_sources FROM m
      UNION ALL SELECT 'exact_dup_rate', exact_dup_rate FROM m
      UNION ALL SELECT 'mean_chars', mean_chars FROM m
      UNION ALL SELECT 'median_tokens', median_tokens FROM m
      UNION ALL SELECT 'top_source_share', top_source_share FROM m
      UNION ALL SELECT 'top_lang_share', top_lang_share FROM m
    ) ORDER BY metric
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card ("Datasheets for Datasets", Gebru et al. 2018):
    the release-readiness statistics table for the document corpus —
    size, token budget, language/source composition and
    concentration, exact-duplication rate, and length profile — as
    ONE query emitting (metric, value) rows, the shape a model card
    pipeline drops straight into its documentation build.

    Shape: a single scan computes every per-doc derived column; the
    share columns are two window counts over the same scan; one
    final aggregate. At 100 TB this is one pass + an O(1) summary —
    the whole datasheet costs one corpus read."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "lang",
        "source",
        "n_chars",
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n_tok"),
        F.md5("text").alias("h"),
    )
    shared = base.select(
        "*",
        (
            F.count(F.lit(1)).over(Window.partitionBy("source"))
            * 1.0
            / F.count(F.lit(1)).over(Window.partitionBy())
        ).alias("src_share"),
        (
            F.count(F.lit(1)).over(Window.partitionBy("lang"))
            * 1.0
            / F.count(F.lit(1)).over(Window.partitionBy())
        ).alias("lang_share"),
    )
    m = shared.agg(
        (F.count(F.lit(1)) * 1.0).alias("n_docs"),
        (F.sum("n_tok") * 1.0).alias("total_tokens"),
        (F.countDistinct("lang") * 1.0).alias("n_langs"),
        (F.countDistinct("source") * 1.0).alias("n_sources"),
        (1.0 - F.countDistinct("h") * 1.0 / F.count(F.lit(1))).alias(
            "exact_dup_rate"
        ),
        F.avg("n_chars").alias("mean_chars"),
        F.percentile("n_tok", F.lit(0.5)).alias("median_tokens"),
        F.max("src_share").alias("top_source_share"),
        F.max("lang_share").alias("top_lang_share"),
    )
    metrics = [
        "n_docs",
        "total_tokens",
        "n_langs",
        "n_sources",
        "exact_dup_rate",
        "mean_chars",
        "median_tokens",
        "top_source_share",
        "top_lang_share",
    ]
    stacked = m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("metric"),
                        F.col(name).alias("value"),
                    )
                    for name in metrics
                ]
            )
        ).alias("kv")
    ).select("kv.metric", F.round("kv.value", 6).alias("value"))
    return stacked.orderBy("metric")


@register(
    "events_lorenz_deciles",
    oracle="""
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT n, NTILE(10) OVER (ORDER BY n, user_id) AS decile
      FROM per_user
    ),
    per_dec AS (
      SELECT decile, SUM(n) AS dn, COUNT(*) AS users
      FROM ranked GROUP BY decile
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(users AS BIGINT) AS n_users,
           ROUND(SUM(dn) OVER (ORDER BY decile
                               ROWS UNBOUNDED PRECEDING)
                 * 1.0 / (SELECT SUM(n) FROM per_user), 6)
             AS cum_event_share
    FROM per_dec
    ORDER BY decile
    """,
)
def events_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement Lorenz curve by user decile: users ranked by event
    count into deciles (ascending), each row reporting the cumulative
    share of all events generated by the bottom k deciles — the curve
    whose distance from the diagonal is the engagement Gini, and the
    concrete form of "the top 10 % of users generate X % of traffic"
    for capacity and abuse planning.

    Shape: per-user reduce, one NTILE window over O(users), one
    10-row running share — nothing data-sized after the first
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    ranked = per_user.select(
        "n",
        F.ntile(10).over(Window.orderBy("n", "user_id")).alias("decile"),
    )
    per_dec = ranked.groupBy("decile").agg(
        F.sum("n").alias("dn"), F.count(F.lit(1)).alias("users")
    )
    tot = per_user.agg(F.sum("n").alias("t"))
    cum = F.sum("dn").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per_dec.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("long"),
            F.col("users").cast("long").alias("n_users"),
            F.round(cum * 1.0 / F.col("t"), 6).alias("cum_event_share"),
        )
        .orderBy("decile")
    )
