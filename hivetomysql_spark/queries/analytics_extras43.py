"""Analytics extras, batch 43: robust estimation, information rate,
and vocabulary richness.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* median-of-means — the heavy-tail-robust mean estimator built from
  k bucketed means (the primitive inside robust streaming
  estimators).
* entropy rate — bits per transition of the event-type Markov
  chain, the compressibility/predictability of the behavior stream.
* hapax ratio — once-occurring vocabulary share per source, the
  richness complement of Heaps'-law fitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_MOM_K = 16


@register(
    "agg_median_of_means",
    oracle=f"""
    WITH bucketed AS (
      SELECT o_totalprice AS x,
             ('0x' || substr(md5('mom:' || o_orderkey), 1, 8))::BIGINT
               % {_MOM_K} AS b
      FROM orders
    ),
    bm AS (
      SELECT b, AVG(x) AS m, COUNT(*) AS n FROM bucketed GROUP BY b
    )
    SELECT CAST({_MOM_K} AS BIGINT) AS k_buckets,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           ROUND(quantile_cont(m, 0.5), 6) AS median_of_means,
           ROUND(SUM(m * n) / SUM(n), 6) AS plain_mean,
           ROUND(MAX(m) - MIN(m), 6) AS bucket_mean_spread
    FROM bm
    """,
)
def agg_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means: rows are hashed into k=16 buckets, each
    bucket's mean is computed, and the MEDIAN of those means is the
    estimate — the estimator with exponential concentration under
    heavy tails where the plain mean has only Chebyshev (the
    primitive inside robust streaming aggregation). md5 bucketing
    makes the whole construction deterministic and oracle-checked;
    the spread of bucket means is the built-in outlier diagnostic.

    Shape: one scan with map-side combine into k partial means, then
    O(k) scalar math — identical cost to a plain mean at any
    scale."""
    o = load_table(spark, sf_dir, "orders")
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mom:"), F.col("o_orderkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _MOM_K
    )
    bm = (
        o.select(F.col("o_totalprice").alias("x"), b.alias("b"))
        .groupBy("b")
        .agg(F.avg("x").alias("m"), F.count(F.lit(1)).alias("n"))
    )
    return bm.agg(
        F.lit(_MOM_K).cast("long").alias("k_buckets"),
        F.sum("n").cast("long").alias("n_rows"),
        F.round(F.percentile("m", F.lit(0.5)), 6).alias("median_of_means"),
        F.round(F.sum(F.col("m") * F.col("n")) / F.sum("n"), 6).alias(
            "plain_mean"
        ),
        F.round(F.max("m") - F.min("m"), 6).alias("bucket_mean_spread"),
    )


@register(
    "events_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    trans AS (
      SELECT event_type AS a, nxt AS b, COUNT(*) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    row_tot AS (SELECT a, SUM(n) AS rn FROM trans GROUP BY a),
    tot AS (SELECT SUM(n) * 1.0 AS t FROM trans)
    SELECT CAST((SELECT SUM(n) FROM trans) AS BIGINT) AS n_transitions,
           ROUND(-SUM((row_tot.rn / tot.t)
                      * (trans.n * 1.0 / row_tot.rn)
                      * LN(trans.n * 1.0 / row_tot.rn)) / LN(2.0), 6)
             AS entropy_rate_bits,
           ROUND(LN((SELECT COUNT(DISTINCT a) FROM trans)) / LN(2.0), 6)
             AS max_entropy_bits
    FROM trans
    JOIN row_tot ON row_tot.a = trans.a
    CROSS JOIN tot
    """,
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain:
    H = −Σ_a π(a) Σ_b P(b|a) log₂ P(b|a), with π estimated from
    transition mass — bits of surprise per step, against the log₂|A|
    ceiling. Low rate = predictable journeys (prefetchable,
    compressible, bot-like); near-ceiling = memoryless browsing. The
    information-theoretic single number summarizing the whole
    `event_transitions` matrix.

    Shape: one per-user lead window, one O(|A|²) transition count,
    O(|A|²) log math — data-sized work is the single window pass."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("a"), F.col("nxt").alias("b")
    ).agg(F.count(F.lit(1)).alias("n"))
    row_tot = trans.groupBy("a").agg(F.sum("n").alias("rn"))
    tot = trans.agg(F.sum("n").cast("double").alias("t"))
    n_states = trans.select("a").distinct().count()
    joined = trans.join(F.broadcast(row_tot), "a").crossJoin(
        F.broadcast(tot)
    )
    p_cond = F.col("n") * 1.0 / F.col("rn")
    import math

    return joined.agg(
        F.sum("n").cast("long").alias("n_transitions"),
        F.round(
            -F.sum((F.col("rn") / F.col("t")) * p_cond * F.log(p_cond))
            / math.log(2.0),
            6,
        ).alias("entropy_rate_bits"),
        F.round(F.lit(math.log(n_states) / math.log(2.0)), 6).alias(
            "max_entropy_bits"
        ),
    )


@register(
    "text_hapax_ratio",
    oracle="""
    WITH toks AS (
      SELECT source,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ),
    counts AS (
      SELECT source, tok, COUNT(*) AS n FROM toks GROUP BY source, tok
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax,
           ROUND(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS hapax_ratio,
           CAST(SUM(n) AS BIGINT) AS n_tokens
    FROM counts
    GROUP BY source
    ORDER BY source
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena share per source: the fraction of each slice's
    vocabulary that occurs exactly once — the vocabulary-richness
    number lexicographers and corpus auditors read next to Heaps'
    law (a closed template vocabulary, as in this fixture, shows
    hapax ≈ 0; scraped natural text runs 40-60 %, and a sudden drop
    flags boilerplate flooding).

    Shape: token explosion → (source, token) count → O(vocab)
    aggregate; vocabulary-bounded after the first reduce."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    )
    counts = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax"),
            F.round(
                F.sum(F.when(F.col("n") == 1, 1).otherwise(0)) * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("hapax_ratio"),
            F.sum("n").cast("long").alias("n_tokens"),
        )
        .orderBy("source")
    )
