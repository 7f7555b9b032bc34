"""Analytics extras, batch 39: revenue retention, reliability
metrics, distribution divergence, and metric-learning data prep.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* NRR / GRR — net and gross revenue retention year over year, the
  SaaS board metrics, as two cohort aggregates.
* MTBF / MTTR — mean time between failures and to recovery from the
  error stream, the reliability pair under every SLO.
* Jensen-Shannon divergence — per-source token-distribution
  distance from the corpus, the symmetric bounded drift measure.
* semi-hard triplet mining — the batch data-prep step of metric
  learning (FaceNet-style): negatives inside the (d_ap, d_ap+margin)
  band per anchor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "orders_nrr_grr",
    oracle="""
    WITH yearly AS (
      SELECT o_custkey AS c, EXTRACT(year FROM o_orderdate) AS y,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1, 2
    ),
    paired AS (
      SELECT a.y AS base_year, a.rev AS rev0, COALESCE(b.rev, 0) AS rev1
      FROM yearly a
      LEFT JOIN yearly b ON b.c = a.c AND b.y = a.y + 1
    )
    SELECT CAST(base_year AS BIGINT) AS base_year,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(LEAST(rev1, rev0)) / SUM(rev0), 6) AS grr,
           ROUND(SUM(rev1) / SUM(rev0), 6) AS nrr
    FROM paired
    WHERE base_year < (SELECT MAX(y) FROM yearly)
    GROUP BY base_year
    ORDER BY base_year
    """,
)
def orders_nrr_grr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net and gross revenue retention by base year: for customers
    active in year Y, GRR caps each customer's next-year revenue at
    this year's (churn + contraction only), NRR lets expansion count
    — the pair of numbers that separates "leaky bucket" from
    "negative churn" businesses.

    Shape: one (customer, year) reduce, one self-join shifted by a
    year (both sides pre-reduced to O(customers·years)), one O(years)
    aggregate."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.col("o_custkey").alias("c"), F.year("o_orderdate").alias("y")
    ).agg(F.sum("o_totalprice").alias("rev"))
    nxt = yearly.select(
        "c", (F.col("y") - 1).alias("y"), F.col("rev").alias("rev1")
    )
    paired = yearly.join(nxt, ["c", "y"], "left").select(
        F.col("y").alias("base_year"),
        F.col("rev").alias("rev0"),
        F.coalesce(F.col("rev1"), F.lit(0.0)).alias("rev1"),
    )
    max_y = yearly.agg(F.max("y").alias("my"))
    return (
        paired.crossJoin(F.broadcast(max_y))
        .where(F.col("base_year") < F.col("my"))
        .groupBy("base_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(
                F.sum(F.least("rev1", "rev0")) / F.sum("rev0"), 6
            ).alias("grr"),
            F.round(F.sum("rev1") / F.sum("rev0"), 6).alias("nrr"),
        )
        .select(
            F.col("base_year").cast("long"), "n_customers", "grr", "nrr"
        )
        .orderBy("base_year")
    )


@register(
    "events_mtbf_mttr",
    oracle="""
    WITH seq AS (
      SELECT ts, event_type, event_id,
             LAG(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
               OVER (ORDER BY ts, event_id) AS prev_err
      FROM events
    ),
    failures AS (
      -- time between consecutive errors, global stream
      SELECT epoch_us(ts) - epoch_us(prev_err) AS gap_us
      FROM seq WHERE event_type = 'error' AND prev_err IS NOT NULL
    ),
    recoveries AS (
      -- first non-error event after each error = recovery
      SELECT epoch_us(ts) - epoch_us(prev_err) AS rec_us
      FROM (
        SELECT ts, event_type, prev_err,
               ROW_NUMBER() OVER (PARTITION BY prev_err
                                  ORDER BY ts, event_id) AS rn
        FROM seq WHERE event_type <> 'error' AND prev_err IS NOT NULL
      ) WHERE rn = 1
    )
    SELECT CAST((SELECT COUNT(*) + 1 FROM failures) AS BIGINT)
             AS n_failures,
           ROUND((SELECT AVG(gap_us) FROM failures) / 1000000.0, 2)
             AS mtbf_s,
           ROUND((SELECT AVG(rec_us) FROM recoveries) / 1000000.0, 2)
             AS mttr_s,
           ROUND(1.0 - (SELECT AVG(rec_us) FROM recoveries)
                       / (SELECT AVG(gap_us) FROM failures), 6)
             AS availability
    """,
)
def events_mtbf_mttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTBF and MTTR from the event stream: mean gap between
    consecutive errors (failures), mean gap from each error to the
    first non-error event after it (recovery), and the implied
    availability 1 − MTTR/MTBF — the reliability pair every SLO
    review reads together (high MTBF with high MTTR is a different
    problem than the reverse).

    Shape: one IGNORE-NULLS forward-carry window over the global
    stream (at scale: keyed by service/shard so the window
    partitions), one row_number per error epoch, two scalar
    aggregates."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy("ts", "event_id")
    seq = ev.select(
        "ts",
        "event_type",
        "event_id",
        F.last(
            F.when(F.col("event_type") == "error", F.col("ts")), True
        )
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_err"),
    )
    failures = seq.where(
        (F.col("event_type") == "error") & F.col("prev_err").isNotNull()
    ).select(
        (F.unix_micros("ts") - F.unix_micros("prev_err")).alias("gap_us")
    )
    rec_w = Window.partitionBy("prev_err").orderBy("ts", "event_id")
    recoveries = (
        seq.where(
            (F.col("event_type") != "error") & F.col("prev_err").isNotNull()
        )
        .withColumn("rn", F.row_number().over(rec_w))
        .where("rn = 1")
        .select(
            (F.unix_micros("ts") - F.unix_micros("prev_err")).alias("rec_us")
        )
    )
    f = failures.agg(
        F.count(F.lit(1)).alias("nf"), F.avg("gap_us").alias("mtbf_us")
    )
    r = recoveries.agg(F.avg("rec_us").alias("mttr_us"))
    return f.crossJoin(F.broadcast(r)).select(
        (F.col("nf") + 1).cast("long").alias("n_failures"),
        F.round(F.col("mtbf_us") / 1e6, 2).alias("mtbf_s"),
        F.round(F.col("mttr_us") / 1e6, 2).alias("mttr_s"),
        F.round(1.0 - F.col("mttr_us") / F.col("mtbf_us"), 6).alias(
            "availability"
        ),
    )


@register(
    "text_js_divergence_sources",
    oracle="""
    WITH toks AS (
      SELECT source,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ),
    src AS (
      SELECT source, tok, COUNT(*) AS n FROM toks GROUP BY source, tok
    ),
    src_tot AS (SELECT source, SUM(n) AS t FROM src GROUP BY source),
    corpus AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
    corpus_tot AS (SELECT SUM(n) AS t FROM corpus),
    probs AS (
      SELECT s.source,
             s.n * 1.0 / st.t AS p,
             c.n * 1.0 / ct.t AS q
      FROM src s
      JOIN src_tot st ON st.source = s.source
      JOIN corpus c ON c.tok = s.tok
      CROSS JOIN corpus_tot ct
    )
    SELECT source,
           ROUND(SUM(0.5 * p * LN(2.0 * p / (p + q))
                     + 0.5 * q * LN(2.0 * q / (p + q)))
                 / LN(2.0), 6) AS js_divergence_bits
    FROM probs
    GROUP BY source
    ORDER BY source
    """,
)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (bits) between each source's unigram
    distribution and the corpus distribution — the symmetric, bounded
    [0,1] drift measure that PSI and raw KL both fail to be (KL blows
    up on missing tokens; JS never does). The per-source score ranks
    which slices least resemble the corpus mixture. (Source
    vocabularies here are subsets of the corpus vocabulary, so the
    corpus-side q term with p=0 vanishes into the shared support —
    both engines compute the same restricted sum.)

    Shape: one token explosion, two vocabulary-bounded count tables,
    one broadcast join — everything after the explode is O(vocab ·
    sources)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    )
    src = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n"))
    src_tot = src.groupBy("source").agg(F.sum("n").alias("t"))
    corpus = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cn"))
    corpus_tot = corpus.agg(F.sum("cn").alias("ct"))
    probs = (
        src.join(F.broadcast(src_tot), "source")
        .join(F.broadcast(corpus), "tok")
        .crossJoin(F.broadcast(corpus_tot))
        .select(
            "source",
            (F.col("n") * 1.0 / F.col("t")).alias("p"),
            (F.col("cn") * 1.0 / F.col("ct")).alias("q"),
        )
    )
    term = 0.5 * F.col("p") * F.log(2.0 * F.col("p") / (F.col("p") + F.col("q"))) + (
        0.5 * F.col("q") * F.log(2.0 * F.col("q") / (F.col("p") + F.col("q")))
    )
    import math

    return (
        probs.groupBy("source")
        .agg(F.round(F.sum(term) / math.log(2.0), 6).alias("js_divergence_bits"))
        .orderBy("source")
    )


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
    e = load_table(spark, sf_dir, "embeddings").select(
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
