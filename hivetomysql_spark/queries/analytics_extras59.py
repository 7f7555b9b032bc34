"""Analytics extras, batch 59: decoder-accuracy auditing, TOST
equivalence testing, and n-gram novelty.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* audio pitch estimate — recover each WAV's sine frequency from its
  DECODED samples via zero-crossing rate and compare against the
  synthesizer's md5-derived ground truth: a decoder-accuracy audit
  with internal ground truth, fully oracled.
* TOST equivalence — two one-sided Welch tests proving the ABSENCE
  of a meaningful difference (non-inferiority), the inverse goal of
  every significance test in the registry.
* n-gram novelty — share of held-out trigrams never seen in the
  training half: the memorization/novelty complement of
  `text_train_eval_perplexity`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "multimodal_audio_pitch_estimate",
    oracle="""
    WITH wavs AS (
      SELECT doc_id, length(text) AS tlen FROM documents WHERE doc_id % 4 = 0
    ),
    meta AS (
      SELECT doc_id,
             CAST(200.0 + ('0x' || substr(md5('wav:' || doc_id), 1, 2))::INT
                  * 4.0 AS DOUBLE) AS true_freq,
             160 + least(tlen, 1440) AS n
      FROM wavs
    ),
    samp AS (
      SELECT doc_id, n, true_freq, t,
             trunc(0.3 * 32767 * sin(2 * pi() * true_freq * t / 8000.0))
               AS s
      FROM meta, UNNEST(generate_series(0, n - 1)) AS g(t)
    ),
    flagged AS (
      SELECT doc_id, n, true_freq,
             CASE WHEN t >= 1 AND (s < 0) <>
                  (LAG(s) OVER (PARTITION BY doc_id ORDER BY t) < 0)
                  THEN 1 ELSE 0 END AS is_cross
      FROM samp
    ),
    zc AS (
      SELECT doc_id, n, true_freq, SUM(is_cross) AS crossings
      FROM flagged GROUP BY doc_id, n, true_freq
    )
    SELECT doc_id,
           ROUND(true_freq, 4) AS true_freq_hz,
           ROUND(crossings * 8000.0 / (2.0 * (n - 1)), 4) AS est_freq_hz,
           ROUND(ABS(crossings * 8000.0 / (2.0 * (n - 1)) - true_freq)
                 / true_freq, 6) AS rel_error
    FROM zc
    """,
)
def multimodal_audio_pitch_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pitch estimation over REAL decoded WAV samples — with internal
    ground truth: each fixture wav is a sine whose frequency derives
    from md5(doc_id), so the zero-crossing estimate f = ZCR * rate/2
    computed from the DECODED PCM can be scored against the true
    frequency the synthesizer used. This is the decoder-accuracy
    audit pattern: the pipeline proves its own decode+DSP path
    end-to-end (a corrupted decode shows up as pitch error), and the
    DuckDB twin re-synthesizes every sample to verify the audit
    itself. ZCR pitch tracking is the production hot path's cheap
    first pass (autocorrelation refines it; same plan shape).

    Shape: Arrow mapInPandas decode per asset; crossings reduce
    executor-locally; O(assets) output."""
    from hivetomysql_spark.operators import multimodal as M

    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 4 == 0
    )
    binary = M.attach_multimodal_payload(docs, "doc_id", "text")

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("true_freq_hz", DoubleType()),
            StructField("est_freq_hz", DoubleType()),
            StructField("rel_error", DoubleType()),
        ]
    )

    def batches(it):
        import hashlib

        for pdf in it:
            ids, tf, ef, re_ = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, s = M.decode_wav(payload)
                n = len(s)
                crossings = sum(
                    1 for a, b in zip(s, s[1:]) if (a < 0) != (b < 0)
                )
                est = crossings * rate / (2.0 * (n - 1))
                seed = hashlib.md5(f"wav:{doc_id}".encode()).digest()
                true = 200.0 + seed[0] * 4.0
                ids.append(doc_id)
                tf.append(M._round_half_up(true, 4))
                ef.append(M._round_half_up(est, 4))
                re_.append(M._round_half_up(abs(est - true) / true, 6))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "true_freq_hz": tf,
                    "est_freq_hz": ef,
                    "rel_error": re_,
                }
            )

    return binary.mapInPandas(batches, schema=schema)


_TOST_MARGIN = 0.05  # equivalence margin: 5% of the pooled mean


@register(
    "stats_equivalence_tost",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             COUNT(*) FILTER (WHERE user_id % 2 = 0) AS n_a,
             COUNT(*) FILTER (WHERE user_id % 2 = 1) AS n_b,
             AVG(value) FILTER (WHERE user_id % 2 = 0) AS m_a,
             AVG(value) FILTER (WHERE user_id % 2 = 1) AS m_b,
             VAR_SAMP(value) FILTER (WHERE user_id % 2 = 0) AS v_a,
             VAR_SAMP(value) FILTER (WHERE user_id % 2 = 1) AS v_b,
             AVG(value) AS m_all
      FROM events GROUP BY event_type
    ),
    t AS (
      SELECT event_type,
             m_a - m_b AS diff,
             {_TOST_MARGIN} * m_all AS margin,
             SQRT(v_a / n_a + v_b / n_b) AS se
      FROM g
    )
    SELECT event_type,
           ROUND(diff, 4) AS diff,
           ROUND(margin, 4) AS margin,
           ROUND((diff + margin) / se, 4) AS z_lower,
           ROUND((diff - margin) / se, 4) AS z_upper,
           (diff + margin) / se > 1.645 AND (diff - margin) / se < -1.645
             AS equivalent_90
    FROM t
    """,
)
def stats_equivalence_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence testing by TOST (two one-sided tests): the A/B
    groups are declared EQUIVALENT at 90% when the difference is
    significantly ABOVE -margin AND significantly BELOW +margin
    (margin = 5% of the metric mean) — the procedure that proves a
    refactor/migration changed nothing, which a non-significant
    t-test cannot (absence of evidence is not evidence of absence).
    Inverse inference goal of every significance test in the
    registry; same one-scan Welch sufficient statistics.

    Shape: one conditional-aggregate scan to O(metrics), scalar
    math."""
    ev = load_table(spark, sf_dir, "events")
    a = F.col("user_id") % 2 == 0
    g = ev.groupBy("event_type").agg(
        F.count(F.when(a, 1)).alias("n_a"),
        F.count(F.when(~a, 1)).alias("n_b"),
        F.avg(F.when(a, F.col("value"))).alias("m_a"),
        F.avg(F.when(~a, F.col("value"))).alias("m_b"),
        F.var_samp(F.when(a, F.col("value"))).alias("v_a"),
        F.var_samp(F.when(~a, F.col("value"))).alias("v_b"),
        F.avg("value").alias("m_all"),
    )
    diff = F.col("m_a") - F.col("m_b")
    margin = _TOST_MARGIN * F.col("m_all")
    se = F.sqrt(F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b"))
    return g.select(
        "event_type",
        F.round(diff, 4).alias("diff"),
        F.round(margin, 4).alias("margin"),
        F.round((diff + margin) / se, 4).alias("z_lower"),
        F.round((diff - margin) / se, 4).alias("z_upper"),
        (
            ((diff + margin) / se > 1.645) & ((diff - margin) / se < -1.645)
        ).alias("equivalent_90"),
    )


@register(
    "text_ngram_novelty_ratio",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, doc_id % 2 = 0 AS is_train,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    tris AS (
      SELECT doc_id, source, is_train,
             array_to_string(w[i:i+2], ' ') AS g
      FROM toks, UNNEST(generate_series(1, greatest(len(w) - 2, 1))) AS t(i)
    ),
    train_set AS (SELECT DISTINCT g FROM tris WHERE is_train),
    eval_tris AS (
      SELECT e.source, e.g, ts.g IS NOT NULL AS seen
      FROM tris e LEFT JOIN train_set ts ON ts.g = e.g
      WHERE NOT e.is_train
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_eval_trigrams,
           CAST(SUM(CASE WHEN seen THEN 0 ELSE 1 END) AS BIGINT) AS n_novel,
           ROUND(SUM(CASE WHEN seen THEN 0.0 ELSE 1.0 END) / COUNT(*), 4)
             AS novelty_ratio
    FROM eval_tris GROUP BY source
    """,
)
def text_ngram_novelty_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram novelty of the held-out half against the training
    half: the share of eval trigrams NEVER seen in training — the
    memorization/novelty axis that perplexity alone conflates (low
    perplexity + low novelty = the corpus repeats itself; low
    perplexity + high novelty = the model generalizes). Used both to
    audit corpus diversity and, applied to model samples, to detect
    verbatim training-data regurgitation.

    Shape: one in-row trigram fan-out, a distinct reduce for the
    train set, one hash join of eval trigrams against it (at 100 TB
    the train set joins as hashed 8-byte keys, same plan as the
    dedup posting tables)."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.lower("text")), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - 2, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(w, i, 3)),
    )
    tris = d.select(
        "doc_id",
        "source",
        (F.col("doc_id") % 2 == 0).alias("is_train"),
        F.explode(grams).alias("g"),
    )
    train_set = tris.where("is_train").select("g").distinct()
    ts = train_set.select(F.col("g").alias("tg"))
    eval_tris = (
        tris.where(~F.col("is_train"))
        .join(F.broadcast(ts), F.col("g") == F.col("tg"), "left")
        .select("source", F.col("tg").isNotNull().alias("seen"))
    )
    return eval_tris.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_eval_trigrams"),
        F.sum((~F.col("seen")).cast("long")).cast("long").alias("n_novel"),
        F.round(
            F.sum(F.when(F.col("seen"), 0.0).otherwise(1.0))
            / F.count(F.lit(1)),
            4,
        ).alias("novelty_ratio"),
    )
