"""Analytics extras, batch 36: watermark economics, distributed
linear algebra, and spectral audio features.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* late-data accounting — how many events each watermark delay would
  drop per window, the number that PICKS the watermark.
* Gram matrix — X^T X over the embedding matrix as a relational
  aggregate, the kernel under PCA/covariance/linear probes.
* DFT band energies — real 4-bin spectral features over decoded WAV
  PCM, cross-engine verified against re-synthesized samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "stream_late_data_accounting",
    oracle="""
    WITH arr AS (
      -- arrival order = event_id (the generator emits ids in arrival
      -- order); an event is late-by-d if when it arrives, the max
      -- event time already seen exceeds its own event time by > d
      SELECT ts,
             MAX(ts) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS seen_max
      FROM events
    ),
    lateness AS (
      SELECT DATE_TRUNC('hour', ts) AS w,
             CASE WHEN seen_max IS NULL THEN 0.0
                  ELSE GREATEST(epoch_us(seen_max) - epoch_us(ts), 0)
                       / 1000000.0 END AS late_s
      FROM arr
    )
    SELECT CAST(w AS TIMESTAMP) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_out_of_order,
           CAST(SUM(CASE WHEN late_s > 600 THEN 1 ELSE 0 END) AS BIGINT)
             AS dropped_at_10m,
           CAST(SUM(CASE WHEN late_s > 1800 THEN 1 ELSE 0 END) AS BIGINT)
             AS dropped_at_30m,
           ROUND(MAX(late_s), 1) AS max_late_s
    FROM lateness
    GROUP BY w
    ORDER BY w
    """,
)
def stream_late_data_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark economics: replaying the event stream in ARRIVAL
    order (event_id), each event's lateness is how far the observed
    event-time high-water mark has already passed it; per hourly
    window, count events a 10-minute vs 30-minute watermark would
    drop. This table — not intuition — is how you pick
    `withWatermark`'s delay: the smallest d whose drop count is
    acceptable. Batch twin of the streaming tier's watermark
    semantics (`streaming/windows.py`).

    Shape: one running-max window over arrival order (at scale:
    per-partition arrival logs make this a per-partition running max
    + broadcast partition offsets), one hourly aggregate."""
    ev = load_table(spark, sf_dir, "events")
    seen = ev.select(
        "ts",
        F.max("ts")
        .over(
            Window.orderBy("event_id").rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        .alias("seen_max"),
    )
    late_s = F.when(F.col("seen_max").isNull(), 0.0).otherwise(
        F.greatest(
            (F.unix_micros("seen_max") - F.unix_micros("ts")) / 1e6,
            F.lit(0.0),
        )
    )
    lateness = seen.select(
        F.date_trunc("hour", "ts").alias("window_start"),
        late_s.alias("late_s"),
    )
    return (
        lateness.groupBy("window_start")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(F.col("late_s") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_out_of_order"),
            F.sum(F.when(F.col("late_s") > 600, 1).otherwise(0))
            .cast("long")
            .alias("dropped_at_10m"),
            F.sum(F.when(F.col("late_s") > 1800, 1).otherwise(0))
            .cast("long")
            .alias("dropped_at_30m"),
            F.round(F.max("late_s"), 1).alias("max_late_s"),
        )
        .orderBy("window_start")
    )


_GRAM_DIMS = 8


@register(
    "embedding_gram_matrix",
    oracle=f"""
    WITH e AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
    cells AS (
      SELECT i, j, SUM(x[i] * x[j]) AS v
      FROM e,
           UNNEST(generate_series(1, {_GRAM_DIMS})) AS a(i),
           UNNEST(generate_series(1, {_GRAM_DIMS})) AS b(j)
      WHERE i <= j
      GROUP BY i, j
    )
    SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           ROUND(v, 4) AS gram
    FROM cells
    ORDER BY i, j
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram matrix X^T X over the embedding matrix (upper triangle of
    the first 8 dimensions) as a pure relational aggregate: each row
    contributes its outer-product cells, summed with map-side
    combine — the kernel computation under covariance, PCA, ridge
    regression normal equations, and linear probes, shaped so a
    1000-executor cluster computes it in one pass with O(d²) output.

    Shape: per-row fan-out is the fixed d(d+1)/2 cell list (in-row
    explode), then ONE groupBy((i,j)) — no vector shuffles, no
    driver-side matrix; at 64 dims full the fan-out is 2080 cells/row,
    still bounded and combiner-friendly."""
    e = load_table(spark, sf_dir, "embeddings").select(
        F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    idx = [(i, j) for i in range(1, _GRAM_DIMS + 1) for j in range(i, _GRAM_DIMS + 1)]
    cells = e.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.lit(j).alias("j"),
                        (
                            F.element_at("x", i) * F.element_at("x", j)
                        ).alias("v"),
                    )
                    for i, j in idx
                ]
            )
        ).alias("c")
    ).select("c.i", "c.j", "c.v")
    return (
        cells.groupBy("i", "j")
        .agg(F.round(F.sum("v"), 4).alias("gram"))
        .select(F.col("i").cast("long"), F.col("j").cast("long"), "gram")
        .orderBy("i", "j")
    )


_DFT_N = 256
_DFT_BINS = (1, 2, 3, 4)


@register(
    "multimodal_audio_dft_bands",
    oracle=f"""
    WITH wav_meta AS (
      SELECT doc_id,
             200.0 + ('0x' || substr(md5('wav:' || doc_id), 1, 2))::INT
               * 4.0 AS freq,
             160 + least(length(text), 1440) AS ns
      FROM documents WHERE doc_id % 4 = 0
    ),
    samp AS (
      SELECT doc_id, t,
             trunc(0.3 * 32767 * sin(2 * pi() * freq * t / 8000.0))
               / 32768.0 AS x
      FROM wav_meta, UNNEST(generate_series(0, {_DFT_N} - 1)) AS g(t)
      WHERE t < ns
    ),
    bands AS (
      SELECT doc_id, k,
             SUM(x * cos(2 * pi() * k * t / {_DFT_N})) AS re,
             SUM(x * sin(2 * pi() * k * t / {_DFT_N})) AS im
      FROM samp, UNNEST([{", ".join(str(k) for k in _DFT_BINS)}]) AS b(k)
      GROUP BY doc_id, k
    )
    SELECT doc_id, CAST(k AS BIGINT) AS k,
           ROUND(SQRT(re * re + im * im), 4) AS magnitude
    FROM bands
    ORDER BY doc_id, k
    """,
)
def multimodal_audio_dft_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real spectral features over decoded audio: 4 DFT bin
    magnitudes (k=1..4 over the first 256 PCM samples) per WAV asset,
    computed as plain sums of x·cos / x·sin — the Goertzel-style
    single-bin DFT every lightweight audio featurizer uses before
    reaching for FFT libraries. Fully oracle-verified: DuckDB
    re-synthesizes the same PCM sine and recomputes the same bins.

    Shape: the decode+window runs in the Arrow mapInPandas tier
    conceptually; HERE the samples are re-derived in expression space
    (the synthesizer is deterministic), making the whole spectral
    path cross-engine checkable — per-row work is O(N·bins), output
    O(assets·bins), no shuffle until the final tiny ordering."""
    docs = load_table(spark, sf_dir, "documents")
    wav = docs.where(F.col("doc_id") % 4 == 0).select(
        "doc_id",
        (
            200.0
            + F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("wav:"), F.col("doc_id").cast("string"))),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("int")
            * 4.0
        ).alias("freq"),
        (160 + F.least(F.length("text"), F.lit(1440))).alias("ns"),
    )
    two_pi = 2 * F.lit(3.141592653589793)
    # cast-to-long truncates toward zero, matching Python's int() and
    # the oracle's trunc() (DuckDB CAST would ROUND — the gotcha)
    samp = wav.select(
        "doc_id",
        "freq",
        F.explode(
            F.sequence(F.lit(0), F.least(F.col("ns"), F.lit(_DFT_N)) - 1)
        ).alias("t"),
    ).select(
        "doc_id",
        "t",
        (
            (
                0.3
                * 32767
                * F.sin(two_pi * F.col("freq") * F.col("t") / 8000.0)
            ).cast("long")
            / 32768.0
        ).alias("x"),
    )
    bands = (
        samp.select(
            "doc_id",
            "t",
            "x",
            F.explode(F.array(*[F.lit(k) for k in _DFT_BINS])).alias("k"),
        )
        .groupBy("doc_id", "k")
        .agg(
            F.sum(
                F.col("x")
                * F.cos(
                    2
                    * F.lit(3.141592653589793)
                    * F.col("k")
                    * F.col("t")
                    / _DFT_N
                )
            ).alias("re"),
            F.sum(
                F.col("x")
                * F.sin(
                    2
                    * F.lit(3.141592653589793)
                    * F.col("k")
                    * F.col("t")
                    / _DFT_N
                )
            ).alias("im"),
        )
    )
    return bands.select(
        "doc_id",
        F.col("k").cast("long"),
        F.round(
            F.sqrt(F.col("re") * F.col("re") + F.col("im") * F.col("im")), 4
        ).alias("magnitude"),
    ).orderBy("doc_id", "k")
