"""Analytics extras, batch 48: boosted stumps, a pinned HyperLogLog,
and readability scoring.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* gradient-boosted stumps — 3 rounds of L2 boosting with depth-1
  trees expressed relationally (the XGBoost training loop as a
  query): residuals -> candidate-split histogram -> argmax gain ->
  broadcast update, no exploded fact rows, no driver-side model.
* pinned HyperLogLog — a full 256-register HLL built from md5
  hashes with integer-only rank extraction, so the DuckDB oracle
  re-derives every register and the estimate; upgrades the
  approx-NDV family from contract-tested to value-verified.
* Flesch readability — words/sentences/syllable-group counts per
  document via regexp, averaged per source: the classic
  text-quality signal next to `text_quality`'s ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_GBDT_CANDS = [5, 10, 15, 20, 25, 30, 35, 40, 45]
_GBDT_LR = 0.5
_GBDT_ROUNDS = 3


def _gbdt_oracle() -> str:
    """Unrolled boosting rounds: each round computes the 9-candidate
    split histogram from sufficient statistics, picks the max-gain
    split (ties -> smaller threshold), and updates the prediction via
    a cross join of the 1-row winner."""
    parts = ["""
    WITH pts AS (
      SELECT l_quantity AS x,
             l_extendedprice AS y,
             (SELECT AVG(l_extendedprice) FROM lineitem) AS f
      FROM lineitem
    ),
    r0 AS (SELECT x, y, f FROM pts)"""]
    for r in range(1, _GBDT_ROUNDS + 1):
        cand_rows = ", ".join(f"({c})" for c in _GBDT_CANDS)
        parts.append(f"""
    cand{r} AS (
      SELECT c,
             SUM(CASE WHEN x <= c THEN 1 ELSE 0 END) AS nl,
             SUM(CASE WHEN x <= c THEN y - f ELSE 0 END) AS sl,
             SUM(CASE WHEN x > c THEN 1 ELSE 0 END) AS nr,
             SUM(CASE WHEN x > c THEN y - f ELSE 0 END) AS sr
      FROM r{r - 1}, (VALUES {cand_rows}) AS cs(c)
      GROUP BY c
    ),
    best{r} AS (
      SELECT c, sl / nl AS ml, sr / nr AS mr,
             (sl / nl) * sl + (sr / nr) * sr AS gain
      FROM cand{r}
      ORDER BY gain DESC, c LIMIT 1
    ),
    r{r} AS (
      SELECT x, y,
             f + {_GBDT_LR} * (CASE WHEN x <= b.c THEN b.ml ELSE b.mr END)
               AS f
      FROM r{r - 1}, best{r} b
    ),
    out{r} AS (
      SELECT {r} AS round,
             (SELECT c FROM best{r}) AS split_at,
             ROUND((SELECT ml FROM best{r}), 4) AS mean_left,
             ROUND((SELECT mr FROM best{r}), 4) AS mean_right,
             ROUND(SQRT(SUM((y - f) * (y - f)) / COUNT(*)), 4) AS rmse
      FROM r{r}
    )""")
    union = "\n    UNION ALL ".join(
        f"SELECT * FROM out{r}" for r in range(1, _GBDT_ROUNDS + 1)
    )
    return ",".join(parts) + f"\n    {union}"


@register("ml_gbdt_stumps_boost", oracle=_gbdt_oracle())
def ml_gbdt_stumps_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient-boosted depth-1 trees, trained relationally: 3 rounds
    of L2 boosting of l_extendedprice on l_quantity. Each round is
    (a) ONE un-exploded scan computing all 9 candidate splits'
    sufficient statistics as conditional aggregates (the XGBoost-hist
    trick — no 9x row fan-out), (b) an O(9) argmax with a
    deterministic tie-break packed into a 1-row DataFrame, (c) a
    broadcast cross join applying f += lr * stump(x). The model never
    leaves the cluster; nothing is collected driver-side.

    Scale: per round exactly one O(candidates) shuffle over the
    fact scan's partial aggregates; the update is a map-side
    broadcast. Rounds chain lazily — Catalyst pipelines the three
    updates into successive stages of one job."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )
    f0 = li.agg(F.avg("y").alias("f"))
    cur = li.crossJoin(F.broadcast(f0))
    out_rows = []
    from pyspark.sql.window import Window

    for r in range(1, _GBDT_ROUNDS + 1):
        # the ACTUAL histogram trick: one 10-bucket groupBy per round
        # (bucket = quantity band of width 5), then every candidate
        # split's sufficient statistics fall out of prefix sums over
        # the 10-row histogram — the 36-expression conditional
        # aggregate this replaces cost 1.3s/round at sf0.1 for the
        # same numbers
        bucket = F.least(
            F.greatest(F.ceil(F.col("x") / 5).cast("int"), F.lit(1)),
            F.lit(10),
        )
        hist = cur.groupBy(bucket.alias("bk")).agg(
            F.count(F.lit(1)).alias("n_b"),
            F.sum(F.col("y") - F.col("f")).alias("s_b"),
        )
        wc = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, 0)
        wa = Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        cumm = hist.select(
            "bk",
            F.sum("n_b").over(wc).alias("nl"),
            F.sum("s_b").over(wc).alias("sl"),
            F.sum("n_b").over(wa).alias("nt"),
            F.sum("s_b").over(wa).alias("st"),
        ).where(F.col("bk") <= 9)  # candidates are 5..45
        nr = F.col("nt") - F.col("nl")
        sr = F.col("st") - F.col("sl")
        cand_struct = F.struct(
            (
                (F.col("sl") / F.col("nl")) * F.col("sl")
                + (sr / nr) * sr
            ).alias("gain"),
            (-F.col("bk") * 5).alias("neg_c"),
            (F.col("sl") / F.col("nl")).alias("ml"),
            (sr / nr).alias("mr"),
        )
        # max struct picks max gain, ties toward the SMALLER
        # threshold via -c
        best = cumm.agg(F.max(cand_struct).alias("b")).select(
            (-F.col("b.neg_c")).alias("c"),
            F.col("b.ml").alias("ml"),
            F.col("b.mr").alias("mr"),
        )
        # lazy checkpoint per round: the RMSE aggregate below AND the
        # next round's histogram both consume `cur` — without a
        # barrier each consumer re-executes the full boosting lineage
        # from the scan (measured 6.8s -> ~2s at sf0.1)
        cur = cur.crossJoin(F.broadcast(best)).select(
            "x",
            "y",
            (
                F.col("f")
                + _GBDT_LR
                * F.when(F.col("x") <= F.col("c"), F.col("ml")).otherwise(
                    F.col("mr")
                )
            ).alias("f"),
        ).localCheckpoint(eager=False)
        out_rows.append(
            cur.agg(
                F.lit(r).alias("round"),
                F.first(F.col("x") * 0).alias("_drop"),  # placeholder
                F.sqrt(
                    F.sum((F.col("y") - F.col("f")) * (F.col("y") - F.col("f")))
                    / F.count(F.lit(1))
                ).alias("rmse_raw"),
            )
            .crossJoin(F.broadcast(best))
            .select(
                F.col("round").cast("int").alias("round"),
                F.col("c").cast("int").alias("split_at"),
                F.round("ml", 4).alias("mean_left"),
                F.round("mr", 4).alias("mean_right"),
                F.round("rmse_raw", 4).alias("rmse"),
            )
        )
    out = out_rows[0]
    for df in out_rows[1:]:
        out = out.unionByName(df)
    return out


_HLL_M = 256


def _hll_rank_sql(w: str) -> str:
    # integer-only rank-of-first-one-bit in a 24-bit window:
    # rho = 25 - popcount-of-thresholds; no log2, no bin-string
    terms = " + ".join(
        f"CASE WHEN {w} >= {1 << k} THEN 1 ELSE 0 END" for k in range(24)
    )
    return f"(25 - ({terms}))"


@register(
    "agg_hyperloglog_pinned",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT
        ('0x' || substr(md5('hll:' || o_custkey), 1, 8))::BIGINT AS hv
      FROM orders
    ),
    slots AS (
      SELECT hv // 16777216 AS idx, hv % 16777216 AS w FROM h
    ),
    regs AS (
      SELECT idx, MAX({_hll_rank_sql("w")}) AS m FROM slots GROUP BY idx
    ),
    z AS (
      SELECT SUM(POW(2.0, -m)) + ({_HLL_M} - COUNT(*)) AS zsum,
             {_HLL_M} - COUNT(*) AS v
      FROM regs
    ),
    est AS (
      SELECT (0.7213 / (1.0 + 1.079 / {_HLL_M}))
             * {_HLL_M} * {_HLL_M} / zsum AS raw, v
      FROM z
    ),
    corrected AS (
      -- small-range (linear counting) correction: raw <= 2.5m with
      -- zero registers present => m * ln(m / V)
      SELECT raw,
             CASE WHEN raw <= 2.5 * {_HLL_M} AND v > 0
                  THEN {_HLL_M} * LN({_HLL_M} * 1.0 / v)
                  ELSE raw END AS e,
             v
      FROM est
    )
    SELECT (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
             AS n_exact,
           ROUND(raw, 4) AS hll_raw,
           ROUND(e, 4) AS hll_estimate,
           ROUND(ABS(e - (SELECT COUNT(DISTINCT o_custkey) FROM orders))
                 / (SELECT COUNT(DISTINCT o_custkey) FROM orders), 6)
             AS rel_error,
           CAST(v AS BIGINT) AS n_zero_registers,
           CAST({_HLL_M} AS BIGINT) AS n_registers
    FROM corrected
    """,
)
def agg_hyperloglog_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A COMPLETE HyperLogLog built in the engine with a pinned
    (md5) hash family, so the oracle reproduces every register:
    32-bit hash -> top 8 bits pick one of 256 registers, low 24 bits
    yield the rank via an integer-only threshold popcount (no
    floating log2, no binary-string length — both engines derive
    identical ranks), registers merge with MAX, and the raw estimate
    is alpha_m * m^2 / (sum 2^-M_j + zero registers). Spark's own
    approx_count_distinct is the production tier
    (`agg_approx_distinct`); this query proves the engine can
    EXPRESS the sketch relationally and gets it right to the bit.

    Scale: MAX-merge registers are associative — the same query runs
    over any partitioning with one O(256) shuffle after map-side
    combine, and register tables from disjoint corpus shards union
    and re-MAX to give the sketch of the union (mergeability is the
    entire point of HLL at 100 TB)."""
    o = load_table(spark, sf_dir, "orders")
    h = o.select(
        F.conv(F.substring(F.md5(F.concat(F.lit("hll:"), F.col("o_custkey"))), 1, 8), 16, 10)
        .cast("long")
        .alias("hv")
    ).distinct()
    slots = h.select(
        (F.col("hv") / 16777216).cast("long").alias("idx"),
        (F.col("hv") % 16777216).alias("w"),
    )
    rank = F.lit(25) - sum(
        [
            F.when(F.col("w") >= (1 << k), 1).otherwise(0)
            for k in range(24)
        ],
        F.lit(0),
    )
    regs = slots.select("idx", rank.alias("rho")).groupBy("idx").agg(
        F.max("rho").alias("m")
    )
    z = regs.agg(
        (
            F.sum(F.pow(F.lit(2.0), -F.col("m")))
            + (F.lit(_HLL_M) - F.count(F.lit(1)))
        ).alias("zsum"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).alias("v"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
    est = z.select(
        (F.lit(alpha) * _HLL_M * _HLL_M / F.col("zsum")).alias("raw"), "v"
    ).select(
        "raw",
        # small-range (linear counting) correction, as in the oracle
        F.when(
            (F.col("raw") <= 2.5 * _HLL_M) & (F.col("v") > 0),
            F.lit(float(_HLL_M)) * F.log(F.lit(_HLL_M) * 1.0 / F.col("v")),
        )
        .otherwise(F.col("raw"))
        .alias("e"),
        "v",
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("n_exact"))
    return est.crossJoin(F.broadcast(exact)).select(
        F.col("n_exact").cast("long").alias("n_exact"),
        F.round("raw", 4).alias("hll_raw"),
        F.round("e", 4).alias("hll_estimate"),
        F.round(
            F.abs(F.col("e") - F.col("n_exact")) / F.col("n_exact"), 6
        ).alias("rel_error"),
        F.col("v").cast("long").alias("n_zero_registers"),
        F.lit(_HLL_M).cast("long").alias("n_registers"),
    )


@register(
    "text_readability_flesch",
    oracle="""
    WITH per_doc AS (
      SELECT source,
             len(regexp_extract_all(text, '[^ ]+')) AS words,
             len(regexp_extract_all(text, '[.!?]+')) + 1 AS sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
      FROM documents
    ),
    scored AS (
      SELECT source, words,
             206.835 - 1.015 * (words * 1.0 / sentences)
                     - 84.6 * (syl * 1.0 / words) AS flesch,
             0.39 * (words * 1.0 / sentences)
                   + 11.8 * (syl * 1.0 / words) - 15.59 AS fk_grade
      FROM per_doc WHERE words > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(words), 4) AS avg_words,
           ROUND(AVG(flesch), 4) AS avg_flesch,
           ROUND(AVG(fk_grade), 4) AS avg_fk_grade
    FROM scored GROUP BY source
    """,
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch Reading Ease + Flesch-Kincaid grade per source: words
    and sentences via regexp token counts, syllables approximated by
    vowel-group runs ([aeiouy]+ — the standard cheap estimator) —
    all JVM-side regexp counts, no UDF. The corpus-quality signal a
    pretraining mix uses next to `text_quality`'s punctuation /
    stopword ratios: sources whose grade level drifts are flagged
    before they enter the mix.

    Scale: pure scan + one O(sources) aggregate; regexp_extract_all
    runs inside whole-stage codegen, nothing shuffles but the
    19-source rollup."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit("[^ ]+"), 0)).alias("words"),
        (
            F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), 0)) + 1
        ).alias("sentences"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0)
        ).alias("syl"),
    ).where(F.col("words") > 0)
    scored = per_doc.select(
        "source",
        "words",
        (
            F.lit(206.835)
            - 1.015 * (F.col("words") * 1.0 / F.col("sentences"))
            - 84.6 * (F.col("syl") * 1.0 / F.col("words"))
        ).alias("flesch"),
        (
            0.39 * (F.col("words") * 1.0 / F.col("sentences"))
            + 11.8 * (F.col("syl") * 1.0 / F.col("words"))
            - 15.59
        ).alias("fk_grade"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("words"), 4).alias("avg_words"),
        F.round(F.avg("flesch"), 4).alias("avg_flesch"),
        F.round(F.avg("fk_grade"), 4).alias("avg_fk_grade"),
    )
