"""Analytics extras, batch 41: seasonal smoothing, corpus
dispersion, and embedding-space geometry.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* seasonal Holt-Winters — additive triple exponential smoothing with
  a 7-slot day-of-week seasonal state, completing the EMA → Holt →
  Holt-Winters smoothing family as array folds.
* token dispersion — Gries' DP: how unevenly a token spreads across
  corpus parts (beyond raw frequency).
* embedding isotropy — mean pairwise cosine WITHOUT a pairwise join
  (sufficient-statistics identity), the embedding-quality metric
  behind "all my vectors point the same way" bugs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_HW_ALPHA = 0.3
_HW_BETA = 0.1
_HW_GAMMA = 0.2
_HW_P = 7


def _hw_state_update_sql() -> str:
    # state list: [level, trend, s1..s7, idx]; e = [x]
    # si for the CURRENT period is slot (idx % 7) + 3 in acc
    a, b, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    slots = ", ".join(
        f"CASE WHEN CAST(acc[10] AS INT) % 7 = {i} "
        f"THEN {g} * (e[1] - ({a} * (e[1] - acc[{i + 3}])"
        f" + (1 - {a}) * (acc[1] + acc[2]))) "
        f"+ (1 - {g}) * acc[{i + 3}] ELSE acc[{i + 3}] END"
        for i in range(_HW_P)
    )
    lvl = f"{a} * (e[1] - acc[CAST(acc[10] AS INT) % 7 + 3]) + (1 - {a}) * (acc[1] + acc[2])"
    trd = (
        f"{b} * (({lvl}) - acc[1]) + (1 - {b}) * acc[2]"
    )
    return f"[{lvl}, {trd}, {slots}, acc[10] + 1]"


@register(
    "timeseries_holt_winters_seasonal",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      GROUP BY 1
    ),
    s AS (
      SELECT list(x ORDER BY d) AS xs, COUNT(*) AS n FROM daily
    ),
    folded AS (
      SELECT n,
             list_reduce(
               -- trailing 1.0 = the period index AFTER consuming the
               -- seed observation (only the first element's transform
               -- is ever used as the accumulator seed)
               list_transform(xs, v -> [v, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                                        0.0, 0.0, 1.0]),
               (acc, e) -> {_hw_state_update_sql()}
             ) AS st
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(st[1], 4) AS level,
           ROUND(st[2], 4) AS trend,
           ROUND(st[3], 4) AS season_slot0,
           ROUND(st[1] + st[2]
                 + st[CAST(st[10] AS INT) % 7 + 3], 4) AS forecast_1
    FROM folded
    """,
)
def timeseries_holt_winters_seasonal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Additive Holt-Winters (α=0.3, β=0.1, γ=0.2, period 7) over
    daily order counts from 1997 on: level, trend, and a 7-slot
    day-of-week seasonal state updated per observation — completing
    the smoothing family (`timeseries_ema` → `timeseries_holt_winters`
    → seasonal), expressed as ONE per-series array fold with a
    10-component state vector (level, trend, 7 seasonal slots,
    index). Seed: level = x₁, trend and seasonals 0 — both engines
    fold the identical flat-linear update forms, so the oracle
    matches bit-for-bit before rounding.

    Shape: the fact table reduces to O(days) first; the fold is
    JVM-side whole-stage codegen over one array; the streaming twin
    is applyInPandasWithState with the same update."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.where(F.col("o_orderdate") >= F.lit("1997-01-01"))
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    s = daily.agg(
        F.array_sort(F.collect_list(F.struct("d", "x"))).alias("seq"),
        F.count(F.lit(1)).alias("n"),
    )
    xs = F.transform(F.col("seq"), lambda e: e["x"])
    a, b, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA

    def upd(acc, x):
        idx = F.element_at(acc, 10).cast("int") % _HW_P
        si = F.element_at(acc, idx + 3)  # slot i sits at position i+3
        lvl = a * (x - si) + (1 - a) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        trd = b * (lvl - F.element_at(acc, 1)) + (1 - b) * F.element_at(
            acc, 2
        )
        slots = [
            F.when(
                idx == i,
                g * (x - lvl) + (1 - g) * F.element_at(acc, i + 3),
            ).otherwise(F.element_at(acc, i + 3))
            for i in range(_HW_P)
        ]
        return F.array(lvl, trd, *slots, F.element_at(acc, 10) + 1)

    init = F.array(
        F.element_at(xs, 1),
        *([F.lit(0.0)] * (_HW_P + 1)),
        F.lit(1.0),
    )
    st = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))), init, upd
    )
    nxt_si = F.element_at(
        st, (F.element_at(st, 10).cast("int") % _HW_P) + 3
    )
    return s.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.element_at(st, 1), 4).alias("level"),
        F.round(F.element_at(st, 2), 4).alias("trend"),
        F.round(F.element_at(st, 3), 4).alias("season_slot0"),
        F.round(
            F.element_at(st, 1) + F.element_at(st, 2) + nxt_si, 4
        ).alias("forecast_1"),
    )


@register(
    "text_token_dispersion",
    oracle="""
    WITH toks AS (
      SELECT source,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ),
    part_sizes AS (
      SELECT source, COUNT(*) AS sz FROM toks GROUP BY source
    ),
    tot AS (SELECT SUM(sz) * 1.0 AS t FROM part_sizes),
    tok_part AS (
      SELECT tok, source, COUNT(*) AS n FROM toks GROUP BY tok, source
    ),
    tok_tot AS (SELECT tok, SUM(n) AS f FROM tok_part GROUP BY tok),
    dp AS (
      -- Gries' DP: 0.5 * sum over parts |expected share - observed
      -- share|; parts where the token is absent contribute their
      -- expected share
      SELECT tt.tok, tt.f,
             0.5 * SUM(ABS(ps.sz / tot.t
                           - COALESCE(tp.n, 0) * 1.0 / tt.f)) AS dp
      FROM tok_tot tt
      CROSS JOIN part_sizes ps
      CROSS JOIN tot
      LEFT JOIN tok_part tp ON tp.tok = tt.tok AND tp.source = ps.source
      GROUP BY tt.tok, tt.f
    )
    SELECT tok, CAST(f AS BIGINT) AS freq, ROUND(dp, 6) AS dispersion_dp
    FROM dp
    ORDER BY dispersion_dp DESC, tok
    LIMIT 15
    """,
)
def text_token_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gries' deviation of proportions (DP) per token: how unevenly a
    token's occurrences spread across corpus parts (sources) relative
    to part sizes — 0 = perfectly proportional, →1 = concentrated in
    one part. Frequency alone misses this (a frequent token can live
    in one source); DP is the standard corpus-linguistics dispersion
    measure and a practical boilerplate/contamination screen. Top-15
    most-concentrated tokens.

    Shape: token explosion → two vocabulary-bounded count tables →
    a vocab × parts join (both sides tiny after the reduce) — at
    100 TB the only data-sized stage is the first count."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    )
    part_sizes = toks.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    tot = part_sizes.agg(F.sum("sz").cast("double").alias("t"))
    tok_part = toks.groupBy("tok", "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    tok_tot = tok_part.groupBy("tok").agg(F.sum("n").alias("f"))
    grid = tok_tot.crossJoin(F.broadcast(part_sizes)).crossJoin(
        F.broadcast(tot)
    )
    dp = (
        grid.join(tok_part, ["tok", "source"], "left")
        .groupBy("tok", "f")
        .agg(
            (
                0.5
                * F.sum(
                    F.abs(
                        F.col("sz") / F.col("t")
                        - F.coalesce(F.col("n"), F.lit(0)) * 1.0 / F.col("f")
                    )
                )
            ).alias("dp")
        )
    )
    return (
        dp.select(
            "tok",
            F.col("f").cast("long").alias("freq"),
            F.round("dp", 6).alias("dispersion_dp"),
        )
        .orderBy(F.desc("dispersion_dp"), "tok")
        .limit(15)
    )


_ISO_DIMS = 64


@register(
    "embedding_isotropy",
    oracle=f"""
    WITH e AS (
      SELECT list_transform(embedding::DOUBLE[],
               x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                              embedding::DOUBLE[])))
               AS u
      FROM embeddings
    ),
    sums AS (
      SELECT COUNT(*) * 1.0 AS n,
             [{", ".join(f"SUM(u[{j + 1}])" for j in range(_ISO_DIMS))}]
               AS sv
      FROM e
    )
    SELECT CAST(n AS BIGINT) AS n_vectors,
           ROUND((list_dot_product(sv, sv) - n) / (n * (n - 1)), 6)
             AS mean_pairwise_cosine,
           ROUND(sqrt(list_dot_product(sv, sv)) / n, 6)
             AS mean_vector_norm
    FROM sums
    """,
)
def embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy check WITHOUT a pairwise join: with unit
    vectors û, the mean pairwise cosine is (‖Σû‖² − N)/(N(N−1)) —
    a sufficient-statistics identity that turns an O(N²) computation
    into one scan of per-dimension sums. High values mean the space
    has a dominant common direction (the anisotropy bug that cripples
    cosine retrieval; cf. Mu & Viswanath 2018 "All-but-the-Top"), and
    the companion mean-vector norm is the fraction of that common
    mass.

    Shape: one aggregate of 64 sums — map-side combined, O(d) bytes
    shuffled at ANY corpus size; the naive all-pairs form this
    replaces is the textbook example of a scale-killer."""
    e = load_table(spark, sf_dir, "embeddings").select(
        F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform("x", lambda v: v * v),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    u = e.select(F.transform("x", lambda v: v / nrm).alias("u"))
    sums = u.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[
            F.sum(F.element_at("u", j + 1)).alias(f"s{j}")
            for j in range(_ISO_DIMS)
        ],
    )
    sv2 = None
    for j in range(_ISO_DIMS):
        term = F.col(f"s{j}") * F.col(f"s{j}")
        sv2 = term if sv2 is None else sv2 + term
    return sums.select(
        F.col("n").cast("long").alias("n_vectors"),
        F.round((sv2 - F.col("n")) / (F.col("n") * (F.col("n") - 1)), 6).alias(
            "mean_pairwise_cosine"
        ),
        F.round(F.sqrt(sv2) / F.col("n"), 6).alias("mean_vector_norm"),
    )
