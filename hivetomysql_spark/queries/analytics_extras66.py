"""Analytics extras, batch 66: Markov absorption analysis and MATTR
lexical diversity.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* Markov absorption — expected steps-to-absorption and absorption
  probabilities (purchase vs error) from every transient state via
  a truncated Neumann series: the funnel-economics number that
  completes the Markov family (stationary, removal attribution,
  entropy rate).
* MATTR — moving-average type-token ratio over 50-token windows:
  the length-unbiased lexical-diversity measure (plain TTR falls
  mechanically with document length; MATTR fixes the comparison).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_AB_TRANSIENT = ["signup", "click", "view"]
_AB_ABSORBING = ["purchase", "error"]
_AB_ITERS = 15


def _absorb_oracle() -> str:
    t, a = _AB_TRANSIENT, _AB_ABSORBING
    nt = len(t)
    cells = ",\n             ".join(
        f"SUM(CASE WHEN prev = '{t[i]}' AND event_type = '{s}' "
        f"THEN 1 ELSE 0 END) AS c_{i}_{s}"
        for i in range(nt)
        for s in (t + a)
    )
    rows = ",\n             ".join(
        f"SUM(CASE WHEN prev = '{t[i]}' THEN 1 ELSE 0 END) AS r{i}"
        for i in range(nt)
    )
    sql = f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    tc AS (
      SELECT {cells}, {rows}
      FROM seq WHERE prev IS NOT NULL
    ),
    it0 AS (SELECT {", ".join(
        f"{'1.0' if i == j else '0.0'}::DOUBLE AS m{i}{j}"
        for i in range(nt) for j in range(nt))},
        {", ".join(f"1.0::DOUBLE AS st{i}" for i in range(nt))},
        {", ".join(f"0.0::DOUBLE AS ab{i}{s}" for i in range(nt) for s in a)}
    )
    """
    prev = "it0"
    q = lambda i, j: f"(tc.c_{i}_{t[j]} * 1.0 / tc.r{i})"  # noqa: E731
    r = lambda i, s: f"(tc.c_{i}_{s} * 1.0 / tc.r{i})"  # noqa: E731
    for k in range(1, _AB_ITERS + 1):
        absorb = ", ".join(
            f"({prev}.ab{i}{s} + "
            + " + ".join(f"{prev}.m{i}{j} * {r(j, s)}" for j in range(nt))
            + f") AS ab{i}{s}"
            for i in range(nt)
            for s in a
        )
        mass = ", ".join(
            "("
            + " + ".join(f"{prev}.m{i}{x} * {q(x, j)}" for x in range(nt))
            + f") AS m{i}{j}"
            for i in range(nt)
            for j in range(nt)
        )
        steps = ", ".join(
            f"({prev}.st{i} + "
            + " + ".join(
                "("
                + " + ".join(f"{prev}.m{i}{x} * {q(x, j)}" for x in range(nt))
                + ")"
                for j in range(nt)
            )
            + f") AS st{i}"
            for i in range(nt)
        )
        sql += (
            f", it{k} AS (SELECT {mass}, {steps}, {absorb} "
            f"FROM {prev} CROSS JOIN tc)\n"
        )
        prev = f"it{k}"
    selects = " UNION ALL ".join(
        f"SELECT '{t[i]}' AS start_state, "
        f"ROUND({prev}.st{i}, 4) AS expected_steps, "
        f"ROUND({prev}.ab{i}{a[0]}, 6) AS p_purchase, "
        f"ROUND({prev}.ab{i}{a[1]}, 6) AS p_error "
        f"FROM {prev} CROSS JOIN tc"
        for i in range(nt)
    )
    return sql + selects


@register("events_markov_absorption", oracle=_absorb_oracle())
def events_markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing-chain analysis of the event funnel: purchase and
    error absorb; from each transient state (signup/click/view) the
    expected number of steps until absorption (t = N·1, N = sum Q^k
    truncated at 15 terms) and where the user ends up (B = N·R,
    purchase vs error split) — the funnel-economics numbers behind
    'how long until a signup converts, and to what'. The 5-state
    matrix collects driver-side (25 scalars, the PageRank-loop
    pattern at its smallest); the oracle unrolls all 15 matrix
    powers with step and absorption accumulators as chained CTEs,
    verifying the series itself.

    Scale: the only O(rows) work is the per-user lag window;
    everything after runs on a 3x5 matrix."""
    t, a = _AB_TRANSIENT, _AB_ABSORBING
    nt = len(t)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).where(F.col("prev").isNotNull())
    tc = seq.agg(
        *[
            F.sum(
                (
                    (F.col("prev") == t[i]) & (F.col("event_type") == s)
                ).cast("long")
            ).alias(f"c_{i}_{s}")
            for i in range(nt)
            for s in (t + a)
        ],
        *[
            F.sum((F.col("prev") == t[i]).cast("long")).alias(f"r{i}")
            for i in range(nt)
        ],
    ).collect()[0]
    Q = [
        [tc[f"c_{i}_{t[j]}"] / tc[f"r{i}"] for j in range(nt)]
        for i in range(nt)
    ]
    R = [
        [tc[f"c_{i}_{s}"] / tc[f"r{i}"] for s in a] for i in range(nt)
    ]
    M = [[1.0 if i == j else 0.0 for j in range(nt)] for i in range(nt)]
    st = [1.0] * nt
    ab = [[0.0, 0.0] for _ in range(nt)]
    for _ in range(_AB_ITERS):
        for i in range(nt):
            for s in range(2):
                acc = ab[i][s]
                for j in range(nt):
                    acc = acc + M[i][j] * R[j][s]
                ab[i][s] = acc
        NM = [[0.0] * nt for _ in range(nt)]
        for i in range(nt):
            for j in range(nt):
                acc = M[i][0] * Q[0][j]
                for x in range(1, nt):
                    acc = acc + M[i][x] * Q[x][j]
                NM[i][j] = acc
        for i in range(nt):
            st[i] = st[i] + sum(NM[i])
        M = NM
    rows = [
        (t[i], round(st[i], 10), ab[i][0], ab[i][1]) for i in range(nt)
    ]
    out = None
    for i in range(nt):
        row = spark.range(1).select(
            F.lit(t[i]).alias("start_state"),
            F.round(F.lit(st[i]), 4).alias("expected_steps"),
            F.round(F.lit(ab[i][0]), 6).alias("p_purchase"),
            F.round(F.lit(ab[i][1]), 6).alias("p_error"),
        )
        out = row if out is None else out.unionByName(row)
    return out


_MATTR_WIN = 50
_MATTR_STEP = 25


@register(
    "text_mattr_diversity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    per_doc AS (
      SELECT doc_id, source, len(w) AS n,
             len(list_distinct(w)) * 1.0 / len(w) AS plain_ttr,
             CASE WHEN len(w) < {_MATTR_WIN} THEN
               len(list_distinct(w)) * 1.0 / len(w)
             ELSE (
               SELECT AVG(len(list_distinct(w[s.s:s.s+{_MATTR_WIN - 1}]))
                          / {_MATTR_WIN}.0)
               FROM UNNEST(range(1, len(w) - {_MATTR_WIN} + 2,
                                 {_MATTR_STEP})) AS s(s)
             ) END AS mattr
      FROM toks WHERE len(w) > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(n), 2) AS avg_tokens,
           ROUND(AVG(plain_ttr), 4) AS avg_plain_ttr,
           ROUND(AVG(mattr), 4) AS avg_mattr
    FROM per_doc GROUP BY source
    """,
)
def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average type-token ratio (MATTR, Covington &
    McFall): distinct-token share averaged over sliding 50-token
    windows (step 25), falling back to plain TTR for short
    documents — the lexical-diversity measure that does NOT fall
    mechanically with document length, reported next to plain TTR so
    the length bias is visible per source. The diversity screen for
    template-farm and repetitive-generation content, complementing
    `text_distinct_ngram_diversity` (n-gram level) and
    `text_hapax_ratio` (corpus level).

    Shape: pure in-row array work (windows never leave the token
    array), one O(sources) rollup."""
    d = load_table(spark, sf_dir, "documents")
    w = F.filter(
        F.split(F.trim(F.lower("text")), r"\s+"), lambda x: x != ""
    )
    toks = d.select("doc_id", "source", w.alias("w")).where(F.size("w") > 0)
    n = F.size("w")
    plain = F.size(F.array_distinct("w")) * 1.0 / n
    starts = F.sequence(
        F.lit(1), n - _MATTR_WIN + 1, F.lit(_MATTR_STEP)
    )
    win_ttrs = F.transform(
        starts,
        lambda s: F.size(F.array_distinct(F.slice(F.col("w"), s, _MATTR_WIN)))
        / float(_MATTR_WIN),
    )
    mattr = F.when(n < _MATTR_WIN, plain).otherwise(
        F.aggregate(win_ttrs, F.lit(0.0), lambda acc, x: acc + x)
        / F.size(win_ttrs)
    )
    per_doc = toks.select(
        "source", n.alias("n"), plain.alias("plain_ttr"), mattr.alias("mattr")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n"), 2).alias("avg_tokens"),
        F.round(F.avg("plain_ttr"), 4).alias("avg_plain_ttr"),
        F.round(F.avg("mattr"), 4).alias("avg_mattr"),
    )
