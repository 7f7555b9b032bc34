"""Analytics extras, batch 46: bipartite link analysis and dedup
budget planning.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* HITS — hub (customer) / authority (part) scores on the purchase
  bipartite graph, the other canonical link-analysis fixpoint next
  to PageRank.
* dedup threshold sweep — documents and tokens removed at Jaccard
  thresholds 0.2/0.3/0.5, the table that prices a dedup policy
  before committing the corpus build to one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_HITS_ROUNDS = 6


def _hits_oracle() -> str:
    # L1-normalized alternating updates, unrolled:
    # a_r(p) = sum over edges (c,p) of h_{r-1}(c), then normalize;
    # h_r(c) = sum over edges (c,p) of a_r(p), then normalize.
    rounds = []
    prev_h = "h0"
    for r in range(1, _HITS_ROUNDS + 1):
        # MATERIALIZED throughout: every CTE here is referenced
        # twice (update + its own normalizer), so DuckDB's default
        # inlining doubles work per round = 2^rounds blowup
        rounds.append(f"""a{r}raw AS MATERIALIZED (
      SELECT e.p, SUM(h.s) AS s
      FROM e JOIN {prev_h} h ON h.c = e.c GROUP BY e.p
    ),
    a{r} AS MATERIALIZED (
      SELECT p, s / (SELECT SUM(s) FROM a{r}raw) AS s FROM a{r}raw
    ),
    h{r}raw AS MATERIALIZED (
      SELECT e.c, SUM(s) AS s
      FROM (SELECT e.c, a.s FROM e JOIN a{r} a ON a.p = e.p) e
      GROUP BY e.c
    ),
    h{r} AS MATERIALIZED (
      SELECT c, s / (SELECT SUM(s) FROM h{r}raw) AS s FROM h{r}raw
    )""")
        prev_h = f"h{r}"
    R = _HITS_ROUNDS
    return f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_partkey < 200
    ),
    h0 AS MATERIALIZED (
      SELECT c, 1.0 / (SELECT COUNT(DISTINCT c) FROM e) AS s
      FROM (SELECT DISTINCT c FROM e)
    ),
    {",".join(rounds)}
    SELECT CAST(a.p AS BIGINT) AS part,
           ROUND(a.s, 6) AS authority,
           CAST(ROW_NUMBER() OVER (ORDER BY a.s DESC, a.p) AS BIGINT)
             AS rank
    FROM a{R} a
    ORDER BY a.s DESC, a.p
    LIMIT 10
    """


@register("graph_hits_authority", oracle=_hits_oracle())
def graph_hits_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999) on the customer→part purchase bipartite
    graph (parts < 200 to bound the oracle): alternating hub
    (customer) / authority (part) score updates, L1-normalized, 6
    rounds; top-10 authority parts — the "what do well-connected
    buyers buy" ranking, the canonical link-analysis fixpoint next
    to `graph_pagerank_nations`.

    Shape: each half-round is one join of the edge list against the
    O(nodes) score vector + one keyed aggregate — the same
    Pregel-on-DataFrames step as PageRank, with the score vector
    broadcastable at any realistic node count; normalization is one
    scalar. Fixed rounds (matching the unrolled oracle), with
    convergence measured in the invariant tests."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .where(F.col("l_partkey") < 200)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint()
    )
    n_c = e.select("c").distinct().count()
    h = e.select("c").distinct().select(
        "c", (F.lit(1.0) / n_c).alias("s")
    )
    for _ in range(_HITS_ROUNDS):
        a_raw = (
            e.join(h.withColumnRenamed("s", "hs"), "c")
            .groupBy("p")
            .agg(F.sum("hs").alias("s"))
        )
        a_tot = a_raw.agg(F.sum("s").alias("t"))
        a = a_raw.crossJoin(F.broadcast(a_tot)).select(
            "p", (F.col("s") / F.col("t")).alias("s")
        )
        h_raw = (
            e.join(a.withColumnRenamed("s", "as_"), "p")
            .groupBy("c")
            .agg(F.sum("as_").alias("s"))
        )
        h_tot = h_raw.agg(F.sum("s").alias("t"))
        h = (
            h_raw.crossJoin(F.broadcast(h_tot))
            .select("c", (F.col("s") / F.col("t")).alias("s"))
            .localCheckpoint()
        )
        last_a = a
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("s"), "p")
    return (
        last_a.select(
            F.col("p").cast("long").alias("part"),
            F.round("s", 6).alias("authority"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .orderBy(F.desc("authority"), "part")
        .limit(10)
    )


@register(
    "text_dedup_threshold_sweep",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
      FROM words, UNNEST(generate_series(1, greatest(len(w) - 2, 1))) AS t(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id),
    toksz AS (
      SELECT doc_id, len(w) AS n_tok FROM words
    ),
    pairs AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT ida, idb, c * 1.0 / (sa.ns + sb.ns - c) AS j
      FROM pairs
      JOIN sizes sa ON sa.doc_id = ida
      JOIN sizes sb ON sb.doc_id = idb
    ),
    thresholds AS (SELECT UNNEST([0.2, 0.3, 0.5]::DOUBLE[]) AS thr),
    removed AS (
      -- min-id survivor policy: the larger id of every pair above
      -- threshold is removed
      SELECT t.thr, j.idb AS doc_id
      FROM thresholds t JOIN jac j ON j.j >= t.thr
      GROUP BY t.thr, j.idb
    )
    SELECT thresholds.thr AS threshold,
           CAST(COUNT(r.doc_id) AS BIGINT) AS n_docs_removed,
           CAST(COALESCE(SUM(ts.n_tok), 0) AS BIGINT) AS n_tokens_removed,
           ROUND(COALESCE(SUM(ts.n_tok), 0) * 1.0
                 / (SELECT SUM(n_tok) FROM toksz), 6) AS token_share_removed
    FROM thresholds
    LEFT JOIN removed r ON r.thr = thresholds.thr
    LEFT JOIN toksz ts ON ts.doc_id = r.doc_id
    GROUP BY thresholds.thr
    ORDER BY thresholds.thr
    """,
)
def text_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup budget sweep: documents and tokens that a min-id-survivor
    near-dup policy would remove at Jaccard thresholds 0.2 / 0.3 /
    0.5 — the table that prices a dedup policy (tokens sacrificed vs
    duplication tolerated) BEFORE the corpus build commits to one;
    run on the exact 3-gram pair table so the sweep is ground truth,
    not an LSH estimate.

    Shape: the pair table is computed ONCE (same posting-list join as
    `dedup_ngram_jaccard`) and the three thresholds are filters over
    it — sweeping costs nothing beyond the single pair
    materialization."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("w")
    ).localCheckpoint()
    sh = words.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.size("w") - 2, F.lit(1))
                    ),
                    lambda i: F.concat_ws(" ", F.slice(F.col("w"), i, 3)),
                )
            )
        ).alias("g"),
    ).select("doc_id", F.xxhash64("g").alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ns"))
    toksz = words.select("doc_id", F.size("w").alias("n_tok"))
    a = sh.select(F.col("doc_id").alias("ida"), "shingle")
    b = sh.select(F.col("doc_id").alias("idb"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .where(F.col("ida") < F.col("idb"))
        .groupBy("ida", "idb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = (
        pairs.join(
            sizes.select(F.col("doc_id").alias("ida"), F.col("ns").alias("nsa")),
            "ida",
        )
        .join(
            sizes.select(F.col("doc_id").alias("idb"), F.col("ns").alias("nsb")),
            "idb",
        )
        .select(
            "idb",
            (
                F.col("c") / (F.col("nsa") + F.col("nsb") - F.col("c"))
            ).alias("j"),
        )
        .localCheckpoint()
    )
    thr = spark.createDataFrame(
        [(0.2,), (0.3,), (0.5,)], "thr: double"
    )
    removed = (
        thr.crossJoin(jac)
        .where(F.col("j") >= F.col("thr"))
        .select("thr", F.col("idb").alias("doc_id"))
        .distinct()
    )
    tok_tot = toksz.agg(F.sum("n_tok").alias("t"))
    return (
        thr.join(removed, "thr", "left")
        .join(toksz, "doc_id", "left")
        .crossJoin(F.broadcast(tok_tot))
        .groupBy("thr")
        .agg(
            F.count("doc_id").cast("long").alias("n_docs_removed"),
            F.coalesce(F.sum("n_tok"), F.lit(0))
            .cast("long")
            .alias("n_tokens_removed"),
            F.round(
                F.coalesce(F.sum("n_tok"), F.lit(0)) * 1.0 / F.first("t"), 6
            ).alias("token_share_removed"),
        )
        .select(
            F.col("thr").alias("threshold"),
            "n_docs_removed",
            "n_tokens_removed",
            "token_share_removed",
        )
        .orderBy("threshold")
    )
