"""Analytics extras, batch 30: iterative graph core, diversified
retrieval, resampling-free uncertainty, embedding normalization.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* k-core decomposition — iterative degree peeling, the classic
  "dense engagement subgraph" extraction.
* MMR re-ranking — maximal marginal relevance diversified top-k,
  the retrieval-stage de-duplication of semantic search results.
* jackknife ratio SE — delete-one variance of a RATIO estimator
  from sufficient statistics (no resampling pass).
* per-dimension embedding standardization — corpus-level feature
  scaling (diagonal whitening) as a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.operators.similarity import _as_double, _dot, _norm
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_KCORE_K = 3
_KCORE_ORACLE_ROUNDS = 16


def _kcore_oracle() -> str:
    # MATERIALIZED stops DuckDB inlining each CTE at every reference —
    # n{r} is referenced twice per round, so inlined expansion is
    # exponential in rounds (16 rounds exhausted the fd limit)
    rounds = []
    prev = "n0"
    for r in range(1, _KCORE_ORACLE_ROUNDS + 1):
        rounds.append(
            f"""e{r} AS MATERIALIZED (
      SELECT u, v FROM ed
      WHERE u IN (SELECT u FROM {prev}) AND v IN (SELECT u FROM {prev})
    ),
    n{r} AS MATERIALIZED (
      SELECT u FROM e{r} GROUP BY u HAVING COUNT(*) >= {_KCORE_K}
    )"""
        )
        prev = f"n{r}"
    last = _KCORE_ORACLE_ROUNDS
    return f"""
    WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    epair AS MATERIALIZED (
      SELECT a.p AS u, b.p AS v
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= 2
    ),
    ed AS MATERIALIZED (
      SELECT u, v FROM epair UNION ALL SELECT v, u FROM epair
    ),
    n0 AS MATERIALIZED (
      SELECT u FROM ed GROUP BY u HAVING COUNT(*) >= {_KCORE_K}
    ),
    {",".join(rounds)},
    core_e AS (
      SELECT u, v FROM ed
      WHERE u IN (SELECT u FROM n{last}) AND v IN (SELECT u FROM n{last})
    ),
    core_d AS (SELECT u, COUNT(*) AS d FROM core_e GROUP BY u)
    SELECT CAST({_KCORE_K} AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_core_nodes,
           CAST(COALESCE(SUM(d), 0) / 2 AS BIGINT) AS n_core_edges,
           CAST(COALESCE(MAX(d), 0) AS BIGINT) AS max_core_degree
    FROM core_d
    """


@register("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=3) of the support-≥2 co-purchase part
    graph by iterative degree peeling: repeatedly delete nodes with
    in-core degree < k until stable; the surviving subgraph is the
    densest "always bought in combination" backbone — the standard
    community-seed / spam-ring / engagement-core primitive.

    Shape: each peel round is one semi-join (edges restricted to
    surviving nodes) + one degree aggregate over the SHRINKING edge
    set — at 100 TB round cost decays geometrically as the periphery
    peels away; lineage is truncated per round (localCheckpoint).
    Rounds are adaptive with a loud 30-round cap (the sf0.01 fixture
    peels in ~10; silently returning a half-peeled core is the one
    failure the oracle gate could not localize — same policy as
    `graph_connected_components`). Oracle unrolls 16 peel rounds;
    extra rounds past the fixpoint are no-ops, so both engines agree
    whenever peeling terminates within the unroll."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("o", F.col("p").alias("u"))
    b = op.select("o", F.col("p").alias("v"))
    epair = (
        a.join(b, "o")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("nco"))
        .where(F.col("nco") >= 2)
        .select("u", "v")
    )
    ed = epair.union(
        epair.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    # scope the shuffle width to the (small, shrinking) peel loop and
    # silence AQE's per-micro-stage re-planning — the same treatment
    # that cut graph_connected_components' round overhead; per-round
    # cost here is task scheduling, not data
    n_edges = ed.count()
    nparts = max(1 if n_edges < 100_000 else 4, n_edges // 500_000)
    saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
    saved_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        def peel(ns):
            ce = ed.join(ns, "u").join(
                ns.select(F.col("u").alias("v")), "v"
            )
            return (
                ce.groupBy("u")
                .agg(F.count(F.lit(1)).alias("d"))
                .where(F.col("d") >= _KCORE_K)
                .select("u")
            )

        nodes = ed.groupBy("u").agg(F.count(F.lit(1)).alias("d")).where(
            F.col("d") >= _KCORE_K
        ).select("u")
        prev_n = None
        converged = False
        for _ in range(15):
            # TWO peels per checkpoint+count: core size is monotone
            # non-increasing, so probing every second round costs at
            # most two no-op peels after the fixpoint but halves the
            # per-iteration job count (checkpoint job + count job
            # dominate these tiny rounds)
            ns = peel(nodes).localCheckpoint()
            cur_n = ns.count()
            if cur_n == prev_n:
                converged = True
                nodes = ns
                break
            prev_n = cur_n
            nodes = peel(ns)
        if not converged:
            raise RuntimeError(
                "graph_kcore: peeling did not stabilize within 15 probes "
                "x 2 peels each (= 30 single peels; last core size "
                f"{prev_n}); raise the cap for this graph"
            )
        core_e = ed.join(nodes, "u").join(
            nodes.select(F.col("u").alias("v")), "v"
        )
        core_d = core_e.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        out = core_d.agg(
            F.lit(_KCORE_K).cast("long").alias("k"),
            F.count(F.lit(1)).cast("long").alias("n_core_nodes"),
            (F.coalesce(F.sum("d"), F.lit(0)) / 2).cast("long").alias(
                "n_core_edges"
            ),
            F.coalesce(F.max("d"), F.lit(0)).cast("long").alias(
                "max_core_degree"
            ),
        ).localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved_parts)
        spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
    return out


_MMR_LAMBDA = 0.7
_MMR_CAND = 12
_MMR_K = 5


def _mmr_oracle() -> str:
    sel = """s1 AS (
      SELECT id, rel, 1 AS pick FROM cand ORDER BY rel DESC, id LIMIT 1
    )"""
    parts = [sel]
    for r in range(2, _MMR_K + 1):
        p = f"s{r - 1}all"
        prev_union = (
            "s1"
            if r == 2
            else f"s{r - 1}all"
        )
        # accumulated selection through round r-1
        if r == 2:
            parts.append("s1all AS (SELECT * FROM s1)")
            prev_union = "s1all"
        parts.append(
            f"""p{r} AS (
      SELECT c.id, c.rel, MAX(s.sim) AS ms
      FROM cand c
      JOIN sims s ON s.a = c.id AND s.b IN (SELECT id FROM {prev_union})
      WHERE c.id NOT IN (SELECT id FROM {prev_union})
      GROUP BY c.id, c.rel
    ),
    s{r} AS (
      SELECT id, rel, {r} AS pick FROM p{r}
      ORDER BY {_MMR_LAMBDA} * rel - {1 - _MMR_LAMBDA:.1f} * ms DESC, id
      LIMIT 1
    ),
    s{r}all AS (SELECT * FROM {prev_union} UNION ALL SELECT * FROM s{r})"""
        )
    return f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv,
             sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])) AS qn
      FROM embeddings WHERE vec_id = 0
    ),
    cand AS (
      SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v,
             list_dot_product(e.embedding::DOUBLE[], q.qv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                        e.embedding::DOUBLE[])) * q.qn)
               AS rel
      FROM embeddings e, q
      WHERE e.vec_id <> 0
      ORDER BY rel DESC, e.vec_id
      LIMIT {_MMR_CAND}
    ),
    sims AS (
      SELECT x.id AS a, y.id AS b,
             list_dot_product(x.v, y.v)
               / (sqrt(list_dot_product(x.v, x.v))
                  * sqrt(list_dot_product(y.v, y.v))) AS sim
      FROM cand x JOIN cand y ON x.id <> y.id
    ),
    {",".join(parts)}
    SELECT pick, CAST(id AS BIGINT) AS neighbor_id,
           ROUND(rel, 6) AS relevance
    FROM s{_MMR_K}all
    ORDER BY pick
    """


@register("similarity_mmr_rerank", oracle=_mmr_oracle())
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): from the query's top-12 cosine candidates, greedily pick 5
    maximizing λ·relevance − (1−λ)·max-similarity-to-already-picked
    (λ=0.7, id-ascending tie-break) — the standard retrieval-stage
    diversification that stops semantic search returning five copies
    of the same near-duplicate passage.

    Shape: stage 1 (data-sized) is the brute-force/ANN top-N scan —
    distributed exactly like `similarity_cosine_topk`; stage 2
    operates on the O(N²)=144-cell candidate similarity matrix, so
    the greedy loop runs as N tiny DataFrame rounds whose inputs
    never exceed the candidate set — at 100 TB stage 2's cost is
    unchanged because the candidate set is k-bounded, not
    data-bounded."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("id"), _as_double("embedding").alias("v")
    ).withColumn("n", _norm("v"))
    q = base.where("id = 0").select(
        F.col("v").alias("qv"), F.col("n").alias("qn")
    )
    cand = (
        base.where("id <> 0")
        .crossJoin(F.broadcast(q))
        .select(
            "id", "v", "n", (_dot("v", "qv") / (F.col("n") * F.col("qn"))).alias("rel")
        )
        .orderBy(F.desc("rel"), "id")
        .limit(_MMR_CAND)
        .localCheckpoint()
    )
    sims = (
        cand.select(F.col("id").alias("a"), F.col("v").alias("va"), F.col("n").alias("na"))
        .crossJoin(
            cand.select(
                F.col("id").alias("b"), F.col("v").alias("vb"), F.col("n").alias("nb")
            )
        )
        .where(F.col("a") != F.col("b"))
        .select(
            "a", "b", (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("sim")
        )
        .localCheckpoint()
    )
    first = (
        cand.orderBy(F.desc("rel"), "id").limit(1).select("id", "rel").collect()[0]
    )
    picked = [(1, first.id, first.rel)]
    for r in range(2, _MMR_K + 1):
        sel_ids = [p[1] for p in picked]
        nxt = (
            cand.where(~F.col("id").isin(sel_ids))
            .join(
                sims.where(F.col("b").isin(sel_ids)).groupBy("a").agg(
                    F.max("sim").alias("ms")
                ),
                cand["id"] == F.col("a"),
            )
            .orderBy(
                F.desc(
                    _MMR_LAMBDA * F.col("rel") - (1 - _MMR_LAMBDA) * F.col("ms")
                ),
                "id",
            )
            .limit(1)
            .select("id", "rel")
            .collect()[0]
        )
        picked.append((r, nxt.id, nxt.rel))
    out = spark.createDataFrame(
        [(p, int(i), float(rl)) for p, i, rl in picked],
        "pick: int, neighbor_id: long, relevance: double",
    )
    return out.select(
        "pick", "neighbor_id", F.round("relevance", 6).alias("relevance")
    ).orderBy("pick")


@register(
    "stats_jackknife_ratio",
    oracle="""
    WITH base AS (
      SELECT l_extendedprice * (1 - l_discount) AS rev, l_quantity AS q
      FROM lineitem
    ),
    tot AS (
      SELECT SUM(rev) AS sr, SUM(q) AS sq, COUNT(*) AS n FROM base
    ),
    loo AS (
      -- d_i = r_i - R expanded analytically: subtracting two ~equal
      -- ratios loses ~10 digits to cancellation and the two engines'
      -- sum orders then disagree past the rounding; the expanded form
      -- keeps every term small
      SELECT (b.q * t.sr - b.rev * t.sq) / (t.sq * (t.sq - b.q)) AS d_i,
             t.n AS n, t.sr / t.sq AS ratio
      FROM base b CROSS JOIN tot t
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           ROUND(MAX(ratio), 6) AS ratio,
           ROUND(SQRT((MAX(n) - 1.0) / MAX(n)
                 * (SUM(d_i * d_i)
                    - COUNT(*) * AVG(d_i) * AVG(d_i))), 6) AS jk_se,
           ROUND((MAX(n) - 1.0) * AVG(d_i), 6) AS jk_bias
    FROM loo
    """,
)
def stats_jackknife_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one jackknife standard error and bias of the RATIO
    estimator revenue-per-unit (Σ discounted revenue / Σ quantity) —
    the uncertainty method of record for ratio metrics, computed
    WITHOUT any resampling pass: each leave-one-out replicate
    r_i = (S_rev − rev_i)/(S_qty − q_i) is closed-form from the
    broadcast totals, so the whole estimate is one scan + one
    aggregate. Complements `stats_poisson_bootstrap` (which needs R
    passes-worth of weighted sums) for smooth estimators.

    Shape: one aggregate produces the totals (3 scalars, broadcast
    back); the replicate column is map-side arithmetic; the final
    moment aggregate is map-side combined. Two scans total, zero
    data-sized shuffles at any corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        F.col("l_quantity").alias("q"),
    )
    tot = base.agg(
        F.sum("rev").alias("sr"), F.sum("q").alias("sq"), F.count(F.lit(1)).alias("n")
    )
    # d_i = r_i - R expanded analytically (q·S_r - rev·S_q) /
    # (S_q·(S_q - q)): subtracting two nearly-equal ratios loses ~10
    # digits to cancellation and cross-engine sum order then breaks
    # the 6-decimal canon; the expanded form keeps terms small
    loo = base.crossJoin(F.broadcast(tot)).select(
        (
            (F.col("q") * F.col("sr") - F.col("rev") * F.col("sq"))
            / (F.col("sq") * (F.col("sq") - F.col("q")))
        ).alias("d_i"),
        "n",
        (F.col("sr") / F.col("sq")).alias("ratio"),
    )
    return loo.agg(
        F.max("n").cast("long").alias("n"),
        F.round(F.max("ratio"), 6).alias("ratio"),
        F.round(
            F.sqrt(
                (F.max("n") - 1.0)
                / F.max("n")
                * (
                    F.sum(F.col("d_i") * F.col("d_i"))
                    - F.count(F.lit(1)) * F.avg("d_i") * F.avg("d_i")
                )
            ),
            6,
        ).alias("jk_se"),
        F.round((F.max("n") - 1.0) * F.avg("d_i"), 6).alias("jk_bias"),
    )


_STD_DIMS = 8


def _standardize_oracle() -> str:
    cols = ",\n           ".join(
        f"ROUND((embedding[{j + 1}]::DOUBLE - s.m{j}) / s.sd{j}, 4) AS z{j}"
        for j in range(_STD_DIMS)
    )
    stats = ", ".join(
        f"AVG(embedding[{j + 1}]::DOUBLE) AS m{j}, "
        f"STDDEV_SAMP(embedding[{j + 1}]::DOUBLE) AS sd{j}"
        for j in range(_STD_DIMS)
    )
    return f"""
    WITH s AS (SELECT {stats} FROM embeddings)
    SELECT vec_id,
           {cols}
    FROM embeddings, s
    """


@register("embedding_standardize_dims", oracle=_standardize_oracle())
def embedding_standardize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization of the embedding matrix
    (diagonal whitening, first 8 dims reported as columns): corpus
    mean/std per dimension, then (x−μ)/σ per vector — the feature
    scaling step before distance-based ops (k-means, Mahalanobis)
    whose skipping silently degrades every downstream similarity.

    Shape: the stats pass is ONE aggregate producing 2·d scalars
    (map-side combined over in-row array access — no explode, no
    shuffle of element rows); the apply pass is a broadcast of those
    scalars into scan-stage arithmetic. Two scans, zero data-sized
    shuffles at 100 TB."""
    e = load_table(spark, sf_dir, "embeddings")
    el = [F.element_at("embedding", j + 1).cast("double") for j in range(_STD_DIMS)]
    stats = e.agg(
        *[F.avg(el[j]).alias(f"m{j}") for j in range(_STD_DIMS)],
        *[F.stddev_samp(el[j]).alias(f"sd{j}") for j in range(_STD_DIMS)],
    )
    out = [F.col("vec_id")]
    for j in range(_STD_DIMS):
        out.append(
            F.round((el[j] - F.col(f"m{j}")) / F.col(f"sd{j}"), 4).alias(f"z{j}")
        )
    return e.crossJoin(F.broadcast(stats)).select(*out)
