"""Analytics extras, batch 28: scalable statistics and graph/recsys ops.

None of these exist in the reference (`HiveToMysql.java:1-641` copies
rows, computes nothing); SURVEY.md §2.2 extension-tier entries:

* Spearman rank correlation — the robust (monotone, outlier-immune)
  complement of the `agg_stats` Pearson family.
* Poisson bootstrap — THE scalable bootstrap (one pass, no
  resampling shuffle); md5-deterministic so the whole mechanism is
  oracle-checked end-to-end.
* item co-occurrence similarity — the item-item collaborative-
  filtering kernel (cosine over co-purchase incidence).
* common-neighbor link prediction — Jaccard scores for unlinked
  pairs of the co-purchase graph.
* WOE / information value — the credit-scoring feature screen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


def _avg_rank(col: str) -> F.Column:
    # tie-averaged (fractional) rank: min-rank + (ties-1)/2
    return (
        F.rank().over(Window.orderBy(col))
        + (F.count(F.lit(1)).over(Window.partitionBy(col)) - 1) / 2.0
    )


_AVG_RANK_SQL = (
    "RANK() OVER (ORDER BY {c}) + (COUNT(*) OVER (PARTITION BY {c}) - 1) / 2.0"
)


@register(
    "stats_spearman_corr",
    oracle=f"""
    WITH r AS (
      SELECT {_AVG_RANK_SQL.format(c="l_quantity")} AS rq,
             {_AVG_RANK_SQL.format(c="l_extendedprice")} AS rp,
             {_AVG_RANK_SQL.format(c="l_discount")} AS rd
      FROM lineitem
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CORR(rq, rp), 6) AS rho_qty_price,
           ROUND(CORR(rq, rd), 6) AS rho_qty_disc,
           ROUND(CORR(rd, rp), 6) AS rho_disc_price
    FROM r
    """,
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation = Pearson correlation of
    tie-averaged ranks — the monotone-association measure that
    ignores outliers and nonlinear-but-monotone scaling, computed for
    three lineitem column pairs in one pass over the ranked relation.
    Tie handling is the classical fractional rank (average of the
    positions the tied block occupies), written as
    min-rank + (ties-1)/2 so both engines agree exactly.

    Shape: three global rank windows (one sort each) then a single
    O(1)-row correlation aggregate. The global-order window is the
    textbook form; at 100 TB each rank becomes the two-level
    range-partitioned prefix-sum already used by `etl_surrogate_keys`
    (sort within range partitions, broadcast per-partition offsets) —
    no single-partition window needed."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.select(
        _avg_rank("l_quantity").alias("rq"),
        _avg_rank("l_extendedprice").alias("rp"),
        _avg_rank("l_discount").alias("rd"),
    )
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.corr("rq", "rp"), 6).alias("rho_qty_price"),
        F.round(F.corr("rq", "rd"), 6).alias("rho_qty_disc"),
        F.round(F.corr("rd", "rp"), 6).alias("rho_disc_price"),
    )


# Poisson(1) inverse CDF breakpoints: P(X <= k) for k = 0..6; a
# uniform above the last bin maps to 7. Identical literals on both
# engines make the branch selection bit-identical.
_POIS_CDF = (
    0.3678794411714423,
    0.7357588823428846,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)
_BOOT_R = 32


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {p!r} THEN {k}" for k, p in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 7 END"


@register(
    "stats_poisson_bootstrap",
    oracle=f"""
    WITH reps AS (SELECT UNNEST(RANGE(0, {_BOOT_R})) AS rep),
    seeded AS (
      -- ONE md5 per row; per-replicate uniforms come from a
      -- multiplicative shift mod the same prime (32x fewer digest
      -- evaluations than md5-per-(row,rep) — measured 4x on the
      -- whole query at sf0.1)
      SELECT o_totalprice AS x,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
               % 999983 AS s
      FROM orders
    ),
    weighted AS (
      SELECT r.rep, o.x,
             {_pois_case_sql(
                 "(((o.s * (7919 + 104729 * r.rep)) % 999983) + 0.5) "
                 "/ 999983.0"
             )} AS w
      FROM seeded o CROSS JOIN reps r
    ),
    means AS (
      SELECT rep, SUM(w * x) / SUM(w) AS m
      FROM weighted GROUP BY rep
    )
    SELECT CAST({_BOOT_R} AS BIGINT) AS n_replicates,
           ROUND((SELECT AVG(o_totalprice) FROM orders), 4) AS point_mean,
           ROUND(AVG(m), 4) AS boot_mean,
           ROUND(STDDEV_SAMP(m), 4) AS boot_se,
           ROUND(quantile_cont(m, 0.025), 4) AS ci_lo,
           ROUND(quantile_cont(m, 0.975), 4) AS ci_hi
    FROM means
    """,
)
def stats_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap confidence interval for mean order value —
    the bootstrap that actually scales: instead of drawing n-out-of-n
    resamples (a shuffle per replicate), every row independently
    contributes a Poisson(1)-distributed weight to each of R
    replicates, so all R resample means come out of ONE scan with
    map-side partial aggregation (Chamandy et al., "Estimating
    Uncertainty for Massive Data Streams", Google 2012). The Poisson
    draw is the inverse-CDF transform of an md5-derived uniform, so
    the mechanism itself is deterministic and oracle-verified; a
    production run would swap in a seeded RNG, nothing else changes.

    Shape: scan × R in-row fan-out (R=32, a projection not a join on
    the Spark side), groupBy(rep) with partial aggregation → R rows,
    then O(R) quantile math. Zero data-sized shuffles; this is the
    100 TB uncertainty-quantification pattern."""
    o = load_table(spark, sf_dir, "orders")
    # ONE md5 per row; per-replicate uniforms via a multiplicative
    # shift mod the same prime — 32x fewer digest evaluations than
    # md5-per-(row, rep), measured 4x on the whole query at sf0.1
    s = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15),
            16,
            10,
        ).cast("long")
        % 999983
    )
    rep = F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("rep")
    # hoist the digest BELOW the generator: a single select would put
    # the Project above Generate and evaluate md5 once per (row, rep)
    # — R times more digests (measured 3.7s -> ~1s at sf0.1)
    seeded = o.select(
        F.col("o_totalprice").alias("x"), s.alias("s")
    ).select("x", "s", rep)
    u = (
        (F.col("s") * (7919 + 104729 * F.col("rep"))) % 999983 + 0.5
    ) / 999983.0
    w = F.lit(7)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < _POIS_CDF[k], F.lit(k)).otherwise(w)
    weighted = seeded.select("rep", "x", w.alias("w"))
    means = weighted.groupBy("rep").agg(
        (F.sum(F.col("w") * F.col("x")) / F.sum("w")).alias("m")
    )
    point = o.agg(F.avg("o_totalprice").alias("pm"))
    return means.crossJoin(F.broadcast(point)).agg(
        F.lit(_BOOT_R).cast("long").alias("n_replicates"),
        F.round(F.first("pm"), 4).alias("point_mean"),
        F.round(F.avg("m"), 4).alias("boot_mean"),
        F.round(F.stddev_samp("m"), 4).alias("boot_se"),
        F.round(F.percentile("m", F.lit(0.025)), 4).alias("ci_lo"),
        F.round(F.percentile("m", F.lit(0.975)), 4).alias("ci_hi"),
    )


@register(
    "recsys_item_cooccurrence",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    deg AS (SELECT p, COUNT(*) AS d FROM op GROUP BY p),
    pairs AS (
      SELECT a.p AS p1, b.p AS p2, COUNT(*) AS n_co
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
    )
    SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
           CAST(n_co AS BIGINT) AS n_co,
           ROUND(n_co / SQRT(d1.d * d2.d), 6) AS cosine
    FROM pairs
    JOIN deg d1 ON d1.p = pairs.p1
    JOIN deg d2 ON d2.p = pairs.p2
    WHERE n_co >= 2
    ORDER BY cosine DESC, p1, p2
    LIMIT 20
    """,
)
def recsys_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering kernel: cosine similarity
    over the order×part incidence matrix — n_co(i,j) / sqrt(n_i·n_j),
    reported for the top-20 co-purchased part pairs (min support 2).
    This is the batch half of every "customers also bought" ranker.

    Shape: the self-join is keyed on l_orderkey, so the fan-out per
    order is bounded by order size squared (TPC-H ≤ 7 lines → ≤ 21
    pairs) — a posting-list expansion, not an all-pairs product; then
    one groupBy(p1,p2) and two joins against the O(parts) degree
    table. At 100 TB the same plan holds because the per-order bound
    is a data invariant; a hot-item cap (drop items in > T% of
    orders, as in `dedup_ngram_jaccard`'s max_posting_len) bounds the
    worst case."""
    li = load_table(spark, sf_dir, "lineitem")
    # materialize the reduced incidence list once: it feeds the
    # degree table AND both self-join sides — without this the fact
    # table is scanned (and the distinct re-shuffled) three times
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint()
    )
    deg = op.groupBy("p").agg(F.count(F.lit(1)).alias("d"))
    a = op.select(F.col("o"), F.col("p").alias("p1"))
    b = op.select(F.col("o"), F.col("p").alias("p2"))
    pairs = (
        a.join(b, "o")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .where(F.col("n_co") >= 2)
    )
    out = (
        pairs.join(deg.select(F.col("p").alias("p1"), F.col("d").alias("d1")), "p1")
        .join(deg.select(F.col("p").alias("p2"), F.col("d").alias("d2")), "p2")
        .select(
            F.col("p1").cast("long"),
            F.col("p2").cast("long"),
            F.col("n_co").cast("long"),
            F.round(F.col("n_co") / F.sqrt(F.col("d1") * F.col("d2")), 6).alias(
                "cosine"
            ),
        )
    )
    return out.orderBy(F.desc("cosine"), "p1", "p2").limit(20)


@register(
    "graph_link_prediction",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    epair AS (
      SELECT a.p AS u, b.p AS v
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= 2
    ),
    edges AS (
      SELECT u, v FROM epair UNION ALL SELECT v AS u, u AS v FROM epair
    ),
    deg AS (SELECT u, COUNT(*) AS d FROM edges GROUP BY u),
    wedge AS (
      SELECT e1.u AS a, e2.v AS c, COUNT(*) AS cn
      FROM edges e1 JOIN edges e2 ON e1.v = e2.u AND e1.u < e2.v
      GROUP BY e1.u, e2.v
    ),
    cand AS (
      SELECT w.a, w.c, w.cn
      FROM wedge w LEFT JOIN epair e ON e.u = w.a AND e.v = w.c
      WHERE e.u IS NULL
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(c AS BIGINT) AS c,
           CAST(cn AS BIGINT) AS common_neighbors,
           ROUND(cn / (da.d + dc.d - cn), 6) AS jaccard
    FROM cand
    JOIN deg da ON da.u = cand.a
    JOIN deg dc ON dc.u = cand.c
    ORDER BY jaccard DESC, common_neighbors DESC, a, c
    LIMIT 20
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction on the co-purchase part graph
    (edges = part pairs co-ordered ≥ 2 times): for every NON-adjacent
    pair reachable in two hops, Jaccard = |N(a)∩N(c)| / |N(a)∪N(c)|,
    top-20 — the classic "products likely to be bought together next"
    signal (Liben-Nowell & Kleinberg 2003).

    Shape: the wedge join is keyed on the shared middle vertex
    (same ordered-wedge trick as `graph_triangle_count`), so cost is
    Σ deg(v)² over the SPARSIFIED (support ≥ 2) edge set, not the raw
    co-occurrence list; the anti join removes existing edges; degree
    joins are O(V). At 100 TB the support threshold plus a hot-vertex
    degree cap keep Σ deg² bounded — the standard link-prediction
    blocking strategy."""
    li = load_table(spark, sf_dir, "lineitem")
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint()
    )
    a = op.select("o", F.col("p").alias("u"))
    b = op.select("o", F.col("p").alias("v"))
    # materialize the sparsified edge list: it feeds the undirected
    # expansion, the anti join, and (via edges) the degree table and
    # both wedge sides — unmaterialized, the whole pair pipeline
    # re-ran per reference (measured 34 shuffles / 18 fact scans)
    epair = (
        a.join(b, "o")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("nco"))
        .where(F.col("nco") >= 2)
        .select("u", "v")
        .localCheckpoint()
    )
    edges = epair.union(
        epair.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("m"))
    e2 = edges.select(F.col("u").alias("m"), F.col("v").alias("c"))
    wedge = (
        e1.join(e2, "m")
        .where(F.col("a") < F.col("c"))
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    cand = wedge.join(
        epair.select(F.col("u").alias("a"), F.col("v").alias("c")),
        ["a", "c"],
        "left_anti",
    )
    out = (
        cand.join(deg.select(F.col("u").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("u").alias("c"), F.col("d").alias("dc")), "c")
        .select(
            F.col("a").cast("long"),
            F.col("c").cast("long"),
            F.col("cn").cast("long").alias("common_neighbors"),
            F.round(
                F.col("cn") / (F.col("da") + F.col("dc") - F.col("cn")), 6
            ).alias("jaccard"),
        )
    )
    return out.orderBy(
        F.desc("jaccard"), F.desc("common_neighbors"), "a", "c"
    ).limit(20)


@register(
    "feature_woe_iv",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS cat,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
      FROM orders
    ),
    per_cat AS (
      SELECT cat,
             SUM(1 - bad) + 0.5 AS good_n,
             SUM(bad) + 0.5 AS bad_n
      FROM base GROUP BY cat
    ),
    tot AS (
      SELECT SUM(good_n) AS g, SUM(bad_n) AS b FROM per_cat
    )
    SELECT cat,
           CAST(good_n - 0.5 AS BIGINT) AS n_good,
           CAST(bad_n - 0.5 AS BIGINT) AS n_bad,
           ROUND(LN((good_n / g) / (bad_n / b)), 6) AS woe,
           ROUND((good_n / g - bad_n / b)
                 * LN((good_n / g) / (bad_n / b)), 6) AS iv_contrib
    FROM per_cat CROSS JOIN tot
    ORDER BY cat
    """,
)
def feature_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of Evidence / Information Value feature screen — the
    credit-scoring standard for ranking categorical predictors
    against a binary target (here: order priority vs
    finished-status). WOE_i = ln(good-share_i / bad-share_i) with the
    0.5 Laplace adjustment that keeps empty cells finite; the IV
    contribution (share-gap × WOE) sums to the feature's screening
    score (< 0.02 useless, > 0.3 strong).

    Shape: one grouped count over the fact table, then O(categories)
    scalar math against a broadcast 1-row total — the same
    zero-extra-shuffle profile as `privacy_dp_noise_count`; at 100 TB
    this is a single map-side-combined aggregation."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("cat"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("bad"),
    )
    per_cat = base.groupBy("cat").agg(
        (F.sum(1 - F.col("bad")) + 0.5).alias("good_n"),
        (F.sum("bad") + 0.5).alias("bad_n"),
    )
    tot = per_cat.agg(
        F.sum("good_n").alias("g"), F.sum("bad_n").alias("b")
    )
    gs = F.col("good_n") / F.col("g")
    bs = F.col("bad_n") / F.col("b")
    return (
        per_cat.crossJoin(F.broadcast(tot))
        .select(
            "cat",
            (F.col("good_n") - 0.5).cast("long").alias("n_good"),
            (F.col("bad_n") - 0.5).cast("long").alias("n_bad"),
            F.round(F.log(gs / bs), 6).alias("woe"),
            F.round((gs - bs) * F.log(gs / bs), 6).alias("iv_contrib"),
        )
        .orderBy("cat")
    )
