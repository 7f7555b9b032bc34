"""Analytics extras, batch 31: relational model training, robust
regression, incremental ingestion, and DP order statistics.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* decision stump — the depth-1 CART split search as one scan
  (candidate × side aggregate), "train a tree node as a query".
* Theil-Sen slope — median-of-pairwise-slopes robust trend.
* incremental corpus dedup — the production ingestion path: new
  batch vs existing corpus only (never corpus × corpus).
* DP median via the exponential mechanism — md5-determinized so the
  mechanism itself is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_STUMP_DECILES = [float(d) / 10.0 for d in range(1, 10)]


@register(
    "ml_decision_stump",
    oracle=f"""
    WITH base AS (
      SELECT o_totalprice AS x, o_orderpriority AS cat,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    th AS (
      SELECT quantile_cont(x, [{", ".join(str(d) for d in _STUMP_DECILES)}])
        AS qs
      FROM base
    ),
    num_cand AS (
      SELECT 'price<=' || CAST(ROUND(qs[i], 4) AS VARCHAR) AS split,
             qs[i] AS thr, NULL AS cat
      FROM th, UNNEST(generate_series(1, {len(_STUMP_DECILES)})) AS g(i)
    ),
    cat_cand AS (
      SELECT DISTINCT 'prio=' || cat AS split, NULL::DOUBLE AS thr, cat
      FROM base
    ),
    cand AS (SELECT * FROM num_cand UNION ALL SELECT * FROM cat_cand),
    assigned AS (
      SELECT c.split,
             CASE WHEN c.thr IS NOT NULL
                  THEN CASE WHEN b.x <= c.thr THEN 1 ELSE 0 END
                  ELSE CASE WHEN b.cat = c.cat THEN 1 ELSE 0 END
             END AS is_left,
             b.y
      FROM base b CROSS JOIN cand c
    ),
    sides AS (
      SELECT split, is_left, COUNT(*) AS n, AVG(y * 1.0) AS p
      FROM assigned GROUP BY split, is_left
    ),
    gini AS (
      SELECT split,
             SUM(n) AS n_total,
             SUM(n * 2.0 * p * (1.0 - p)) / SUM(n) AS weighted_gini
      FROM sides GROUP BY split
    )
    SELECT split,
           ROUND(weighted_gini, 6) AS gini,
           CAST(n_total AS BIGINT) AS n
    FROM gini
    ORDER BY gini, split
    """,
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-1 CART split search ("train a tree node as a query"):
    candidate splits are the 9 exact deciles of order value plus a
    one-vs-rest indicator per priority class; every candidate's
    weighted Gini impurity 2·p·(1−p) against the finished-status
    target is computed in ONE candidate-exploded aggregate and the
    table is returned ranked best-first — exactly the split-finding
    step a distributed tree trainer (XGBoost/LightGBM hist mode) runs
    per node.

    Shape: one exact-percentile pass (O(1) rows out) + one scan with
    a bounded ×14 candidate fan-out into a map-side-combinable
    groupBy(candidate, side) — at 100 TB this is the canonical
    histogram-based split search, no per-candidate rescans."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_totalprice").alias("x"),
        F.col("o_orderpriority").alias("cat"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    th = base.agg(
        F.percentile("x", F.array(*[F.lit(d) for d in _STUMP_DECILES])).alias(
            "qs"
        )
    )
    num_cand = th.select(
        F.explode("qs").alias("thr")
    ).select(
        F.concat(
            F.lit("price<="), F.round("thr", 4).cast("string")
        ).alias("split"),
        "thr",
        F.lit(None).cast("string").alias("cat"),
    )
    cat_cand = base.select("cat").distinct().select(
        F.concat(F.lit("prio="), "cat").alias("split"),
        F.lit(None).cast("double").alias("thr"),
        "cat",
    )
    cand = num_cand.unionByName(cat_cand)
    assigned = base.crossJoin(F.broadcast(cand.withColumnRenamed("cat", "ccat"))).select(
        "split",
        F.when(
            F.col("thr").isNotNull(),
            F.when(F.col("x") <= F.col("thr"), 1).otherwise(0),
        )
        .otherwise(F.when(F.col("cat") == F.col("ccat"), 1).otherwise(0))
        .alias("is_left"),
        "y",
    )
    sides = assigned.groupBy("split", "is_left").agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.col("y") * 1.0).alias("p")
    )
    gini = sides.groupBy("split").agg(
        F.sum("n").alias("n_total"),
        (
            F.sum(F.col("n") * 2.0 * F.col("p") * (1.0 - F.col("p")))
            / F.sum("n")
        ).alias("weighted_gini"),
    )
    return gini.select(
        "split",
        F.round("weighted_gini", 6).alias("gini"),
        F.col("n_total").cast("long").alias("n"),
    ).orderBy("gini", "split")


@register(
    "stats_theil_sen",
    oracle="""
    WITH monthly AS (
      SELECT (EXTRACT(year FROM o_orderdate) - 1990) * 12
               + EXTRACT(month FROM o_orderdate) AS mx,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    slopes AS (
      SELECT (b.rev - a.rev) / (b.mx - a.mx) AS s
      FROM monthly a JOIN monthly b ON a.mx < b.mx
    ),
    m AS (SELECT quantile_cont(s, 0.5) AS slope FROM slopes),
    icept AS (
      SELECT quantile_cont(rev - m.slope * mx, 0.5) AS intercept
      FROM monthly, m
    )
    SELECT CAST((SELECT COUNT(*) FROM monthly) AS BIGINT) AS n_points,
           CAST((SELECT COUNT(*) FROM slopes) AS BIGINT) AS n_pairs,
           ROUND(m.slope, 4) AS slope_per_month,
           ROUND(icept.intercept, 4) AS intercept
    FROM m, icept
    """,
)
def stats_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of monthly revenue: the median of all
    pairwise slopes (and the median intercept given that slope) — the
    estimator that shrugs off outlier months where OLS gets dragged
    (29 % breakdown point).

    Shape: the fact table reduces to O(months) points FIRST, so the
    all-pairs slope set is months²/2 — thousands of rows, not a data-
    sized blowup; at 100 TB the reduce is the only data-sized stage.
    For point sets too large to pair exactly, the standard fallback
    is pairing a deterministic sample (same plan, sampled join) —
    documented, not needed at any fixture scale."""
    o = load_table(spark, sf_dir, "orders")
    # materialize the O(months) reduction once — it feeds both pair
    # sides, the intercept pass, and the count (was 8 fact scans)
    monthly = (
        o.groupBy(
            (
                (F.year("o_orderdate") - 1990) * 12 + F.month("o_orderdate")
            ).alias("mx")
        )
        .agg(F.sum("o_totalprice").alias("rev"))
        .localCheckpoint()
    )
    a = monthly.select(F.col("mx").alias("x1"), F.col("rev").alias("r1"))
    b = monthly.select(F.col("mx").alias("x2"), F.col("rev").alias("r2"))
    slopes = (
        a.join(b, F.col("x1") < F.col("x2"))
        .select(((F.col("r2") - F.col("r1")) / (F.col("x2") - F.col("x1"))).alias("s"))
    )
    m = slopes.agg(F.percentile("s", F.lit(0.5)).alias("slope"))
    icept = (
        monthly.crossJoin(F.broadcast(m))
        .agg(
            F.percentile(
                F.col("rev") - F.col("slope") * F.col("mx"), F.lit(0.5)
            ).alias("intercept")
        )
    )
    np_ = monthly.agg(F.count(F.lit(1)).alias("n_points"))
    npair = slopes.agg(F.count(F.lit(1)).alias("n_pairs"))
    return (
        np_.crossJoin(npair)
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(icept))
        .select(
            F.col("n_points").cast("long"),
            F.col("n_pairs").cast("long"),
            F.round("slope", 4).alias("slope_per_month"),
            F.round("intercept", 4).alias("intercept"),
        )
    )


@register(
    "pipeline_incremental_dedup",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text, md5(text) AS h FROM documents WHERE doc_id < 400
    ),
    batch AS (
      SELECT doc_id, text, source, md5(text) AS h
      FROM documents WHERE doc_id >= 400
    ),
    exact_dup AS (
      SELECT DISTINCT b.doc_id FROM batch b JOIN corpus c ON c.h = b.h
    ),
    bw AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ),
    sh AS (
      -- 5-gram shingles (the RefinedWeb production choice): on this
      -- closed 31-token vocabulary 3-grams are pathologically hot
      -- (every shingle shared by hundreds of docs -> quadratic
      -- posting joins); 5-grams keep postings short while flagging
      -- the same near-dup set
      SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle
      FROM bw, UNNEST(generate_series(1, greatest(len(w) - 4, 1))) AS t(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id),
    cand AS (
      SELECT b.doc_id AS bid, c.doc_id AS cid, COUNT(*) AS inter
      FROM sh b JOIN sh c ON b.shingle = c.shingle
      WHERE b.doc_id >= 400 AND c.doc_id < 400
      GROUP BY b.doc_id, c.doc_id
    ),
    near_dup AS (
      SELECT DISTINCT cand.bid AS doc_id
      FROM cand
      JOIN sizes sb ON sb.doc_id = cand.bid
      JOIN sizes sc ON sc.doc_id = cand.cid
      WHERE cand.inter * 1.0 / (sb.ns + sc.ns - cand.inter) >= 0.3
    )
    SELECT b.source,
           CAST(COUNT(*) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exact_dup,
           CAST(SUM(CASE WHEN e.doc_id IS NULL AND nd.doc_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
           CAST(SUM(CASE WHEN e.doc_id IS NULL AND nd.doc_id IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM batch b
    LEFT JOIN exact_dup e ON e.doc_id = b.doc_id
    LEFT JOIN near_dup nd ON nd.doc_id = b.doc_id
    GROUP BY b.source
    ORDER BY b.source
    """,
)
def pipeline_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup — the path a production corpus
    actually runs: an incoming batch (doc_id ≥ 400) is screened
    against the EXISTING corpus (doc_id < 400), never against itself
    at full quadratic cost: exact content-hash anti-join first, then
    5-gram-shingle Jaccard ≥ 0.3 candidates restricted to
    batch×corpus postings (5-grams are the RefinedWeb-style choice —
    on this closed vocabulary 3-gram postings go quadratic). Per-source admission report.

    Shape: the posting-list self-join is cross-side filtered
    (batch-side × corpus-side only), so incremental cost is
    O(batch postings), not O(corpus²) — the property that lets a
    100 TB corpus ingest a daily crawl without re-deduping history;
    the exact tier joins on 16-byte digests."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where("doc_id < 400")
    batch = docs.where("doc_id >= 400")
    exact = (
        batch.select("doc_id", F.md5("text").alias("h"))
        .join(corpus.select(F.md5("text").alias("h")).distinct(), "h")
        .select("doc_id")
        .distinct()
        .withColumn("is_exact", F.lit(1))
    )
    # materialize the token array FIRST: referencing split(text)
    # inside the per-index lambda would re-tokenize the document for
    # every shingle position (O(tokens²) per doc — measured 2x on
    # the whole query)
    words = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("w")
    )
    # localCheckpoint the O(docs) array table BEFORE fan-out:
    # CollapseProject otherwise inlines this transform+array_distinct
    # into all three downstream references (size, the generator, and
    # the retained projection) and evaluates it redundantly per row —
    # measured 3.7s -> 0.7s at sf0.1 for the posting-table build
    toks = words.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size("w") - 4, F.lit(1))
                ),
                lambda i: F.concat_ws(" ", F.slice(F.col("w"), i, 5)),
            )
        ).alias("sh"),
    ).localCheckpoint()
    # shuffle 8-byte xxhash64 keys instead of shingle strings (the
    # dedup_ngram_jaccard trick — collision odds are negligible and
    # only perturb one intersection count)
    sh = toks.select(
        "doc_id", F.size("sh").alias("ns"), F.explode("sh").alias("g")
    ).select("doc_id", "ns", F.xxhash64("g").alias("shingle"))
    bsh = sh.where("doc_id >= 400").select(
        F.col("doc_id").alias("bid"), F.col("ns").alias("nsb"), "shingle"
    )
    csh = sh.where("doc_id < 400").select(
        F.col("doc_id").alias("cid"), F.col("ns").alias("nsc"), "shingle"
    )
    cand = (
        bsh.join(csh, "shingle")
        .groupBy("bid", "cid", "nsb", "nsc")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    near = (
        cand.where(
            F.col("inter")
            / (F.col("nsb") + F.col("nsc") - F.col("inter"))
            >= 0.3
        )
        .select(F.col("bid").alias("doc_id"))
        .distinct()
        .withColumn("is_near", F.lit(1))
    )
    return (
        batch.select("doc_id", "source")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_new"),
            F.sum(F.when(F.col("is_exact") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_exact_dup"),
            F.sum(
                F.when(
                    F.col("is_exact").isNull() & (F.col("is_near") == 1), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_near_dup"),
            F.sum(
                F.when(
                    F.col("is_exact").isNull() & F.col("is_near").isNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("source")
    )


_DPQ_BINS = 32
_DPQ_EPS = 1.0


@register(
    "privacy_dp_quantile",
    oracle=f"""
    WITH ext AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
             COUNT(*) AS n
      FROM orders
    ),
    bins AS (
      SELECT i, lo + (hi - lo) * (i + 0.5) / {_DPQ_BINS} AS center, n
      FROM ext, UNNEST(generate_series(0, {_DPQ_BINS} - 1)) AS g(i)
    ),
    util AS (
      SELECT b.i, b.center, b.n,
             -ABS((SELECT COUNT(*) FROM orders o
                   WHERE o.o_totalprice <= b.center) - b.n / 2.0) AS u
      FROM bins b
    ),
    wts AS (
      SELECT i, center,
             EXP({_DPQ_EPS} * (u - MAX(u) OVER ()) / 2.0) AS w
      FROM util
    ),
    cum AS (
      SELECT i, center, w,
             SUM(w) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER () AS tw
      FROM wts
    ),
    pick AS (
      SELECT MIN(i) AS pick_i FROM cum
      WHERE cw >= tw * ((('0x' || substr(md5('dpq'), 1, 8))::BIGINT
                         % 999983) + 0.5) / 999983.0
    )
    SELECT CAST({_DPQ_BINS} AS BIGINT) AS n_bins,
           CAST(pick.pick_i AS BIGINT) AS picked_bin,
           ROUND((SELECT center FROM cum WHERE i = pick.pick_i), 4)
             AS dp_median,
           ROUND((SELECT quantile_cont(o_totalprice, 0.5) FROM orders), 4)
             AS true_median
    FROM pick
    """,
)
def privacy_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private median via the exponential mechanism
    (McSherry-Talwar): candidate outputs are 32 equi-width bin
    centers, utility = −|rank(c) − n/2| (sensitivity 1), selection
    probability ∝ exp(ε·u/2) with ε=1, sampled by inverting the
    cumulative weight at an md5-derived uniform — deterministic, so
    the oracle verifies the MECHANISM end-to-end (a production
    release swaps the hash for a calibrated RNG, nothing else).

    Shape: one extremes pass, one rank-per-candidate aggregate
    (candidate list is O(bins), broadcastable), O(bins) weight math —
    the data-sized work is two scans regardless of corpus size."""
    o = load_table(spark, sf_dir, "orders")
    ext = o.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    bins = ext.select(
        F.explode(F.sequence(F.lit(0), F.lit(_DPQ_BINS - 1))).alias("i"),
        "lo",
        "hi",
        "n",
    ).select(
        "i",
        (
            F.col("lo")
            + (F.col("hi") - F.col("lo")) * (F.col("i") + 0.5) / _DPQ_BINS
        ).alias("center"),
        "n",
    )
    ranked = (
        o.crossJoin(F.broadcast(bins))
        .groupBy("i", "center", "n")
        .agg(
            F.sum(
                F.when(F.col("o_totalprice") <= F.col("center"), 1).otherwise(0)
            ).alias("rank_c")
        )
        .select(
            "i",
            "center",
            (-F.abs(F.col("rank_c") - F.col("n") / 2.0)).alias("u"),
        )
    )
    from pyspark.sql.window import Window

    wts = ranked.withColumn(
        "w",
        F.exp(
            _DPQ_EPS
            * (F.col("u") - F.max("u").over(Window.partitionBy()))
            / 2.0
        ),
    )
    cum = wts.select(
        "i",
        "center",
        F.sum("w")
        .over(Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cw"),
        F.sum("w").over(Window.partitionBy()).alias("tw"),
    )
    h = F.conv(F.substring(F.md5(F.lit("dpq")), 1, 8), 16, 10).cast("long")
    uni = ((h % 999983) + 0.5) / 999983.0
    pick = (
        cum.where(F.col("cw") >= F.col("tw") * uni)
        .agg(F.min("i").alias("pick_i"))
    )
    true_med = o.agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("tm")
    )
    return (
        pick.join(
            cum.select(F.col("i").alias("pick_i"), "center"), "pick_i"
        )
        .crossJoin(F.broadcast(true_med))
        .select(
            F.lit(_DPQ_BINS).cast("long").alias("n_bins"),
            F.col("pick_i").cast("long").alias("picked_bin"),
            F.round("center", 4).alias("dp_median"),
            F.round("tm", 4).alias("true_median"),
        )
    )
