"""Analytics extras, batch 52: LSH quality audit, Theil inequality,
CV fold assignment, and the bullwhip effect.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* LSH quality audit — precision/recall of the banded-MinHash
  candidate set against exact Jaccard ground truth, BOTH computed
  in-engine and both re-derived by the oracle: the evaluation
  harness for the dedup tier, as a query.
* Theil T index — the decomposable inequality measure next to the
  Gini / Lorenz pair already in the registry.
* CV folds — deterministic md5 k-fold assignment with per-fold
  target statistics (balance check before any model training).
* bullwhip effect — order-vs-shipment variance amplification, the
  classic supply-chain signal-distortion diagnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.operators import dedup as D
from hivetomysql_spark.queries import register
from hivetomysql_spark.queries.llm import _minhash_sig_exprs
from hivetomysql_spark.tables import load_table

_LQ_TAU = 0.3


@register(
    "dedup_lsh_quality_audit",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ),
    shl AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 1)),
               i -> array_to_string(w[i:i+2], ' '))) AS shs
      FROM words
    ),
    sh AS (
      SELECT doc_id, g.s AS shingle FROM shl, UNNEST(shs) AS g(s)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE c * 1.0 / (sa.n + sb.n - c) >= {_LQ_TAU}
    ),
    sigs AS (
      SELECT doc_id, {_minhash_sig_exprs(32)} AS sig FROM shl
    ),
    bands AS (
      SELECT doc_id, b,
             array_to_string(sig[b*4+1:b*4+4], '#') AS bucket
      FROM sigs, range(8) r(b)
      QUALIFY COUNT(*) OVER (PARTITION BY b, bucket) <= 1000
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM bands a JOIN bands c
        ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id
    ),
    joined AS (
      SELECT COALESCE(e.id_a, c.id_a) AS id_a,
             e.id_a IS NOT NULL AS is_exact,
             c.id_a IS NOT NULL AS is_cand
      FROM exact e FULL OUTER JOIN cand c
        ON c.id_a = e.id_a AND c.id_b = e.id_b
    )
    SELECT CAST(SUM(CASE WHEN is_exact THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_pairs,
           CAST(SUM(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT)
             AS n_candidates,
           CAST(SUM(CASE WHEN is_exact AND is_cand THEN 1 ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN is_cand AND NOT is_exact THEN 1 ELSE 0 END)
                AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN is_exact AND NOT is_cand THEN 1 ELSE 0 END)
                AS BIGINT) AS fn,
           ROUND(SUM(CASE WHEN is_exact AND is_cand THEN 1 ELSE 0 END) * 1.0
                 / SUM(CASE WHEN is_cand THEN 1 ELSE 0 END), 4) AS precision,
           ROUND(SUM(CASE WHEN is_exact AND is_cand THEN 1 ELSE 0 END) * 1.0
                 / SUM(CASE WHEN is_exact THEN 1 ELSE 0 END), 4) AS recall
    FROM joined
    """,
)
def dedup_lsh_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup-tier evaluation harness as a query: exact 3-gram
    Jaccard pairs at tau=0.3 (posting-list ground truth) vs the RAW
    banded-MinHash candidate set (32 hashes, 8x4 bands, md5-pinned),
    full-outer joined into TP/FP/FN with precision and recall. This
    is the table that justifies shipping LSH at 100 TB — recall says
    what the bands miss, precision prices the verification stage.
    Both tiers AND the audit are re-derived end-to-end by the DuckDB
    oracle.

    Shape: ground truth is the posting-list self-join (O(batch
    postings)); candidates are band-bucket collisions; the audit
    join touches only pair keys. At scale the exact side runs on a
    sample — the query shape is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    exact = D.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=_LQ_TAU
    ).select("id_a", "id_b")
    cand = D.minhash_lsh_pairs(
        docs,
        "doc_id",
        "text",
        num_hashes=32,
        bands=8,
        threshold=0.0,  # RAW candidates: audit judges the bands, not the verify stage
        hash_family="md5",
    ).select(F.col("id_a").alias("ca"), F.col("id_b").alias("cb")).distinct()
    j = exact.join(
        cand,
        (F.col("id_a") == F.col("ca")) & (F.col("id_b") == F.col("cb")),
        "full_outer",
    ).select(
        F.col("id_a").isNotNull().alias("is_exact"),
        F.col("ca").isNotNull().alias("is_cand"),
    )
    tp = F.sum((F.col("is_exact") & F.col("is_cand")).cast("long"))
    return j.agg(
        F.sum(F.col("is_exact").cast("long")).cast("long").alias(
            "n_exact_pairs"
        ),
        F.sum(F.col("is_cand").cast("long")).cast("long").alias(
            "n_candidates"
        ),
        tp.cast("long").alias("tp"),
        F.sum((F.col("is_cand") & ~F.col("is_exact")).cast("long"))
        .cast("long")
        .alias("fp"),
        F.sum((F.col("is_exact") & ~F.col("is_cand")).cast("long"))
        .cast("long")
        .alias("fn"),
        F.round(
            tp * 1.0 / F.sum(F.col("is_cand").cast("long")), 4
        ).alias("precision"),
        F.round(
            tp * 1.0 / F.sum(F.col("is_exact").cast("long")), 4
        ).alias("recall"),
    )


@register(
    "agg_theil_inequality",
    oracle="""
    WITH spend AS (
      SELECT c.c_nationkey AS nationkey, o.o_custkey,
             SUM(o.o_totalprice) AS x,
             SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    mu AS (
      SELECT nationkey, COUNT(*) AS n, AVG(x) AS m,
             CAST(SUM(cents) AS BIGINT) AS tc
      FROM spend GROUP BY 1
    )
    SELECT s.nationkey,
           CAST(mu.n AS BIGINT) AS n_customers,
           (mu.tc * 1.0 / mu.n) / 100.0 AS mean_spend,
           ROUND(SUM((s.x / mu.m) * LN(s.x / mu.m)) / mu.n, 4) AS theil_t
    FROM spend s JOIN mu ON mu.nationkey = s.nationkey
    GROUP BY s.nationkey, mu.n, mu.m, mu.tc
    """,
)
def agg_theil_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T index of customer spend per nation: (1/N) sum (x/mu)
    ln(x/mu) — zero at perfect equality, ln(N) at total
    concentration, and (unlike Gini, already in the registry) EXACTLY
    decomposable into within-group + between-group terms, which is
    why economists report it for segmented populations. Completes
    the inequality family next to `agg_gini_coefficient` and
    `events_lorenz_deciles`.

    Shape: one fact reduce to customer grain, one O(nations) mean
    join back (broadcast), one grouped rollup."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"), "o_custkey")
        .agg(
            F.sum("o_totalprice").alias("x"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("cents"),
        )
    )
    mu = spend.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("m"),
        F.sum("cents").alias("tc"),
    )
    j = spend.join(F.broadcast(mu), "nationkey")
    # mean via the integer-cents ledger and two correctly-rounded
    # IEEE divisions: no decimal ROUND of a float sum, whose .xx5
    # half-cases flip between engines AND between Spark executions
    # (partial-sum order)
    return j.groupBy("nationkey", "n", "m", "tc").agg(
        F.col("n").cast("long").alias("n_customers"),
        ((F.first("tc") * 1.0 / F.first("n")) / 100.0).alias("mean_spend"),
        F.round(
            F.sum((F.col("x") / F.col("m")) * F.log(F.col("x") / F.col("m")))
            / F.first("n"),
            4,
        ).alias("theil_t"),
    ).drop("n", "m", "tc")


_CV_K = 5


@register(
    "feature_cv_folds",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey, SUM(o_totalprice) AS target
      FROM orders GROUP BY o_custkey
    ),
    folds AS (
      SELECT o_custkey, target,
             ('0x' || substr(md5('cv:' || o_custkey), 1, 8))::BIGINT
               % {_CV_K} AS fold
      FROM spend
    )
    SELECT CAST(fold AS INT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(target), 2) AS mean_target,
           ROUND(STDDEV_SAMP(target), 2) AS std_target
    FROM folds GROUP BY fold
    """,
)
def feature_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    md5(entity) mod 5 at the CUSTOMER grain — hashing the entity, not
    the row, is what prevents the same customer leaking across folds
    (the grouped-CV rule). Per-fold target mean/std is the balance
    check run before any training: folds whose target distributions
    diverge flag a hash or grain mistake. md5-pinned, so assignment
    is reproducible everywhere, including by the oracle.

    Shape: one fact reduce to entity grain, one O(K) rollup."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("target"))
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cv:"), F.col("o_custkey"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _CV_K
    )
    return (
        spend.select(fold.cast("int").alias("fold"), "target")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("target"), 2).alias("mean_target"),
            F.round(F.stddev_samp("target"), 2).alias("std_target"),
        )
    )


@register(
    "supply_bullwhip_effect",
    oracle="""
    WITH ordered AS (
      SELECT CAST(date_trunc('month', CAST(o.o_orderdate AS DATE))
                  AS TIMESTAMP) AS m,
             SUM(l.l_quantity) AS q
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    ),
    shipped AS (
      SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE))
                  AS TIMESTAMP) AS m,
             SUM(l_quantity) AS q
      FROM lineitem GROUP BY 1
    ),
    o_stats AS (
      SELECT COUNT(*) AS n, AVG(q) AS mu, VAR_SAMP(q) AS v FROM ordered
    ),
    s_stats AS (
      SELECT COUNT(*) AS n, AVG(q) AS mu, VAR_SAMP(q) AS v FROM shipped
    )
    SELECT CAST(o_stats.n AS BIGINT) AS n_order_months,
           CAST(s_stats.n AS BIGINT) AS n_ship_months,
           ROUND(o_stats.v / (o_stats.mu * o_stats.mu), 6) AS cv2_orders,
           ROUND(s_stats.v / (s_stats.mu * s_stats.mu), 6) AS cv2_shipments,
           ROUND((o_stats.v / (o_stats.mu * o_stats.mu))
                 / (s_stats.v / (s_stats.mu * s_stats.mu)), 4)
             AS bullwhip_ratio
    FROM o_stats CROSS JOIN s_stats
    """,
)
def supply_bullwhip_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip-effect diagnostic: squared coefficient of variation
    of monthly ORDERED quantity over monthly SHIPPED quantity — a
    ratio above 1 means demand signals amplify as they travel up the
    chain (Lee et al.'s classic distortion), the number that decides
    whether to damp ordering policies. Both series reduce to
    O(months) before any statistics.

    Shape: two fact reduces (one joined to orders for the order
    date), two O(1) variance aggregates, one scalar division."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ordered = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.date_trunc("month", F.to_date("o_orderdate")).alias("m"))
        .agg(F.sum("l_quantity").alias("q"))
    )
    shipped = li.groupBy(
        F.date_trunc("month", F.to_date("l_shipdate")).alias("m")
    ).agg(F.sum("l_quantity").alias("q"))
    os_ = ordered.agg(
        F.count(F.lit(1)).alias("no"),
        F.avg("q").alias("muo"),
        F.var_samp("q").alias("vo"),
    )
    ss = shipped.agg(
        F.count(F.lit(1)).alias("ns"),
        F.avg("q").alias("mus"),
        F.var_samp("q").alias("vs"),
    )
    cv2o = F.col("vo") / (F.col("muo") * F.col("muo"))
    cv2s = F.col("vs") / (F.col("mus") * F.col("mus"))
    return os_.crossJoin(F.broadcast(ss)).select(
        F.col("no").cast("long").alias("n_order_months"),
        F.col("ns").cast("long").alias("n_ship_months"),
        F.round(cv2o, 6).alias("cv2_orders"),
        F.round(cv2s, 6).alias("cv2_shipments"),
        F.round(cv2o / cv2s, 4).alias("bullwhip_ratio"),
    )
