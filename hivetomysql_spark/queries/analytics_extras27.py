"""Analytics extras, batch 27: training-split governance, URL
parsing, schema contracts, and feature-engineering statistics.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's DQ / feature / governance tiers:

* URL parsing — parse_url family over deterministic event URLs;
* schema contract — declared column constraints audited in one scan;
* NTILE binning — exact equal-depth feature discretization;
* Cramér's V — categorical association strength from a contingency
  table;
* target encoding — smoothed mean-target categorical encoding;
* split leakage — cross-split exact-duplicate contamination count;
* PMI bigrams — pointwise-mutual-information collocations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

# ---------------------------------------------------------------------------
# URL parsing family
# ---------------------------------------------------------------------------


@register(
    "func_url_parse",
    oracle="""
    WITH u AS (
      SELECT event_id,
             'https://' || event_type || '.example.com/u/' ||
             CAST(user_id AS VARCHAR) || '/p?ref=' || event_type ||
             '&v=' || CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR) AS url
      FROM events
    )
    SELECT regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+([^?]*)', 1) AS path,
           regexp_extract(url, 'ref=([^&]*)', 1) AS ref_param,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT regexp_extract(url, '/u/([0-9]+)/', 1))
                AS BIGINT) AS n_users
    FROM u
    GROUP BY 1, 2, 3, 4
    """,
)
def func_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing family over deterministic event URLs:
    ``parse_url`` (PROTOCOL/HOST/PATH/QUERY-with-key) does the
    decomposition JVM-side — the clickstream-normalization idiom; the
    oracle re-derives each part with regexes. Aggregating by the
    parsed parts collapses millions of raw URLs into the routed
    page-family table a traffic pipeline actually stores. Pure scan +
    one groupBy on low-cardinality parsed keys."""
    ev = load_table(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://"),
        F.col("event_type"),
        F.lit(".example.com/u/"),
        F.col("user_id").cast("string"),
        F.lit("/p?ref="),
        F.col("event_type"),
        F.lit("&v="),
        F.floor("value").cast("long").cast("string"),
    )
    u = ev.select("event_id", url.alias("url"))
    return u.groupBy(
        F.parse_url("url", F.lit("PROTOCOL")).alias("scheme"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
    ).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.count_distinct(
            F.regexp_extract("url", r"/u/([0-9]+)/", 1)
        ).alias("n_users"),
    )


# ---------------------------------------------------------------------------
# schema contract audit
# ---------------------------------------------------------------------------


@register(
    "dq_schema_contract",
    oracle="""
    SELECT * FROM (
      SELECT 'o_orderkey_not_null' AS constraint_name,
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_violations
      FROM orders
      UNION ALL
      SELECT 'o_orderkey_unique',
             CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
                  AS BIGINT)
      UNION ALL
      SELECT 'o_totalprice_positive',
             CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus_domain',
             CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'o_orderdate_range',
             CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                             OR o_orderdate >= TIMESTAMP '2030-01-01'
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'o_custkey_in_customer',
             CAST((SELECT COUNT(*) FROM orders o
                   WHERE NOT EXISTS (SELECT 1 FROM customer c
                                     WHERE c.c_custkey = o.o_custkey))
                  AS BIGINT)
    )
    """,
)
def dq_schema_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared schema contract audited in one pass: NOT NULL,
    uniqueness, positivity, value domain, date range, and referential
    integrity, each reported as a (constraint, violations) row — the
    dbt-tests / Great-Expectations contract shape. The five scalar
    constraints fold into ONE aggregate over one scan; uniqueness
    reuses the same scan (count - distinct); the FK check is a
    broadcast anti-join. At 100 TB this is exactly the audit you
    append to every load job: no extra shuffle beyond one aggregate
    and one anti-join."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.agg(
        F.sum(F.col("o_orderkey").isNull().cast("long")).alias("nn"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("uq"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("pos"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")
        ).alias("dom"),
        F.sum(
            (
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (
                    F.col("o_orderdate")
                    >= F.lit("2030-01-01").cast("timestamp")
                )
            ).cast("long")
        ).alias("rng"),
    )
    fk = (
        o.join(
            F.broadcast(c.select("c_custkey")),
            o.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("fk"))
    )
    row = base.crossJoin(F.broadcast(fk))
    pairs = [
        ("o_orderkey_not_null", "nn"),
        ("o_orderkey_unique", "uq"),
        ("o_totalprice_positive", "pos"),
        ("o_orderstatus_domain", "dom"),
        ("o_orderdate_range", "rng"),
        ("o_custkey_in_customer", "fk"),
    ]
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("constraint_name"),
                    F.col(col).cast("long").alias("n_violations"),
                )
                for name, col in pairs
            ]
        )
    ).alias("kv")
    return row.select(stacked).select("kv.constraint_name", "kv.n_violations")


# ---------------------------------------------------------------------------
# quantile binning
# ---------------------------------------------------------------------------


@register(
    "feature_ntile_binning",
    oracle="""
    WITH binned AS (
      SELECT o_totalprice,
             NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi,
           ROUND(AVG(o_totalprice), 2) AS mean_price
    FROM binned
    GROUP BY bin
    """,
)
def feature_ntile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretization (MLlib QuantileDiscretizer semantics,
    exact): NTILE(4) over the (value, key) order assigns equal-depth
    bins deterministically, then per-bin count/lo/hi/mean become the
    binning table a feature store persists. The global sort is the
    honest cost of EXACT quantiles; the approximate path at 100 TB is
    percentile_approx bin edges + a scan-side CASE, same downstream
    schema."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(4).over(w).alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.avg("o_totalprice"), 2).alias("mean_price"),
        )
    )


# ---------------------------------------------------------------------------
# Cramér's V
# ---------------------------------------------------------------------------


@register(
    "stats_cramers_v",
    oracle="""
    WITH ct AS (
      SELECT o_orderpriority AS a, o_orderstatus AS b, COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    ), tot AS (
      SELECT SUM(n) AS n FROM ct
    ), marg AS (
      SELECT ct.a, ct.b, ct.n,
             SUM(ct.n) OVER (PARTITION BY ct.a) AS ra,
             SUM(ct.n) OVER (PARTITION BY ct.b) AS cb,
             tot.n AS total
      FROM ct CROSS JOIN tot
    ), chi AS (
      SELECT SUM(POWER(n - ra * cb * 1.0 / total, 2)
                 / (ra * cb * 1.0 / total)) AS chi2,
             MAX(total) AS total,
             COUNT(DISTINCT a) AS r,
             COUNT(DISTINCT b) AS c
      FROM marg
    )
    SELECT ROUND(chi2, 4) AS chi2,
           CAST(total AS BIGINT) AS n,
           CAST(r AS INT) AS n_rows_levels,
           CAST(c AS INT) AS n_col_levels,
           ROUND(SQRT(chi2 / (total * (LEAST(r, c) - 1))), 6) AS cramers_v
    FROM chi
    """,
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between order priority and status:
    contingency counts (one groupBy on the pair), marginals via two
    windows over the TINY distinct-pair table, χ² against
    independence expectations, V = sqrt(χ²/(n·(min(r,c)-1))). The
    only O(rows) work is the first groupBy — the association math
    runs on the r×c table, which is what makes categorical drift
    scans over hundreds of column pairs feasible at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    ct = o.groupBy(
        F.col("o_orderpriority").alias("a"), F.col("o_orderstatus").alias("b")
    ).agg(F.count(F.lit(1)).alias("n"))
    marg = ct.select(
        "a",
        "b",
        "n",
        F.sum("n").over(Window.partitionBy("a")).alias("ra"),
        F.sum("n").over(Window.partitionBy("b")).alias("cb"),
        F.sum("n").over(Window.partitionBy()).alias("total"),
    )
    exp = F.col("ra") * F.col("cb") / F.col("total")
    chi = marg.agg(
        F.sum(F.pow(F.col("n") - exp, 2) / exp).alias("chi2"),
        F.max("total").alias("total"),
        F.count_distinct("a").alias("r"),
        F.count_distinct("b").alias("c"),
    )
    return chi.select(
        F.round("chi2", 4).alias("chi2"),
        F.col("total").cast("long").alias("n"),
        F.col("r").cast("int").alias("n_rows_levels"),
        F.col("c").cast("int").alias("n_col_levels"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("total") * (F.least("r", "c") - F.lit(1)))
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# smoothed target encoding
# ---------------------------------------------------------------------------


@register(
    "feature_target_encoding_smooth",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS segment, o.o_totalprice
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), g AS (
      SELECT segment, COUNT(*) AS n, SUM(o_totalprice) AS s FROM j GROUP BY 1
    ), gm AS (
      SELECT SUM(s) / SUM(n) AS gmean FROM g
    )
    SELECT segment,
           CAST(n AS BIGINT) AS n_orders,
           ROUND(s / n, 4) AS raw_mean,
           ROUND((s + 10 * gmean) / (n + 10), 4) AS encoded
    FROM g CROSS JOIN gm
    """,
)
def feature_target_encoding_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean-target encoding of customer market segment
    against order value: encoded = (Σy + m·global_mean)/(n + m) with
    m=10 — the Laplace-style shrinkage that keeps rare categories
    from memorizing noise. One broadcast dim join + one groupBy; the
    encoding table is category-sized and broadcasts back for the
    actual encode step, so the fact table never reshuffles."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == F.col("c_custkey"),
    ).select(F.col("c_mktsegment").alias("segment"), "o_totalprice")
    g = j.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
    )
    glob = g.agg((F.sum("s") / F.sum("n")).alias("gmean"))
    return g.crossJoin(F.broadcast(glob)).select(
        "segment",
        F.col("n").cast("long").alias("n_orders"),
        F.round(F.col("s") / F.col("n"), 4).alias("raw_mean"),
        F.round(
            (F.col("s") + 10 * F.col("gmean")) / (F.col("n") + 10), 4
        ).alias("encoded"),
    )


# ---------------------------------------------------------------------------
# split leakage
# ---------------------------------------------------------------------------


@register(
    "dq_split_leakage",
    oracle="""
    WITH split AS (
      SELECT doc_id, text,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       ::BIGINT % 5 = 0
                  THEN 'test' ELSE 'train' END AS split
      FROM documents
    ), by_text AS (
      SELECT md5(text) AS h,
             SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
             SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS n_test
      FROM split GROUP BY 1
    )
    SELECT CAST(SUM(CASE WHEN n_train > 0 AND n_test > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS leaked_texts,
           CAST(SUM(CASE WHEN n_train > 0 AND n_test > 0 THEN n_test
                         ELSE 0 END) AS BIGINT) AS leaked_test_docs,
           CAST(SUM(n_train) AS BIGINT) AS n_train_docs,
           CAST(SUM(n_test) AS BIGINT) AS n_test_docs
    FROM by_text
    """,
)
def dq_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: a deterministic 80/20 hash
    split (md5(doc_id) mod 5), then exact-duplicate texts appearing
    on BOTH sides are counted — the leakage check every eval pipeline
    must run before reporting numbers. One groupBy on md5(text)
    (32-byte shuffle keys); both counters fold in the same pass."""
    docs = load_table(spark, sf_dir, "documents")
    split = docs.select(
        "doc_id",
        "text",
        F.when(
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % 5
            == 0,
            F.lit("test"),
        )
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    by_text = split.groupBy(F.md5("text").alias("h")).agg(
        F.sum((F.col("split") == "train").cast("long")).alias("n_train"),
        F.sum((F.col("split") == "test").cast("long")).alias("n_test"),
    )
    leaked = (F.col("n_train") > 0) & (F.col("n_test") > 0)
    return by_text.agg(
        F.sum(leaked.cast("long")).alias("leaked_texts"),
        F.sum(F.when(leaked, F.col("n_test")).otherwise(0)).alias(
            "leaked_test_docs"
        ),
        F.sum("n_train").alias("n_train_docs"),
        F.sum("n_test").alias("n_test_docs"),
    )


# ---------------------------------------------------------------------------
# PMI bigram collocations
# ---------------------------------------------------------------------------


@register(
    "text_pmi_bigrams",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ), uni AS (
      SELECT unnest(w) AS tok FROM words
    ), ucount AS (
      SELECT tok, COUNT(*) AS n FROM uni GROUP BY tok
    ), utot AS (
      SELECT SUM(n) AS t FROM ucount
    ), bi AS (
      SELECT w[i] AS w1, w[i+1] AS w2
      FROM words, UNNEST(generate_series(1, len(w) - 1)) AS s(i)
    ), bcount AS (
      SELECT w1, w2, COUNT(*) AS n FROM bi GROUP BY w1, w2
    ), btot AS (
      SELECT SUM(n) AS t FROM bcount
    )
    SELECT w1, w2,
           CAST(b.n AS BIGINT) AS n_pair,
           ROUND(LN((b.n * 1.0 / btot.t)
                    / ((u1.n * 1.0 / utot.t) * (u2.n * 1.0 / utot.t))), 6)
             AS pmi
    FROM bcount b
    JOIN ucount u1 ON u1.tok = b.w1
    JOIN ucount u2 ON u2.tok = b.w2
    CROSS JOIN utot CROSS JOIN btot
    WHERE b.n >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI collocations: bigram and unigram counts from one
    tokenize pass each, PMI = ln(p(ab)/(p(a)p(b))) with a min-count
    floor of 5 (the classic Church–Hanks measure — the phrase-mining
    step of a tokenizer-training pipeline). The unigram table
    broadcasts into the bigram join (vocabulary ≪ corpus); top-20 is
    a TakeOrdered, not a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.split(F.trim(F.lower("text")), r"\s+").alias("w")
    )
    uni = words.select(F.explode("w").alias("tok"))
    ucount = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    utot = ucount.agg(F.sum("n").alias("t"))
    bi = words.select(
        F.explode(
            F.transform(
                F.slice("w", 1, F.greatest(F.size("w") - 1, F.lit(0))),
                lambda x, i: F.struct(
                    x.alias("w1"),
                    F.element_at("w", i + 2).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bcount = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    btot = bcount.agg(F.sum("n").alias("t"))
    u1 = ucount.select(F.col("tok").alias("w1"), F.col("n").alias("n1"))
    u2 = ucount.select(F.col("tok").alias("w2"), F.col("n").alias("n2"))
    scored = (
        bcount.where(F.col("n") >= 5)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(utot.select(F.col("t").alias("ut"))))
        .crossJoin(F.broadcast(btot.select(F.col("t").alias("bt"))))
        .select(
            "w1",
            "w2",
            F.col("n").cast("long").alias("n_pair"),
            F.round(
                F.log(
                    (F.col("n") / F.col("bt"))
                    / ((F.col("n1") / F.col("ut")) * (F.col("n2") / F.col("ut")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(20)
