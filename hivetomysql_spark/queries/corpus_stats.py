"""Corpus statistics + data-governance tier: TF-IDF, co-occurrence
PMI, PII anonymization, stratified sampling, column profiling,
histograms, and blocked fuzzy entity resolution.

Extension tier (SURVEY.md §2.2): the reference
(`HiveToMysql.java:1-641`) contains no analytics beyond its
scan→remap→insert path; these are the corpus-statistics and
data-quality operators a 100 TB training-data pipeline layers on top.
Every query here is a single linear DataFrame chain with DuckDB
oracle parity.

Scale notes (100 TB stance):
- TF-IDF / PMI shuffle on the *term*, never the document body — the
  wide ``text`` column is dropped at tokenize time, so shuffled bytes
  are O(tokens), not O(corpus).
- Document frequency and corpus-size sides of the joins are
  vocabulary-sized → always broadcast (no shuffle of the TF table).
- Stratified sampling and anonymization are narrow projections/
  filters: zero shuffles, fully pushed into the scan stage.
- Entity resolution joins only within equality *blocks* (last token),
  turning the O(n²) all-pairs distance into per-block partitions —
  the standard blocking design for record linkage at scale.
- The profiler computes every column's stats in ONE pass over the
  table (multi-aggregate + stack), not one scan per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term) pairs — whitespace-normalized lowercase tokens.

    The split array is materialized in a named projection before the
    explode (measured: inlining the split into explode re-evaluates
    it per exploded row), and ``explode_outer`` avoids the planner's
    implicit ``size(arr) > 0`` pushed filter (arrays are never empty
    here).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w")
    )
    return docs.select("doc_id", F.explode_outer("w").alias("term"))


_TOK_CTE = """
tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
)
"""


@register(
    "text_tfidf_topterms",
    oracle=f"""
    WITH {_TOK_CTE},
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             ROUND(tf.tf * LN((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6) AS tfidf
      FROM tf, dfreq, n
      WHERE tf.term = dfreq.term
    )
    SELECT doc_id, term, tf, tfidf, CAST(rk AS INTEGER) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term
      ) AS rk
      FROM scored
    )
    WHERE rk <= 3
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF
    (idf = ln((N+1)/(df+1))).

    Plan: tokenize → (doc, term) count [shuffle on (doc_id, term)] →
    document-frequency table derived FROM the tf table (no second
    corpus scan) and broadcast back (vocabulary-sized), corpus size N
    broadcast as a 1-row literal → per-doc window top-k. The only
    full-data shuffles are the tf groupBy and the final per-doc
    window partition; both keys are well-distributed at any scale.
    """
    tok = _tokens(spark, sf_dir)
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = (
        load_table(spark, sf_dir, "documents")
        .agg(F.count("*").alias("n_docs"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 3)


@register(
    "text_cooccurrence_pmi",
    oracle=f"""
    WITH {_TOK_CTE},
    dt AS (SELECT DISTINCT doc_id, term FROM tok),
    dfreq AS (SELECT term, COUNT(*) AS df FROM dt GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    pairs AS (
      SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS n_co
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY a.term, b.term
    )
    SELECT term_a, term_b, n_co,
           ROUND(LN(n_co * 1.0 * n.n_docs / (fa.df * 1.0 * fb.df)), 6) AS pmi
    FROM pairs, dfreq fa, dfreq fb, n
    WHERE pairs.term_a = fa.term AND pairs.term_b = fb.term
    ORDER BY n_co DESC, term_a, term_b
    LIMIT 20
    """,
)
def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 co-occurring token pairs with pointwise mutual
    information pmi = ln(P(a,b)/(P(a)P(b))) at document granularity.

    Plan: per-doc sorted distinct-token sets (one exchange, reused by
    both branches) → pairs generated MAP-SIDE via index-sliced array
    combinations (``a < b`` by sort order, each unordered pair once)
    → pair counts → broadcast the vocabulary-sized doc-frequency
    table twice for the PMI denominators. No self-join: the former
    doc_id-shuffled join of the full (doc,term) table is replaced by
    in-partition fan-out (cold 7.1s → 4.6s at sf0.1, identical
    output); at 100 TB per-doc fan-out d(d-1)/2 is bounded by capping
    distinct tokens per document. The final top-20 is a total order
    (count desc, then pair lexicographic) → TakeOrderedAndProject,
    no global sort.
    """
    # per-doc sorted distinct-token sets computed MAP-SIDE
    # (array_distinct over the split array — no explode, no
    # groupBy(doc) exchange at all; the earlier version shuffled the
    # full (doc, term) table once to collect_set it back). The
    # localCheckpoint pins the arrays so the pair generator and the
    # document-frequency branch both read the materialized form
    # instead of re-splitting the text. Pairs are generated MAP-SIDE
    # from each set via index-sliced array combinations (cold
    # 7.1s -> 4.6s at sf0.1 when the self-join died; the exchange
    # removal takes the warm path 1.8s -> 1.5s). At 100 TB the
    # per-doc fan-out d(d-1)/2 is bounded by capping distinct tokens
    # per doc, not by join sizing.
    ts = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.array_sort(
                F.array_distinct(
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+")
                )
            ).alias("ts"),
        )
        .localCheckpoint(eager=False)
    )
    dfreq = (
        ts.select(F.explode("ts").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    n = (
        load_table(spark, sf_dir, "documents")
        .agg(F.count("*").alias("n_docs"))
    )
    pair_arr = F.flatten(
        F.transform(
            "ts",
            lambda x, i: F.transform(
                F.slice("ts", i + 2, F.size("ts")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        ts.select(F.explode_outer(pair_arr).alias("p"))
        .groupBy(F.col("p.a").alias("term_a"), F.col("p.b").alias("term_b"))
        .agg(F.count("*").alias("n_co"))
    )
    fa = F.broadcast(dfreq.select(F.col("term").alias("term_a"), F.col("df").alias("df_a")))
    fb = F.broadcast(dfreq.select(F.col("term").alias("term_b"), F.col("df").alias("df_b")))
    return (
        pairs.join(fa, "term_a")
        .join(fb, "term_b")
        .crossJoin(F.broadcast(n))
        .select(
            "term_a",
            "term_b",
            "n_co",
            F.round(
                F.log(
                    F.col("n_co")
                    * F.lit(1.0)
                    * F.col("n_docs")
                    / (F.col("df_a") * F.lit(1.0) * F.col("df_b"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("n_co"), "term_a", "term_b")
        .limit(20)
    )


@register(
    "privacy_anonymize",
    oracle="""
    SELECT substring(md5(CAST(c_custkey AS VARCHAR)), 1, 16) AS pseudo_id,
           regexp_replace(c_name, '[0-9]', '*', 'g') AS masked_name,
           CAST(floor(c_acctbal / 1000.0) * 1000 AS BIGINT) AS bal_band,
           c_mktsegment
    FROM customer
    """,
)
def privacy_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR-style anonymization pass: stable pseudonymous key (md5 of
    the natural key — referentially consistent across tables), digit
    masking on the name, and k-anonymity-style generalization of the
    account balance into 1000-wide bands.

    A pure narrow projection: zero shuffles, runs entirely inside the
    scan stage at any scale, and Parquet column pruning drops every
    untouched column.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 16).alias(
            "pseudo_id"
        ),
        F.regexp_replace("c_name", "[0-9]", "*").alias("masked_name"),
        (F.floor(F.col("c_acctbal") / 1000.0) * 1000)
        .cast("long")
        .alias("bal_band"),
        "c_mktsegment",
    )


@register(
    "sample_stratified",
    oracle="""
    WITH tagged AS (
      SELECT c_mktsegment, c_acctbal,
             substring(md5(c_mktsegment || '|' || CAST(c_custkey AS VARCHAR)), 1, 1)
               IN ('0','1','2','3') AS keep
      FROM customer
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE keep) AS n_sampled,
           ROUND(AVG(c_acctbal) FILTER (WHERE keep), 6) AS avg_bal_sampled,
           ROUND(AVG(c_acctbal), 6) AS avg_bal_full
    FROM tagged
    GROUP BY c_mktsegment
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: ~25% of each market segment,
    selected by the first hex digit of md5(stratum|key) ∈ {0..3}.
    Hash-based selection is reproducible across engines and runs
    (unlike ``sampleBy``'s RNG) and needs no per-stratum state — the
    sampling decision is a stateless row-local expression, so the
    whole sample + per-stratum accuracy check is ONE aggregation pass
    (conditional aggregates), no join of sample against population.
    """
    c = load_table(spark, sf_dir, "customer")
    keep = F.substring(
        F.md5(F.concat_ws("|", "c_mktsegment", F.col("c_custkey").cast("string"))),
        1,
        1,
    ).isin("0", "1", "2", "3")
    return (
        c.withColumn("keep", keep)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_total"),
            F.count(F.when(F.col("keep"), 1)).alias("n_sampled"),
            F.round(
                F.avg(F.when(F.col("keep"), F.col("c_acctbal"))), 6
            ).alias("avg_bal_sampled"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_bal_full"),
        )
    )


@register(
    "profile_table",
    oracle="""
    SELECT 'o_orderstatus' AS col_name,
           COUNT(*) - COUNT(o_orderstatus) AS n_nulls,
           COUNT(DISTINCT o_orderstatus) AS ndv,
           CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           MIN(o_orderstatus) AS min_str, MAX(o_orderstatus) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           COUNT(*) - COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           COUNT(*) - COUNT(o_custkey), COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           COUNT(*) - COUNT(o_totalprice), COUNT(DISTINCT o_totalprice),
           ROUND(MIN(o_totalprice), 6), ROUND(MAX(o_totalprice), 6),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM orders
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (the data-quality primitive behind schema
    drift / null-rate monitoring): null count, exact NDV, min/max for
    a configured column set — computed in ONE pass over the table
    (a single multi-aggregate; Spark plans the mixed COUNT DISTINCTs
    via expand), then pivoted to one row per column with ``stack``.
    The oracle's UNION-ALL-of-scans shape is exactly what this
    formulation avoids at 100 TB: 4 profiled columns cost 1 scan, not
    4.
    """
    o = load_table(spark, sf_dir, "orders")
    stats = o.agg(
        F.count(F.when(F.col("o_orderstatus").isNull(), 1)).alias("status_nulls"),
        F.countDistinct("o_orderstatus").alias("status_ndv"),
        F.min("o_orderstatus").alias("status_min"),
        F.max("o_orderstatus").alias("status_max"),
        F.count(F.when(F.col("o_orderpriority").isNull(), 1)).alias("prio_nulls"),
        F.countDistinct("o_orderpriority").alias("prio_ndv"),
        F.min("o_orderpriority").alias("prio_min"),
        F.max("o_orderpriority").alias("prio_max"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("cust_nulls"),
        F.countDistinct("o_custkey").alias("cust_ndv"),
        F.min("o_custkey").cast("double").alias("cust_min"),
        F.max("o_custkey").cast("double").alias("cust_max"),
        F.count(F.when(F.col("o_totalprice").isNull(), 1)).alias("price_nulls"),
        F.countDistinct("o_totalprice").alias("price_ndv"),
        F.round(F.min("o_totalprice"), 6).alias("price_min"),
        F.round(F.max("o_totalprice"), 6).alias("price_max"),
    )
    return stats.select(
        F.expr(
            """
            stack(4,
              'o_orderstatus', status_nulls, status_ndv,
                CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                status_min, status_max,
              'o_orderpriority', prio_nulls, prio_ndv,
                CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                prio_min, prio_max,
              'o_custkey', cust_nulls, cust_ndv,
                cust_min, cust_max,
                CAST(NULL AS STRING), CAST(NULL AS STRING),
              'o_totalprice', price_nulls, price_ndv,
                price_min, price_max,
                CAST(NULL AS STRING), CAST(NULL AS STRING)
            ) AS (col_name, n_nulls, ndv, min_num, max_num, min_str, max_str)
            """
        )
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 30000.0), 19) AS BIGINT) AS bucket,
           CAST(least(floor(o_totalprice / 30000.0), 19) AS BIGINT) * 30000
             AS bucket_lo,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (20 buckets of 30k, last
    bucket open-ended). Bucketing is a row-local floor — the
    aggregation shuffles only 20 distinct keys after map-side partial
    aggregation, so the reduce side is O(buckets) regardless of table
    size: the canonical map-combine win.
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 30000.0), F.lit(19)).cast(
        "long"
    )
    return (
        o.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total"),
        )
        .select("bucket", (F.col("bucket") * 30000).alias("bucket_lo"), "n", "total")
    )


@register(
    "er_blocked_fuzzy",
    oracle="""
    WITH names AS (
      SELECT DISTINCT p_name,
             string_split(p_name, ' ')[-1] AS block
      FROM part
    )
    SELECT a.block,
           a.p_name AS name_a,
           b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
    FROM names a
    JOIN names b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def er_blocked_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution: candidate duplicate part names
    = pairs sharing a blocking key (last token) within edit distance
    ≤ 4. Blocking turns the O(n²) all-pairs Levenshtein into an
    equi-join on the block key — each block is one shuffle partition
    and distance runs only inside blocks, the standard record-linkage
    scaling design (at 100 TB you'd add a second blocking pass on a
    different key to catch cross-block dupes).
    """
    p = load_table(spark, sf_dir, "part")
    names = p.select(
        "p_name", F.element_at(F.split("p_name", " "), -1).alias("block")
    ).distinct()
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 4)
        .select(
            F.col("a.block").alias("block"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("dist"),
        )
    )


@register(
    "dq_expectations",
    oracle="""
    SELECT * FROM (
      SELECT 'lineitem_orderkey_ri' AS rule,
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
               AS n_violations,
             (SELECT COUNT(*) FROM lineitem) AS n_checked
      UNION ALL
      SELECT 'orders_price_positive',
             (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0),
             (SELECT COUNT(*) FROM orders)
      UNION ALL
      SELECT 'customer_key_unique',
             (SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer),
             (SELECT COUNT(*) FROM customer)
      UNION ALL
      SELECT 'customer_acctbal_nonneg',
             (SELECT COUNT(*) FROM customer WHERE c_acctbal < 0),
             (SELECT COUNT(*) FROM customer)
      UNION ALL
      SELECT 'documents_min_20_tokens',
             (SELECT COUNT(*) FROM documents
              WHERE LEN(string_split_regex(trim(lower(text)), '\\s+')) < 20),
             (SELECT COUNT(*) FROM documents)
    ) t
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite: each rule emits (violations,
    checked) — referential integrity (anti join, the only rule that
    needs a shuffle), range/sign checks, key uniqueness, and a corpus
    minimum-length gate. Every non-join rule is a single-scan
    aggregate with map-side partials; the rule results are unioned as
    one tiny DataFrame so a 100 TB audit is one pass per table, not
    one job per rule."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    docs = load_table(spark, sf_dir, "documents")

    def rule(name: str, violations, checked) -> DataFrame:
        return violations.crossJoin(checked).select(
            F.lit(name).alias("rule"),
            F.col("v").alias("n_violations"),
            F.col("n").alias("n_checked"),
        )

    ri = rule(
        "lineitem_orderkey_ri",
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").agg(
            F.count(F.lit(1)).alias("v")
        ),
        li.agg(F.count(F.lit(1)).alias("n")),
    )
    price = rule(
        "orders_price_positive",
        o.agg(F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("v")),
        o.agg(F.count(F.lit(1)).alias("n")),
    )
    uniq = rule(
        "customer_key_unique",
        c.agg((F.count(F.lit(1)) - F.count_distinct("c_custkey")).alias("v")),
        c.agg(F.count(F.lit(1)).alias("n")),
    )
    bal = rule(
        "customer_acctbal_nonneg",
        c.agg(F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0)).alias("v")),
        c.agg(F.count(F.lit(1)).alias("n")),
    )
    toks = F.size(F.split(F.trim(F.lower("text")), r"\s+"))
    short = rule(
        "documents_min_20_tokens",
        docs.agg(F.sum(F.when(toks < 20, 1).otherwise(0)).alias("v")),
        docs.agg(F.count(F.lit(1)).alias("n")),
    )
    return ri.unionByName(price).unionByName(uniq).unionByName(bal).unionByName(short)


@register(
    "agg_salted_two_phase",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for hot group keys: phase 1
    groups by (key, salt) — 16 partial states per key spread across
    the cluster — phase 2 merges the partials per key. With only 5
    event types, an unsalted groupBy would reduce 1/5 of all rows in
    each of 5 tasks; the salt bounds any task at 1/(5·16). The salt
    is a hash of a high-cardinality column, not rand(), so retried
    tasks re-produce identical partials (deterministic under
    speculative execution). Oracle = the plain one-phase aggregate —
    salting must be invisible in the result."""
    ev = load_table(spark, sf_dir, "events")
    salt = F.pmod(F.xxhash64("event_id"), F.lit(16)).alias("salt")
    phase1 = ev.groupBy("event_type", salt).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("pv"),
    )
    return phase1.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pv"), 2).cast("double").alias("total"),
    )


@register(
    "text_bm25_scores",
    oracle=f"""
    WITH {_TOK_CTE},
    qt AS (SELECT UNNEST(['join', 'hash', 'filter']) AS term),
    dl AS (SELECT doc_id, COUNT(*) AS dlen FROM tok GROUP BY doc_id),
    stats AS (
      SELECT COUNT(*) AS n_docs, AVG(dlen) AS avgdl FROM dl
    ),
    f AS (
      SELECT t.doc_id, t.term, COUNT(*) AS tf
      FROM tok t JOIN qt ON t.term = qt.term
      GROUP BY t.doc_id, t.term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM f GROUP BY term),
    scored AS (
      SELECT f.doc_id,
             SUM(LN((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1)
                 * f.tf * 2.2
                 / (f.tf + 1.2 * (0.25 + 0.75 * dl.dlen / stats.avgdl)))
               AS score
      FROM f
      JOIN dfreq ON dfreq.term = f.term
      JOIN dl ON dl.doc_id = f.doc_id
      CROSS JOIN stats
      GROUP BY f.doc_id
    )
    SELECT doc_id, ROUND(score, 6) AS bm25
    FROM scored
    WHERE score > 1.0
    """,
)
def text_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against the query terms
    (join, hash, filter) with k1=1.2, b=0.75 — the retrieval scorer a
    corpus search/mining pipeline runs beside TF-IDF.

    Scale shape: tokens are FILTERED to the query terms before any
    aggregation (the per-(doc,term) shuffle carries only matching
    postings, not the corpus); document lengths reduce in the same
    token pass; corpus stats (N, avgdl) and per-term df are tiny
    aggregates broadcast into the final per-doc scoring join. Nothing
    O(corpus) crosses the wire except the one posting-list groupBy.
    """
    terms = ["join", "hash", "filter"]
    k1, b = 1.2, 0.75
    docs = load_table(spark, sf_dir, "documents")
    # fully MAP-SIDE per-doc stats: query terms are a small FIXED
    # list, so dlen and per-term tf are array expressions over the
    # once-materialized token array — no explode, no groupBy(doc)
    # exchange (was 1 scan + 2 shuffles; now 1 scan + the one tiny
    # corpus-stats reduce). The multi-referenced array alias keeps
    # the split un-inlined.
    w = F.split(F.trim(F.lower("text")), r"\s+")
    base = docs.select("doc_id", w.alias("w"))
    per_doc = base.select(
        "doc_id",
        F.size("w").cast("long").alias("dlen"),
        *[
            F.size(F.filter("w", lambda x: x == F.lit(t)))
            .cast("long")
            .alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dlen").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    joined = per_doc.crossJoin(F.broadcast(stats))

    def term_score(i: int):
        tf = F.col(f"tf{i}")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5) + 1
        )
        denom = tf + k1 * (1 - b + b * F.col("dlen") / F.col("avgdl"))
        return F.when(tf > 0, idf * tf * (k1 + 1) / denom).otherwise(0.0)

    score = sum((term_score(i) for i in range(len(terms))), F.lit(0.0))
    scored = joined.select("doc_id", score.alias("score"))
    return scored.where(F.col("score") > 1.0).select(
        "doc_id", F.round("score", 6).alias("bm25")
    )


@register(
    "sample_cap_per_source",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR))
             ) AS rk
      FROM documents
    )
    SELECT doc_id, source, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 20
    """,
)
def sample_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contribution cap: at most 20 documents per source,
    chosen by md5(doc_id) order — the corpus-balancing step that stops
    one crawl domain from dominating a training mix. Deterministic
    (hash order, never rand()) so re-runs and retried tasks pick the
    SAME sample; one shuffle on source, and at 100 TB the window
    input can be pre-pruned with an approximate per-source count
    filter before ranking."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string"))
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 20)
    )


@register(
    "privacy_k_anonymity",
    oracle="""
    WITH cells AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
             COUNT(*) AS n
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT COUNT(*) AS n_cells,
           CAST(MIN(n) AS BIGINT) AS min_cell,
           COUNT(*) FILTER (WHERE n < 5) AS cells_below_k,
           CAST(SUM(n) FILTER (WHERE n < 5) AS BIGINT) AS rows_at_risk
    FROM cells
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the quasi-identifier tuple
    (segment, nation, balance band): how many equivalence classes
    exist, the smallest class, and how many rows sit in classes
    small enough to re-identify. The release gate that decides
    whether privacy_anonymize's generalization went far enough;
    one groupBy then a one-row summary."""
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 2000.0).alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.min("n").alias("min_cell"),
        F.count_if(F.col("n") < 5).alias("cells_below_k"),
        F.sum(F.when(F.col("n") < 5, F.col("n"))).alias("rows_at_risk"),
    )


@register(
    "dq_benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    )
    SELECT digit,
           COUNT(*) AS n,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (), 4) AS observed_p,
           ROUND(LOG10(1.0 + 1.0 / digit), 4) AS benford_p
    FROM d
    GROUP BY digit
    """,
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit: first-digit distribution of order totals
    vs the log10(1+1/d) expectation — the classic fabricated-data
    screen for financial columns. (Synthetic uniform-ish fixtures
    deviate, which is exactly what the audit shows.) One aggregate;
    the share is a window over the 9-row result, not the data."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    from pyspark.sql.window import Window

    counts = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return counts.select(
        "digit",
        "n",
        F.round(F.col("n") * 1.0 / total, 4).alias("observed_p"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 4).alias("benford_p"),
    )


@register(
    "text_zipf_fit",
    oracle=f"""
    WITH {_TOK_CTE},
    freq AS (SELECT term, COUNT(*) AS f FROM tok GROUP BY term),
    ranked AS (
      SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, term) AS r FROM freq
    )
    SELECT ROUND(REGR_SLOPE(LN(f), LN(r)), 4) AS zipf_slope,
           ROUND(REGR_R2(LN(f), LN(r)), 4) AS fit_r2,
           COUNT(*) AS vocab_size
    FROM ranked
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law audit: slope of the log-log rank-frequency line
    over the corpus vocabulary (natural language ~ -1; synthetic or
    templated corpora deviate — a cheap distribution-shift detector
    for training data). Term counts shuffle once; the regression runs
    over the vocabulary-sized ranked table, and the ranking window is
    ordered by (freq, term) so ties are deterministic."""
    tok = _tokens(spark, sf_dir)
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    from pyspark.sql.window import Window

    r = F.row_number().over(Window.orderBy(F.desc("f"), F.asc("term")))
    ranked = freq.select("f", r.alias("r"))
    return ranked.agg(
        F.round(F.regr_slope(F.log("f"), F.log("r")), 4).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("f"), F.log("r")), 4).alias("fit_r2"),
        F.count(F.lit(1)).alias("vocab_size"),
    )


@register(
    "text_length_extremes",
    oracle="""
    WITH r AS (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS rn_s,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS rn_l
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 2) AS avg_chars,
           CAST(MAX(CASE WHEN rn_s = 1 THEN doc_id END) AS BIGINT)
             AS shortest_doc,
           CAST(MAX(CASE WHEN rn_l = 1 THEN doc_id END) AS BIGINT)
             AS longest_doc
    FROM r
    GROUP BY lang
    """,
)
def text_length_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length profile with argmin/argmax documents —
    min_by/max_by over a (length, id) struct so ties resolve to one
    deterministic doc under any partitioning (bare min_by on the
    length alone is nondeterministic whenever two docs tie). The
    lowest doc_id wins both races; single-pass mergeable aggregate."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.min_by("doc_id", F.struct(F.col("n_chars"), F.col("doc_id"))).alias(
            "shortest_doc"
        ),
        F.max_by(
            "doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")))
        ).alias("longest_doc"),
    )
