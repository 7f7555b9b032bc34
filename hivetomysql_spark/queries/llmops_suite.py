"""LLM data-pipeline extras suite.

Folded from the round-build batch modules (analytics_extras*): every
query whose name matches this domain moved here verbatim together
with its batch-local helpers, so related operators read side by side.
Section banners record the source batch; helpers shared across
domains were duplicated module-private; colliding private names carry
a _b<batch> suffix.
"""

from __future__ import annotations



# ========================================================================
# from analytics_extras.py — original batch rationale:
# Analytics extras: robust statistics, customer segmentation,
# sequential recurrences, pinned-hash sketches, containment dedup, and
# one-pass centroid assignment.
#
# Not in the reference (hiveToMysql computes nothing — the single class
# `HiveToMysql.java:1-641` only copies rows); these widen the extension
# tiers of SURVEY.md §2.2 with operator shapes a production analytics /
# training-data stack runs daily:
#
# * MAD outlier flags — the robust anomaly screen (3·1.4826·MAD rule);
# * RFM segmentation — the classic marketing cohort cut;
# * per-key EMA — a *sequential recurrence*, the one aggregation class
#   a parallel engine cannot express as a commutative fold;
# * count-min sketch — with the hash family pinned to md5 so the sketch
#   itself (not just its contract) is oracle-checkable in DuckDB;
# * n-gram containment — the asymmetric near-dup signal for
#   quoted/sub-document duplication (Jaccard misses short-inside-long);
# * k-means assignment — the map-side step of Lloyd's / IVF coarse
#   quantization, as one broadcast join.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.operators import dedup as D
from hivetomysql_spark.operators.ranks import grouped_row_number
from hivetomysql_spark.operators.similarity import _as_double, _dot, _norm
from hivetomysql_spark.queries import register
from hivetomysql_spark.queries.llm import _SHINGLES_CTE
from hivetomysql_spark.tables import load_table



@register(
    "dedup_containment",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(c * 1.0 / sa.n, 4) AS contain_a_in_b,
           ROUND(c * 1.0 / sb.n, 4) AS contain_b_in_a
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE greatest(c * 1.0 / sa.n, c * 1.0 / sb.n) >= 0.5
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric 3-gram containment pairs (either direction ≥ 0.5):
    catches a short document quoted inside a long one, which Jaccard
    under-scores because the union is dominated by the long side —
    the RefinedWeb/Dolma sub-document-duplication signal. Same
    posting-list plan (and the same single 8-byte-key shuffle) as
    dedup_ngram_jaccard."""
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_containment_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


# ========================================================================
# from analytics_extras4.py — original batch rationale:
# Analytics extras, batch 4: C4-style duplicate-span corpus stats,
# linear multi-touch attribution, price-series drawdown, ABC (Pareto
# class) inventory classification, CUSUM changepoint detection, and
# daily lead-lag cross-correlation.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's LLM-pipeline / aggregation /
# time-series tiers:
#
# * duplicate-span stats — the C4/RefinedWeb signal "how much of each
#   document is made of spans that also occur in other documents",
#   computed on non-overlapping 10-token spans;
# * linear attribution — purchase value split equally across the
#   user's view/click touches in the prior 7 days, the simplest
#   defensible multi-touch model;
# * max drawdown — largest peak-to-trough decline of the daily-revenue
#   series, the classic risk statistic;
# * ABC classification — A/B/C Pareto classes by cumulative revenue
#   share (70/90 cut), the inventory-management staple;
# * CUSUM changepoint — day of maximum |cumulative deviation from the
#   mean| per event type, the page-one change-detection statistic;
# * cross-correlation — Pearson correlation between the daily view
#   series and the purchase series shifted by lag −3..+3 days, the
#   lead-lag discovery tool.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


SPAN = 10  # tokens per non-overlapping span



@register(
    "dedup_span_duplicates",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    spans AS (
      SELECT doc_id, array_to_string(tk[(g*10+1):(g*10+10)], ' ') AS span
      FROM toks, generate_series(0, 1000) AS gs(g)
      WHERE len(tk) >= (g*10+10)
    ),
    span_docs AS (
      SELECT span, COUNT(DISTINCT doc_id) AS nd FROM spans GROUP BY span
    ),
    per_doc AS (
      SELECT s.doc_id, COUNT(*) AS n_spans,
             SUM(CASE WHEN sd.nd > 1 THEN 1 ELSE 0 END) AS dup_spans
      FROM spans s JOIN span_docs sd ON s.span = sd.span
      GROUP BY s.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dup_spans) AS BIGINT) AS total_dup_spans,
           ROUND(AVG(dup_spans * 1.0 / n_spans), 6) AS avg_dup_ratio,
           CAST(SUM(CASE WHEN dup_spans > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_dup
    FROM per_doc
    """,
)
def dedup_span_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style duplicate-span statistics: chop each document into
    non-overlapping 10-token spans, mark spans that occur in more
    than one document, and report corpus totals plus the mean
    duplicated fraction per document.

    Scale shape: spans are derived in the scan stage (split + slice,
    no shuffle, ~n_tokens/10 rows per doc). One shuffle groups spans
    to get their doc-frequency; the join back to per-doc rows keys on
    the span hash — both sides already partitioned by span from the
    same exchange. The final two aggregates are O(docs) then O(1).
    At 100 TB, hash the span (xxhash64) instead of carrying text into
    the shuffle — here the span text stays because the oracle needs
    identical grouping keys.
    """
    d = load_table(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.split("text", " ").alias("tk"))
    n_spans = (F.size("tk") / SPAN).cast("int")
    spans = tk.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_spans - 1)).alias("g"),
        "tk",
    ).select(
        "doc_id",
        F.concat_ws(
            " ", F.slice("tk", F.col("g") * SPAN + 1, SPAN)
        ).alias("span"),
    )
    span_docs = spans.groupBy("span").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    per_doc = (
        spans.join(span_docs, "span")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum((F.col("nd") > 1).cast("int")).alias("dup_spans"),
        )
    )
    return per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dup_spans").alias("total_dup_spans"),
        F.round(F.avg(F.col("dup_spans") / F.col("n_spans")), 6).alias(
            "avg_dup_ratio"
        ),
        F.sum((F.col("dup_spans") > 0).cast("int")).alias("docs_with_dup"),
    )


# ========================================================================
# from analytics_extras7.py — original batch rationale:
# Analytics extras, batch 7: LLM-corpus curation and embedding
# infrastructure — weighted reservoir sampling, a staged quality
# funnel, tokenizer vocabulary coverage, product quantization, and
# PCA by power iteration.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's training-data / embedding tiers:
#
# * importance sampling — Efraimidis-Spirakis exponential-key weighted
#   reservoir, the one-pass mergeable way to draw a weighted sample;
# * quality funnel — Gopher-style staged document filters with
#   per-stage survivor accounting;
# * vocab coverage — top-K corpus vocabulary + per-source OOV rates,
#   the tokenizer-fit diagnostic;
# * product quantization — 2x32-dim subspace codebook assignment with
#   quantization-error accounting, the ANN index building block;
# * PCA power iteration — dominant covariance eigenvector via three
#   matrix-free broadcast-vector passes.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_RES_K = 20



@register(
    "sample_importance_weighted",
    oracle=f"""
    WITH keyed AS (
      SELECT o_orderkey, o_totalprice,
             -ln((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                  ::BIGINT % 999983 + 0.5) / 999983.0) / o_totalprice AS k
      FROM orders
    ),
    ranked AS (
      SELECT o_orderkey, o_totalprice, k,
             ROW_NUMBER() OVER (ORDER BY k, o_orderkey) AS rn
      FROM keyed
    )
    SELECT CAST(rn AS BIGINT) AS rn, o_orderkey,
           ROUND(o_totalprice, 2) AS weight,
           ROUND(k * 1e6, 6) AS key_x1e6
    FROM ranked WHERE rn <= {_RES_K}
    """,
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling (Efraimidis-Spirakis A-ES): each
    row draws an exponential key -ln(u)/w from a deterministic
    md5-derived uniform; the k smallest keys ARE a weighted-without-
    replacement sample. One pass, no resampling, and the reservoir is
    mergeable — partial top-k reservoirs union and re-truncate, which
    is what makes the scheme work as a map-side combine at 100 TB
    (Spark compiles the sort+limit to TakeOrderedAndProject — per-
    partition top-k then a k-sized driver merge, never a global
    sort). Weight = order value, so big orders are proportionally
    overrepresented, the usual importance design for value-weighted
    audits."""
    o = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = ((h % 999983) + 0.5) / 999983.0
    keyed = o.select(
        "o_orderkey",
        "o_totalprice",
        (-F.log(u) / F.col("o_totalprice")).alias("k"),
    )
    ranked = keyed.select(
        "o_orderkey",
        "o_totalprice",
        "k",
        F.row_number().over(Window.orderBy("k", "o_orderkey")).alias("rn"),
    ).where(F.col("rn") <= _RES_K)
    return ranked.select(
        F.col("rn").cast("long").alias("rn"),
        "o_orderkey",
        F.round("o_totalprice", 2).alias("weight"),
        F.round(F.col("k") * 1e6, 6).alias("key_x1e6"),
    )



@register(
    "corpus_quality_funnel",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t.tok
      FROM documents,
           UNNEST(regexp_split_to_array(lower(text), '[^a-z]+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
    ),
    m AS (
      SELECT doc_id,
             SUM(c) AS n_tok,
             SUM(LENGTH(tok) * c) * 1.0 / SUM(c) AS mean_len,
             COUNT(*) * 1.0 / SUM(c) AS uniq_ratio,
             MAX(c) * 1.0 / SUM(c) AS top_ratio
      FROM tf GROUP BY doc_id
    ),
    flags AS (
      SELECT d.doc_id,
             CASE WHEN d.n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END AS f1,
             CASE WHEN m.mean_len BETWEEN 3 AND 12 THEN 1 ELSE 0 END AS f2,
             CASE WHEN m.uniq_ratio >= 0.3 THEN 1 ELSE 0 END AS f3,
             CASE WHEN m.top_ratio <= 0.2 THEN 1 ELSE 0 END AS f4
      FROM documents d JOIN m ON m.doc_id = d.doc_id
    ),
    stages(stage, ord) AS (
      VALUES ('0_all', 0), ('1_length', 1), ('2_word_len', 2),
             ('3_uniq', 3), ('4_repetition', 4)
    ),
    surv AS (
      SELECT s.stage, s.ord,
             SUM(CASE s.ord
                   WHEN 0 THEN 1
                   WHEN 1 THEN f1
                   WHEN 2 THEN f1 * f2
                   WHEN 3 THEN f1 * f2 * f3
                   ELSE f1 * f2 * f3 * f4 END) AS n
      FROM stages s CROSS JOIN flags
      GROUP BY s.stage, s.ord
    )
    SELECT stage,
           CAST(n AS BIGINT) AS survivors,
           CAST(LAG(n, 1, n) OVER (ORDER BY ord) - n AS BIGINT)
             AS dropped_here,
           ROUND(n * 1.0 / MAX(n) OVER (), 4) AS pass_rate
    FROM surv
    """,
)
def corpus_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style staged quality funnel with per-stage
    accounting: length bounds, mean-word-length bounds, unique-token
    ratio, and a top-token repetition screen applied cumulatively,
    reporting survivors / dropped / cumulative pass-rate per stage —
    the report a corpus-curation run ships with so each rule's cost
    is visible (cf. Gopher's table of per-filter removal rates).

    Shape: one tokenize+count pass to per-doc metrics (the only
    O(corpus) work), then a constant-size stage table crossed with
    the flags — adding stages costs nothing at scale. All flags are
    computed once, so a doc failing stage 1 is still measured for
    stages 2-4 (cumulative semantics, matching the funnel product
    f1*f2*...)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("tok"),
    ).where(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    m = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"),
        (F.sum(F.length("tok") * F.col("c")) / F.sum("c")).alias("mean_len"),
        (F.count(F.lit(1)) / F.sum("c")).alias("uniq_ratio"),
        (F.max("c") / F.sum("c")).alias("top_ratio"),
    )
    flags = docs.join(m, "doc_id").select(
        F.col("n_chars").between(100, 2000).cast("int").alias("f1"),
        F.col("mean_len").between(3, 12).cast("int").alias("f2"),
        (F.col("uniq_ratio") >= 0.3).cast("int").alias("f3"),
        (F.col("top_ratio") <= 0.2).cast("int").alias("f4"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("f1").alias("n1"),
        F.sum(F.col("f1") * F.col("f2")).alias("n2"),
        F.sum(F.col("f1") * F.col("f2") * F.col("f3")).alias("n3"),
        F.sum(F.col("f1") * F.col("f2") * F.col("f3") * F.col("f4")).alias("n4"),
    )
    stages = agg.select(
        F.explode(
            F.array(
                F.struct(F.lit("0_all").alias("stage"), F.lit(0).alias("ord"), F.col("n0").alias("n")),
                F.struct(F.lit("1_length").alias("stage"), F.lit(1).alias("ord"), F.col("n1").alias("n")),
                F.struct(F.lit("2_word_len").alias("stage"), F.lit(2).alias("ord"), F.col("n2").alias("n")),
                F.struct(F.lit("3_uniq").alias("stage"), F.lit(3).alias("ord"), F.col("n3").alias("n")),
                F.struct(F.lit("4_repetition").alias("stage"), F.lit(4).alias("ord"), F.col("n4").alias("n")),
            )
        ).alias("s")
    ).select("s.stage", "s.ord", "s.n")
    w = Window.orderBy("ord")
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return stages.select(
        "stage",
        F.col("n").cast("long").alias("survivors"),
        (F.lag("n", 1, None).over(w).cast("long") - F.col("n"))
        .cast("long")
        .alias("dropped_here"),
        F.round(F.col("n") / F.max("n").over(w_all), 4).alias("pass_rate"),
    ).withColumn(
        "dropped_here", F.coalesce(F.col("dropped_here"), F.lit(0).cast("long"))
    )


# ========================================================================
# from analytics_extras8.py — original batch rationale:
# Analytics extras, batch 8: Markov-chain steady state, cross-table
# reconciliation, training-shard manifests, and CDC apply with deletes.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's iterative / data-quality /
# training-data tiers:
#
# * Markov stationary distribution — event-type transition chain power-
#   iterated to steady state (10 fixed rounds, fully oracled via an
#   unrolled-CTE matrix-vector chain);
# * reconciliation — the orders-vs-lineitem monthly coverage audit
#   every warehouse runs between fact tables;
# * shard manifest — deterministic greedy packing of documents into
#   fixed-size training shards (the WebDataset/TFRecord manifest step);
# * CDC apply — last-writer-wins change-feed materialization with
#   delete tombstones, one window pass.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "incremental_cdc_apply",
    oracle="""
    WITH feed AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events
    ),
    ranked AS (
      SELECT user_id, value, op,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_ops,
             SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id) AS n_deletes
      FROM feed
    )
    SELECT user_id,
           ROUND(value, 2) AS final_value,
           CAST(n_ops AS BIGINT) AS n_ops,
           CAST(n_deletes AS BIGINT) AS n_deletes
    FROM ranked WHERE rn = 1 AND op = 'U'
    """,
)
def incremental_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply with delete tombstones: the event
    stream is read as a change feed ('error' = DELETE tombstone,
    anything else = UPSERT), and last-writer-wins materializes the
    final table — a key whose LAST change is a tombstone vanishes
    from the output. One ranked-window pass; contrast merge_upsert
    (no deletes) and dedup_keep_latest (no tombstone semantics).

    Scale: this is the compaction step of every CDC lakehouse
    (Hudi/Delta MERGE): shuffle keys are user ids (well spread), the
    window never needs the full history sorted globally, and in
    streaming form the same logic is dropDuplicates-on-key after a
    max-ts reduce, with the watermark bounding state."""
    ev = load_table(spark, sf_dir, "events")
    feed = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    w = Window.partitionBy("user_id")
    ranked = feed.select(
        "user_id",
        "value",
        "op",
        F.row_number()
        .over(w.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_ops"),
        F.sum((F.col("op") == "D").cast("long")).over(w).alias("n_deletes"),
    )
    return ranked.where((F.col("rn") == 1) & (F.col("op") == "U")).select(
        "user_id",
        F.round("value", 2).alias("final_value"),
        F.col("n_ops").cast("long").alias("n_ops"),
        F.col("n_deletes").cast("long").alias("n_deletes"),
    )


# ========================================================================
# from analytics_extras13.py — original batch rationale:
# Analytics extras, batch 13: Markov removal-effect attribution and
# class-balanced sampling.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's attribution / training-data tiers:
#
# * removal-effect attribution — the Markov-chain attribution model
#   (Anderl et al.): each channel's credit is the drop in modeled
#   conversion probability when that channel is removed from the
#   journey graph, computed by finite-horizon value iteration and
#   fully oracled via unrolled CTEs;
# * balanced sampling — md5-deterministic equal-per-class
#   downsampling, the class-rebalancing step before training.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "sample_balanced_classes",
    oracle="""
    WITH sized AS (
      SELECT l_returnflag AS label, COUNT(*) AS n
      FROM lineitem GROUP BY 1
    ),
    cap AS (SELECT MIN(n) AS min_n FROM sized),
    ranked AS (
      SELECT l_returnflag AS label,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY md5(CAST(l_orderkey AS VARCHAR) || ':'
                            || CAST(l_linenumber AS VARCHAR)),
                        l_orderkey, l_linenumber
             ) AS rk,
             l_quantity
      FROM lineitem
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           ROUND(AVG(l_quantity), 2) AS avg_quantity
    FROM ranked CROSS JOIN cap
    WHERE rk <= cap.min_n
    GROUP BY label
    """,
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every label (returnflag) is capped
    at the minority-class count, members chosen by md5 order — the
    deterministic rebalancing step before training a classifier on
    skewed labels (retried tasks and re-runs pick the SAME sample,
    unlike rand()-based sampling).

    Shape: one tiny count aggregate broadcast as the cap, one
    grouped two-level rank (operators/ranks.grouped_row_number —
    labels are few and rows per label huge, so the per-label window
    form sorted N/3 rows in ONE task per label; r11 window audit
    measured its max group at exactly N/3, 10x per decade). The md5
    order becomes bucketable by lifting its first 15 hex chars to a
    long (monotone in the string, so (prefix, md5, okey, lnum)
    orders identically to (md5, okey, lnum) and equal keys can't
    split across buckets); the cap filter is a runtime value, so no
    WindowGroupLimit could have saved the window form."""
    li = load_table(spark, sf_dir, "lineitem")
    sized = li.groupBy(F.col("l_returnflag").alias("label")).agg(
        F.count(F.lit(1)).alias("n")
    )
    cap = sized.agg(F.min("n").alias("min_n"))
    order_key = F.md5(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit(":"),
            F.col("l_linenumber").cast("string"),
        )
    )
    keyed = li.select(
        F.col("l_returnflag").alias("label"),
        "l_quantity",
        "l_orderkey",
        "l_linenumber",
        order_key.alias("__md5"),
    ).withColumn(
        "__mdnum", F.conv(F.substring("__md5", 1, 15), 16, 10).cast("long")
    )
    ranked = grouped_row_number(
        keyed,
        ["label"],
        "__mdnum",
        ["__md5", "l_orderkey", "l_linenumber"],
        out="rk",
    ).select("label", "l_quantity", "rk")
    return (
        ranked.crossJoin(F.broadcast(cap))
        .where(F.col("rk") <= F.col("min_n"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.round(F.avg("l_quantity"), 2).alias("avg_quantity"),
        )
    )


# ========================================================================
# from analytics_extras31.py — original batch rationale:
# Analytics extras, batch 31: relational model training, robust
# regression, incremental ingestion, and DP order statistics.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * decision stump — the depth-1 CART split search as one scan
#   (candidate × side aggregate), "train a tree node as a query".
# * Theil-Sen slope — median-of-pairwise-slopes robust trend.
# * incremental corpus dedup — the production ingestion path: new
#   batch vs existing corpus only (never corpus × corpus).
# * DP median via the exponential mechanism — md5-determinized so the
#   mechanism itself is oracle-checked.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



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


# ========================================================================
# from analytics_extras45.py — original batch rationale:
# Analytics extras, batch 45: the dataset datasheet and engagement
# inequality.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * dataset card — the "datasheets for datasets" statistics table
#   (Gebru et al.): size, composition, duplication, length profile,
#   concentration — one query, release-ready numbers.
# * engagement Lorenz deciles — cumulative share of events held by
#   each user decile, the inequality curve behind "1% of users
#   generate X% of traffic".
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "pipeline_dataset_card",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, lang, source, n_chars,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tok,
             md5(text) AS h
      FROM documents
    ),
    m AS (
      SELECT COUNT(*) * 1.0 AS n_docs,
             SUM(n_tok) * 1.0 AS total_tokens,
             COUNT(DISTINCT lang) * 1.0 AS n_langs,
             COUNT(DISTINCT source) * 1.0 AS n_sources,
             1.0 - COUNT(DISTINCT h) * 1.0 / COUNT(*) AS exact_dup_rate,
             AVG(n_chars) AS mean_chars,
             quantile_cont(n_tok, 0.5) AS median_tokens,
             MAX(src_share) AS top_source_share,
             MAX(lang_share) AS top_lang_share
      FROM (
        SELECT *,
               COUNT(*) OVER (PARTITION BY source) * 1.0
                 / COUNT(*) OVER () AS src_share,
               COUNT(*) OVER (PARTITION BY lang) * 1.0
                 / COUNT(*) OVER () AS lang_share
        FROM base
      )
    )
    SELECT metric, ROUND(value, 6) AS value FROM (
      SELECT 'n_docs' AS metric, n_docs AS value FROM m
      UNION ALL SELECT 'total_tokens', total_tokens FROM m
      UNION ALL SELECT 'n_langs', n_langs FROM m
      UNION ALL SELECT 'n_sources', n_sources FROM m
      UNION ALL SELECT 'exact_dup_rate', exact_dup_rate FROM m
      UNION ALL SELECT 'mean_chars', mean_chars FROM m
      UNION ALL SELECT 'median_tokens', median_tokens FROM m
      UNION ALL SELECT 'top_source_share', top_source_share FROM m
      UNION ALL SELECT 'top_lang_share', top_lang_share FROM m
    ) ORDER BY metric
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card ("Datasheets for Datasets", Gebru et al. 2018):
    the release-readiness statistics table for the document corpus —
    size, token budget, language/source composition and
    concentration, exact-duplication rate, and length profile — as
    ONE query emitting (metric, value) rows, the shape a model card
    pipeline drops straight into its documentation build.

    Shape: the main summary is one map-side-combined aggregate over
    the per-doc derived columns; the concentration shares come from
    two tiny grouped maxima (O(|sources|)/O(|langs|) rows) broadcast
    onto the 1-row summary. Three linear passes, zero windows — at
    100 TB every pass spreads across executors; the earlier
    window-count form single-partitioned the whole corpus."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "lang",
        "source",
        "n_chars",
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n_tok"),
        F.md5("text").alias("h"),
    )
    # concentration shares as map-side-combined aggregates, NOT
    # window counts: the previous count().over(Window.partitionBy())
    # was a global window over every raw document row — a
    # single-partition materialization of the corpus at scale. The
    # grouped maxima are O(|sources|)/O(|langs|) rows and broadcast.
    src_top = (
        base.groupBy("source")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("top_source_cnt"))
    )
    lang_top = (
        base.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("top_lang_cnt"))
    )
    m = (
        base.agg(
            (F.count(F.lit(1)) * 1.0).alias("n_docs"),
            (F.sum("n_tok") * 1.0).alias("total_tokens"),
            (F.countDistinct("lang") * 1.0).alias("n_langs"),
            (F.countDistinct("source") * 1.0).alias("n_sources"),
            (1.0 - F.countDistinct("h") * 1.0 / F.count(F.lit(1))).alias(
                "exact_dup_rate"
            ),
            F.avg("n_chars").alias("mean_chars"),
            F.percentile("n_tok", F.lit(0.5)).alias("median_tokens"),
        )
        .crossJoin(F.broadcast(src_top))
        .crossJoin(F.broadcast(lang_top))
        .withColumn(
            "top_source_share", F.col("top_source_cnt") / F.col("n_docs")
        )
        .withColumn(
            "top_lang_share", F.col("top_lang_cnt") / F.col("n_docs")
        )
    )
    metrics = [
        "n_docs",
        "total_tokens",
        "n_langs",
        "n_sources",
        "exact_dup_rate",
        "mean_chars",
        "median_tokens",
        "top_source_share",
        "top_lang_share",
    ]
    stacked = m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("metric"),
                        F.col(name).alias("value"),
                    )
                    for name in metrics
                ]
            )
        ).alias("kv")
    ).select("kv.metric", F.round("kv.value", 6).alias("value"))
    return stacked.orderBy("metric")


# ========================================================================
# from analytics_extras50.py — original batch rationale:
# Analytics extras, batch 50: data-mixing epoch planning, weighted
# near-dup, a pinned Bloom filter, and time-decay scoring.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * mixture epoch planner — tokens-at-mix and epoch counts per source
#   under a temperature-adjusted sampling mix and a fixed token
#   budget, with the >4-epoch repetition flag (the data-constrained
#   scaling rule of thumb) — the table a pretraining run plans from.
# * IDF-weighted Jaccard — near-dup scoring where rare shingles count
#   more than boilerplate (the weighted upgrade of
#   `dedup_ngram_jaccard`, same posting-list shuffle plan).
# * pinned Bloom filter — a complete m-bit / k-hash Bloom filter
#   built relationally from md5 hashes, with measured-vs-theoretical
#   false-positive rate; completes the sketch family next to the
#   pinned HLL / count-min / linear-counting / KMV.
# * time-decay score — exponentially decayed engagement per user, the
#   classic recency-weighted feature.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_MIX_ALPHA = 0.7


_MIX_BUDGET = 2_000_000


_MIX_EPOCH_CAP = 4.0



@register(
    "sample_mixture_epochs",
    oracle=f"""
    WITH per_source AS (
      SELECT source,
             SUM(len(regexp_extract_all(text, '[^ ]+'))) AS toks
      FROM documents GROUP BY source
    ),
    weighted AS (
      SELECT source, toks,
             POW(toks, {_MIX_ALPHA}) AS pw,
             SUM(POW(toks, {_MIX_ALPHA})) OVER () AS z
      FROM per_source
    ),
    mixed AS (
      SELECT source, toks, pw / z AS w,
             {_MIX_BUDGET} * (pw / z) AS toks_at_mix
      FROM weighted
    )
    SELECT source,
           CAST(toks AS BIGINT) AS n_tokens,
           ROUND(w, 6) AS mix_weight,
           CAST(FLOOR(toks_at_mix) AS BIGINT) AS tokens_at_mix,
           ROUND(toks_at_mix / toks, 4) AS epochs,
           toks_at_mix / toks > {_MIX_EPOCH_CAP} AS over_epoch_cap
    FROM mixed
    """,
)
def sample_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-mix epoch planner: temperature-adjusted sampling
    weights w_s ∝ tokens_s^0.7 (the multilingual up-weighting rule),
    tokens drawn per source under a fixed training budget, and the
    implied epoch count tokens_at_mix / tokens_s — flagged where it
    exceeds 4 epochs, past which repeated data decays in value
    (Muennighoff et al.'s data-constrained scaling observation).
    This is the one-page table a data team signs off before a run.

    Shape: one scan reduces to O(sources); the normalizer is a
    window over 19 rows; everything else is scalar math."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.sum(
            F.size(F.regexp_extract_all("text", F.lit("[^ ]+"), 0))
        ).alias("toks")
    )
    from pyspark.sql.window import Window

    pw = F.pow(F.col("toks"), _MIX_ALPHA)
    weighted = per_source.select(
        "source",
        "toks",
        pw.alias("pw"),
        F.sum(pw).over(Window.partitionBy()).alias("z"),
    )
    mixed = weighted.select(
        "source",
        "toks",
        (F.col("pw") / F.col("z")).alias("w"),
        (F.lit(_MIX_BUDGET) * (F.col("pw") / F.col("z"))).alias(
            "toks_at_mix"
        ),
    )
    return mixed.select(
        "source",
        F.col("toks").cast("long").alias("n_tokens"),
        F.round("w", 6).alias("mix_weight"),
        F.floor("toks_at_mix").cast("long").alias("tokens_at_mix"),
        F.round(F.col("toks_at_mix") / F.col("toks"), 4).alias("epochs"),
        (F.col("toks_at_mix") / F.col("toks") > _MIX_EPOCH_CAP).alias(
            "over_epoch_cap"
        ),
    )


# ========================================================================
# from analytics_extras52.py — original batch rationale:
# Analytics extras, batch 52: LSH quality audit, Theil inequality,
# CV fold assignment, and the bullwhip effect.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * LSH quality audit — precision/recall of the banded-MinHash
#   candidate set against exact Jaccard ground truth, BOTH computed
#   in-engine and both re-derived by the oracle: the evaluation
#   harness for the dedup tier, as a query.
# * Theil T index — the decomposable inequality measure next to the
#   Gini / Lorenz pair already in the registry.
# * CV folds — deterministic md5 k-fold assignment with per-fold
#   target statistics (balance check before any model training).
# * bullwhip effect — order-vs-shipment variance amplification, the
#   classic supply-chain signal-distortion diagnostic.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.operators import dedup as D
from hivetomysql_spark.queries import register
from hivetomysql_spark.queries.llm import _minhash_hs_expr, _minhash_sig_exprs
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
    hsl AS (
      SELECT doc_id, {_minhash_hs_expr()} AS hs FROM shl
    ),
    sigs AS (
      SELECT doc_id, {_minhash_sig_exprs(32)} AS sig FROM hsl
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
    sample — the registered embodiment of that tier is
    :func:`dedup_lsh_quality_audit_sampled` (deterministic md5 doc
    sample, same TP/FP/FN schema); this unsampled form is the
    fixture-scale exact-verify tier."""
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


# deterministic ~25% doc sample for the sampled audit tier: first 4
# md5 hex chars of the doc id, mod 4 — the same md5-fraction idiom
# the sampling suite pins (llm2.py), reproducible on both engines
_LQS_MOD = 4


@register(
    "dedup_lsh_quality_audit_sampled",
    oracle=f"""
    WITH sampled AS (
      SELECT doc_id, text FROM documents
      WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                 AS INT) % {_LQS_MOD} = 0
    ),
    words AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM sampled
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
    hsl AS (
      SELECT doc_id, {{hs}} AS hs FROM shl
    ),
    sigs AS (
      SELECT doc_id, {{sig}} AS sig FROM hsl
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
    """.format(hs=_minhash_hs_expr(), sig=_minhash_sig_exprs(32)),
)
def dedup_lsh_quality_audit_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SAMPLED exact tier of the LSH quality audit — the form
    that actually ships at 100 TB. The unsampled audit's ground
    truth (exact 3-gram Jaccard pairs) is quadratic-ish in the
    batch via posting lists, so it is the cost ceiling of the whole
    audit at corpus scale; here both tiers run over a DETERMINISTIC
    ~25% doc sample (md5(doc_id) hex mod 4 — reproducible across
    engines and runs, no RNG). A uniform doc sample keeps each PAIR
    with probability p^2 independently of whether the bands catch
    it, so the sampled precision/recall are unbiased estimates of
    the full-corpus values, at 1/16th the exact-tier cost at p=1/4
    (production tunes p down as the corpus grows; the audit's
    variance scales with 1/sqrt(sampled pairs), so p is chosen to
    keep a few thousand exact pairs in sample).

    Same TP/FP/FN/precision/recall schema as
    :func:`dedup_lsh_quality_audit`; both tiers AND the audit join
    are re-derived end-to-end by the DuckDB oracle on the same
    sample.

    Unbiasedness is GATED, not asserted (r13,
    tests/test_lsh_audit_sampling.py): both tiers are doc-local, so
    the sampled pair sets are exactly the full sets filtered to
    sampled endpoints (set equality pinned at sf0.01 AND sf0.1 —
    the property that makes retention Bernoulli(p^2) per pair), and
    the measured retention sits within 1 sigma of n_full x p_hat^2
    (sf0.1: 15 kept of 256 full pairs, expected 15.66 at
    p_hat=0.247; sf0.01: 1 of 25, expected 1.49), with the full
    precision/recall inside the sampled Wilson(z=4) intervals."""
    pred = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        ).cast("int")
        % _LQS_MOD
        == 0
    )
    docs = load_table(spark, sf_dir, "documents").where(pred)
    exact = D.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=_LQ_TAU
    ).select("id_a", "id_b")
    cand = D.minhash_lsh_pairs(
        docs,
        "doc_id",
        "text",
        num_hashes=32,
        bands=8,
        threshold=0.0,  # RAW candidates: audit judges the bands
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


# ========================================================================
# from analytics_extras53.py — original batch rationale:
# Analytics extras, batch 53: backfill planning, contribution
# analysis, funnel step latency, and Holm correction.
#
# The backfill planner is the one operator here with a DIRECT
# reference tie: `HiveToMysql.java:270-282` re-imports exactly one
# `ds=` partition per run and trusts the scheduler to know which —
# this query computes which (the gap manifest a scheduler iterates).
# The rest extend SURVEY.md §2.2:
#
# * contribution analysis — year-over-year revenue delta decomposed
#   by nation with share-of-change ranking (the "why did the metric
#   move" BI primitive), integer-cents exact.
# * funnel step latency — median/p90 time between funnel stages from
#   per-user first-touch timestamps.
# * Holm correction — step-down FWER control over the per-metric
#   Welch tests, sibling of `stats_benjamini_hochberg`'s FDR.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "incremental_backfill_planner",
    oracle="""
    WITH src AS (
      SELECT DISTINCT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1996-01-01'
    ),
    tgt AS (
      -- simulated target state: loads failed where md5(ds) % 13 = 0
      SELECT d FROM src
      WHERE ('0x' || substr(md5(strftime(d, '%Y%m%d')), 1, 8))::BIGINT
            % 13 <> 0
    ),
    missing AS (
      SELECT s.d FROM src s LEFT JOIN tgt t ON t.d = s.d
      WHERE t.d IS NULL
    ),
    grouped AS (
      SELECT d,
             d - INTERVAL (ROW_NUMBER() OVER (ORDER BY d)) DAY AS grp
      FROM missing
    )
    SELECT MIN(d) AS range_start,
           MAX(d) AS range_end,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM grouped GROUP BY grp
    """,
)
def incremental_backfill_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill manifest for a ds-partitioned target: compare the
    source's partition calendar against the target's loaded set
    (simulated here by an md5-deterministic failure pattern) and
    emit CONTIGUOUS missing ranges via gaps-and-islands (d minus
    row_number collapses consecutive days to one group). This is the
    planning step above the reference's per-`ds` delete-before-insert
    (`HiveToMysql.java:270-282` re-imports one partition and trusts
    the Tss scheduler to know which); with a manifest, a scheduler
    replays exactly the missing ranges — idempotently, thanks to the
    delete-before-insert sink this engine already provides
    (sinks/jdbc.py).

    Shape: partition calendars are O(days); the anti-join, the
    islands window, and the rollup all run on that reduced set."""
    o = load_table(spark, sf_dir, "orders")
    src = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .select(F.date_trunc("day", "o_orderdate").alias("d"))
        .distinct()
    )
    failed = (
        F.conv(
            F.substring(F.md5(F.date_format("d", "yyyyMMdd")), 1, 8), 16, 10
        ).cast("long")
        % 13
        == 0
    )
    tgt = src.where(~failed).select(F.col("d").alias("td"))
    missing = src.join(tgt, F.col("d") == F.col("td"), "left_anti")
    grp = F.date_sub(
        F.col("d").cast("date"), F.row_number().over(Window.orderBy("d"))
    )
    grouped = missing.select("d", grp.alias("grp"))
    return grouped.groupBy("grp").agg(
        F.min("d").alias("range_start"),
        F.max("d").alias("range_end"),
        F.count(F.lit(1)).alias("n_days"),
    ).drop("grp")


# ========================================================================
# from analytics_extras60.py — original batch rationale:
# Analytics extras, batch 60: SCD2 change application, the
# Mann-Kendall trend test, and bot-regularity screening.
#
# The SCD2 apply is the closest of these to the reference's world:
# `HiveToMysql.java` re-imports whole dimension partitions because it
# has no notion of history (`270-282` deletes and reloads); an SCD2
# dimension with incremental change application is what that pipeline
# grows into. The rest extend SURVEY.md §2.2:
#
# * Mann-Kendall — the nonparametric monotone-trend test (pairwise
#   sign statistic with tie correction) next to `stats_theil_sen`'s
#   slope and `stats_runs_test`'s randomness check.
# * bot screen — inter-event gap regularity per user (a near-zero
#   coefficient of variation is a metronome, not a human), the
#   abuse-detection primitive over the events stream.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_SCD2_EFF = "2024-01-01"



@register(
    "incremental_scd2_apply",
    oracle=f"""
    WITH affected AS (
      SELECT c_custkey, c_mktsegment
      FROM customer
      WHERE c_custkey % 11 = 0 AND c_custkey < 300
    ),
    closed AS (
      SELECT c_custkey,
             c_mktsegment AS segment,
             TIMESTAMP '1990-01-01' AS valid_from,
             TIMESTAMP '{_SCD2_EFF}' AS valid_to,
             FALSE AS is_current
      FROM affected
    ),
    opened AS (
      SELECT c_custkey,
             'MIGRATED' AS segment,
             TIMESTAMP '{_SCD2_EFF}' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to,
             TRUE AS is_current
      FROM affected
    )
    SELECT * FROM closed UNION ALL SELECT * FROM opened
    """,
)
def incremental_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC change batch to a Type-2 dimension: for each
    changed entity, CLOSE the current row (valid_to = effective
    date, is_current = false) and OPEN a new version — expressed as
    a union of the adjusted old rows and the new rows, the
    merge-free formulation that writes as one dynamic-partition
    overwrite of the affected keys. The change batch here is the
    deterministic 'every 11th customer migrates segment' so the
    oracle can replay it; a real feed plugs into the same shape (cf.
    `incremental_cdc_apply` for the last-writer-wins fact variant,
    `scd2_order_priority` for deriving intervals from history).
    The reference's answer to dimension change was delete-and-reload
    of the whole partition (HiveToMysql.java:270-282); this is the
    incremental answer with history preserved.

    Shape: the change batch joins the dimension on its key (both
    sides bucket on it at scale); everything else is projection."""
    c = load_table(spark, sf_dir, "customer")
    affected = c.where(
        (F.col("c_custkey") % 11 == 0) & (F.col("c_custkey") < 300)
    ).select("c_custkey", "c_mktsegment")
    eff = F.lit(_SCD2_EFF).cast("timestamp")
    closed = affected.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01").cast("timestamp").alias("valid_from"),
        eff.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = affected.select(
        "c_custkey",
        F.lit("MIGRATED").alias("segment"),
        eff.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionByName(opened)


# ========================================================================
# from analytics_extras74.py — original batch rationale:
# Analytics extras, batch 74: the corpus release gate.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); SURVEY.md §2.2 extension-tier entry:
#
# * release gate — the ship/no-ship checklist as ONE query: exact-dup
#   rate, held-out trigram novelty, language coverage,
#   documents<->embeddings integrity, and length sanity, each as a
#   (check, value, passed) row with its threshold. The pass/fail
#   capstone over `pipeline_dataset_card`'s descriptive table — what
#   a data-release review actually signs.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "pipeline_release_gate",
    oracle="""
    WITH dups AS (
      SELECT COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dup,
             COUNT(*) AS n FROM documents
    ),
    toks AS (
      SELECT doc_id, source, doc_id % 2 = 0 AS is_train,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    tris AS (
      SELECT is_train, array_to_string(w[i:i+2], ' ') AS g
      FROM toks, UNNEST(generate_series(1, greatest(len(w) - 2, 1))) AS t(i)
    ),
    novelty AS (
      SELECT SUM(CASE WHEN ts.g IS NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
               AS nov
      FROM (SELECT g FROM tris WHERE NOT is_train) e
      LEFT JOIN (SELECT DISTINCT g FROM tris WHERE is_train) ts
        ON ts.g = e.g
    ),
    langs AS (SELECT COUNT(DISTINCT lang) AS nl FROM documents),
    emb AS (
      SELECT SUM(CASE WHEN e.vec_id IS NULL THEN 1 ELSE 0 END) AS missing,
             SUM(CASE WHEN e.vec_id IS NOT NULL AND len(e.embedding) <> 64
                      THEN 1 ELSE 0 END) AS wrong_dim
      FROM documents d
      LEFT JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    lens AS (
      SELECT AVG(len(list_filter(
               regexp_split_to_array(lower(trim(text)), '\\s+'),
               x -> x <> ''))) AS mean_toks
      FROM documents
    )
    SELECT * FROM (
      SELECT 'exact_dup_rate' AS check_name,
             ROUND(n_dup * 1.0 / n, 6) AS value,
             n_dup * 1.0 / n < 0.25 AS passed
      FROM dups
      UNION ALL
      SELECT 'heldout_trigram_novelty', ROUND(nov, 6), nov > 0.1
      FROM novelty
      UNION ALL
      SELECT 'language_coverage', CAST(nl AS DOUBLE), nl >= 5 FROM langs
      UNION ALL
      SELECT 'docs_missing_embedding', CAST(missing AS DOUBLE), missing = 0
      FROM emb
      UNION ALL
      SELECT 'embeddings_wrong_dim', CAST(wrong_dim AS DOUBLE), wrong_dim = 0
      FROM emb
      UNION ALL
      SELECT 'mean_tokens_in_band', ROUND(mean_toks, 6),
             mean_toks BETWEEN 20 AND 500
      FROM lens
    )
    """,
)
def pipeline_release_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus release gate as one query: six (check, value,
    passed) rows — exact-duplicate rate under 25%, held-out trigram
    novelty above 10% (a corpus that only repeats itself teaches
    nothing), full language coverage, zero documents without
    embeddings, zero wrong-dimension vectors, mean document length
    in the trainable band. This is the pass/fail capstone over
    `pipeline_dataset_card`'s descriptive stats: the card describes,
    the gate DECIDES, and a release pipeline blocks on any false in
    the passed column. Each signal has a full-strength sibling in
    the registry (dedup tiers, novelty, embedding coverage audit);
    the gate runs their cheap forms in one pass so it can gate every
    ingest, not just quarterly reviews.

    Shape: three scans (documents twice — hash+tokens and lengths
    fold into one; embeddings once) reduced to scalars; the novelty
    join is trigram-hash sized."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    w = F.filter(
        F.split(F.trim(F.lower("text")), r"\s+"), lambda x: x != ""
    )
    base = d.select(
        "doc_id",
        "lang",
        F.md5("text").alias("h"),
        w.alias("w"),
        (F.col("doc_id") % 2 == 0).alias("is_train"),
    ).localCheckpoint(eager=False)
    dups = base.agg(
        (
            (F.count(F.lit(1)) - F.countDistinct("h"))
            * 1.0
            / F.count(F.lit(1))
        ).alias("dup_rate"),
        F.countDistinct("lang").alias("nl"),
        F.avg(F.size("w")).alias("mean_toks"),
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("w") - 2, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(F.col("w"), i, 3)),
    )
    tris = base.select("is_train", F.explode(grams).alias("g"))
    train_set = (
        tris.where("is_train").select("g").distinct().select(
            F.col("g").alias("tg")
        )
    )
    novelty = (
        tris.where(~F.col("is_train"))
        .join(F.broadcast(train_set), F.col("g") == F.col("tg"), "left")
        .agg(
            (
                F.sum(F.col("tg").isNull().cast("long"))
                * 1.0
                / F.count(F.lit(1))
            ).alias("nov")
        )
    )
    emb = (
        d.select("doc_id")
        .join(
            e.select("vec_id", F.size("embedding").alias("dim")),
            d["doc_id"] == e["vec_id"],
            "left",
        )
        .agg(
            F.sum(F.col("vec_id").isNull().cast("long")).alias("missing"),
            F.sum(
                (
                    F.col("vec_id").isNotNull() & (F.col("dim") != 64)
                ).cast("long")
            ).alias("wrong_dim"),
        )
    )
    j = dups.crossJoin(F.broadcast(novelty)).crossJoin(F.broadcast(emb))

    def row(name, value, passed):
        return j.select(
            F.lit(name).alias("check_name"),
            F.round(value, 6).cast("double").alias("value"),
            passed.alias("passed"),
        )

    return (
        row("exact_dup_rate", F.col("dup_rate"), F.col("dup_rate") < 0.25)
        .unionByName(
            row("heldout_trigram_novelty", F.col("nov"), F.col("nov") > 0.1)
        )
        .unionByName(
            row(
                "language_coverage",
                F.col("nl").cast("double"),
                F.col("nl") >= 5,
            )
        )
        .unionByName(
            row(
                "docs_missing_embedding",
                F.col("missing").cast("double"),
                F.col("missing") == 0,
            )
        )
        .unionByName(
            row(
                "embeddings_wrong_dim",
                F.col("wrong_dim").cast("double"),
                F.col("wrong_dim") == 0,
            )
        )
        .unionByName(
            row(
                "mean_tokens_in_band",
                F.col("mean_toks"),
                F.col("mean_toks").between(20, 500),
            )
        )
    )


# ========================================================================
# round-6 addition: length-bucketed batch shaping (padding efficiency)
# ========================================================================

_LB_BATCH = 32


@register(
    "sample_length_buckets",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             len(regexp_extract_all(trim(text), '[^ ]+')) AS n_tok
      FROM documents
    ),
    bucketed AS (
      SELECT doc_id, n_tok,
             CASE WHEN n_tok <= 16 THEN 16
                  WHEN n_tok <= 32 THEN 32
                  WHEN n_tok <= 64 THEN 64
                  WHEN n_tok <= 128 THEN 128
                  WHEN n_tok <= 256 THEN 256
                  ELSE 512 END AS bucket
      FROM toks
    ),
    gstats AS (
      SELECT MAX(n_tok) AS max_tok, SUM(n_tok) AS all_tok, COUNT(*) AS n
      FROM toks
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(CEIL(COUNT(*) * 1.0 / {_LB_BATCH}) AS BIGINT) AS n_batches,
           CAST(SUM(n_tok) AS BIGINT) AS real_tokens,
           CAST(COUNT(*) * bucket AS BIGINT) AS padded_tokens,
           ROUND(1.0 - SUM(n_tok) * 1.0 / (COUNT(*) * bucket), 4)
             AS waste_pct,
           ROUND(1.0 - gstats.all_tok * 1.0 / (gstats.n * gstats.max_tok), 4)
             AS unbucketed_waste_pct
    FROM bucketed CROSS JOIN gstats
    GROUP BY bucket, gstats.all_tok, gstats.n, gstats.max_tok
    """,
)
def sample_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch shaping: documents grouped into
    power-of-two token-length buckets (16..512, the standard
    sequence-length ladder), with per-bucket batch counts at batch
    size 32 and the padding-waste ratio — next to the waste the run
    would pay padding every batch to the global max. This is the
    accounting that justifies length-bucketed batching in a training
    pipeline: padded_tokens/real_tokens IS the wasted FLOP fraction.
    Bucket boundaries are an explicit CASE ladder, not float log2 —
    log2 of exact powers differs in the last bit across engines and
    would flip bucket edges.

    100 TB shape: one map-side bucketing expression + one
    map-side-combined groupBy on ≤ 6 bucket keys; the global scalar
    rides a broadcast cross join. Nothing data-sized shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
    )
    bucket = (
        F.when(F.col("n_tok") <= 16, 16)
        .when(F.col("n_tok") <= 32, 32)
        .when(F.col("n_tok") <= 64, 64)
        .when(F.col("n_tok") <= 128, 128)
        .when(F.col("n_tok") <= 256, 256)
        .otherwise(512)
    )
    glob = toks.agg(
        F.max("n_tok").alias("max_tok"),
        F.sum("n_tok").alias("all_tok"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        toks.withColumn("bucket", bucket)
        .crossJoin(F.broadcast(glob))
        .groupBy("bucket", "all_tok", "n", "max_tok")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("real_tok"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.ceil(F.col("n_docs") * 1.0 / _LB_BATCH)
            .cast("long")
            .alias("n_batches"),
            F.col("real_tok").cast("long").alias("real_tokens"),
            (F.col("n_docs") * F.col("bucket")).cast("long").alias("padded_tokens"),
            F.round(
                1.0 - F.col("real_tok") * 1.0 / (F.col("n_docs") * F.col("bucket")),
                4,
            ).alias("waste_pct"),
            F.round(
                1.0 - F.col("all_tok") * 1.0 / (F.col("n") * F.col("max_tok")), 4
            ).alias("unbucketed_waste_pct"),
        )
    )


# ========================================================================
# round-6 addition: URL canonicalization (web-corpus curation)
# ========================================================================


@register(
    "corpus_url_canonicalize",
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             'https://Sub' || (doc_id % 7) || '.Example' || (doc_id % 13)
             || '.COM/path/' || (doc_id % 50) || '?utm_source=feed&id='
             || doc_id || '&utm_campaign=x#frag' || doc_id AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             lower(regexp_extract(url, '^https?://([^/]+)', 1)) AS host,
             regexp_extract(url, '^https?://[^/]+([^?#]*)', 1) AS path,
             regexp_replace(regexp_replace(
               regexp_extract(url, '\\?([^#]*)', 1),
               '(^|&)utm_[^&]*', '', 'g'), '^&+', '') AS clean_query
      FROM seeded
    )
    SELECT regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT host || path ||
                      CASE WHEN clean_query = '' THEN ''
                           ELSE '?' || clean_query END) AS BIGINT)
             AS n_canonical,
           CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths
    FROM canon
    GROUP BY 1
    """,
)
def corpus_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the normalization every web-corpus
    pipeline runs BEFORE content dedup (CommonCrawl-derived sets
    dedup by canonical URL first; it is orders of magnitude cheaper
    than text comparison): lowercase the host, drop the fragment,
    strip utm_* tracking parameters, then count canonical URLs per
    registered domain. The fixture corpus carries no URLs, so
    deterministic doc_id-derived URLs (mixed case, tracking params,
    fragments — the messy shapes crawlers actually see) are seeded
    in-query identically in both engines; the oracle therefore
    value-checks the canonicalization rules themselves.

    100 TB shape: pure map-side regex canonicalization in whole-stage
    codegen, one map-side-combined groupBy on the domain key. The
    distinct-counts shuffle 8-byte-hashable canonical strings, never
    page bodies."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://Sub"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example"),
        (F.col("doc_id") % 13).cast("string"),
        F.lit(".COM/path/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("?utm_source=feed&id="),
        F.col("doc_id").cast("string"),
        F.lit("&utm_campaign=x#frag"),
        F.col("doc_id").cast("string"),
    )
    seeded = docs.select("doc_id", url.alias("url"))
    canon = seeded.select(
        "doc_id",
        F.lower(F.regexp_extract("url", r"^https?://([^/]+)", 1)).alias("host"),
        F.regexp_extract("url", r"^https?://[^/]+([^?#]*)", 1).alias("path"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_extract("url", r"\?([^#]*)", 1),
                F.lit(r"(^|&)utm_[^&]*"),
                F.lit(""),
            ),
            F.lit(r"^&+"),
            F.lit(""),
        ).alias("clean_query"),
    )
    canonical = F.concat(
        F.col("host"),
        F.col("path"),
        F.when(F.col("clean_query") == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), F.col("clean_query"))
        ),
    )
    return (
        canon.select(
            F.regexp_extract("host", r"([^.]+\.[^.]+)$", 1).alias("domain"),
            canonical.alias("canonical"),
            "path",
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("canonical").alias("n_canonical"),
            F.countDistinct("path").alias("n_paths"),
        )
    )
