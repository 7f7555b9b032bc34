"""Analytics extras, batch 19: classifier evaluation, promo lift,
supplier concentration, and character entropy.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's evaluation / business-analytics /
text tiers:

* langid confusion — declared-vs-predicted label matrix + accuracy
  for the text_langid classifier (models need scoreboards, not just
  predictions);
* promo-day lift — first-of-month revenue vs same-day-of-week
  baseline, the seasonally-controlled lift read;
* supplier HHI — Herfindahl-Hirschman concentration of supplier
  revenue within each brand, the supply-chain-risk index;
* char entropy — per-document character-distribution entropy, the
  cheapest corrupted/low-quality-text screen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.queries.llm import _langid_oracle
from hivetomysql_spark.operators import text as T
from hivetomysql_spark.tables import load_table


@register(
    "text_langid_confusion",
    oracle=f"""
    WITH pred AS ({_langid_oracle()})
    SELECT lang_declared,
           lang_predicted,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (), 4) AS share
    FROM pred
    GROUP BY lang_declared, lang_predicted
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix for the function-word language classifier:
    declared label (the documents.lang column) against text_langid's
    prediction, with each cell's corpus share — the scoreboard that
    turns a classifier stage into a measurable one (per-language
    recall falls out of the rows; the diagonal mass is accuracy).

    Shape: reuses the langid projection (one scan, JVM-side
    filter/size votes) and rolls up to an O(langs^2) matrix."""
    docs = load_table(spark, sf_dir, "documents")
    pred = T.language_id(docs, "doc_id", "text")
    cells = pred.groupBy("lang_declared", "lang_predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_all = Window.partitionBy()
    return cells.select(
        "lang_declared",
        "lang_predicted",
        F.col("n").cast("long").alias("n_docs"),
        F.round(F.col("n") / F.sum("n").over(w_all), 4).alias("share"),
    )


@register(
    "promo_day_lift",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    flagged AS (
      SELECT d, rev,
             ISODOW(d) AS dow,
             CASE WHEN EXTRACT(day FROM d) = 1 THEN 1 ELSE 0 END AS promo
      FROM daily
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(SUM(promo) AS BIGINT) AS n_promo_days,
           ROUND(AVG(CASE WHEN promo = 1 THEN rev END), 2) AS promo_avg,
           ROUND(AVG(CASE WHEN promo = 0 THEN rev END), 2) AS baseline_avg,
           ROUND(AVG(CASE WHEN promo = 1 THEN rev END)
                 / AVG(CASE WHEN promo = 0 THEN rev END) - 1.0, 4) AS lift
    FROM flagged GROUP BY dow
    """,
)
def promo_day_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo-day lift with seasonal control: first-of-month revenue
    (the stand-in promo calendar) against the same-day-of-week
    non-promo baseline — comparing Mondays to Mondays, so weekly
    seasonality cannot masquerade as lift. The honest version of
    'the promo made +X%', one step before a proper diff-in-diff.

    Shape: N orders compress to O(days) in one pass; everything after
    is a conditional aggregate over the compressed series."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    flagged = daily.select(
        (F.weekday("d") + 1).alias("dow"),
        "rev",
        F.when(F.dayofmonth("d") == 1, 1).otherwise(0).alias("promo"),
    )
    promo_avg = F.avg(F.when(F.col("promo") == 1, F.col("rev")))
    base_avg = F.avg(F.when(F.col("promo") == 0, F.col("rev")))
    return flagged.groupBy("dow").agg(
        F.sum("promo").cast("long").alias("n_promo_days"),
        F.round(promo_avg, 2).alias("promo_avg"),
        F.round(base_avg, 2).alias("baseline_avg"),
        F.round(promo_avg / base_avg - 1.0, 4).alias("lift"),
    ).select(F.col("dow").cast("long").alias("dow"), "n_promo_days", "promo_avg", "baseline_avg", "lift")


@register(
    "supply_chain_hhi",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand AS brand, l.l_suppkey,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS r
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT brand, SUM(r) AS t, COUNT(*) AS n_suppliers FROM rev GROUP BY brand
    )
    SELECT rev.brand,
           CAST(MIN(tot.n_suppliers) AS BIGINT) AS n_suppliers,
           ROUND(SUM((rev.r / tot.t) * (rev.r / tot.t)) * 10000, 1) AS hhi,
           ROUND(MAX(rev.r / tot.t), 4) AS top_supplier_share
    FROM rev JOIN tot ON tot.brand = rev.brand
    GROUP BY rev.brand
    """,
)
def supply_chain_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per brand: the Herfindahl-Hirschman
    index (sum of squared revenue shares x 10000 — the antitrust
    scale where >2500 is 'highly concentrated') plus the single
    largest supplier's share — the supply-chain-risk screen that
    flags brands one supplier outage would take down.

    Shape: one fact-scan aggregate to (brand, supplier) revenue
    (part is broadcast), one O(pairs) rollup; shares come from a
    broadcast-joined totals table, not a window over the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("p_brand").alias("brand"), "l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"))
    )
    tot = rev.groupBy("brand").agg(
        F.sum("r").alias("t"), F.count(F.lit(1)).alias("n_suppliers")
    )
    j = rev.join(F.broadcast(tot), "brand")
    share = F.col("r") / F.col("t")
    return j.groupBy("brand").agg(
        F.min("n_suppliers").cast("long").alias("n_suppliers"),
        F.round(F.sum(share * share) * 10000, 1).alias("hhi"),
        F.round(F.max(share), 4).alias("top_supplier_share"),
    )


@register(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, substr(text, i, 1) AS ch
      FROM documents, UNNEST(range(1, length(text) + 1)) t(i)
    ),
    freq AS (
      SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
    ),
    tot AS (
      SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_distinct
      FROM freq GROUP BY doc_id
    )
    SELECT f.doc_id,
           CAST(MIN(t.n) AS BIGINT) AS n_chars,
           CAST(MIN(t.n_distinct) AS BIGINT) AS n_distinct_chars,
           ROUND(-SUM((f.c * 1.0 / t.n) * ln(f.c * 1.0 / t.n)), 4)
             AS char_entropy_nats
    FROM freq f JOIN tot t ON t.doc_id = f.doc_id
    GROUP BY f.doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document — the
    cheapest corrupted-text screen: binary junk decoded as text shows
    near-uniform bytes (high entropy), template/repeated filler shows
    abnormally low entropy, and natural language sits in a tight band
    in between. Pairs with text_compression_quality (which estimates
    the same signal via compressibility, rows-only) as the oracled
    member of the family.

    Shape: explode to characters, two grouped passes — the
    (doc, char) key space is bounded by docs x alphabet."""
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
        "text",
    ).select("doc_id", F.expr("substring(text, i, 1)").alias("ch"))
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_distinct")
    )
    j = freq.join(tot, "doc_id")
    p = F.col("c") / F.col("n")
    return j.groupBy("doc_id").agg(
        F.min("n").cast("long").alias("n_chars"),
        F.min("n_distinct").cast("long").alias("n_distinct_chars"),
        F.round(-F.sum(p * F.log(p)), 4).alias("char_entropy_nats"),
    )
