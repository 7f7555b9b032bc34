"""Analytics extras, batch 20: new-vs-returning revenue and Heaps'
law vocabulary growth.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); closes out SURVEY.md §2.2's business-analytics / corpus-
statistics tiers for this round:

* revenue split — monthly revenue decomposed into new-customer vs
  returning-customer money, the acquisition-vs-retention P&L view;
* Heaps' law — vocabulary growth V(n) ~ K n^beta fitted by log-log
  OLS over token-stream checkpoints, the corpus-scaling diagnostic
  that predicts vocabulary (and tokenizer) size at 100x the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "revenue_new_vs_returning",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(CAST(date_trunc('month', CAST(o_orderdate AS DATE))
                      AS TIMESTAMP)) AS first_m
      FROM orders GROUP BY o_custkey
    ),
    tagged AS (
      SELECT CAST(date_trunc('month', CAST(o.o_orderdate AS DATE))
                  AS TIMESTAMP) AS m,
             CASE WHEN CAST(date_trunc('month', CAST(o.o_orderdate AS DATE))
                           AS TIMESTAMP) = f.first_m
                  THEN 1 ELSE 0 END AS is_new,
             o.o_totalprice AS rev
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    )
    SELECT m AS month,
           ROUND(SUM(CASE WHEN is_new = 1 THEN rev ELSE 0 END), 2)
             AS new_revenue,
           ROUND(SUM(CASE WHEN is_new = 0 THEN rev ELSE 0 END), 2)
             AS returning_revenue,
           ROUND(SUM(CASE WHEN is_new = 1 THEN rev ELSE 0 END)
                 / SUM(rev), 4) AS new_share
    FROM tagged GROUP BY m
    """,
)
def revenue_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split into new-customer money (orders in the
    customer's first-ever month) vs returning-customer money — the
    acquisition-vs-retention decomposition behind 'is growth new
    logos or expansion'. A falling new_share with flat totals means
    the base is compounding; the reverse means a leaky bucket.

    Shape: one groupBy for first months, re-joined on custkey (the
    bucketing-friendly fact-to-aggregate join), one monthly rollup."""
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.to_date("o_orderdate"))
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.to_date("o_orderdate"))).alias("first_m")
    )
    tagged = o.join(firsts, "o_custkey").select(
        month.alias("m"),
        F.when(month == F.col("first_m"), 1).otherwise(0).alias("is_new"),
        F.col("o_totalprice").alias("rev"),
    )
    new_rev = F.sum(F.when(F.col("is_new") == 1, F.col("rev")).otherwise(0.0))
    ret_rev = F.sum(F.when(F.col("is_new") == 0, F.col("rev")).otherwise(0.0))
    return tagged.groupBy(F.col("m").alias("month")).agg(
        F.round(new_rev, 2).alias("new_revenue"),
        F.round(ret_rev, 2).alias("returning_revenue"),
        F.round(new_rev / F.sum("rev"), 4).alias("new_share"),
    )


_HEAPS_CHECKPOINTS = 10


@register(
    "text_heaps_law",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    toks AS (
      SELECT doc_id, i, l[i] AS tok
      FROM raw, UNNEST(range(1, len(l) + 1)) t(i)
    ),
    ordered AS (
      SELECT tok,
             ROW_NUMBER() OVER (ORDER BY doc_id, i) AS pos
      FROM toks
    ),
    firsts AS (
      SELECT tok, MIN(pos) AS first_pos FROM ordered GROUP BY tok
    ),
    n_total AS (SELECT MAX(pos) AS n FROM ordered),
    cps AS (
      SELECT CAST(FLOOR(n_total.n * k / {_HEAPS_CHECKPOINTS}.0) AS BIGINT)
               AS cp
      FROM n_total, UNNEST(range(1, {_HEAPS_CHECKPOINTS} + 1)) t(k)
    ),
    curve AS (
      SELECT cps.cp AS n_tokens,
             (SELECT COUNT(*) FROM firsts WHERE firsts.first_pos <= cps.cp)
               AS vocab
      FROM cps
    ),
    fit AS (
      SELECT COUNT(*) AS k,
             AVG(ln(n_tokens * 1.0)) AS mx,
             AVG(ln(vocab * 1.0)) AS my,
             COVAR_SAMP(ln(n_tokens * 1.0), ln(vocab * 1.0)) AS cxy,
             VAR_SAMP(ln(n_tokens * 1.0)) AS vx
      FROM curve
    )
    SELECT CAST((SELECT MAX(n_tokens) FROM curve) AS BIGINT) AS n_tokens,
           CAST((SELECT MAX(vocab) FROM curve) AS BIGINT) AS vocab_size,
           ROUND(cxy / vx, 4) AS heaps_beta,
           ROUND(exp(my - (cxy / vx) * mx), 2) AS heaps_k
    FROM fit
    """,
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law fit: vocabulary size grows as V(n) ~ K n^beta with
    the token stream; beta and K come from log-log OLS over 10
    equally-spaced checkpoints of the cumulative vocabulary curve.
    The number that predicts tokenizer/vocab growth at 100x the
    corpus (natural language sits near beta ~ 0.5; beta near 1 means
    unbounded junk vocabulary — an ingest red flag).

    Shape: the cumulative-distinct curve needs NO running distinct —
    each token type contributes at its FIRST stream position (one
    groupBy), and the checkpoint curve is 10 bounded count-filters
    over the O(vocab) firsts table; the OLS is closed-form on 10
    points. The only wide op is the position ROW_NUMBER, which at
    100 TB becomes the two-level partition-offset rank (rank within
    partition + broadcast prefix offsets)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), "[^a-z]+")).alias("i", "tok"),
    ).where(F.col("tok") != "")
    ordered = toks.select(
        "tok",
        F.row_number().over(Window.orderBy("doc_id", "i")).alias("pos"),
    )
    firsts = ordered.groupBy("tok").agg(F.min("pos").alias("first_pos"))
    n_total = ordered.agg(F.max("pos").alias("n")).collect()[0]["n"]
    cps = [
        int(n_total * k / _HEAPS_CHECKPOINTS)
        for k in range(1, _HEAPS_CHECKPOINTS + 1)
    ]
    curve = firsts.agg(
        *[
            F.sum(F.when(F.col("first_pos") <= cp, 1).otherwise(0)).alias(
                f"v{j}"
            )
            for j, cp in enumerate(cps)
        ]
    ).collect()[0]
    pts = [(float(cp), float(curve[f"v{j}"])) for j, cp in enumerate(cps)]
    import math

    k = len(pts)
    mx = sum(math.log(x) for x, _ in pts) / k
    my = sum(math.log(v) for _, v in pts) / k
    cxy = sum(
        (math.log(x) - mx) * (math.log(v) - my) for x, v in pts
    ) / (k - 1)
    vx = sum((math.log(x) - mx) ** 2 for x, _ in pts) / (k - 1)
    beta = cxy / vx
    kk = math.exp(my - beta * mx)
    return spark.range(1).select(
        F.lit(int(pts[-1][0])).cast("long").alias("n_tokens"),
        F.lit(int(pts[-1][1])).cast("long").alias("vocab_size"),
        F.round(F.lit(beta), 4).alias("heaps_beta"),
        F.round(F.lit(kk), 2).alias("heaps_k"),
    )
