"""Analytics extras, batch 17: SQL UDFs, parameterized dynamic SQL,
and boilerplate detection.

Not in the reference (`HiveToMysql.java:1-641` generates only static
`SELECT *` / `DELETE` / `INSERT` text); extends SURVEY.md §2.2's
function-surface / corpus-curation tiers with Spark 4 SQL-language
features and a C4-style cleaning pass:

* SQL UDF — CREATE TEMPORARY FUNCTION ... RETURN <expr> (Spark 4
  SQL-defined scalar functions: named, reusable, and still fully
  Catalyst-optimized — they inline into the plan, unlike Python
  UDFs);
* EXECUTE IMMEDIATE — parameterized dynamic SQL, the safe
  string-free version of the reference's hand-assembled statements;
* boilerplate ratio — cross-document frequent-shingle share per doc
  (the template/ToS-removal signal in web-corpus cleaning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table
from hivetomysql_spark.tables import register_views


@register(
    "func_sql_udf",
    oracle="""
    WITH t AS (
      SELECT o_orderstatus,
             SUM(o_totalprice) AS s,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus
    ),
    tot AS (SELECT SUM(s) AS total FROM t)
    SELECT o_orderstatus,
           ROUND(s / tot.total, 4) AS revenue_share,
           ROUND(s / n, 2) AS avg_order_value
    FROM t CROSS JOIN tot
    """,
)
def func_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-defined scalar functions: CREATE TEMPORARY
    FUNCTION ... RETURN <expression> registers a named, reusable
    function whose body INLINES into the Catalyst plan — zero
    serialization boundary, full codegen, unlike any Python UDF. Here
    `share(x, total)` and `avg_value(s, n)` wrap the ratio idioms and
    are applied over a grouped orders rollup.

    The reference's only 'functions' are Java string-assembly helpers
    (HiveToMysql.java:470-508); this is the engine-native
    replacement: named SQL abstractions with optimizer-visible
    bodies."""
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION share(x DOUBLE, total DOUBLE) "
        "RETURNS DOUBLE RETURN x / total"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION avg_value(s DOUBLE, n BIGINT) "
        "RETURNS DOUBLE RETURN s / n"
    )
    return spark.sql(
        """
        WITH t AS (
          SELECT o_orderstatus, SUM(o_totalprice) AS s, COUNT(*) AS n
          FROM orders GROUP BY o_orderstatus
        ),
        tot AS (SELECT SUM(s) AS total FROM t)
        SELECT o_orderstatus,
               ROUND(share(s, tot.total), 4) AS revenue_share,
               ROUND(avg_value(s, n), 2) AS avg_order_value
        FROM t CROSS JOIN tot
        """
    )


@register(
    "sql_parameterized_exec",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_totalprice > 50000 AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized dynamic SQL via Spark 4 EXECUTE IMMEDIATE with
    named markers — the injection-proof replacement for the
    reference's string-concatenated statements (HiveToMysql.java
    builds DELETE/INSERT text by hand and hand-picks quote wrappers
    at 470-508 to dodge injection; parameter binding makes that whole
    class of code obsolete). The statement text is fixed; only typed
    parameters vary.

    Shape: after binding, the plan is identical to the static query —
    parameterization is a front-end concern, invisible to Catalyst."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority,
                  CAST(COUNT(*) AS BIGINT) AS n_orders,
                  ROUND(SUM(o_totalprice), 2) AS revenue
           FROM orders
           WHERE o_totalprice > :min_price AND o_orderstatus = :status
           GROUP BY o_orderpriority'
          USING 50000 AS min_price, 'F' AS status
        """
    )


_BP_SHINGLE = 5
_BP_MIN_DOCS = 3


@register(
    "text_boilerplate_ratio",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id,
             regexp_split_to_array(lower(text), '[^a-z]+') AS l
      FROM documents
    ),
    idx AS (
      SELECT doc_id, i, l[i] AS tok
      FROM raw, UNNEST(range(1, len(l) + 1)) t(i)
    ),
    toks AS (
      SELECT doc_id, tok,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS pos
      FROM idx WHERE tok <> ''
    ),
    sh AS (
      SELECT a.doc_id, a.pos,
             a.tok || ' ' || b.tok || ' ' || c.tok || ' ' || d.tok || ' '
               || e.tok AS shingle
      FROM toks a
      JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
      JOIN toks d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
      JOIN toks e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4
    ),
    df AS (
      SELECT shingle, COUNT(DISTINCT doc_id) AS n_docs
      FROM sh GROUP BY shingle
    ),
    flagged AS (
      SELECT s.doc_id,
             COUNT(*) AS n_shingles,
             SUM(CASE WHEN df.n_docs >= {_BP_MIN_DOCS} THEN 1 ELSE 0 END)
               AS n_boiler
      FROM sh s JOIN df ON df.shingle = s.shingle
      GROUP BY s.doc_id
    )
    SELECT doc_id,
           CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_boiler AS BIGINT) AS n_boilerplate,
           ROUND(n_boiler * 1.0 / n_shingles, 4) AS boilerplate_ratio
    FROM flagged
    """,
)
def text_boilerplate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate share per document: 5-token shingles that
    appear in >= 3 distinct documents are boilerplate (navigation,
    ToS, generated templates — the stuff C4-style cleaning strips
    before training), and each doc reports what fraction of its
    shingles is boilerplate. Complements dedup (whole/near-document)
    and span dedup (within-corpus repeats) with the
    cross-document-frequent-PHRASE signal.

    Shape: shingles form in a per-doc window (no join needed on the
    Spark side — the SQL oracle's self-joins are the declarative
    equivalent); document frequency is one grouped count; the
    per-doc rollup joins doc shingles to the df table on the shingle
    hash. At 100 TB hash the shingle (xxhash64) before the df
    groupBy so the shuffle carries 8 bytes, not strings."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), "[^a-z]+")).alias("i", "tok"),
    ).where(F.col("tok") != "")
    w = Window.partitionBy("doc_id").orderBy("i")
    sh = (
        toks.select(
            "doc_id",
            F.concat_ws(
                " ",
                "tok",
                F.lead("tok", 1).over(w),
                F.lead("tok", 2).over(w),
                F.lead("tok", 3).over(w),
                F.lead("tok", 4).over(w),
            ).alias("shingle"),
            F.lead("tok", 4).over(w).alias("last_tok"),
        )
        .where(F.col("last_tok").isNotNull())
        .drop("last_tok")
    )
    df_tab = sh.groupBy("shingle").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    flagged = sh.join(df_tab, "shingle").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(
            F.when(F.col("n_docs") >= _BP_MIN_DOCS, 1).otherwise(0)
        ).alias("n_boiler"),
    )
    return flagged.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_boiler").cast("long").alias("n_boilerplate"),
        F.round(F.col("n_boiler") / F.col("n_shingles"), 4).alias(
            "boilerplate_ratio"
        ),
    )
