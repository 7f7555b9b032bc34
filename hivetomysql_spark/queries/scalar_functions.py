"""Scalar-function surface (SURVEY.md §2.2 "Scalar functions").

The reference's only scalar computation is date formatting and quote
wrapping (HiveToMysql.java:115,182,470-508); this module demonstrates
the full built-in function families — string / date / math / JSON /
array / conditional — all JVM-side expressions inside whole-stage
codegen (no Python in the row path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "func_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                          AS name_upper,
           CAST(LENGTH(p_name) AS INT)            AS name_len,
           SUBSTR(p_name, 1, 4)                   AS name_prefix,
           CONCAT_WS('-', p_brand, p_type)        AS brand_type,
           STRING_SPLIT(p_name, ' ')[1]           AS first_word,
           REPLACE(p_name, ' ', '_')              AS name_snake,
           REGEXP_EXTRACT(p_brand, '#([0-9]+)', 1) AS brand_num,
           CAST(LEVENSHTEIN(p_type, 'PROMO') AS INT) AS dist_promo,
           TRIM('  ' || p_type || ' ')            AS type_trim
    FROM part
    """,
)
def func_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, length, substring, concat_ws, split,
    replace, regexp_extract, levenshtein, trim."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.levenshtein(F.col("p_type"), F.lit("PROMO")).alias("dist_promo"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trim"),
    )


@register(
    "func_date",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year  FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           CAST(EXTRACT(day   FROM o_orderdate) AS INT) AS order_day,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since_95,
           STRFTIME(o_orderdate, '%Y%m%d')              AS ds
    FROM orders
    WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    """,
)
def func_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family: extract, trunc, add, diff, format — includes the
    reference's ds-formatting idiom (yyyyMMdd,
    HiveToMysql.java:110-115) as date_format."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    ).select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("timestamp")
        .alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_95"
        ),
        F.date_format("o_orderdate", "yyyyMMdd").alias("ds"),
    )


@register(
    "func_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_discount - 0.05), 4)                    AS abs_disc,
           CAST(CEIL(l_quantity) AS BIGINT)                    AS qty_ceil,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT)       AS price_k,
           ROUND(SQRT(l_quantity), 6)                          AS qty_sqrt,
           ROUND(LN(l_extendedprice + 1), 6)                   AS price_ln,
           ROUND(POW(1 + l_tax, 2), 6)                         AS tax_sq,
           CAST(l_partkey % 7 AS BIGINT)                       AS part_mod
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs, ceil, floor, sqrt, ln, pow, modulo."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("abs_disc"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(F.lit(1) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_partkey") % 7).alias("part_mod"),
    )


@register(
    "func_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def func_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column
    (get_json_object — the semi-structured path a training-data
    pipeline uses for metadata columns)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "func_array",
    oracle="""
    SELECT vec_id, label,
           CAST(LEN(embedding) AS INT) AS dim,
           ROUND(LIST_SUM(LIST_TRANSFORM(embedding::DOUBLE[], x -> x * x)), 6) AS sq_norm,
           ROUND(LIST_MAX(embedding::DOUBLE[]), 6) AS max_elem
    FROM embeddings
    """,
)
def func_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/lambda family over the embedding vectors: size,
    transform+aggregate (squared L2 norm), array_max — all JVM
    higher-order functions, no UDF."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    sq_norm = F.aggregate(
        dbl, F.lit(0.0), lambda acc, x: acc + x * x
    )
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(sq_norm, 6).alias("sq_norm"),
        F.round(F.array_max(dbl), 6).alias("max_elem"),
    )


@register(
    "func_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS size_class,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open?') AS status_decoded,
           GREATEST(o_totalprice, 50000.0) AS floored_price,
           LEAST(CAST(EXTRACT(year FROM o_orderdate) AS INT), 1999) AS capped_year
    FROM orders
    """,
)
def func_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE WHEN, coalesce, nullif, greatest,
    least."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open?")
        ).alias("status_decoded"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("floored_price"),
        F.least(F.year("o_orderdate"), F.lit(1999)).alias("capped_year"),
    )


@register(
    "func_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255                    AS low_byte,
           o_orderkey | 4096                   AS with_flag,
           xor(o_orderkey, o_custkey)          AS key_xor,
           o_orderkey << 2                     AS shifted_l,
           o_orderkey >> 3                     AS shifted_r,
           CAST(bit_count(o_orderkey) AS INT)  AS popcount
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def func_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator family (mask/flag/xor/shift/popcount) — all
    JVM codegen expressions; the bread and butter of hash-partitioner
    and bitmap-index style derivations."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "func_sequence_explode",
    oracle="""
    SELECT CAST(d.day AS TIMESTAMP) AS day, COUNT(*) AS open_orders
    FROM (
      SELECT UNNEST(generate_series(CAST(o_orderdate AS DATE),
                                    CAST(o_orderdate AS DATE) + 3,
                                    INTERVAL 1 DAY)) AS day
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-06-01'
        AND o_orderdate <  TIMESTAMP '2000-06-08'
    ) d
    GROUP BY CAST(d.day AS TIMESTAMP)
    """,
)
def func_sequence_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval densification via sequence()+explode: each order in
    one week expands to its 4-day processing window; counting per day
    yields concurrent-open-orders. The generator runs inside the scan
    stage (no shuffle until the final small agg) and the date filter
    is pushed to parquet — the fan-out never leaves the executor."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-06-08").cast("timestamp"))
    )
    start = F.to_date("o_orderdate")
    days = F.sequence(start, F.date_add(start, 3))
    return (
        o.select(F.explode(days).alias("day0"))
        .select(F.col("day0").cast("timestamp").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("open_orders"))
    )


@register(
    "func_array_setops",
    oracle="""
    SELECT doc_id,
           list_sort(list_filter(list_distinct(toks),
                                 x -> list_contains(['join','hash','scan','filter'], x)))
             AS kw_present,
           list_sort(list_filter(list_distinct(toks),
                                 x -> NOT list_contains(['join','hash','scan','filter'], x)))
             AS kw_absent,
           CAST(LEN(list_distinct(list_concat(toks, ['join','hash','scan','filter'])))
                AS INT) AS n_union
    FROM (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents WHERE doc_id < 15
    ) d
    """,
)
def func_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (intersect/except/union) between each
    document's token set and a keyword list — sorted so results are
    set-deterministic. All JVM array expressions inside the scan
    stage; the keyword operand is a literal (no join)."""
    kw = F.array(*[F.lit(x) for x in ["join", "hash", "scan", "filter"]])
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 15)
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    d = docs.select("doc_id", toks.alias("toks"))
    return d.select(
        "doc_id",
        F.array_sort(F.array_intersect("toks", kw)).alias("kw_present"),
        F.array_sort(F.array_except("toks", kw)).alias("kw_absent"),
        F.size(F.array_union("toks", kw)).alias("n_union"),
    )


@register(
    "func_timezone",
    oracle="""
    SELECT event_id,
           timezone('America/Los_Angeles', ts::TIMESTAMPTZ) AS la_wall,
           timezone('Asia/Shanghai', ts::TIMESTAMPTZ) AS sh_wall,
           CAST(EXTRACT(HOUR FROM timezone('America/Los_Angeles',
                                           ts::TIMESTAMPTZ)) AS INT)
             AS la_hour
    FROM events
    WHERE event_id < 300
    """,
)
def func_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion: UTC instants to LA / Shanghai wall-clock
    time (DST-correct — verified across the 2024-03-10 US transition
    against DuckDB's tz database). Pure JVM expressions; the session
    timezone stays UTC and conversions are explicit per-expression,
    which is the only sane policy on a cluster (executors must never
    consult machine-local timezones)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 300)
    la = F.from_utc_timestamp("ts", "America/Los_Angeles")
    return ev.select(
        "event_id",
        la.alias("la_wall"),
        F.from_utc_timestamp("ts", "Asia/Shanghai").alias("sh_wall"),
        F.hour(la).alias("la_hour"),
    )


@register(
    "func_array_predicates",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents WHERE doc_id < 40
    )
    SELECT doc_id,
           list_contains(toks, 'join') AS mentions_join,
           LEN(list_filter(toks, t -> LEN(t) <= 2)) = 0 AS all_longish,
           CAST(COALESCE(list_position(toks, 'hash'), 0) AS BIGINT)
             AS hash_pos,
           CAST(LEN(list_filter(toks, t -> t LIKE 's%')) AS INT) AS n_s_words,
           CAST(LEN(list_distinct(toks)) AS INT) AS n_unique
    FROM d
    """,
)
def func_array_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array predicates: exists / forall / position /
    filter-count / distinct-count over token arrays — the lambda
    family every array-typed schema needs. All JVM expressions in the
    scan stage (higher-order lambdas run interpreted, not codegen —
    fine off the hot path; for per-row hot loops prefer explode+
    relational forms, see dedup_ngram_jaccard)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    d = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("toks")
    )
    return d.select(
        "doc_id",
        F.exists("toks", lambda t: t == "join").alias("mentions_join"),
        F.forall("toks", lambda t: F.length(t) > 2).alias("all_longish"),
        F.array_position("toks", "hash").alias("hash_pos"),
        F.size(F.filter("toks", lambda t: t.startswith("s"))).alias(
            "n_s_words"
        ),
        F.size(F.array_distinct("toks")).alias("n_unique"),
    )


@register(
    "udtf_top_tokens",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents WHERE doc_id < 30
    ),
    cnt AS (
      SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY doc_id, term
    ),
    r AS (
      SELECT doc_id, term, c,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY c DESC, term) AS rn
      FROM cnt
    )
    SELECT doc_id, term AS token, CAST(c AS INT) AS cnt
    FROM r WHERE rn <= 3
    """,
)
def udtf_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined table function) applied as a
    correlated LATERAL: each document row fans out to its top-3
    tokens by (count desc, token asc).

    The UDTF runs row-local in the scan stage — no shuffle at all,
    versus the explode→groupBy→window formulation (the oracle) which
    shuffles the full token stream. That trade is right when the
    per-row state fits memory (a Counter over one document); the
    relational form wins when per-group data exceeds a row. This is
    the documented policy exception: Python in the row path is
    acceptable only Arrow-batched or, as here, for logic that
    REMOVES a shuffle.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, cnt int")
    class TopTokens:
        def eval(self, text: str, k: int):
            from collections import Counter

            counts = Counter((text or "").strip().lower().split())
            for tok, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
                :k
            ]:
                yield tok, c

    spark.udtf.register("top_tokens", TopTokens)
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 30)
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.cnt
        FROM {docs} d, LATERAL top_tokens(d.text, 3) t
        """,
        docs=docs,
    )


@register(
    "sql_scripting_search",
    oracle="""
    WITH RECURSIVE walk(k, thr, n) AS (
      SELECT 0, CAST(50000.0 AS DOUBLE),
             (SELECT COUNT(*) FROM orders WHERE o_totalprice > 50000.0)
      UNION ALL
      SELECT k + 1, CAST(thr * 2 AS DOUBLE),
             (SELECT COUNT(*) FROM orders o WHERE o.o_totalprice > w.thr * 2)
      FROM walk w WHERE w.n >= 100
    )
    SELECT CAST(k AS INT) AS n_iters,
           ROUND(thr, 2) AS threshold,
           CAST(n AS BIGINT) AS n_above
    FROM walk ORDER BY k DESC LIMIT 1
    """,
)
def sql_scripting_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN/DECLARE/WHILE): iteratively
    double a price threshold until fewer than 100 orders exceed it —
    a driver-side control loop where each probe is a full
    distributed aggregate. The procedural surface for workflows that
    previously needed client-side glue; the oracle expresses the
    same walk as a recursive CTE. Each iteration is one scan —
    at scale you'd replace the linear walk with percentile()."""
    spark.conf.set("spark.sql.scripting.enabled", "true")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "scripting_orders"
    )
    return spark.sql(
        """
        BEGIN
          DECLARE thr DOUBLE DEFAULT 50000.0;
          DECLARE n BIGINT;
          DECLARE k INT DEFAULT 0;
          SET n = (SELECT COUNT(*) FROM scripting_orders
                   WHERE o_totalprice > thr);
          WHILE n >= 100 DO
            SET thr = thr * 2;
            SET k = k + 1;
            SET n = (SELECT COUNT(*) FROM scripting_orders
                     WHERE o_totalprice > thr);
          END WHILE;
          SELECT k AS n_iters, ROUND(thr, 2) AS threshold, n AS n_above;
        END
        """
    )


@register(
    "func_arrow_udf",
    oracle="""
    SELECT doc_id, source,
           CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) AS source_num
    FROM documents
    WHERE doc_id < 50
    """,
)
def func_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (Spark 4 useArrow=True):
    batches cross the JVM/Python boundary as Arrow instead of pickled
    rows (~2-5x over legacy UDFs). The logic here (trailing-number
    parse) is deliberately SQL-expressible so the oracle can check it
    — in production this surface is for logic that ISN'T (external
    libraries, complex parsing); when the expression IS expressible,
    the JVM regexp wins, which is the engine's UDF policy."""
    from pyspark.sql.functions import udf

    @udf(returnType="int", useArrow=True)
    def trailing_num(s: str) -> int | None:
        import re

        m = re.search(r"(\d+)$", s or "")
        return int(m.group(1)) if m else None

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return docs.select("doc_id", "source", trailing_num("source").alias("source_num"))


@register(
    "agg_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           ROUND(AVG(l_discount), 6) AS avg_disc
    FROM lineitem
    GROUP BY ALL
    """,
)
def agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL through the SQL surface — every non-aggregate
    select item becomes a grouping key (identical dialect sugar in
    Spark 4 and DuckDB; plans exactly like the explicit GROUP BY)."""
    li = load_table(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               ROUND(AVG(l_discount), 6) AS avg_disc
        FROM {lineitem}
        GROUP BY ALL
        """,
        lineitem=li,
    )


@register(
    "func_json_typed",
    oracle="""
    SELECT event_type,
           COUNT(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS INT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS INT) AS max_k,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4)
             AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def func_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: from_json with a declared schema turns the
    props string into a real struct column ONCE per row — then every
    field access is a plain column (vs get_json_object re-parsing the
    string per extraction; func_json shows that surface). The
    schema-on-read pattern for semi-structured event payloads."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json("props", "k INT").alias("p")
    )
    k = F.col("p.k")
    return parsed.groupBy("event_type").agg(
        F.count(k).alias("n_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


@register(
    "func_reduce_finish",
    oracle="""
    SELECT vec_id,
           ROUND(EXP(list_sum(list_transform(embedding::DOUBLE[],
                                             x -> LN(ABS(x) + 1e-9)))
                     / LEN(embedding)), 6) AS geo_mean_abs
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def func_reduce_finish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregate() with a FINISH lambda: per-vector geometric mean of
    |x| — the accumulator sums logs element-wise and the finish
    function normalizes and exponentiates once per row, so the whole
    reduction stays a single scan-stage expression (the two-lambda
    form most engines hide behind REDUCE ... FINISH)."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    geo = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.struct(F.lit(0.0).alias("s"), F.lit(0).alias("n")),
        lambda acc, x: F.struct(
            (acc.s + F.log(F.abs(x) + F.lit(1e-9))).alias("s"),
            (acc.n + F.lit(1)).alias("n"),
        ),
        lambda acc: F.exp(acc.s / acc.n),
    )
    return e.select("vec_id", F.round(geo, 6).alias("geo_mean_abs"))


@register(
    "agg_higher_moments",
    oracle="""
    WITH mu AS (
      SELECT event_type, AVG(value) AS m, COUNT(*) AS n
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(AVG(POW(e.value - mu.m, 3))
                 / POW(AVG(POW(e.value - mu.m, 2)), 1.5), 4) + 0
             AS skewness,
           ROUND(AVG(POW(e.value - mu.m, 4))
                 / POW(AVG(POW(e.value - mu.m, 2)), 2) - 3, 4) + 0
             AS excess_kurtosis
    FROM events e JOIN mu ON mu.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per event type —
    Spark's skewness()/kurtosis() aggregates compute exactly the
    m3/m2^1.5 and m4/m2²-3 population moments (single-pass, merged
    as raw moment partials), which the oracle reproduces with an
    explicit two-pass centered-moment formulation (DuckDB's own
    skewness() applies sample bias correction, a different
    statistic). +0 normalizes IEEE -0.0."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        (F.round(F.skewness("value"), 4) + F.lit(0.0)).alias("skewness"),
        (F.round(F.kurtosis("value"), 4) + F.lit(0.0)).alias(
            "excess_kurtosis"
        ),
    )


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS rev
    FROM orders
    WHERE o_totalprice > 100000
    GROUP BY o_orderpriority
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 |> operators): the linear FROM |>
    WHERE |> AGGREGATE form — reads in execution order like the
    DataFrame API, plans identically to the nested SELECT (the
    oracle). Dialect surface only; no plan difference to manage."""
    o = load_table(spark, sf_dir, "orders")
    return spark.sql(
        """
        FROM {orders}
        |> WHERE o_totalprice > 100000
        |> AGGREGATE COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS rev
           GROUP BY o_orderpriority
        """,
        orders=o,
    )


@register(
    "func_collation",
    oracle="""
    SELECT lower(c_mktsegment) AS segment_ci,
           COUNT(*) AS n,
           COUNT(DISTINCT c_mktsegment) AS n_raw_spellings
    FROM (
      SELECT CASE WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
                  WHEN c_custkey % 3 = 1 THEN c_mktsegment
                  ELSE
                    upper(substring(c_mktsegment, 1, 1)) ||
                    lower(substring(c_mktsegment, 2))
             END AS c_mktsegment
      FROM customer
    ) v
    GROUP BY 1
    """,
)
def func_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 COLLATE UTF8_LCASE): messy
    mixed-case segment values group case-insensitively WITHOUT
    normalizing the stored column — the collation travels with the
    comparison, so joins/groupings downstream inherit it. The oracle
    gets the same answer by explicit lower(); collation is the
    declarative form (and at scale avoids materializing a second
    normalized column). Output keyed by lower() on both sides so the
    group label is deterministic."""
    c = load_table(spark, sf_dir, "customer")
    messy = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, F.lower("c_mktsegment"))
        .when(F.col("c_custkey") % 3 == 1, F.col("c_mktsegment"))
        .otherwise(F.initcap(F.lower("c_mktsegment")))
        .alias("seg"),
    )
    collated = messy.select(
        "c_custkey", F.expr("seg COLLATE UTF8_LCASE").alias("seg_ci"), "seg"
    )
    return (
        collated.groupBy("seg_ci")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("seg").alias("n_raw_spellings"),
        )
        .select(
            F.lower("seg_ci").alias("segment_ci"), "n", "n_raw_spellings"
        )
    )


@register(
    "func_regexp_family",
    oracle="""
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numbers,
           regexp_extract(text, '([a-z]+ing)\\b', 1) AS first_ing,
           regexp_matches(text, 'join|merge') AS mentions_join_merge,
           LEN(regexp_replace(text, '\\s+', ' ', 'g')) AS n_chars_normalized
    FROM documents
    WHERE doc_id < 60
    """,
)
def func_regexp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface: occurrence counting (regexp_count), first
    capture (regexp_extract), boolean match, and whitespace
    normalization — all lookahead-free patterns, which is the
    portability line where java.util.regex and RE2-family engines
    agree (documented in operators/text.py's tokenizer)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"[0-9]+")).alias("n_numbers"),
        F.regexp_extract("text", r"([a-z]+ing)\b", 1).alias("first_ing"),
        F.col("text").rlike("join|merge").alias("mentions_join_merge"),
        F.length(F.regexp_replace("text", r"\s+", " ")).cast("bigint").alias(
            "n_chars_normalized"
        ),
    )


@register(
    "explode_with_position",
    oracle="""
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS term
    FROM (
      SELECT doc_id, toks,
             UNNEST(generate_series(1, CAST(LEN(toks) AS BIGINT))) AS i
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\\s+') AS toks
            FROM documents WHERE doc_id < 10) d
    ) t
    """,
)
def explode_with_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: token fan-out that keeps each element's position —
    the ordinality column sequence models, positional n-grams, and
    span labeling all need. Same zero-shuffle generator shape as
    explode_lateral; position is 0-based (the oracle's parallel
    unnest of generate_subscripts is 1-based, shifted to match)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 10)
    proj = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("toks")
    )
    return proj.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    )


@register(
    "func_formatting",
    oracle="""
    SELECT o_orderkey,
           printf('%05d', CAST(o_orderkey AS INT)) AS padded_key,
           printf('%.2f', ROUND(o_totalprice, 2)) AS price_str,
           lpad(o_orderstatus, 3, '_') AS status_padded,
           o_orderstatus || '#' || CAST(o_orderkey AS VARCHAR) AS tag
    FROM orders WHERE o_orderkey < 120
    """,
)
def func_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting (zero-padded keys, fixed-decimal money
    strings), lpad, and concatenation — the export-formatting surface
    the reference's quote-wrap logic (HiveToMysql.java:470-508) is a
    special case of. %d/%f specifiers chosen because they format
    identically across JVM and C-family printf."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 120)
    return o.select(
        "o_orderkey",
        F.format_string("%05d", F.col("o_orderkey").cast("int")).alias(
            "padded_key"
        ),
        F.format_string("%.2f", F.round("o_totalprice", 2)).alias("price_str"),
        F.lpad("o_orderstatus", 3, "_").alias("status_padded"),
        F.concat(
            "o_orderstatus", F.lit("#"), F.col("o_orderkey").cast("string")
        ).alias("tag"),
    )
