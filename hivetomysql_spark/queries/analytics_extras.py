"""Analytics extras: robust statistics, customer segmentation,
sequential recurrences, pinned-hash sketches, containment dedup, and
one-pass centroid assignment.

Not in the reference (hiveToMysql computes nothing — the single class
`HiveToMysql.java:1-641` only copies rows); these widen the extension
tiers of SURVEY.md §2.2 with operator shapes a production analytics /
training-data stack runs daily:

* MAD outlier flags — the robust anomaly screen (3·1.4826·MAD rule);
* RFM segmentation — the classic marketing cohort cut;
* per-key EMA — a *sequential recurrence*, the one aggregation class
  a parallel engine cannot express as a commutative fold;
* count-min sketch — with the hash family pinned to md5 so the sketch
  itself (not just its contract) is oracle-checkable in DuckDB;
* n-gram containment — the asymmetric near-dup signal for
  quoted/sub-document duplication (Jaccard misses short-inside-long);
* k-means assignment — the map-side step of Lloyd's / IVF coarse
  quantization, as one broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.operators import dedup as D
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


@register(
    "segment_rfm",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_order,
             COUNT(*) AS frequency,
             ROUND(SUM(o_totalprice), 2) AS monetary
      FROM orders
      GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             date_diff('day', last_order, (SELECT MAX(last_order) FROM base))
               AS recency_days,
             frequency, monetary,
             ntile(4) OVER (ORDER BY date_diff('day', last_order,
                              (SELECT MAX(last_order) FROM base)), o_custkey)
               AS r_score,
             ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
             ntile(4) OVER (ORDER BY monetary DESC, o_custkey)  AS m_score
      FROM base
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CASE WHEN r_score = 1 AND f_score = 1 AND m_score = 1
                  THEN 'champion'
                WHEN r_score >= 3 AND f_score <= 2 THEN 'at_risk'
                WHEN f_score = 1 THEN 'loyal'
                ELSE 'regular' END AS segment
    FROM scored
    """,
)
def segment_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) quartile segmentation of
    customers from their order history. Recency is days since the
    customer's last order relative to the corpus max date; each
    dimension is scored into deterministic quartiles (ntile ordered
    by the metric with o_custkey tie-break — monetary is pre-rounded
    so FP sum noise cannot flip the sort).

    Scale note: ntile over the full customer set is a single-partition
    window. At 100 TB the same scores come from ONE percentile_approx
    pass producing the three quartile boundary arrays (broadcast,
    then a map-side comparison per customer) — the boundaries path is
    what feature_quantile_binning demonstrates; here the exact ntile
    keeps the oracle strict."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    gmax = base.agg(F.max("last_order").alias("gmax"))
    scored = (
        base.crossJoin(F.broadcast(gmax))
        .withColumn("recency_days", F.datediff("gmax", "last_order"))
        .drop("gmax", "last_order")
    )
    r_w = Window.orderBy("recency_days", "o_custkey")
    f_w = Window.orderBy(F.desc("frequency"), "o_custkey")
    m_w = Window.orderBy(F.desc("monetary"), "o_custkey")
    scored = scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(r_w).alias("r_score"),
        F.ntile(4).over(f_w).alias("f_score"),
        F.ntile(4).over(m_w).alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") == 1) & (F.col("f_score") == 1) & (F.col("m_score") == 1),
            "champion",
        )
        .when((F.col("r_score") >= 3) & (F.col("f_score") <= 2), "at_risk")
        .when(F.col("f_score") == 1, "loyal")
        .otherwise("regular")
    )
    return scored.withColumn("segment", seg)


@register(
    "anomaly_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type, abs(e.value - m.med) AS absdev, m.med
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, median(absdev) AS mad, MIN(med) AS med
      FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           ROUND(m.med, 4) AS med,
           ROUND(m.mad, 4) AS mad,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN d.absdev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers,
           ROUND(SUM(CASE WHEN d.absdev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 4) AS outlier_rate
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type, m.med, m.mad
    """,
)
def anomaly_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen per event_type: a point is anomalous when
    its absolute deviation from the group median exceeds 3·1.4826·MAD
    (the consistency-scaled median absolute deviation — the robust
    z-score). Unlike mean/stddev screens, a burst of anomalies cannot
    drag the threshold toward itself.

    Shape: two exact-percentile aggregates (median, then MAD) with the
    O(groups) results broadcast back — the fact table is scanned, never
    shuffled. At 100 TB swap percentile → approx_percentile for
    single-pass mergeable sketches; the exact form keeps the oracle
    strict."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("absdev")
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("absdev", F.lit(0.5)).alias("mad"),
        F.min("med").alias("med"),
    )
    flagged = dev.drop("med").join(F.broadcast(mad), "event_type")
    is_out = (F.col("absdev") > 3 * 1.4826 * F.col("mad")).cast("long")
    return flagged.groupBy("event_type").agg(
        F.round(F.min("med"), 4).alias("med"),
        F.round(F.min("mad"), 4).alias("mad"),
        F.count(F.lit(1)).alias("n"),
        F.sum(is_out).alias("n_outliers"),
        F.round(F.sum(is_out) / F.count(F.lit(1)), 4).alias("outlier_rate"),
    )


@register(
    "embedding_kmeans_assign",
    oracle="""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
      SELECT e.vec_id, c.cid,
             list_dot_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[])
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.cvec::DOUBLE[], c.cvec::DOUBLE[]))) AS cos,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[])
                          / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                             * sqrt(list_dot_product(c.cvec::DOUBLE[], c.cvec::DOUBLE[]))) DESC,
                        c.cid
             ) AS rn
      FROM embeddings e CROSS JOIN cents c
    )
    SELECT cid,
           COUNT(*) AS n_members,
           ROUND(AVG(cos), 4) AS avg_cosine,
           MIN(vec_id) AS min_member
    FROM scored WHERE rn = 1
    GROUP BY cid
    """,
)
def embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd's-iteration assignment step: every vector joins the 8
    broadcast centroids (seeded as vec_id < 8), takes its arg-max
    cosine centroid (cid tie-break), and per-cluster membership stats
    come back in one aggregate. This is exactly the map-side shape of
    distributed k-means AND of IVF coarse quantization: centroids are
    O(k·dim) broadcast state, the corpus is scanned once, and the only
    shuffle carries O(k) partial aggregates."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    e = emb.select("vec_id", _as_double("embedding").alias("v")).withColumn(
        "nv", _norm("v")
    )
    c = cents.select("cid", _as_double("cvec").alias("cv")).withColumn(
        "nc", _norm("cv")
    )
    scored = e.crossJoin(F.broadcast(c)).select(
        "vec_id",
        "cid",
        (_dot("v", "cv") / (F.col("nv") * F.col("nc"))).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "cid")
    best = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return best.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("cos"), 4).alias("avg_cosine"),
        F.min("vec_id").alias("min_member"),
    )


@register(
    "sample_diverse_per_cluster",
    oracle="""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
      SELECT e.vec_id, c.cid,
             list_dot_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[])
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.cvec::DOUBLE[], c.cvec::DOUBLE[]))) AS cos,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[])
                          / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                             * sqrt(list_dot_product(c.cvec::DOUBLE[], c.cvec::DOUBLE[]))) DESC,
                        c.cid
             ) AS rn
      FROM embeddings e CROSS JOIN cents c
    ),
    assigned AS (SELECT vec_id, cid, cos FROM scored WHERE rn = 1)
    SELECT cid, vec_id, CAST(pick AS INT) AS pick, ROUND(cos, 4) AS cosine
    FROM (
      SELECT cid, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY cid ORDER BY cos DESC, vec_id)
               AS pick
      FROM assigned
    )
    WHERE pick <= 2
    """,
)
def sample_diverse_per_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-capped sampling in embedding space: assign every
    vector to its nearest seed centroid (the embedding_kmeans_assign
    step), then keep the top-2 most-central members per cluster — a
    deterministic coreset whose size is O(k), not O(corpus). This is
    the training-mix shape that prevents one dense semantic region
    from dominating a sample: the cap is per-cluster, so coverage is
    spread across all k regions. Per-cluster top-k is a bounded
    window (k clusters × small k'), never a global sort."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    e = emb.select("vec_id", _as_double("embedding").alias("v")).withColumn(
        "nv", _norm("v")
    )
    c = cents.select("cid", _as_double("cvec").alias("cv")).withColumn(
        "nc", _norm("cv")
    )
    scored = e.crossJoin(F.broadcast(c)).select(
        "vec_id",
        "cid",
        (_dot("v", "cv") / (F.col("nv") * F.col("nc"))).alias("cos"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "cid")
    assigned = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    w_pick = Window.partitionBy("cid").orderBy(F.desc("cos"), "vec_id")
    return (
        assigned.withColumn("pick", F.row_number().over(w_pick))
        .where(F.col("pick") <= 2)
        .select("cid", "vec_id", "pick", F.round("cos", 4).alias("cosine"))
    )


@register(
    "timeseries_ema",
    oracle="""
    WITH s AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vals
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           ROUND(list_reduce(vals::DOUBLE[], (acc, x) -> acc * 0.7 + x * 0.3), 4)
             AS ema
    FROM s
    """,
)
def timeseries_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average (α = 0.3) over the event
    stream — a *sequential recurrence*: ema_t = 0.7·ema_{t-1} +
    0.3·x_t cannot be a commutative shuffle fold. Expressed as one
    groupBy collecting the (ts, event_id, value) sequence and one
    JVM-side array fold (sort_array + aggregate) — per-key state is
    O(events-per-key), the per-group fold order is total (event_id
    tie-break), and both engines fold identically so the oracle
    matches bit-for-bit before rounding.

    Scale: per-key sequences in a training/event store are bounded
    (thousands, not billions); for unbounded keys the same recurrence
    runs as applyInPandasWithState over the stream (see
    streaming/stateful.py) or via the log-domain prefix-product
    closed form."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))).alias(
            "seq"
        )
    )
    vals = F.transform(F.col("seq"), lambda s: s["value"])
    ema = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1).cast("double"),
        lambda acc, x: acc * 0.7 + x * 0.3,
    )
    return seq.select(
        "user_id",
        F.size(vals).cast("long").alias("n_events"),
        F.round(ema, 4).alias("ema"),
    )


def _cms_bucket(depth_expr: str, key_expr: str, width: int) -> str:
    """SQL text for one md5-derived CMS bucket (DuckDB oracle side)."""
    return (
        f"('0x' || substr(md5({depth_expr} || ':' || {key_expr}), 1, 8))::BIGINT"
        f" % {width}"
    )


_CMS_DEPTH = 4
_CMS_WIDTH = 64


@register(
    "agg_count_min_sketch",
    oracle=f"""
    WITH rows_ AS (
      SELECT i AS d,
             {_cms_bucket("i::VARCHAR", "CAST(user_id AS VARCHAR)", _CMS_WIDTH)} AS b
      FROM events, UNNEST([0, 1, 2, 3]) AS t(i)
    ),
    cms AS (SELECT d, b, COUNT(*) AS cnt FROM rows_ GROUP BY 1, 2),
    probes AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
    pb AS (
      SELECT user_id, i AS d,
             {_cms_bucket("i::VARCHAR", "CAST(user_id AS VARCHAR)", _CMS_WIDTH)} AS b
      FROM probes, UNNEST([0, 1, 2, 3]) AS t(i)
    ),
    est AS (
      SELECT user_id, MIN(cnt) AS cms_est FROM pb JOIN cms USING (d, b)
      GROUP BY user_id
    ),
    exact AS (
      SELECT user_id, COUNT(*) AS exact_n FROM events
      WHERE user_id < 20 GROUP BY user_id
    )
    SELECT e.user_id, e.exact_n, est.cms_est
    FROM exact e JOIN est USING (user_id)
    """,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 × width 64) over the event stream's
    user_id frequencies, with the hash family pinned to md5 so the
    *sketch contents* — not merely the ≥-exact contract — are
    reproducible in the DuckDB oracle. The counter table is (d, b) →
    count: mergeable by addition, 256 cells regardless of stream size
    — the canonical bounded-memory heavy-hitter state at 100 TB.
    Probing 20 keys returns min over depths of the landed counters,
    reported next to the exact counts (est ≥ exact always; equality
    when no collision)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k"), "user_id"
    )

    def bucket(i: int, key: F.Column) -> F.Column:
        h = F.md5(F.concat(F.lit(str(i)), F.lit(":"), key))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _CMS_WIDTH

    hashed = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("d"), bucket(i, F.col("k")).alias("b"))
                    for i in range(_CMS_DEPTH)
                ]
            )
        ).alias("h")
    )
    cms = hashed.groupBy(F.col("h.d").alias("d"), F.col("h.b").alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    probes = ev.where(F.col("user_id") < 20).select("user_id", "k").distinct()
    pb = probes.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("d"), bucket(i, F.col("k")).alias("b"))
                    for i in range(_CMS_DEPTH)
                ]
            )
        ).alias("h"),
    ).select("user_id", F.col("h.d").alias("d"), F.col("h.b").alias("b"))
    est = (
        pb.join(F.broadcast(cms), ["d", "b"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("cms_est"))
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    return exact.join(est, "user_id").select("user_id", "exact_n", "cms_est")
