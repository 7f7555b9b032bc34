"""Analytics extras, batch 8: Markov-chain steady state, cross-table
reconciliation, training-shard manifests, and CDC apply with deletes.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's iterative / data-quality /
training-data tiers:

* Markov stationary distribution — event-type transition chain power-
  iterated to steady state (10 fixed rounds, fully oracled via an
  unrolled-CTE matrix-vector chain);
* reconciliation — the orders-vs-lineitem monthly coverage audit
  every warehouse runs between fact tables;
* shard manifest — deterministic greedy packing of documents into
  fixed-size training shards (the WebDataset/TFRecord manifest step);
* CDC apply — last-writer-wins change-feed materialization with
  delete tombstones, one window pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_MK_STATES = ["click", "error", "purchase", "signup", "view"]
_MK_ITERS = 10


def _markov_oracle() -> str:
    s = _MK_STATES
    ns = len(s)
    # transition counts pivot: c_ij + row totals r_i
    cells = ",\n             ".join(
        f"SUM(CASE WHEN prev = '{s[i]}' AND event_type = '{s[j]}' "
        f"THEN 1 ELSE 0 END) AS c{i}{j}"
        for i in range(ns)
        for j in range(ns)
    )
    rows = ",\n             ".join(
        f"SUM(CASE WHEN prev = '{s[i]}' THEN 1 ELSE 0 END) AS r{i}"
        for i in range(ns)
    )
    sql = f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    tc AS (
      SELECT {cells},
             {rows},
             COUNT(prev) AS n_trans
      FROM seq WHERE prev IS NOT NULL
    ),
    it0 AS (SELECT {", ".join(f"0.2::DOUBLE AS d{j}" for j in range(ns))})
    """
    prev = "it0"
    for k in range(1, _MK_ITERS + 1):
        comps = ", ".join(
            "("
            + " + ".join(
                f"{prev}.d{i} * (tc.c{i}{j} * 1.0 / tc.r{i})" for i in range(ns)
            )
            + f") AS d{j}"
            for j in range(ns)
        )
        sql += f", it{k} AS (SELECT {comps} FROM {prev} CROSS JOIN tc)\n"
        prev = f"it{k}"
    outs = ", ".join(
        f"ROUND({prev}.d{j}, 6) AS p_{s[j]}" for j in range(len(s))
    )
    sql += f"""
    SELECT CAST(tc.n_trans AS BIGINT) AS n_transitions, {outs}
    FROM {prev} CROSS JOIN tc
    """
    return sql


@register("event_markov_stationary", oracle=_markov_oracle())
def event_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain: the
    5x5 transition matrix comes from one lag-window pass over
    per-user event sequences; the steady state is d <- dP iterated
    10 fixed rounds from uniform (power iteration on the O(states^2)
    matrix, a 25-cell driver-side object). The long-run share of each
    event type under the observed dynamics — what traffic converges
    to, as opposed to what today's mix is.

    Scale: the only O(rows) work is the lag window (shuffled by
    user_id, well-spread keys); the iteration runs on a collected
    25-cell matrix, the PageRank-loop pattern at its smallest. The
    DuckDB oracle unrolls all 10 matrix-vector products as chained
    CTEs over the same conditional-count pivot, so the fixpoint math
    itself is verified, not just the transition counts."""
    s = _MK_STATES
    ns = len(s)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).where(F.col("prev").isNotNull())
    tc = seq.agg(
        *[
            F.sum(
                ((F.col("prev") == s[i]) & (F.col("event_type") == s[j])).cast(
                    "long"
                )
            ).alias(f"c{i}{j}")
            for i in range(ns)
            for j in range(ns)
        ],
        *[
            F.sum((F.col("prev") == s[i]).cast("long")).alias(f"r{i}")
            for i in range(ns)
        ],
        F.count(F.lit(1)).alias("n_trans"),
    ).collect()[0]
    p = [
        [tc[f"c{i}{j}"] / tc[f"r{i}"] for j in range(ns)] for i in range(ns)
    ]
    d = [0.2] * ns
    for _ in range(_MK_ITERS):
        nd = []
        for j in range(ns):
            acc = d[0] * p[0][j]
            for i in range(1, ns):
                acc = acc + d[i] * p[i][j]
            nd.append(acc)
        d = nd
    return spark.range(1).select(
        F.lit(tc["n_trans"]).cast("long").alias("n_transitions"),
        *[F.round(F.lit(d[j]), 6).alias(f"p_{s[j]}") for j in range(ns)],
    )


@register(
    "dq_cross_table_reconciliation",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CAST(date_trunc('month', CAST(o_orderdate AS DATE))
                  AS TIMESTAMP) AS m
      FROM orders
    ),
    l AS (
      SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o.m, o.o_orderkey, COALESCE(l.n_lines, 0) AS n_lines
      FROM o LEFT JOIN l ON l.l_orderkey = o.o_orderkey
    )
    SELECT m AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN n_lines > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS orders_with_lines,
           CAST(SUM(CASE WHEN n_lines = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS orphan_orders,
           CAST(SUM(n_lines) AS BIGINT) AS line_rows,
           ROUND(SUM(CASE WHEN n_lines > 0 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS coverage
    FROM j GROUP BY m
    """,
)
def dq_cross_table_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-fact reconciliation: per order month, how many orders
    have at least one lineitem, how many are orphans, and the raw
    line-row volume — the audit that catches partial loads and
    referential drift between pipelines feeding two fact tables.

    Shape: lineitem pre-aggregates to one row per orderkey BEFORE the
    join (the classic reduce-then-join — the join input shrinks from
    line grain to order grain), then a LEFT join preserves orphans
    and one grouped pass rolls up to months. Both shuffles key on
    orderkey/month; at 100 TB bucketing both facts on orderkey makes
    the join co-located."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_trunc("month", F.to_date("o_orderdate")).alias("m"),
    )
    lag = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    j = o.join(lag, F.col("l_orderkey") == F.col("o_orderkey"), "left").select(
        "m", F.coalesce("n_lines", F.lit(0)).alias("n_lines")
    )
    has = (F.col("n_lines") > 0).cast("long")
    return j.groupBy(F.col("m").alias("month")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(has).cast("long").alias("orders_with_lines"),
        F.sum(1 - has).cast("long").alias("orphan_orders"),
        F.sum("n_lines").cast("long").alias("line_rows"),
        F.round(F.sum(has) / F.count(F.lit(1)), 4).alias("coverage"),
    )


_SHARD_CHARS = 50_000


@register(
    "multimodal_shard_manifest",
    oracle=f"""
    WITH ordered AS (
      SELECT doc_id, n_chars,
             SUM(n_chars) OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS cum_before,
             ROW_NUMBER() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos
      FROM documents
    ),
    assigned AS (
      SELECT doc_id, n_chars, pos,
             -- FLOOR, not bare CAST: DuckDB's double->int cast ROUNDS
             CAST(FLOOR(COALESCE(cum_before, 0) / {_SHARD_CHARS}) AS BIGINT)
               AS shard_id
      FROM ordered
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS shard_chars,
           CAST(MIN(pos) AS BIGINT) AS first_pos,
           CAST(MAX(pos) AS BIGINT) AS last_pos
    FROM assigned GROUP BY shard_id
    """,
)
def multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest: documents are shuffled into a
    deterministic md5 order (so shard contents are stable across
    re-runs AND decorrelated from ingest order — the property
    WebDataset/TFRecord packing needs), then greedily packed into
    ~50k-char shards by running-size cutoff. Output is the per-shard
    manifest: doc count, byte load, positional span.

    Shape: one global ordered window (running sum). At 100 TB the
    same construction runs per partition-range: range-partition by
    the hash key, pack within ranges, offset shard ids by the
    per-range totals from a tiny driver-side prefix sum — the
    two-level scan Spark's rangepartitioner already gives sortWithinPartitions."""
    docs = load_table(spark, sf_dir, "documents")
    ow = Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    ordered = docs.select(
        "doc_id",
        "n_chars",
        F.coalesce(
            F.sum("n_chars").over(ow.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("cum_before"),
        F.row_number().over(ow).alias("pos"),
    )
    assigned = ordered.select(
        "n_chars",
        "pos",
        F.floor(F.col("cum_before") / _SHARD_CHARS).cast("long").alias("shard_id"),
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("shard_chars"),
        F.min("pos").cast("long").alias("first_pos"),
        F.max("pos").cast("long").alias("last_pos"),
    )


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
