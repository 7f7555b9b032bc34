"""Analytics extras, batch 13: Markov removal-effect attribution and
class-balanced sampling.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); extends SURVEY.md §2.2's attribution / training-data tiers:

* removal-effect attribution — the Markov-chain attribution model
  (Anderl et al.): each channel's credit is the drop in modeled
  conversion probability when that channel is removed from the
  journey graph, computed by finite-horizon value iteration and
  fully oracled via unrolled CTEs;
* balanced sampling — md5-deterministic equal-per-class
  downsampling, the class-rebalancing step before training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_MRA_CHANNELS = ["click", "error", "signup", "view"]
_MRA_SRCS = ["START"] + _MRA_CHANNELS
_MRA_DSTS = _MRA_CHANNELS + ["purchase", "NULL"]
_MRA_ITERS = 15


def _mra_trans_cte() -> str:
    return """
    ordered AS (
      SELECT user_id, event_type, ts, event_id,
             COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS purch_before,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ),
    kept AS (SELECT * FROM ordered WHERE purch_before = 0),
    trans AS (
      -- LEAD runs over ALL kept rows (purchase included) BEFORE the
      -- source filter — filtering first would make the window skip
      -- purchase rows and no transition would ever enter 'purchase'
      SELECT src, dst FROM (
        SELECT event_type AS src,
               COALESCE(LEAD(event_type) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id), 'NULL')
                 AS dst
        FROM kept
      ) WHERE src <> 'purchase'
      UNION ALL
      SELECT 'START' AS src, event_type AS dst FROM kept WHERE rn = 1
    )"""


def _mra_oracle() -> str:
    srcs, dsts = _MRA_SRCS, _MRA_DSTS
    cells = ",\n             ".join(
        f"SUM(CASE WHEN src = '{s}' AND dst = '{d}' THEN 1 ELSE 0 END) AS c_{i}_{j}"
        for i, s in enumerate(srcs)
        for j, d in enumerate(dsts)
    )
    rows = ",\n             ".join(
        f"SUM(CASE WHEN src = '{s}' THEN 1 ELSE 0 END) AS r_{i}"
        for i, s in enumerate(srcs)
    )
    sql = f"""
    WITH {_mra_trans_cte()},
    tc AS (
      SELECT {cells},
             {rows}
      FROM trans
    )
    """

    def value_iteration(tag: str, removed: str | None) -> str:
        # chain CTEs v{tag}_{k} with one column per src state
        out = f", v{tag}_0 AS (SELECT {', '.join(f'0.0::DOUBLE AS s{i}' for i in range(len(srcs)))})\n"
        prev = f"v{tag}_0"
        for k in range(1, _MRA_ITERS + 1):
            comps = []
            for i, s in enumerate(srcs):
                if removed is not None and s == removed:
                    comps.append(f"0.0::DOUBLE AS s{i}")
                    continue
                terms = []
                for j, d in enumerate(dsts):
                    if removed is not None and d == removed:
                        continue  # redirected to NULL (value 0)
                    if d == "purchase":
                        val = "1.0"
                    elif d == "NULL":
                        continue  # value 0
                    else:
                        val = f"{prev}.s{srcs.index(d)}"
                    terms.append(f"(tc.c_{i}_{j} * 1.0 / tc.r_{i}) * {val}")
                expr = " + ".join(terms) if terms else "0.0"
                comps.append(
                    f"CASE WHEN tc.r_{i} = 0 THEN 0.0 ELSE {expr} END AS s{i}"
                )
            out += (
                f", v{tag}_{k} AS (SELECT {', '.join(comps)}"
                f" FROM {prev} CROSS JOIN tc)\n"
            )
            prev = f"v{tag}_{k}"
        return out

    sql += value_iteration("b", None)
    for c in _MRA_CHANNELS:
        sql += value_iteration(c, c)
    base = f"vb_{_MRA_ITERS}.s0"
    re_exprs = {
        c: f"(1.0 - v{c}_{_MRA_ITERS}.s0 / {base})" for c in _MRA_CHANNELS
    }
    total = " + ".join(re_exprs.values())
    rows_sql = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, ROUND({base}, 4) AS base_cvr_15step, "
        f"ROUND({re_exprs[c]}, 4) AS removal_effect, "
        f"ROUND(CASE WHEN ({total}) = 0 THEN 0.0 ELSE {re_exprs[c]} / ({total}) END, 4)"
        f" AS attribution_share "
        f"FROM vb_{_MRA_ITERS}"
        + "".join(f" CROSS JOIN v{cc}_{_MRA_ITERS}" for cc in _MRA_CHANNELS)
        for c in _MRA_CHANNELS
    )
    return sql + rows_sql


@register("event_attribution_markov_removal", oracle=_mra_oracle())
def event_attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al., 2014): user
    journeys (events up to the first purchase) define a transition
    graph START -> channels -> {purchase, NULL}; each channel's
    credit is the relative drop in modeled conversion probability
    when the channel is removed (its inbound edges redirected to
    NULL) — credit for being causally on the path, unlike
    position-based rules (cf. attribution_linear_touch). Conversion
    probabilities use 15-step value iteration v(s) = sum_t P(s,t)v(t)
    (a finite-horizon conversion measure, identical on both engines).

    Shape: one lag/lead window pass builds O(states^2) transition
    counts; all five chains (base + 4 removals) iterate on the
    collected matrix driver-side — the Markov-stationary pattern with
    a what-if twist. The oracle unrolls every chain's 15 rounds as
    CTEs, so the counterfactual math is verified end-to-end."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.coalesce(
            F.sum((F.col("event_type") == "purchase").cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("purch_before"),
        F.row_number().over(w).alias("rn"),
    )
    kept = ordered.where(F.col("purch_before") == 0)
    # lead over ALL kept rows first (so purchase is a visible target),
    # THEN drop purchase as a source — the reverse order silently
    # removes every transition into the absorbing conversion state
    seq_trans = (
        kept.select(
            F.col("event_type").alias("src"),
            F.coalesce(F.lead("event_type").over(w), F.lit("NULL")).alias("dst"),
        )
        .where(F.col("src") != "purchase")
    )
    start_trans = kept.where(F.col("rn") == 1).select(
        F.lit("START").alias("src"), F.col("event_type").alias("dst")
    )
    trans = seq_trans.union(start_trans)
    srcs, dsts = _MRA_SRCS, _MRA_DSTS
    tc = trans.agg(
        *[
            F.sum(
                ((F.col("src") == s) & (F.col("dst") == d)).cast("long")
            ).alias(f"c_{i}_{j}")
            for i, s in enumerate(srcs)
            for j, d in enumerate(dsts)
        ],
        *[
            F.sum((F.col("src") == s).cast("long")).alias(f"r_{i}")
            for i, s in enumerate(srcs)
        ],
    ).collect()[0]

    def converge(removed: str | None) -> float:
        v = [0.0] * len(srcs)
        for _ in range(_MRA_ITERS):
            nv = []
            for i, s in enumerate(srcs):
                if removed is not None and s == removed:
                    nv.append(0.0)
                    continue
                r = tc[f"r_{i}"]
                if r == 0:
                    nv.append(0.0)
                    continue
                acc = None
                for j, d in enumerate(dsts):
                    if removed is not None and d == removed:
                        continue
                    if d == "purchase":
                        val = 1.0
                    elif d == "NULL":
                        continue
                    else:
                        val = v[srcs.index(d)]
                    term = (tc[f"c_{i}_{j}"] * 1.0 / r) * val
                    acc = term if acc is None else acc + term
                nv.append(acc if acc is not None else 0.0)
            v = nv
        return v[0]  # START

    base = converge(None)
    effects = {c: 1.0 - converge(c) / base for c in _MRA_CHANNELS}
    total = sum(effects.values())
    rows = [
        (
            c,
            base,
            effects[c],
            effects[c] / total if total != 0 else 0.0,
        )
        for c in _MRA_CHANNELS
    ]
    # round via Spark (HALF_UP like DuckDB) — python round() banker's
    # rounding could diverge at exact midpoints
    raw = spark.createDataFrame(
        rows, ["channel", "base_cvr_15step", "removal_effect", "attribution_share"]
    )
    return raw.select(
        "channel",
        F.round("base_cvr_15step", 4).alias("base_cvr_15step"),
        F.round("removal_effect", 4).alias("removal_effect"),
        F.round("attribution_share", 4).alias("attribution_share"),
    )


_BAL_CAP_ORDER = ("l_returnflag", "l_orderkey", "l_linenumber")


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
    per-label ranked window (labels are few, but rows per label are
    huge — at 100 TB pre-filter each label with an approximate
    per-partition quota before the exact rank to keep the window
    input bounded)."""
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
    w = Window.partitionBy("l_returnflag").orderBy(
        order_key, "l_orderkey", "l_linenumber"
    )
    ranked = li.select(
        F.col("l_returnflag").alias("label"),
        "l_quantity",
        F.row_number().over(w).alias("rk"),
    )
    return (
        ranked.crossJoin(F.broadcast(cap))
        .where(F.col("rk") <= F.col("min_n"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.round(F.avg("l_quantity"), 2).alias("avg_quantity"),
        )
    )
