"""As-of (point-in-time) join — a custom operator Spark lacks.

For each left row, find the most recent right row for the same key
whose timestamp is before (or at) the left row's timestamp. The naive
formulation is a theta join (``r.ts <= l.ts``) + groupBy-max, which
explodes to O(|L|·|R|) per key; this implementation is the
union+window trick:

1. tag both sides and union them (no join at all),
2. one window per key ordered by (ts, side),
3. ``last(right_payload, ignorenulls=True)`` carries the latest right
   payload forward onto each left row.

Cost: a single hash shuffle on the key + per-partition sort — linear
in |L|+|R|, the plan you want at 100 TB (same shape Flink/kdb use for
as-of). Skewed keys are handled by AQE; for a known-hot key, salt the
key and union the results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str] | None = None,
    allow_exact_matches: bool = False,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join (pandas ``merge_asof`` semantics).

    Returns every ``left`` row plus, for each column in
    ``right_values`` (default: all non-key, non-ts right columns), the
    value from the latest ``right`` row with ``right_ts < left_ts``
    (``<=`` when ``allow_exact_matches``); NULL when no such row.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_values is None:
        right_values = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    payload_fields = [right_ts] + right_values

    # side ordering at equal ts decides strict-vs-inclusive matching:
    # right rows sort before left rows iff exact matches are allowed.
    left_side, right_side = (1, 0) if allow_exact_matches else (0, 1)

    payload = F.struct(*[F.col(c) for c in payload_fields]).alias("__payload")
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        payload,
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    null_payload = F.lit(None).cast(
        r.schema["__payload"].dataType
    ).alias("__payload")
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(left_side).alias("__side"),
        null_payload,
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .where(F.col("__side") == left_side)
    )

    out_cols: list[Column] = [
        F.col(f"__l_{c}").alias(c) for c in left.columns
    ]
    out_cols.append(F.col(f"__match.{right_ts}").alias(f"{right_ts}{suffix}"))
    out_cols += [
        F.col(f"__match.{c}").alias(
            f"{c}{suffix}" if c in left.columns else c
        )
        for c in right_values
    ]
    return matched.select(*out_cols)


def cogroup_asof_attribution(events, schema_hint=None):
    """Click→purchase as-of alignment via cogrouped applyInPandas:
    clicks and purchases are co-partitioned by user_id and each
    user's pair of Arrow batches is aligned with pandas merge_asof
    (backward, exact matches allowed).

    This is the cogroup member of the pandas-UDF family (grouped-map
    and grouped-agg live in queries/llm.py and queries/
    relational_extras.py): ONE shuffle co-locates both sides, then
    the alignment is a local sorted merge — exactly how a distributed
    as-of join should run at 100 TB, with pandas doing the two-pointer
    walk instead of an O(clicks × purchases) interval join. The
    union+window formulation (asof_join_last_click) is the all-JVM
    alternative; this one generalizes to alignment logic SQL can't
    express (nearest-by tolerance, multi-column staleness rules).

    The cogroup key is a COARSE user bucket (user_id % n), not the
    user: per-group Arrow round-trips dominate when groups are tiny
    (1500 per-user groups ran ~11 s at sf0.1; 64 bucketed groups with
    merge_asof(by="user_id") doing the per-user split inside pandas
    run the same alignment ~10x faster). The bucket count ADAPTS to
    the input — max(64, events/131072), one metadata-only count() —
    so a bucket's pandas batch stays ~Arrow-sized at any scale
    instead of growing O(N/64) (the r11 pandas-batch audit measured
    the pinned-64 form at 6.7x growth per data decade; adaptive
    buckets cap it). Bucketing by user hash keeps every user's rows
    in exactly one batch, so merge_asof(by="user_id") semantics are
    scale-invariant.

    Ties: at equal click ts merge_asof takes the last row in sort
    order, and the oracle's window orders clicks before purchases at
    the same instant — both sides resolve ties identically.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    n_buckets = max(64, events.count() // 131_072)
    bucket = (F.col("user_id") % n_buckets).alias("bucket")
    # The click side's user_id/ts are ALIASED to fresh names: both
    # branches descend from the one `events` frame, so without the
    # aliases the two cogroup children share those attributes
    # (same exprIds) and column pruning under an output-pruning
    # parent (df.count(), a narrow projection) ships each shared
    # column ONLY with the left child — the click frame then reaches
    # pandas missing user_id/ts and the UDF crashes. Full-output
    # consumers (collect, noop write, the oracle differential) never
    # prune, which is why this only bites .count()-shaped callers
    # (found by the r11 verify drive; fresh exprIds make the children
    # disjoint so pruning cannot cross-assign them).
    clicks = events.where(F.col("event_type") == "click").select(
        bucket,
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        "event_id",
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        bucket, "user_id", "ts", F.col("event_id").alias("purchase_id")
    )

    def align(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        # left = purchases, right = clicks for one user bucket
        p = left.sort_values(["ts", "purchase_id"])
        c = right.sort_values(["click_ts", "event_id"])[
            ["c_user_id", "click_ts"]
        ].rename(columns={"c_user_id": "user_id"})
        if c.empty:
            out = p.assign(click_ts=pd.NaT)
        else:
            out = pd.merge_asof(
                p,
                c,
                left_on="ts",
                right_on="click_ts",
                by="user_id",
                direction="backward",
            )
        lag = (out["ts"] - out["click_ts"]).dt.total_seconds() * 1_000_000
        out["lag_us"] = lag.round().astype("Int64")
        return out[["purchase_id", "user_id", "click_ts", "lag_us"]]

    out_schema = (
        "purchase_id bigint, user_id bigint, click_ts timestamp, lag_us bigint"
    )
    return (
        purchases.groupBy("bucket")
        .cogroup(clicks.groupBy("bucket"))
        .applyInPandas(align, out_schema)
    )
