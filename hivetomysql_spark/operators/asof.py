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
