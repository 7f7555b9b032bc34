"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch the brief's "custom stateful operators" clause
points at: when watermarked windows / ``dropDuplicatesWithinWatermark``
can't express the per-key logic, Structured Streaming hands each key's
micro-batch rows to Python together with an arbitrary persisted state
value. State lives in the state store (checkpointed, per-key,
partitioned by the groupBy key), so the operator scales exactly like
a streaming aggregation: shuffle on user_id once, state strictly
per-key — no global coordination anywhere.

Here: a running per-user accumulator (event count, value sum,
distinct-type set, first/last event time) that survives across
micro-batches and emits the updated totals for every user touched by
a batch — the CDC-style "upsert running aggregate" shape that feeds
a serving store via foreachBatch. All state merges are
order-insensitive, so results are independent of how the input is
split into batches (asserted in tests/test_streaming.py by running
the same data as 1 batch and as N batches).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("n_types", IntegerType()),
        StructField("first_ts_us", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)

# state carries timestamps as int64 micros — simple, timezone-proof
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("types", ArrayType(StringType())),
        StructField("first_ts_us", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals as a stateful stream transform.

    Input must have (user_id, ts, event_type, value); output emits
    one row per user per micro-batch that touched them, with the
    cumulative totals so far ("update" semantics).
    """

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, types, first_us, last_us = state.get
            types = set(types)
        else:
            n, total, types, first_us, last_us = 0, 0.0, set(), None, None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            types.update(pdf["event_type"])
            ts_us = pdf["ts"].astype("int64") // 1000  # ns → us
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, total, sorted(types), first_us, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "n_types": [len(types)],
                "first_ts_us": [first_us],
                "last_ts_us": [last_us],
            }
        )

    return (
        events.select("user_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
