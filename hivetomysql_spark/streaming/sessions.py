"""Stateful streaming gap-sessionization via ``applyInPandasWithState``.

The windowed ``session_window`` aggregation closes sessions by
watermark; this operator instead keeps the per-user session list as
explicit state and merges every incoming event into it — the custom
stateful shape the brief's streaming clause points at.

The state merge is ORDER-INSENSITIVE by construction: state is a set
of disjoint session intervals, and an event joins (and possibly
bridges) every interval within ``gap`` of it — i.e. sessions are the
connected components of the time-gap graph, a result independent of
arrival order. That makes micro-batch slicing and out-of-order
delivery unobservable in the final state (asserted in
tests/test_streaming.py by streaming shuffled files one at a time),
WITHOUT needing a watermark to hold back emission.

Scale: state is per-user and proportional to that user's OPEN session
count (intervals compress events to 4 numbers), shuffled once on
user_id — the same partitioning profile as any streaming aggregation.
A production deployment adds event-time timeout to retire idle users'
state; here sessions stay reopenable so late data is handled exactly,
not dropped.
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
    StructField,
    StructType,
)

GAP_US = 1800 * 1_000_000  # 30 min, matching the batch sessionizers

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", IntegerType()),
        StructField("total_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("longest_us", LongType()),
        StructField("latest_end_us", LongType()),
    ]
)

# parallel arrays: one entry per disjoint session interval
STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("ends", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
        StructField("sums", ArrayType(DoubleType())),
    ]
)


def _absorb(
    sessions: list[list], ts_us: int, value: float, gap_us: int
) -> None:
    """Merge one event into the disjoint session list in place.

    The event bridges every session within ``gap_us`` of it; merging
    is associative+commutative over events (connected components of
    the gap graph), which is what buys order-insensitivity.
    """
    lo, hi, n, total = ts_us, ts_us, 1, value
    keep: list[list] = []
    for s in sessions:
        if s[0] - gap_us <= ts_us <= s[1] + gap_us:
            lo = min(lo, s[0])
            hi = max(hi, s[1])
            n += s[2]
            total += s[3]
        else:
            keep.append(s)
    keep.append([lo, hi, n, total])
    sessions[:] = keep


def gap_sessions(events: DataFrame, gap_us: int = GAP_US) -> DataFrame:
    """Per-user gap sessionization as a stateful stream transform.

    Input needs (user_id, ts, value); emits, for every user touched
    by a micro-batch, the user's cumulative session summary ("update"
    semantics — the latest emission per user is the answer).
    """

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            starts, ends, ns, sums = state.get
            sessions = [list(t) for t in zip(starts, ends, ns, sums)]
        else:
            sessions = []
        for pdf in pdfs:
            ts_us = pdf["ts"].astype("int64") // 1000  # ns → us
            for t, v in zip(ts_us, pdf["value"].astype("float64")):
                _absorb(sessions, int(t), float(v), gap_us)
        sessions.sort(key=lambda s: s[0])
        state.update(
            (
                [s[0] for s in sessions],
                [s[1] for s in sessions],
                [s[2] for s in sessions],
                [s[3] for s in sessions],
            )
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [len(sessions)],
                "total_events": [sum(s[2] for s in sessions)],
                "total_value": [sum(s[3] for s in sessions)],
                "longest_us": [max(s[1] - s[0] for s in sessions)],
                "latest_end_us": [max(s[1] for s in sessions)],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
