"""transformWithStateInPandas tier — Spark 4's typed arbitrary-state
API (the successor of applyInPandasWithState, with named/typed state
variables, TTL, and timers).

ENVIRONMENT GATE (soft): the Python side of transformWithState
speaks protobuf to the JVM state server. ``google.protobuf`` isn't
pip-installed in this container (and installs are disallowed), but
``session.ensure_protobuf`` locates a bundled pure-Python runtime
(the Google Cloud SDK ships one) and exposes it to driver and
workers — so the processor DOES execute here and
tests/test_streaming.py::test_typed_state_processor runs the full
RocksDB-backed stream path. ``tws_available()`` still reports
honestly on hosts where no runtime can be found. The processor
follows the same order-insensitivity contract as
streaming/stateful.py: MapState updates are commutative counts, so
results are invariant to micro-batch slicing and arrival order.

The semantic contract (what the processor computes) is oracle-gated
in batch form as the registry query ``stream_type_counts_batch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def tws_available() -> bool:
    """True when transformWithStateInPandas can run (needs protobuf).

    Delegates to :func:`hivetomysql_spark.session.ensure_protobuf`,
    which probes bundled pure-Python protobuf runtimes (e.g. the
    Google Cloud SDK's) when the package isn't installed — note the
    PYTHONPATH it sets only reaches Python workers if the probe ran
    before the JVM launched (get_spark does this)."""
    from hivetomysql_spark.session import ensure_protobuf

    return ensure_protobuf()


TYPE_COUNTS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_types", LongType()),
    ]
)

try:  # the import itself is safe without protobuf; execution is not
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EventTypeCounter(StatefulProcessor):
        """Per-user event-type histogram in MapState; emits the
        user's running (n_events, n_types) after every micro-batch.

        MapState is keyed by event_type with a bigint count — the
        increment is commutative, so any partitioning of the input
        into micro-batches (and any arrival order within them)
        converges to the same state. RocksDB-backed at scale: state
        per user is O(distinct event types), never O(events).
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.counts = handle.getMapState(
                "counts", "event_type string", "n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            for pdf in rows:
                for etype, grp in pdf.groupby("event_type"):
                    prev = (
                        self.counts.getValue((etype,))[0]
                        if self.counts.containsKey((etype,))
                        else 0
                    )
                    self.counts.updateValue((etype,), (prev + len(grp),))
            n_events, n_types = 0, 0
            for _k, v in self.counts.iterator():
                n_events += v[0]
                n_types += 1
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n_events],
                    "n_types": [n_types],
                }
            )

        def close(self) -> None:
            pass

except ImportError:  # pragma: no cover - pyspark always ships the module
    EventTypeCounter = None  # type: ignore[assignment]


def type_counts_stream(events: DataFrame) -> DataFrame:
    """Wire the typed-state processor onto an events stream (requires
    tws_available(); the RocksDB state store provider must be set:
    spark.sql.streaming.stateStore.providerClass =
    ...state.RocksDBStateStoreProvider)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        EventTypeCounter(),
        outputStructType=TYPE_COUNTS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def type_counts_batch(events: DataFrame) -> DataFrame:
    """The processor's semantic contract, declaratively: what the
    converged MapState holds per user after the whole stream."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("event_type").alias("n_types"),
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

SESSION_GAP_MS = 1800 * 1000  # 30 min, matching streaming/sessions.py

if EventTypeCounter is not None:

    class TimerSessionizer(StatefulProcessor):
        """Gap sessionization via EVENT-TIME TIMERS — the
        transformWithState capability the MapState counter doesn't
        exercise: per-user ValueState holds the open session
        (start, last, n); each batch re-arms one timer at
        last_event + gap; when the watermark passes that expiry the
        timer fires, the closed session is EMITTED from
        handleExpiredTimer, and state clears so the next event opens
        a fresh session.

        Same 30-min-gap semantics as the applyInPandasWithState
        sessionizer for in-order arrival; like every timer-based
        sessionizer it closes eagerly on watermark passage, so an
        event arriving later than the gap (but within the allowed
        lateness) starts a new session rather than re-opening the
        closed one — the documented approximation production
        timer sessionizers (Flink's, Dataflow's) share. State per
        user is O(1); timers are the state store's, not the
        driver's."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.sess = handle.getValueState(
                "sess", "start_us bigint, last_us bigint, n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            parts = [pdf["ts_us"] for pdf in rows]
            us = pd.concat(parts).sort_values().astype("int64").tolist()
            start = last = None
            n = 0
            if self.sess.exists():
                start, last, n = self.sess.get()
            gap_us = SESSION_GAP_MS * 1000
            closed = []
            # gap-split WITHIN the batch: sessions whose closing gap
            # is already visible in the data emit immediately; only
            # the trailing open session waits on the timer
            for t in us:
                if last is None:
                    start, last, n = t, t, 1
                elif t - last <= gap_us:
                    last, n = t, n + 1
                else:
                    closed.append((key[0], start, last, n))
                    start, last, n = t, t, 1
            self.sess.update((start, last, n))
            # exactly one live timer per key, re-armed to the newest
            # last-event expiry
            for tm in self.handle.listTimers():
                self.handle.deleteTimer(tm)
            self.handle.registerTimer(last // 1000 + SESSION_GAP_MS)
            if closed:
                yield pd.DataFrame(
                    closed,
                    columns=[
                        "user_id",
                        "session_start_us",
                        "session_end_us",
                        "n_events",
                    ],
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            import pandas as pd

            if self.sess.exists():
                start, last, n = self.sess.get()
                self.sess.clear()
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "session_start_us": [start],
                        "session_end_us": [last],
                        "n_events": [n],
                    }
                )

        def close(self) -> None:
            pass

else:  # pragma: no cover - pyspark always ships the module
    TimerSessionizer = None  # type: ignore[assignment]


def timer_sessions_stream(events: DataFrame) -> DataFrame:
    """Wire the timer sessionizer onto an events stream: event-time
    mode requires a watermark on the grouping input; ts_us rides
    alongside for exact microsecond session bounds."""
    withmark = events.withWatermark("ts", "0 seconds").select(
        "user_id", "ts", F.unix_micros("ts").alias("ts_us")
    )
    return withmark.groupBy("user_id").transformWithStateInPandas(
        TimerSessionizer(),
        outputStructType=SESSION_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


RECENT_N = 5

RECENT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_recent", LongType()),
        StructField("recent_sum_cents", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)

if EventTypeCounter is not None:

    class RecentEventsTracker(StatefulProcessor):
        """Last-N rolling feature via LIST STATE — the remaining
        typed-state primitive (MapState: type counter; ValueState +
        timers: sessionizer). Keeps each user's N most-recent
        (ts_us, event_id, value_cents) triples: append the batch,
        keep the top N by (event time, event_id), emit the feature row
        (count + integer-cents sum, so the contract is float-free).
        event_id rides in state purely as the tie-break — duplicate
        timestamps at the N boundary must keep the SAME events the
        batch twin / oracle keep (both break ties by event_id), or the
        two paths diverge on tie-heavy data. The read-truncate-put
        cycle is O(N) per key per batch — the feature-server pattern
        (recent-history embeddings, velocity checks) where state must
        stay bounded no matter how hot the key."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.recent = handle.getListState(
                "recent", "ts_us bigint, event_id bigint, cents bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            items = list(self.recent.get()) if self.recent.exists() else []
            for pdf in rows:
                items.extend(
                    (int(t), int(e), int(c))
                    for t, e, c in zip(
                        pdf["ts_us"], pdf["event_id"], pdf["cents"]
                    )
                )
            items.sort()
            items = items[-RECENT_N:]
            self.recent.put(items)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_recent": [len(items)],
                    "recent_sum_cents": [sum(c for _, _, c in items)],
                    # freshness marker: lets a consumer (and the test)
                    # pick each key's newest feature row
                    "last_ts_us": [items[-1][0] if items else 0],
                }
            )

        def close(self) -> None:
            pass

else:  # pragma: no cover - pyspark always ships the module
    RecentEventsTracker = None  # type: ignore[assignment]


def recent_events_stream(events: DataFrame) -> DataFrame:
    """Wire the last-N tracker onto an events stream. Values move as
    integer cents (floor(value*100 + 0.5)) so state and outputs are
    exact longs."""
    prepared = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_id").cast("long").alias("event_id"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        RecentEventsTracker(),
        outputStructType=RECENT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def recent_events_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the converged last-N answer per user (top N by
    event time over the whole input)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc(F.col("event_id"))
    )
    ranked = events.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= RECENT_N
    )
    return ranked.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_recent"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "recent_sum_cents"
        ),
        F.max(F.unix_micros("ts")).alias("last_ts_us"),
    )
