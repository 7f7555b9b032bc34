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
