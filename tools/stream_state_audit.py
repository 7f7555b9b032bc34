"""Streaming stateful-operator batch audit: measure what actually
enters a Python worker per key per micro-batch, at two scales.

tests/test_pandas_batch_gate.py gates the BATCH pandas surface and
excludes the streaming stateful APIs with a rationale ("bounded by
the micro-batch, not the table"); this tool replaces that sentence
with numbers. It spies on ``applyInPandasWithState`` (the concrete
mixin method GroupedData dispatches through), wraps the user update
function so every (key, micro-batch) invocation reports its chunk
count, total rows, and max Arrow chunk rows through an accumulator,
and runs the engine's stateful streams (running_user_totals,
gap_sessionize) from a 4-file parquet source (maxFilesPerTrigger=1,
so the micro-batch COUNT stays fixed and per-batch volume scales
with the fixture) at sf0.01 and sf0.1.

What bounded means here, per component:
- Arrow chunk rows: <= spark.sql.execution.arrow.maxRecordsPerBatch
  regardless of scale (the iterator-of-frames contract).
- Rows per (key, micro-batch): scales with the MICRO-BATCH, i.e.
  with source rate x trigger interval — an ops knob, not the table
  size. For the user-keyed ops this is further divided by key
  cardinality (~rows/users); a LOW-cardinality key (the typed-state
  type_counts demo, 5 keys) concentrates rows/5 per invocation and
  is priced by trigger sizing, exactly like any Flink/Spark keyed
  stream.
- State per key: O(1) fields plus a set bounded by the event-type
  domain; reported as the pickled state length.

Usage: python tools/stream_state_audit.py [SF_SMALL] [SF_BIG]
Defaults: /root/testdata/sf0.01 /root/testdata/sf0.1.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.accumulators import AccumulatorParam  # noqa: E402
from pyspark.sql.pandas.group_ops import PandasGroupedOpsMixin  # noqa: E402

from hivetomysql_spark.session import get_spark  # noqa: E402
from hivetomysql_spark.tables import load_table  # noqa: E402

SMALL_DEFAULT = "/root/testdata/sf0.01"
BIG_DEFAULT = "/root/testdata/sf0.1"

try:  # wrapped closures are defined here; workers must unpickle them
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass


class _ListParam(AccumulatorParam):
    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


_REAL = PandasGroupedOpsMixin.applyInPandasWithState


def _install(acc):
    def spy(self, func, outputStructType, stateStructType, outputMode, timeoutConf):
        def wrapped(key, pdfs, state):
            import pickle

            chunks, rows, max_chunk = 0, 0, 0

            def counting():
                nonlocal chunks, rows, max_chunk
                for pdf in pdfs:
                    chunks += 1
                    rows += len(pdf)
                    max_chunk = max(max_chunk, len(pdf))
                    yield pdf

            out = list(func(key, counting(), state))
            try:
                state_len = len(pickle.dumps(state.get)) if state.exists else 0
            except Exception:  # noqa: BLE001
                state_len = -1
            acc.add([(chunks, rows, max_chunk, state_len)])
            yield from out

        return _REAL(
            self, wrapped, outputStructType, stateStructType, outputMode, timeoutConf
        )

    PandasGroupedOpsMixin.applyInPandasWithState = spy


def _uninstall():
    PandasGroupedOpsMixin.applyInPandasWithState = _REAL


def run_stream(spark, sf_dir: str, op, output_mode: str):
    """Run one stateful op over the events fixture as a 4-micro-batch
    file stream; returns the accumulator records
    [(chunks, rows, max_chunk_rows, state_bytes) per invocation]."""
    acc = spark.sparkContext.accumulator([], _ListParam())
    tmp = tempfile.mkdtemp(prefix="state_audit_")
    try:
        events = load_table(spark, sf_dir, "events")
        src = f"{tmp}/src"
        events.repartition(4).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        _install(acc)
        try:
            q = (
                op(stream)
                .writeStream.format("noop")
                .outputMode(output_mode)
                .option("checkpointLocation", f"{tmp}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        finally:
            _uninstall()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return list(acc.value)


def summarize(records):
    if not records:
        return None
    inv = len(records)
    rows = [r[1] for r in records]
    return {
        "invocations": inv,
        "rows_total": sum(rows),
        "rows_max": max(rows),
        "max_chunk": max(r[2] for r in records),
        "state_max_bytes": max(r[3] for r in records),
    }


def main() -> int:
    args = [a for a in sys.argv[1:]]
    rocksdb = "--rocksdb" in args
    args = [a for a in args if a != "--rocksdb"]
    small = args[0] if len(args) > 0 else SMALL_DEFAULT
    big = args[1] if len(args) > 1 else BIG_DEFAULT

    from hivetomysql_spark.streaming.sessions import gap_sessions
    from hivetomysql_spark.streaming.stateful import running_user_totals

    ops = [
        ("running_user_totals(user key)", running_user_totals, "update"),
        ("gap_sessions(user key)", gap_sessions, "update"),
    ]
    spark = get_spark(app_name="stream_state_audit")
    spark.sparkContext.setLogLevel("ERROR")
    if rocksdb:
        # the provider the typed-state tier documents for scale
        # (typed_state.py) — the Arrow-batch numbers this audit
        # reports must hold under it too (verdict r11 #3)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        print("# state store provider: RocksDB")
    max_records = int(
        spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    )

    print(
        f"# applyInPandasWithState per-(key, micro-batch) batches, "
        f"{small} -> {big} (4 micro-batches each; "
        f"maxRecordsPerBatch={max_records})"
    )
    print(
        f"{'op':<32} {'scale':<7} {'inv':>7} {'rows_max':>9} "
        f"{'chunk_max':>9} {'state_max':>9}"
    )
    for name, op, mode in ops:
        for tag, sf in (("small", small), ("big", big)):
            s = summarize(run_stream(spark, sf, op, mode))
            if s is None:
                print(f"{name:<32} {tag:<7} no invocations captured")
                continue
            flag = (
                "  <-- chunk exceeds maxRecordsPerBatch"
                if s["max_chunk"] > max_records
                else ""
            )
            print(
                f"{name:<32} {tag:<7} {s['invocations']:>7} "
                f"{s['rows_max']:>9} {s['max_chunk']:>9} "
                f"{s['state_max_bytes']:>9}{flag}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
