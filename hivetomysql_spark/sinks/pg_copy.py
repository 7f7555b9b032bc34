"""PostgreSQL bulk sink: partition-parallel ``COPY FROM STDIN``
through the ``psql`` CLI.

The reference ships rows to its target by shelling out to the
database CLI from the driver process — one ``mysql -h.. -P.. -u..``
pipe for the whole load (HiveToMysql.java:258, 550-571 via
ProcessBuilder), single-threaded by construction. This sink is the
Spark-first reincarnation of that CLI transport for PostgreSQL
targets: EVERY task streams its partition through its own
``psql ... -c "COPY tbl (cols) FROM STDIN"`` subprocess — the
server's bulk-ingest fast path (one WAL stream per writer, no
per-row round trips, no client-side statement parsing) — so write
parallelism equals DataFrame partitions exactly like the JDBC sink,
while the transport needs no JDBC driver jar at all.

Why it exists beside :mod:`hivetomysql_spark.sinks.jdbc`: COPY is
the fastest ingest path PostgreSQL has (bulk loads are typically
several times faster than batched INSERTs), and a CLI transport is
sometimes the only one available (this container ships a PostgreSQL
15 server and psql but no JDBC driver jar — exactly the situation
the r12 verdict hit when Derby's embedded engine serialized the
parallel-write axis of tools/jdbc_sweep.py).

Modes mirror the JDBC sink's idempotency ladder:

* ``append``      — plain COPY into the target.
* ``truncate``    — driver-side TRUNCATE, then COPY (the
  delete-before-insert idiom; non-atomic like the reference's
  DELETE + INSERT pair).
* ``staged``      — COPY into ``tbl__staging``, then ONE
  transaction renames staging over the target. PostgreSQL DDL is
  transactional, so unlike MySQL's RENAME dance this swap is truly
  atomic AND crash-safe: readers see the old table until commit,
  a mid-load failure leaves the target untouched, and the swap is
  a metadata flip (O(1), no row rewrite) — strictly stronger than
  ``write_jdbc_staged``'s delete+insert-select window.

Scale notes (100 TB / 1000-executor design): parallelism =
partitions; ``num_partitions`` caps the concurrent COPY streams the
target must absorb (same knob and default as the JDBC sink's
connection cap). Rows travel as COPY ``text`` format built
vectorized in pandas (Arrow batches in, one escaped ``bytes`` blob
out per batch) — the per-task cost is one regex escape pass over
string columns, not a Python loop over rows.
"""

from __future__ import annotations

import subprocess
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_COPY_STREAMS = 16  # same rationale as the JDBC sink cap

# COPY text-format metacharacters (PostgreSQL docs, "COPY" / text
# format): backslash first, then delimiter/newline/carriage return
_ESCAPES = [
    ("\\", "\\\\"),
    ("\t", "\\t"),
    ("\n", "\\n"),
    ("\r", "\\r"),
]


def _quote_ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def copy_text_block(pdf: pd.DataFrame) -> bytes:
    """One COPY text-format block for a pandas batch — vectorized:
    every column becomes an escaped string Series (NULL -> ``\\N``),
    then one ``str.cat`` joins columns with tabs and rows with
    newlines. Booleans/timestamps/floats use pandas' default str
    rendering, all of which PostgreSQL's input functions accept
    (``True``/``False``, ISO timestamps, ``1e-05``)."""
    if len(pdf) == 0:
        return b""
    cols = []
    for c in pdf.columns:
        s = pdf[c]
        mask = s.isna()
        t = s.astype("string")
        for old, new in _ESCAPES:
            t = t.str.replace(old, new, regex=False)
        t = t.mask(mask, "\\N")
        cols.append(t)
    joined = cols[0]
    for t in cols[1:]:
        joined = joined.str.cat(t, sep="\t")
    return ("\n".join(joined.tolist()) + "\n").encode("utf-8")


def run_psql(psql_args: list[str], sql: str, stdin: bytes | None = None) -> str:
    """Driver/task-side psql invocation — ``ON_ERROR_STOP`` so a
    server-side error fails the task loudly instead of scrolling by
    (the reference inspects only the process exit code too,
    HiveToMysql.java:550-567, but ships without ON_ERROR_STOP's
    equivalent and can half-apply a script)."""
    proc = subprocess.run(
        ["psql", *psql_args, "-v", "ON_ERROR_STOP=1", "-X", "-q",
         "-A", "-t", "-c", sql],
        input=stdin,
        capture_output=True,
        timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"psql failed (rc={proc.returncode}): "
            f"{proc.stderr.decode('utf-8', 'replace')[:500]}"
        )
    return proc.stdout.decode("utf-8", "replace")


def _copy_partitions(
    df: DataFrame, table: str, psql_args: list[str]
) -> int:
    """Distributed COPY: each task opens ONE psql COPY subprocess and
    streams all its Arrow batches through it. Returns rows written
    (summed from per-task counts — the action that runs the job)."""
    cols_sql = ", ".join(_quote_ident(c) for c in df.columns)
    copy_sql = f"COPY {table} ({cols_sql}) FROM STDIN"
    args = list(psql_args)

    def sink(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proc = None
        n = 0
        try:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if proc is None:
                    proc = subprocess.Popen(
                        ["psql", *args, "-v", "ON_ERROR_STOP=1", "-X",
                         "-q", "-c", copy_sql],
                        stdin=subprocess.PIPE,
                        stderr=subprocess.PIPE,
                    )
                proc.stdin.write(copy_text_block(pdf))
                n += len(pdf)
            if proc is not None:
                proc.stdin.close()
                rc = proc.wait(timeout=3600)
                if rc != 0:
                    err = proc.stderr.read().decode("utf-8", "replace")
                    raise RuntimeError(
                        f"COPY stream failed (rc={rc}): {err[:500]}"
                    )
        finally:
            if proc is not None and proc.poll() is None:
                proc.kill()
        yield pd.DataFrame({"rows": [n]})

    out = df.mapInPandas(sink, "rows long")
    return int(out.agg(F.sum("rows")).first()[0] or 0)


def write_pg_copy(
    df: DataFrame,
    table: str,
    psql_args: list[str],
    mode: str = "append",
    num_partitions: int | None = None,
) -> int:
    """Write ``df`` into PostgreSQL ``table`` via partition-parallel
    COPY. ``psql_args`` is the connection part of the psql command
    line (e.g. ``["-h", "/tmp/pgscratch", "-p", "55432", "-U",
    "postgres", "-d", "postgres"]``). Returns rows written.

    ``staged`` swaps atomically: COPY lands in ``{table}__staging``
    (created ``LIKE`` the target, recreated per run), then one
    transaction renames target -> ``__retired`` -> drops it and
    promotes staging. A concurrent reader holds its snapshot; a
    failure before COMMIT leaves the target untouched (pytest pins
    both, tests/test_pg_copy_sink.py)."""
    n_parts = num_partitions or DEFAULT_MAX_COPY_STREAMS
    if df.rdd.getNumPartitions() > n_parts:
        df = df.coalesce(n_parts)

    qt = _quote_ident(table)
    if mode == "append":
        return _copy_partitions(df, qt, psql_args)
    if mode == "truncate":
        run_psql(psql_args, f"TRUNCATE TABLE {qt}")
        return _copy_partitions(df, qt, psql_args)
    if mode == "staged":
        staging = _quote_ident(f"{table}__staging")
        retired = _quote_ident(f"{table}__retired")
        run_psql(
            psql_args,
            f"DROP TABLE IF EXISTS {staging}; "
            f"CREATE TABLE {staging} (LIKE {qt} INCLUDING DEFAULTS)",
        )
        n = _copy_partitions(df, staging, psql_args)
        run_psql(
            psql_args,
            "BEGIN; "
            f"DROP TABLE IF EXISTS {retired}; "
            f"ALTER TABLE {qt} RENAME TO {retired}; "
            f"ALTER TABLE {staging} RENAME TO {qt}; "
            f"DROP TABLE {retired}; "
            "COMMIT",
        )
        return n
    raise ValueError(f"unknown mode {mode!r}")
