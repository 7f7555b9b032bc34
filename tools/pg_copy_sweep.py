"""Measure the parallel-write axis of the COPY sink against a real
concurrent-writer target (verdict r12 #6).

tools/jdbc_sweep.py measured the JDBC sink's batchsize axis against
embedded Derby, but Derby serializes concurrent writers at the
engine level, so its numPartitions axis was flat BY CONSTRUCTION.
This sweep drives :func:`hivetomysql_spark.sinks.pg_copy.
write_pg_copy` against a scratch PostgreSQL 15 server (the one real
multi-writer engine in this container) across COPY stream counts,
holding the row volume fixed — the missing measurement for sizing
``num_partitions`` / the JDBC ``DEFAULT_MAX_WRITE_CONNECTIONS`` cap.

Usage: python tools/pg_copy_sweep.py [rows] [streams...]
       (defaults: 2_000_000 rows; streams 1 2 4 8 16)

Starts/stops its own server under a temp dir (root + a ``postgres``
system user required, same gating as tests/test_pg_copy_sink.py);
prints a JSON line per cell and a summary table.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hivetomysql_spark.session import get_spark  # noqa: E402
from hivetomysql_spark.sinks import pg_copy as PG  # noqa: E402

PORT = "55434"


def su_pg(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "postgres", "-s", "/bin/bash", "-c", cmd],
        capture_output=True, text=True, timeout=300,
    )


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    streams = [int(x) for x in sys.argv[2:]] or [1, 2, 4, 8, 16]
    if not (shutil.which("psql") and shutil.which("initdb")):
        print("SKIP: no PostgreSQL binaries")
        return 0
    base = tempfile.mkdtemp(prefix="pgsweep")
    os.chmod(base, 0o755)
    shutil.chown(base, user="postgres")
    data = os.path.join(base, "data")
    try:
        r = su_pg(f"initdb -D {data} -E UTF8 --no-sync")
        assert r.returncode == 0, r.stderr[-300:]
        r = su_pg(
            f"pg_ctl -D {data} -o '-p {PORT} -k {base} "
            "-c listen_addresses=\"\" -c fsync=off "
            "-c synchronous_commit=off -c full_page_writes=off "
            "-c max_wal_size=4GB' "
            f"-l {base}/log -w start"
        )
        assert r.returncode == 0, r.stderr[-300:]
        args = ["-h", base, "-p", PORT, "-U", "postgres", "-d", "postgres"]

        spark = get_spark(app_name="pg_copy_sweep")
        spark.sparkContext.setLogLevel("ERROR")
        from pyspark.sql import functions as F

        # mixed-width payload: two ints, a float, a 36-char string —
        # ~60 B/row on the wire, so 2M rows ≈ 120 MB per cell
        df = spark.range(rows).select(
            "id",
            (F.col("id") % 997).alias("k"),
            (F.col("id") * 0.37).alias("v"),
            F.concat(F.lit("payload-"), F.md5(F.col("id").cast("string")))
            .alias("s"),
        ).cache()
        df.count()  # materialize so the sweep times ONLY the sink

        results = {}
        for n in streams:
            PG.run_psql(
                args,
                "DROP TABLE IF EXISTS sweep_t; "
                "CREATE UNLOGGED TABLE sweep_t "
                "(id bigint, k bigint, v float8, s text)",
            )
            best = float("inf")
            for _ in range(2):
                PG.run_psql(args, "TRUNCATE sweep_t")
                t0 = time.perf_counter()
                wrote = PG.write_pg_copy(
                    df, "sweep_t", args, mode="append", num_partitions=n
                )
                dt = time.perf_counter() - t0
                assert wrote == rows, (wrote, rows)
                best = min(best, dt)
            got = PG.run_psql(args, "SELECT count(*) FROM sweep_t").strip()
            assert got == str(rows), got
            results[n] = round(best, 2)
            print(json.dumps({
                "streams": n, "rows": rows, "sec": results[n],
                "mrows_per_sec": round(rows / best / 1e6, 3),
            }), flush=True)
        base_t = results[streams[0]]
        print("\nstreams  sec     speedup")
        for n in streams:
            print(f"{n:>7}  {results[n]:<6}  {base_t / results[n]:.2f}x")
        return 0
    finally:
        su_pg(f"pg_ctl -D {data} -m immediate stop")
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
