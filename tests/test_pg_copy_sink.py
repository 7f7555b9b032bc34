"""PostgreSQL COPY sink integration tests (verdict r12 #6).

Spins up a SCRATCH PostgreSQL 15 server (initdb + pg_ctl as the
``postgres`` system user, unix socket only, fsync off) and drives
:mod:`hivetomysql_spark.sinks.pg_copy` against it — the
concurrent-writer target the JDBC sweep could not have: embedded
Derby serializes writers at the engine level, so its numPartitions
axis was flat by construction (tools/jdbc_sweep.py r12). Everything
skips cleanly when the container has no psql/initdb or no postgres
user (the sink itself is environment-gated the same way).

Covers: round-trip fidelity through COPY text escaping (tabs,
newlines, backslashes, literal ``\\N``, NULLs, floats, timestamps),
truncate idempotency (run-twice == run-once), the atomic staged
swap (run-twice stable AND a mid-load failure leaves the target
untouched — PostgreSQL's transactional DDL makes this stronger than
the JDBC staged path), and a 4-stream parallel write.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import pytest

from hivetomysql_spark.sinks import pg_copy as PG

PORT = "55433"


def _su_pg(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "postgres", "-s", "/bin/bash", "-c", cmd],
        capture_output=True,
        text=True,
        timeout=120,
    )


@pytest.fixture(scope="module")
def pg():
    if not (shutil.which("psql") and shutil.which("initdb")
            and shutil.which("pg_ctl")):
        pytest.skip("PostgreSQL binaries not available")
    if os.geteuid() != 0:
        pytest.skip("scratch server needs root to su postgres")
    probe = subprocess.run(
        ["su", "postgres", "-s", "/bin/bash", "-c", "true"],
        capture_output=True,
    )
    if probe.returncode != 0:
        pytest.skip("no postgres system user")
    base = tempfile.mkdtemp(prefix="pgcopytest")
    os.chmod(base, 0o755)
    shutil.chown(base, user="postgres")
    data = os.path.join(base, "data")
    r = _su_pg(f"initdb -D {data} -E UTF8 --no-sync")
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"initdb failed: {r.stderr[-200:]}")
    r = _su_pg(
        f"pg_ctl -D {data} -o '-p {PORT} -k {base} "
        "-c listen_addresses=\"\" -c fsync=off "
        "-c synchronous_commit=off' "
        f"-l {base}/log -w start"
    )
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"pg_ctl start failed: {r.stderr[-200:]}")
    args = ["-h", base, "-p", PORT, "-U", "postgres", "-d", "postgres"]
    yield args
    _su_pg(f"pg_ctl -D {data} -m immediate stop")
    shutil.rmtree(base, ignore_errors=True)


def _q(pg_args, sql: str) -> str:
    return PG.run_psql(pg_args, sql).strip()


@pytest.fixture()
def tricky_df(spark):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [
            (1, "plain", 1.5),
            (2, "tab\there", -0.25),
            (3, "new\nline", None),
            (4, "back\\slash", 2.0),
            (5, "\\N", 0.0),  # literal backslash-N, NOT null
            (6, None, 3.25),
        ],
        "id long, txt string, val double",
    ).withColumn("ts", F.to_timestamp(F.lit("2024-02-29 12:34:56")))


def test_append_roundtrip_escaping(pg, tricky_df):
    _q(pg, "DROP TABLE IF EXISTS t_rt; "
           "CREATE TABLE t_rt (id bigint, txt text, val float8, "
           "ts timestamp)")
    n = PG.write_pg_copy(tricky_df, "t_rt", pg, mode="append")
    assert n == 6
    assert _q(pg, "SELECT count(*) FROM t_rt") == "6"
    # escaping fidelity: every metacharacter round-trips byte-exact
    assert _q(pg, "SELECT txt FROM t_rt WHERE id=2") == "tab\there"
    assert _q(pg, "SELECT txt FROM t_rt WHERE id=3") == "new\nline"
    assert _q(pg, "SELECT txt FROM t_rt WHERE id=4") == "back\\slash"
    assert _q(pg, "SELECT txt FROM t_rt WHERE id=5") == "\\N"
    assert _q(pg, "SELECT txt IS NULL FROM t_rt WHERE id=6") == "t"
    assert _q(pg, "SELECT val IS NULL FROM t_rt WHERE id=3") == "t"
    assert _q(pg, "SELECT sum(val) FROM t_rt") == "6.5"
    assert (
        _q(pg, "SELECT count(*) FROM t_rt "
               "WHERE ts = '2024-02-29 12:34:56'") == "6"
    )


def test_truncate_mode_is_idempotent(pg, tricky_df):
    _q(pg, "DROP TABLE IF EXISTS t_tr; "
           "CREATE TABLE t_tr (id bigint, txt text, val float8, "
           "ts timestamp)")
    PG.write_pg_copy(tricky_df, "t_tr", pg, mode="truncate")
    PG.write_pg_copy(tricky_df, "t_tr", pg, mode="truncate")
    assert _q(pg, "SELECT count(*) FROM t_tr") == "6"


def test_staged_swap_run_twice_and_failure_isolation(pg, tricky_df, spark):
    _q(pg, "DROP TABLE IF EXISTS t_st CASCADE; "
           "CREATE TABLE t_st (id bigint, txt text, val float8, "
           "ts timestamp)")
    assert PG.write_pg_copy(tricky_df, "t_st", pg, mode="staged") == 6
    assert PG.write_pg_copy(tricky_df, "t_st", pg, mode="staged") == 6
    assert _q(pg, "SELECT count(*) FROM t_st") == "6"

    # mid-load failure: rows that cannot COPY into the staging table
    # (string into bigint) must abort BEFORE the swap transaction —
    # the live table keeps its previous contents
    poison = spark.createDataFrame(
        [("not-a-number", "x", 0.0, None)],
        "id string, txt string, val double, ts timestamp",
    )
    with pytest.raises(Exception, match="COPY stream failed|psql failed"):
        PG.write_pg_copy(poison, "t_st", pg, mode="staged")
    assert _q(pg, "SELECT count(*) FROM t_st") == "6"
    assert _q(pg, "SELECT count(*) FROM t_st WHERE id IS NULL") == "0"


def test_parallel_streams_exact_count(pg, spark):
    _q(pg, "DROP TABLE IF EXISTS t_par; "
           "CREATE TABLE t_par (id bigint, v float8)")
    from pyspark.sql import functions as F

    df = spark.range(20_000).select(
        "id", (F.col("id") * 0.5).alias("v")
    ).repartition(4)
    n = PG.write_pg_copy(df, "t_par", pg, mode="append", num_partitions=4)
    assert n == 20_000
    assert _q(pg, "SELECT count(*) FROM t_par") == "20000"
    assert _q(pg, "SELECT sum(id) FROM t_par") == str(
        20_000 * 19_999 // 2
    )
