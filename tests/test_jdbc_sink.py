from __future__ import annotations

from hivetomysql_spark.config import DumpConf, DumpMap
from hivetomysql_spark.sinks.jdbc import build_delete_statement


def test_delete_statement_keys_on_constants():
    conf = DumpConf.from_text("ds=20240101\nmysql_table=t\n")
    mapping = DumpMap.from_text("a=x\nds=$ds\nversion=#2.0\n", conf=conf)
    sql, params = build_delete_statement("t", mapping.constant_fields)
    assert sql == "DELETE FROM t WHERE 1=1 AND `ds` = ? AND `version` = ?"
    assert params == ["20240101", "2.0"]


def test_delete_statement_no_constants():
    sql, params = build_delete_statement("t", {})
    assert sql == "DELETE FROM t WHERE 1=1"
    assert params == []


def test_jdbc_roundtrip_idempotent_derby(spark, tmp_path):
    """End-to-end JDBC sink against a REAL database (embedded Derby,
    shipped with Spark): initial load, then the delete-before-insert
    re-import run twice — the target must hold exactly one import's
    rows (reference README.md:22-24 idempotency contract)."""
    from hivetomysql_spark.sinks.jdbc import write_jdbc
    from hivetomysql_spark.sources import read_jdbc

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    conf = DumpConf.from_text(
        "mysql_table=app_t\ndelete_before_dump=true\nds=20240101\n"
    )
    mapping = DumpMap.from_text("val=x\nds=$ds\nversion=#2.0\n", conf=conf)
    df = spark.createDataFrame(
        [("a", "20240101", "2.0"), ("b", "20240101", "2.0")],
        ["val", "ds", "version"],
    )
    # first write creates the table (no pre-delete possible yet)
    plain_conf = DumpConf.from_text("mysql_table=app_t\nds=20240101\n")
    write_jdbc(
        df, plain_conf, mapping, url=url, url_params=None, ident_quote='"',
        create_table_column_types="val VARCHAR(50), ds VARCHAR(20), version VARCHAR(20)",
    )
    # two idempotent re-imports with delete-before-insert
    for _ in range(2):
        write_jdbc(df, conf, mapping, url=url, url_params=None, ident_quote='"')
    back = read_jdbc(spark, url, "app_t")
    rows = [(r.val, r.ds, r.version) for r in back.collect()]
    assert sorted(rows) == [
        ("a", "20240101", "2.0"),
        ("b", "20240101", "2.0"),
    ]

    # a different ds partition must survive a re-import of 20240101
    df2 = spark.createDataFrame([("c", "20240102", "2.0")], ["val", "ds", "version"])
    conf2 = DumpConf.from_text(
        "mysql_table=app_t\ndelete_before_dump=true\nds=20240102\n"
    )
    mapping2 = DumpMap.from_text("val=x\nds=$ds\nversion=#2.0\n", conf=conf2)
    write_jdbc(df2, conf2, mapping2, url=url, url_params=None, ident_quote='"')
    write_jdbc(df, conf, mapping, url=url, url_params=None, ident_quote='"')
    back2 = read_jdbc(spark, url, "app_t")
    assert back2.count() == 3  # a, b (20240101) + c (20240102)


def test_jdbc_staged_swap_idempotent_and_atomic(spark, tmp_path):
    """write_jdbc_staged (verdict r11 #4): the distributed write
    lands in tbl__staging and one driver-side transaction swaps the
    partition in. Contract pinned here: (a) run-twice idempotency,
    (b) a FAILURE DURING THE STAGING WRITE leaves the target exactly
    as it was (the window plain delete+append leaves open), (c) other
    ds partitions survive the swap."""
    from pyspark.sql import functions as F

    from hivetomysql_spark.sinks.jdbc import write_jdbc, write_jdbc_staged
    from hivetomysql_spark.sources import read_jdbc

    url = f"jdbc:derby:{tmp_path}/derbydb2;create=true"
    ddl = "val VARCHAR(50), ds VARCHAR(20), version VARCHAR(20)"

    def mk(rows):
        return spark.createDataFrame(rows, ["val", "ds", "version"])

    # seed: two partitions via the plain writer (creates the table)
    seed = mk([
        ("a0", "20240101", "2.0"), ("b0", "20240101", "2.0"),
        ("keep", "20240102", "2.0"),
    ])
    plain_conf = DumpConf.from_text("mysql_table=app_s\nds=20240101\n")
    write_jdbc(
        seed, plain_conf, None, url=url, url_params=None, ident_quote='"',
        create_table_column_types=ddl,
    )

    conf = DumpConf.from_text(
        "mysql_table=app_s\ndelete_before_dump=true\nds=20240101\n"
    )
    mapping = DumpMap.from_text("val=x\nds=$ds\nversion=#2.0\n", conf=conf)
    fresh = mk([("a1", "20240101", "2.0"), ("b1", "20240101", "2.0")])

    # (a) run-twice idempotency: two staged swaps == one
    for _ in range(2):
        write_jdbc_staged(
            fresh, conf, mapping, url=url, url_params=None,
            ident_quote='"', create_table_column_types=ddl,
        )
    rows = sorted(
        (r.val, r.ds) for r in read_jdbc(spark, url, "app_s").collect()
    )
    assert rows == [
        ("a1", "20240101"), ("b1", "20240101"), ("keep", "20240102"),
    ]

    # (b) fail mid staging write -> target untouched (old rows stay
    # visible; no deleted-but-not-reinserted window)
    import pytest as _pytest
    from pyspark.sql.types import StringType
    from pyspark.sql.functions import udf

    @udf(StringType())
    def boom(v):
        raise RuntimeError("mid-write failure injection")

    bad = mk(
        [("x", "20240101", "2.0"), ("y", "20240101", "2.0")]
    ).withColumn("val", boom("val"))
    with _pytest.raises(Exception):
        write_jdbc_staged(
            bad, conf, mapping, url=url, url_params=None,
            ident_quote='"', create_table_column_types=ddl,
        )
    rows2 = sorted(
        (r.val, r.ds) for r in read_jdbc(spark, url, "app_s").collect()
    )
    assert rows2 == rows, "failed staged write must not touch the target"

    # (c) recovery: the next good run swaps cleanly
    fresh2 = mk([("a2", "20240101", "2.0")])
    write_jdbc_staged(
        fresh2, conf, mapping, url=url, url_params=None,
        ident_quote='"', create_table_column_types=ddl,
    )
    rows3 = sorted(
        (r.val, r.ds) for r in read_jdbc(spark, url, "app_s").collect()
    )
    assert rows3 == [("a2", "20240101"), ("keep", "20240102")]
