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
