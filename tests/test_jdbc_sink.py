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
