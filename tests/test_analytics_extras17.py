"""Semantic assertions for analytics-extras batch 17 (SQL UDFs,
EXECUTE IMMEDIATE, boilerplate ratio) beyond the DuckDB oracle
checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_sql_udf_shares_sum_to_one(spark, sf_dir):
    rows = Q["func_sql_udf"](spark, sf_dir).collect()
    assert len(rows) == 3
    assert sum(r["revenue_share"] for r in rows) == pytest.approx(1.0, abs=0.01)
    for r in rows:
        assert r["avg_order_value"] > 0


def test_parameterized_exec_matches_static_filter(spark, sf_dir):
    rows = Q["sql_parameterized_exec"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    expect = (
        o.where((F.col("o_totalprice") > 50000) & (F.col("o_orderstatus") == "F"))
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    got = {r["o_orderpriority"]: r["n_orders"] for r in rows}
    assert got == {r["o_orderpriority"]: r["count"] for r in expect}


def test_boilerplate_ratio_bounds_and_signal(spark, sf_dir):
    rows = Q["text_boilerplate_ratio"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    for r in rows:
        assert 0.0 <= r["boilerplate_ratio"] <= 1.0
        assert r["n_boilerplate"] <= r["n_shingles"]
    # the synthetic corpus repeats phrases heavily: boilerplate must
    # be detected somewhere
    assert any(r["n_boilerplate"] > 0 for r in rows)
