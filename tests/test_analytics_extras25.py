"""Semantic assertions for analytics-extras batch 25 (OTIF rate,
price dispersion) beyond the DuckDB oracle checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_otif_accounting(spark, sf_dir):
    rows = Q["logistics_otif_rate"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        assert 0 <= r["n_on_time"] <= r["n_lines"]
        assert 0.0 <= r["otif_rate"] <= 1.0
        assert r["avg_lag_days"] <= r["worst_lag_days"]


def test_price_dispersion_ranked_desc(spark, sf_dir):
    rows = sorted(
        Q["pricing_dispersion_audit"](spark, sf_dir).collect(),
        key=lambda r: -r["price_cv"],
    )
    assert 0 < len(rows) <= 15
    cvs = [r["price_cv"] for r in rows]
    assert cvs == sorted(cvs, reverse=True)
    for r in rows:
        assert r["n_sales"] >= 5
        assert r["price_cv"] >= 0
        assert r["mean_unit_price"] > 0
