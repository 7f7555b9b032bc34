"""Semantic assertions for analytics-extras batch 23 (percentile
trend, mix-shift TVD) beyond the DuckDB oracle checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_percentile_trend_ordering(spark, sf_dir):
    rows = Q["orders_percentile_trend"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    for r in rows:
        assert r["p50"] <= r["p90"] <= r["p99"]
        assert r["tail_ratio"] >= 1.0


def test_mix_tvd_bounds_and_coverage(spark, sf_dir):
    rows = Q["drift_priority_mix_tvd"](spark, sf_dir).collect()
    assert rows
    months = (
        load_table(spark, sf_dir, "orders")
        .select(F.date_trunc("month", F.to_date("o_orderdate")))
        .distinct()
        .count()
    )
    # every month except the first has a previous month to compare to
    assert len(rows) == months - 1
    for r in rows:
        assert 0.0 <= r["tvd_vs_prev_month"] <= 1.0
        assert 1 <= r["n_categories"] <= 5
