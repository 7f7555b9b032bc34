"""Semantic assertions for analytics-extras batch 24 (realized
volatility, activation rate) beyond the DuckDB oracle checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_realized_volatility_sane(spark, sf_dir):
    r = Q["finance_realized_volatility"](spark, sf_dir).collect()[0]
    assert r["n_days"] > 0
    assert 0 < r["avg_annualized_vol"] <= r["max_annualized_vol"]
    assert r["max_abs_daily_return"] > 0


def test_activation_rate_bounds(spark, sf_dir):
    r = Q["event_activation_rate"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    assert r["n_users"] == ev.select("user_id").distinct().count()
    assert 0 <= r["n_activated"] <= r["n_users"]
    assert abs(r["activation_rate"] - r["n_activated"] / r["n_users"]) < 0.001
    # week-1 count includes at least the first event itself
    assert r["avg_week1_events"] >= 1.0
