"""Semantic assertions for analytics-extras batch 26 (peak
concurrency) beyond the DuckDB oracle checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_peak_concurrency_bounds(spark, sf_dir):
    r = Q["events_peak_concurrency"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    # at most one active session per user at any instant
    assert 1 <= r["peak_concurrency"] <= n_users
    # session count agrees with the shared sessionizer
    twin = Q["stream_gap_sessions_batch"](spark, sf_dir).collect()
    assert r["n_sessions"] == sum(t["n_sessions"] for t in twin)
    # the peak instant lies within the observed event-time span
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert lo <= r["peak_at"] <= hi
