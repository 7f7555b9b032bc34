"""Semantic assertions for analytics-extras batch 18 (stickiness,
bounce rate) beyond the DuckDB oracle checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_stickiness_bounded_by_one(spark, sf_dir):
    rows = Q["event_stickiness_dau_mau"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["stickiness"] <= 1.0
        assert r["avg_dau"] <= r["wau"] + 1e-9


def test_bounce_rate_consistent_with_sessionizer(spark, sf_dir):
    r = Q["event_bounce_rate"](spark, sf_dir).collect()[0]
    assert 0.0 <= r["bounce_rate"] <= 1.0
    assert r["n_bounces"] <= r["n_sessions"]
    ev = load_table(spark, sf_dir, "events")
    # total events conserved: sessions * avg size = events
    assert abs(r["avg_session_events"] * r["n_sessions"] - ev.count()) < (
        0.005 * r["n_sessions"] + 1
    )
    # same sessionizer as the streaming batch twin: session counts agree
    twin = Q["stream_gap_sessions_batch"](spark, sf_dir).collect()
    assert sum(t["n_sessions"] for t in twin) == r["n_sessions"]
