"""Semantic assertions for analytics-extras batch 12 (Bayesian A/B,
linear counting) beyond the DuckDB oracle checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_bayesian_ab_probability_calibration(spark, sf_dir):
    rows = Q["stats_bayesian_ab"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["p_a_beats_b"] <= 1.0
        assert 0.0 <= r["conv_a"] <= 1.0 and 0.0 <= r["conv_b"] <= 1.0
        # direction agrees: higher observed conversion => P > 1/2
        if r["conv_a"] > r["conv_b"]:
            assert r["p_a_beats_b"] > 0.5
        elif r["conv_a"] < r["conv_b"]:
            assert r["p_a_beats_b"] < 0.5


def test_linear_counting_tracks_exact(spark, sf_dir):
    r = Q["agg_linear_counting"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    assert r["exact_distinct"] == ev.select("user_id").distinct().count()
    assert r["occupied_buckets"] <= min(1024, r["exact_distinct"])
    # occupancy can only undercount collisions; the estimator corrects
    assert r["lc_estimate"] >= r["occupied_buckets"] - 1e-6
    # at load factor << 1 the estimate is tight
    assert r["rel_err"] < 0.1
