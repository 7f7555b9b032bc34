"""Semantic assertions for analytics-extras batch 9 (classical
decomposition, DP histogram, logistic GD, haversine hubs) beyond the
DuckDB oracle checks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_decompose_seasonal_sums_near_zero(spark, sf_dir):
    rows = Q["timeseries_classical_decompose"](spark, sf_dir).collect()
    assert len(rows) == 7
    assert sorted(r["dow"] for r in rows) == list(range(1, 8))
    # seasonal indexes of an additive decomposition are centered:
    # day-count-weighted mean of detrended values is ~0 by construction
    weighted = sum(r["seasonal_index"] * r["n_days"] for r in rows)
    total_days = sum(r["n_days"] for r in rows)
    daily_scale = load_table(spark, sf_dir, "orders").agg(
        F.sum("o_totalprice")
    ).collect()[0][0] / max(total_days, 1)
    assert abs(weighted / total_days) < daily_scale * 0.05
    for r in rows:
        assert r["remainder_std"] >= 0


def test_dp_histogram_capping_bounds(spark, sf_dir):
    rows = Q["privacy_dp_histogram"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    pairs = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        # capped count never exceeds the true count, nor 3 per user
        assert r["capped_count"] <= r["true_count"]
        assert r["capped_count"] <= 3 * pairs[r["event_type"]]
        # Laplace(b=3) noise stays modest
        assert abs(r["dp_count"] - r["capped_count"]) < 45


def test_logistic_gd_descends_from_chance(spark, sf_dir):
    r = Q["ml_logistic_regression_gd"](spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    p_pos = (
        li.agg(
            F.avg(F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0))
        ).collect()[0][0]
    )
    # loss at w=0 is ln 2; three GD steps must improve on it
    assert r["log_loss"] < math.log(2.0)
    # and can never beat the entropy of the label marginal
    entropy = -(p_pos * math.log(p_pos) + (1 - p_pos) * math.log(1 - p_pos))
    assert r["log_loss"] >= entropy - 0.05
    assert r["n_points"] == li.count()


def test_haversine_hubs_cover_all_customers(spark, sf_dir):
    rows = Q["geo_haversine_nearest_hub"](spark, sf_dir).collect()
    c = load_table(spark, sf_dir, "customer")
    assert sum(r["n_customers"] for r in rows) == c.count()
    for r in rows:
        assert 0 <= r["hub_id"] < 4
        assert 0 <= r["avg_km"] <= r["max_km"]
        # half the earth's circumference bounds any great-circle distance
        assert r["max_km"] <= math.pi * 6371.0 + 1
