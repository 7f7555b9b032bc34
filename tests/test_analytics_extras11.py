"""Semantic assertions for analytics-extras batch 11 (star flatten,
key-skew profile, ER cluster rollup, seasonal-naive backtest) beyond
the DuckDB oracle checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_star_flatten_conserves_orders(spark, sf_dir):
    rows = Q["join_star_flatten"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    for r in rows:
        assert r["n_customers"] <= r["n_orders"]
        assert r["revenue"] > 0


def test_key_skew_profile_consistency(spark, sf_dir):
    r = Q["dq_join_key_skew"](spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    assert r["n_rows"] == li.count()
    assert r["n_keys"] == li.select("l_orderkey").distinct().count()
    assert r["p50_rows_per_key"] <= r["p99_rows_per_key"] <= r["max_rows_one_key"]
    assert 0 < r["top_key_share"] <= 1
    assert r["p99_p50_ratio"] >= 1


def test_er_clusters_consistent_with_pairs(spark, sf_dir):
    clusters = Q["er_cluster_rollup"](spark, sf_dir).collect()
    pairs = Q["er_blocked_fuzzy"](spark, sf_dir).collect()
    names_in_pairs = {r["name_a"] for r in pairs} | {r["name_b"] for r in pairs}
    # every matched name lands in exactly one multi-member cluster
    assert sum(r["cluster_size"] for r in clusters) == len(names_in_pairs)
    for r in clusters:
        assert r["cluster_size"] >= 2
        assert r["canonical"] in names_in_pairs


def test_snaive_backtest_metrics_sane(spark, sf_dir):
    r = Q["timeseries_backtest_snaive"](spark, sf_dir).collect()[0]
    assert r["n_scored_days"] > 0
    assert r["mape"] >= 0
    assert r["worst_abs_err"] >= abs(r["mean_bias"])
