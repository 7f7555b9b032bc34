"""Semantic assertions for analytics-extras batch 15 (ratio CI,
duplicate transactions, Mahalanobis outliers) beyond the DuckDB
oracle checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_ratio_ci_brackets_point_estimate(spark, sf_dir):
    rows = Q["agg_ratio_metrics_ci"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["ci_lo"] <= r["revenue_per_order"] <= r["ci_hi"]
        assert r["se_delta"] >= 0
        # CI width is symmetric around the point estimate
        assert (r["ci_hi"] - r["revenue_per_order"]) == pytest.approx(
            r["revenue_per_order"] - r["ci_lo"], abs=0.01
        )


def test_duplicate_transactions_block_invariants(spark, sf_dir):
    rows = Q["dq_duplicate_transactions"](spark, sf_dir).collect()
    for r in rows:
        assert r["orderkey_a"] < r["orderkey_b"]
        assert 0 <= r["days_apart"] <= 90
        # same $500 band by construction
        assert int(r["amount_a"] // 500) == int(r["amount_b"] // 500)


def test_mahalanobis_ranks_are_extreme(spark, sf_dir):
    rows = sorted(
        Q["embedding_outlier_mahalanobis"](spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert len(rows) == 10
    dists = [r["mahalanobis"] for r in rows]
    assert dists == sorted(dists, reverse=True)
    # for standardized 64-dim data, E[d^2] = 64 => typical d ~ 8;
    # the top outliers must exceed the typical distance
    assert dists[0] > 8.0
    assert all(d > 0 for d in dists)
