"""Semantic assertions for analytics-extras batch 16 (quantile
normalization, RFM migration, power analysis, invoice
reconciliation) beyond the DuckDB oracle checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_quantile_normalize_aligns_marginals(spark, sf_dir):
    rows = Q["groupedmap_quantile_normalize"](spark, sf_dir).collect()
    assert len(rows) >= 2
    ev = load_table(spark, sf_dir, "events")
    gmin, gmax = ev.agg(F.min("value"), F.max("value")).collect()[0]
    means = [r["mean_norm"] for r in rows]
    # after normalization all groups share the global marginal:
    # group means collapse toward each other
    assert max(means) - min(means) < (gmax - gmin) * 0.1
    for r in rows:
        assert gmin - 1e-6 <= r["min_norm"] <= r["max_norm"] <= gmax + 1e-6
        assert r["std_norm"] > 0


def test_rfm_migration_rows_and_columns_partition(spark, sf_dir):
    rows = Q["event_rfm_migration_matrix"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["q_from"] <= 4 and 1 <= r["q_to"] <= 4
    # row sums: each from-quartile's migrants are ~n/4 of both-period
    # customers (NTILE balance)
    from collections import defaultdict

    by_from = defaultdict(int)
    for r in rows:
        by_from[r["q_from"]] += r["n_customers"]
    sizes = list(by_from.values())
    assert max(sizes) - min(sizes) <= max(2, 0.6 * max(sizes))


def test_power_analysis_monotone_in_mde(spark, sf_dir):
    rows = Q["stats_power_analysis"](spark, sf_dir).collect()
    for r in rows:
        # smaller detectable effect => (much) larger sample
        assert r["n_per_arm_1pct"] > r["n_per_arm_5pct"]
        # 5x smaller MDE => 25x sample size
        assert r["n_per_arm_1pct"] == pytest.approx(
            r["n_per_arm_5pct"] * 25, rel=0.02
        )


def test_invoice_reconciliation_reports_fixture_inconsistency(spark, sf_dir):
    rows = Q["dq_invoice_reconciliation"](spark, sf_dir).collect()
    assert rows
    total = sum(r["n_orders"] for r in rows)
    within = sum(r["n_within_1pct"] for r in rows)
    # the synthetic fixtures do NOT balance header vs lines — the
    # audit must say so (near-zero pass rate), not paper over it
    assert within < total * 0.05
    for r in rows:
        assert 0 <= r["median_rel_gap"] <= r["max_rel_gap"]
