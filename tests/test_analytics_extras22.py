"""Semantic assertions for analytics-extras batch 22 (margin
waterfall, error-budget burn, discount elasticity) beyond the DuckDB
oracle checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_margin_waterfall_bridge_identity(spark, sf_dir):
    rows = Q["orders_margin_waterfall"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # gross - discounts + tax = invoiced (within cent rounding)
        bridge = r["gross"] - r["discount_given"] + r["tax_collected"]
        assert bridge == pytest.approx(r["invoiced"], abs=0.05)
        assert 0.0 <= r["discount_rate"] <= 0.2


def test_error_budget_burn_consistency(spark, sf_dir):
    rows = Q["sre_error_budget_burn"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        assert r["n_errors"] <= r["n_events"]
        assert r["burn_rate"] == pytest.approx(
            (r["n_errors"] / r["n_events"]) / 0.25, abs=0.001
        )
        assert r["budget_violated"] == (1 if r["burn_rate"] > 1 else 0)


def test_discount_elasticity_reads_no_effect(spark, sf_dir):
    rows = Q["pricing_discount_elasticity"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    corr = rows[0]["corr_discount_quantity"]
    assert all(r["corr_discount_quantity"] == corr for r in rows)
    # fixtures assign discount independently of quantity: the naive
    # elasticity must read as ~zero correlation
    assert abs(corr) < 0.1
