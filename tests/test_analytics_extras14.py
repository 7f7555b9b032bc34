"""Semantic assertions for analytics-extras batch 14 (growth
accounting, reorder points, rare-category redaction) beyond the
DuckDB oracle checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_lifecycle_bridge_identity(spark, sf_dir):
    rows = sorted(
        Q["event_user_lifecycle"](spark, sf_dir).collect(),
        key=lambda r: r["week_no"],
    )
    assert rows
    first = rows[0]
    assert first["n_retained"] == 0 and first["n_resurrected"] == 0
    for r in rows:
        assert r["n_active"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]
    # the growth-accounting bridge: active(w) = active(w-1) + new +
    # resurrected - churned
    for prev, cur in zip(rows, rows[1:]):
        if cur["week_no"] == prev["week_no"] + 1:
            assert (
                cur["n_active"]
                == prev["n_active"]
                + cur["n_new"]
                + cur["n_resurrected"]
                - cur["n_churned"]
            )


def test_reorder_point_dominates_mean_demand(spark, sf_dir):
    rows = Q["inventory_reorder_point"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        # ROP covers at least the expected lead-time demand
        assert r["reorder_point"] >= r["mu_daily"] * 7 - 0.01
        assert r["sigma_daily"] >= 0
        assert r["n_demand_days"] > 0


def test_redaction_conserves_and_suppresses(spark, sf_dir):
    rows = Q["privacy_redact_rare_categories"](spark, sf_dir).collect()
    p = load_table(spark, sf_dir, "part")
    assert sum(r["n_parts"] for r in rows) == p.count()
    for r in rows:
        if r["label"] != "OTHER":
            assert r["n_parts"] >= 60  # every released label meets k
            assert r["n_source_categories"] == 1
