"""Semantic assertions for analytics-extras batch 13 (Markov removal
attribution, balanced sampling) beyond the DuckDB oracle checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_markov_removal_attribution_properties(spark, sf_dir):
    rows = Q["event_attribution_markov_removal"](spark, sf_dir).collect()
    assert sorted(r["channel"] for r in rows) == [
        "click",
        "error",
        "signup",
        "view",
    ]
    base = rows[0]["base_cvr_15step"]
    assert all(r["base_cvr_15step"] == base for r in rows)
    assert 0.0 < base <= 1.0
    shares = [r["attribution_share"] for r in rows]
    assert sum(shares) == pytest.approx(1.0, abs=0.01)
    for r in rows:
        # removing a channel can only hurt (or not affect) conversion
        assert r["removal_effect"] >= -1e-9
        assert r["attribution_share"] >= 0


def test_balanced_sample_equal_classes(spark, sf_dir):
    rows = Q["sample_balanced_classes"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    sizes = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    min_n = min(sizes.values())
    assert len(rows) == len(sizes)
    for r in rows:
        assert r["n_sampled"] == min_n  # exactly balanced
        assert r["avg_quantity"] > 0
