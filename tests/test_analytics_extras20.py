"""Semantic assertions for analytics-extras batch 20 (revenue split,
Heaps' law) beyond the DuckDB oracle checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_revenue_split_conserves_total(spark, sf_dir):
    rows = Q["revenue_new_vs_returning"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    total = o.agg(F.sum("o_totalprice")).collect()[0][0]
    got = sum(r["new_revenue"] + r["returning_revenue"] for r in rows)
    assert got == pytest.approx(total, rel=1e-6)
    for r in rows:
        assert 0.0 <= r["new_share"] <= 1.0
    # the first month is all new revenue by definition
    first = min(rows, key=lambda r: r["month"])
    assert first["returning_revenue"] == 0.0
    assert first["new_share"] == 1.0


def test_heaps_law_plausible_exponent(spark, sf_dir):
    r = Q["text_heaps_law"](spark, sf_dir).collect()[0]
    assert 0 < r["vocab_size"] <= r["n_tokens"]
    # sublinear growth: beta < 1 always; the synthetic fixtures have a
    # CLOSED vocabulary, so saturation (beta ~ 0) is the correct read
    assert 0.0 <= r["heaps_beta"] < 1.0
    assert r["heaps_k"] > 0
    # the fit must roughly reproduce the endpoint
    pred = r["heaps_k"] * (r["n_tokens"] ** r["heaps_beta"])
    assert pred == pytest.approx(r["vocab_size"], rel=0.5)
