"""Semantic assertions for analytics-extras batch 19 (langid
confusion, promo lift, supplier HHI, char entropy) beyond the DuckDB
oracle checks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_langid_confusion_shares_and_coverage(spark, sf_dir):
    rows = Q["text_langid_confusion"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=0.01)
    # the classifier must get a meaningful share of the diagonal
    diag = sum(
        r["n_docs"] for r in rows if r["lang_declared"] == r["lang_predicted"]
    )
    assert diag > 0


def test_promo_lift_covers_all_dows(spark, sf_dir):
    rows = Q["promo_day_lift"](spark, sf_dir).collect()
    assert sorted(r["dow"] for r in rows) == list(range(1, 8))
    for r in rows:
        assert r["baseline_avg"] > 0
        if r["n_promo_days"] > 0 and r["promo_avg"] is not None:
            assert r["lift"] == pytest.approx(
                r["promo_avg"] / r["baseline_avg"] - 1.0, abs=0.01
            )


def test_hhi_bounds(spark, sf_dir):
    rows = Q["supply_chain_hhi"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # HHI of n equal suppliers is 10000/n; monopoly is 10000
        assert 10000.0 / r["n_suppliers"] - 1 <= r["hhi"] <= 10000.0 + 1
        assert 0 < r["top_supplier_share"] <= 1
        # top share bounds HHI from both sides
        assert r["hhi"] >= 10000 * r["top_supplier_share"] ** 2 - 1


def test_char_entropy_band(spark, sf_dir):
    rows = Q["text_char_entropy"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    for r in rows:
        assert 0.0 <= r["char_entropy_nats"] <= math.log(r["n_distinct_chars"]) + 1e-6
        assert r["n_distinct_chars"] <= r["n_chars"]
