"""Semantic assertions for analytics-extras batch 10 (semantic search
e2e, Matryoshka truncation, binary quantization, volume spikes,
cohort LTV) beyond the DuckDB oracle checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_semantic_search_ranked_and_enriched(spark, sf_dir):
    rows = sorted(
        Q["similarity_semantic_search_e2e"](spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, 11))
    cosines = [r["cosine"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)
    assert all(-1.0 <= c <= 1.0 for c in cosines)
    assert all(r["doc_id"] != 0 for r in rows)  # query excluded
    assert all(r["lang"] is not None and r["source"] is not None for r in rows)


def test_matryoshka_recall_bounds(spark, sf_dir):
    rows = Q["embedding_matryoshka_truncation"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["n_common"] <= 10
        assert r["recall_at_10"] == pytest.approx(r["n_common"] / 10.0)
    # a 16/64 prefix keeps SOME signal on average
    assert sum(r["recall_at_10"] for r in rows) / len(rows) > 0.05


def test_binary_quantization_recall_and_hamming(spark, sf_dir):
    rows = Q["embedding_binary_quantization"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["n_common"] <= 10
        assert 0 <= r["min_hamming"] <= 64


def test_volume_spike_top5_shape(spark, sf_dir):
    rows = Q["dq_anomaly_volume_spike"](spark, sf_dir).collect()
    assert len(rows) <= 5
    for r in rows:
        assert r["n_events"] > 0
        assert r["z"] == r["z"]  # not NaN


def test_cohort_ltv_monotone_within_cohort(spark, sf_dir):
    rows = Q["finance_cohort_ltv"](spark, sf_dir).collect()
    assert rows
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append(r)
    o = load_table(spark, sf_dir, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(v[0]["cohort_size"] for v in by_cohort.values()) == n_cust
    for cohort_rows in by_cohort.values():
        cohort_rows.sort(key=lambda r: r["age_months"])
        ltvs = [r["cum_ltv_per_customer"] for r in cohort_rows]
        # cumulative spend never decreases with age
        assert ltvs == sorted(ltvs)
        assert all(v > 0 for v in ltvs)
