"""Semantic assertions for analytics-extras batch 7 (weighted
reservoir, quality funnel, vocab coverage, product quantization,
power-iteration PCA) beyond the DuckDB oracle checks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_importance_sample_favors_heavy_weights(spark, sf_dir):
    rows = Q["sample_importance_weighted"](spark, sf_dir).collect()
    assert len(rows) == 20
    assert [r["rn"] for r in sorted(rows, key=lambda r: r["rn"])] == list(
        range(1, 21)
    )
    o = load_table(spark, sf_dir, "orders")
    mean_w = o.agg(F.avg("o_totalprice")).collect()[0][0]
    sample_mean = sum(r["weight"] for r in rows) / len(rows)
    # weighted sampling overrepresents heavy orders
    assert sample_mean > mean_w
    # keys are the ranking criterion
    keys = [r["key_x1e6"] for r in sorted(rows, key=lambda r: r["rn"])]
    assert keys == sorted(keys)


def test_quality_funnel_monotone(spark, sf_dir):
    rows = sorted(
        Q["corpus_quality_funnel"](spark, sf_dir).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["stage"] for r in rows] == [
        "0_all",
        "1_length",
        "2_word_len",
        "3_uniq",
        "4_repetition",
    ]
    surv = [r["survivors"] for r in rows]
    assert surv == sorted(surv, reverse=True)  # funnel never grows
    assert rows[0]["pass_rate"] == 1.0
    assert rows[0]["dropped_here"] == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur["dropped_here"] == prev["survivors"] - cur["survivors"]


def test_vocab_coverage_rates_bounded(spark, sf_dir):
    rows = Q["tokenizer_vocab_coverage"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["avg_oov_rate"] <= r["max_oov_rate"] <= 1.0
        assert r["n_docs"] > 0


def test_pq_codes_cover_all_vectors(spark, sf_dir):
    rows = Q["embedding_pq_codebook"](spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "embeddings")
    assert sum(r["n_vectors"] for r in rows) == e.count()
    for r in rows:
        assert 0 <= r["code1"] < 4 and 0 <= r["code2"] < 4
        assert r["avg_quant_err"] >= 0
    # the codebook vectors themselves quantize with zero subspace error,
    # so at least one cell has a vector with err ~ the other half only
    assert len(rows) <= 16


def test_pca_unit_vector_and_variance_bound(spark, sf_dir):
    r = Q["embedding_pca_power_iteration"](spark, sf_dir).collect()[0]
    assert r["n_vectors"] > 0
    assert r["lambda_1"] > 0
    # reported components are a prefix of a unit vector
    prefix = r["v_1"] ** 2 + r["v_2"] ** 2 + r["v_3"] ** 2 + r["v_4"] ** 2
    assert prefix <= 1.0 + 1e-6
    # lambda_1 must not exceed total variance
    e = load_table(spark, sf_dir, "embeddings").select(
        F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    total_var = (
        e.select(F.posexplode("x").alias("i", "val"))
        .groupBy("i")
        .agg(F.var_samp("val").alias("v"))
        .agg(F.sum("v"))
        .collect()[0][0]
    )
    assert r["lambda_1"] <= total_var * 1.01
