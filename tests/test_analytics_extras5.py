"""Semantic assertions for analytics-extras batch 5 (target encoding,
bigram LM, OLS, freshness, backlog) beyond the DuckDB oracle checks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_target_encoding_loo_mean_equals_plain_mean(spark, sf_dir):
    rows = Q["feature_target_encoding"](spark, sf_dir).collect()
    assert rows
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    plain = {
        r["c_mktsegment"]: (r["m"], r["n"])
        for r in o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.avg("o_totalprice").alias("m"), F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        m, n = plain[r["seg"]]
        assert r["n"] == n
        # mean of LOO encodings equals the plain category mean
        assert r["loo_mean"] == pytest.approx(m, rel=1e-6)
        # spread exists and brackets the mean
        assert r["loo_min"] <= r["loo_mean"] <= r["loo_max"]
        assert r["loo_std"] > 0


def test_bigram_surprisal_bounds(spark, sf_dir):
    r = Q["text_bigram_surprisal"](spark, sf_dir).collect()[0]
    assert r["n_docs"] > 0
    # add-one smoothing bounds: -ln(c2+1 / c1+V) > 0 always
    assert 0 < r["min_surprisal"] <= r["mean_surprisal"] <= r["max_surprisal"]


def test_ols_normal_equations_residual_orthogonality(spark, sf_dir):
    r = Q["stats_ols_two_factor"](spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    feat = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.any_value("o_totalprice").alias("y"),
            F.sum("l_quantity").alias("x1"),
            F.count("*").alias("x2"),
        )
        .withColumn(
            "resid",
            F.col("y")
            - (
                F.lit(r["intercept"])
                + F.lit(r["beta_qty"]) * F.col("x1")
                + F.lit(r["beta_lines"]) * F.col("x2")
            ),
        )
    )
    orth = feat.agg(
        F.avg("resid").alias("r0"),
        F.corr("resid", "x1").alias("r1"),
        F.corr("resid", "x2").alias("r2"),
        F.avg(F.abs("y")).alias("scale"),
    ).collect()[0]
    # OLS residuals: zero mean, orthogonal to both regressors
    assert abs(orth["r0"]) / orth["scale"] < 1e-4
    assert abs(orth["r1"]) < 1e-3
    assert abs(orth["r2"]) < 1e-3


def test_freshness_lag_has_zero_watermark_row(spark, sf_dir):
    rows = Q["dq_freshness_lag"](spark, sf_dir).collect()
    assert rows
    lags = [r["lag_hours"] for r in rows]
    assert min(lags) == 0.0  # the freshest type defines the watermark
    assert all(lag >= 0 for lag in lags)


def test_backlog_peak_and_conservation(spark, sf_dir):
    r = Q["orders_backlog_running"](spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders")
    n_orders = o.count()
    assert 0 < r["peak_backlog"] <= n_orders
    assert r["neg_days"] == 0
    assert r["n_days"] > 0
