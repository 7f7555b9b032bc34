"""Semantic assertions for analytics-extras batch 4 (span dedup,
attribution, drawdown, ABC, CUSUM, cross-correlation) beyond the
DuckDB oracle checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_span_dup_bounds(spark, sf_dir):
    r = Q["dedup_span_duplicates"](spark, sf_dir).collect()[0]
    assert r["n_docs"] > 0
    assert 0 <= r["docs_with_dup"] <= r["n_docs"]
    assert 0 <= r["avg_dup_ratio"] <= 1
    assert (r["total_dup_spans"] > 0) == (r["docs_with_dup"] > 0)


def test_attribution_conserves_value(spark, sf_dir):
    rows = Q["attribution_linear_touch"](spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} <= {"view", "click"}
    # attributed value sums to the value of purchases that HAVE >=1 touch
    e = load_table(spark, sf_dir, "events")
    buys = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("buy_ts"), "value"
    )
    t = e.where(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("ts").alias("touch_ts")
    )
    touched = (
        t.join(buys, "user_id")
        .where(
            (F.col("touch_ts") < F.col("buy_ts"))
            & (
                F.col("touch_ts")
                >= F.col("buy_ts") - F.expr("INTERVAL 7 DAYS")
            )
        )
        .select("user_id", "buy_ts", "value")
        .distinct()
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    total_attr = sum(r["attributed_value"] for r in rows)
    assert total_attr == pytest.approx(touched, rel=1e-3)


def test_drawdown_nonnegative_and_bounded(spark, sf_dir):
    r = Q["finance_max_drawdown"](spark, sf_dir).collect()[0]
    assert r["max_drawdown"] >= 0
    assert 0 <= r["max_drawdown_frac"] < 1
    assert r["n_days"] > 0


def test_abc_partitions_all_parts(spark, sf_dir):
    rows = {r["abc_class"]: r for r in Q["agg_abc_classification"](spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in rows.values()) == n_parts
    total = li.agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    ).collect()[0][0]
    assert sum(r["class_revenue"] for r in rows.values()) == pytest.approx(
        total, rel=1e-6
    )
    # A parts are fewer but richer per part than C parts
    if "A" in rows and "C" in rows:
        a, c = rows["A"], rows["C"]
        assert a["class_revenue"] / a["n_parts"] > c["class_revenue"] / c["n_parts"]


def test_cusum_changepoint_within_series(spark, sf_dir):
    rows = Q["timeseries_cusum_changepoint"](spark, sf_dir).collect()
    assert rows
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.date_trunc("day", "ts")).alias("lo"),
        F.max(F.date_trunc("day", "ts")).alias("hi"),
    ).collect()[0]
    for r in rows:
        assert r["max_abs_cusum"] >= 0
        # changepoint_day is a timestamp column (DATE outputs are
        # banned: they round-trip differently through pandas)
        assert bounds["lo"] <= r["changepoint_day"] <= bounds["hi"]


def test_xcorr_symmetric_lag_grid(spark, sf_dir):
    rows = sorted(
        Q["timeseries_cross_correlation"](spark, sf_dir).collect(),
        key=lambda r: r["lag"],
    )
    assert [r["lag"] for r in rows] == list(range(-3, 4))
    n0 = next(r["n_days"] for r in rows if r["lag"] == 0)
    for r in rows:
        assert -1 <= r["xcorr"] <= 1
        # |lag| days fall off the overlap at each end
        assert r["n_days"] == n0 - abs(r["lag"])
