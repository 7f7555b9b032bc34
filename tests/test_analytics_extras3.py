"""Semantic assertions for analytics-extras batch 3 (association
rules, ANOVA, autocorrelation, seasonality, windowed funnel) beyond
the DuckDB oracle checks."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_association_rules_bounds_and_bruteforce(spark, sf_dir):
    rows = Q["basket_association_rules"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["support"] <= 1
        assert 0 < r["confidence"] <= 1
        assert r["lift"] > 0
        assert r["brand_a"] < r["brand_b"]
        assert r["pair_cnt"] >= 5
    # brute-force one pair on the collected item set
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    items = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
        .collect()
    )
    baskets = {}
    for it in items:
        baskets.setdefault(it["l_orderkey"], set()).add(it["p_brand"])
    r = rows[0]
    pair_cnt = sum(
        1
        for b in baskets.values()
        if r["brand_a"] in b and r["brand_b"] in b
    )
    cnt_a = sum(1 for b in baskets.values() if r["brand_a"] in b)
    assert r["pair_cnt"] == pair_cnt
    assert r["support"] == pytest.approx(pair_cnt / len(baskets), abs=1e-6)
    assert r["confidence"] == pytest.approx(pair_cnt / cnt_a, abs=1e-6)


def test_anova_f_matches_bruteforce(spark, sf_dir):
    r = Q["stats_anova_f"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    groups = {}
    for row in ev:
        groups.setdefault(row["event_type"], []).append(row["value"])
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    grand = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values()
    )
    f_stat = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["k_groups"] == k and r["n_total"] == n
    assert r["f_stat"] == pytest.approx(f_stat, rel=1e-4)


def test_autocorr_in_range_and_pair_counts(spark, sf_dir):
    rows = Q["timeseries_autocorr"](spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.groupBy("event_type")
        .agg(F.countDistinct(F.to_date("ts")).alias("nd"))
        .collect()
    )
    nd = {r["event_type"]: r["nd"] for r in days}
    for r in rows:
        assert -1 <= r["acf_lag1"] <= 1
        assert r["n_pairs"] == nd[r["event_type"]] - 1


def test_seasonality_indexes_average_to_one(spark, sf_dir):
    rows = Q["timeseries_seasonality_dow"](spark, sf_dir).collect()
    assert len(rows) == 7
    assert sorted(r["dow"] for r in rows) == list(range(7))
    # weighted by day counts, indexes must average to exactly 1
    n = sum(r["n_days"] for r in rows)
    wavg = sum(r["seasonal_idx"] * r["n_days"] for r in rows) / n
    assert wavg == pytest.approx(1.0, abs=1e-4)


def test_windowed_funnel_monotone_and_tighter_than_unbounded(spark, sf_dir):
    r = Q["event_funnel_windowed"](spark, sf_dir).collect()[0]
    assert r["n_view"] >= r["n_click_24h"] >= r["n_purchase_24h"] >= 0
    # the 24h-constrained funnel can never beat the unbounded one
    ub = Q["funnel_conversion"](spark, sf_dir).collect()[0]
    assert r["n_view"] == ub["n_view"]
    assert r["n_click_24h"] <= ub["n_click_after_view"]
