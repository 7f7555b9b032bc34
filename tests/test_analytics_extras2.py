"""Semantic assertions for analytics-extras batch 2 (Welch t-test,
string indexer, graph metrics) beyond the DuckDB oracle checks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_welch_matches_scipy_style_manual(spark, sf_dir):
    rows = Q["stats_ab_welch"](spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    r = rows[0]
    vals_a = [
        x["value"]
        for x in ev.where(
            (F.col("event_type") == r["event_type"]) & (F.col("user_id") % 2 == 0)
        ).collect()
    ]
    vals_b = [
        x["value"]
        for x in ev.where(
            (F.col("event_type") == r["event_type"]) & (F.col("user_id") % 2 == 1)
        ).collect()
    ]
    na, nb = len(vals_a), len(vals_b)
    ma = sum(vals_a) / na
    mb = sum(vals_b) / nb
    va = sum((x - ma) ** 2 for x in vals_a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in vals_b) / (nb - 1)
    t = (ma - mb) / math.sqrt(va / na + vb / nb)
    df = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    assert r["n_a"] == na and r["n_b"] == nb
    assert r["t_stat"] == pytest.approx(t, abs=1e-3)
    assert r["welch_df"] == pytest.approx(df, abs=0.05)
    # with a near-balanced random split, df is close to n-2
    assert r["welch_df"] <= na + nb - 2


def test_string_indexer_dense_frequency_order(spark, sf_dir):
    rows = sorted(
        Q["feature_string_indexer"](spark, sf_dir).collect(),
        key=lambda r: r["category_index"],
    )
    # dense 0..k-1
    assert [r["category_index"] for r in rows] == list(range(len(rows)))
    # non-increasing frequency
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_degree_distribution_accounts_all_nodes(spark, sf_dir):
    rows = Q["graph_degree_distribution"](spark, sf_dir).collect()
    n_nodes = sum(r["n_nodes"] for r in rows)
    # 25 nations, every nation trades at this density
    assert 2 <= n_nodes <= 25
    assert all(r["degree"] >= 1 for r in rows)


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    got = Q["graph_triangle_count"](spark, sf_dir).collect()[0]["n_triangles"]
    # brute force on the collected edge set
    from hivetomysql_spark.queries.graph_suite import _trade_edges

    edges = {(r["u"], r["v"]) for r in _trade_edges(spark, sf_dir).collect()}
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    expect = 0
    ns = sorted(nodes)
    for i, a in enumerate(ns):
        for b in ns[i + 1 :]:
            if (a, b) not in edges:
                continue
            for c in ns:
                if c > b and (a, c) in edges and (b, c) in edges:
                    expect += 1
    assert got == expect


def test_chi_square_zero_when_independent_construction(spark, sf_dir):
    row = Q["stats_chi_square"](spark, sf_dir).collect()[0]
    # random even/odd split is ~independent of event_type: chi2 small,
    # dof = types-1
    assert row["dof"] >= 1
    assert row["chi2"] >= 0


def test_mann_whitney_u_bounds_and_symmetry(spark, sf_dir):
    rows = Q["stats_mann_whitney"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["u_a"] <= r["n_a"] * r["n_b"]
        # random split: z should not be astronomically large
        assert abs(r["z_approx"]) < 10


def test_decimal_money_cents_exact(spark, sf_dir):
    rows = Q["agg_decimal_money"](spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").collect()
    from collections import defaultdict

    cents = defaultdict(int)
    n = defaultdict(int)
    for o in orders:
        cents[o["o_orderstatus"]] += int(o["o_totalprice"] * 100 + 0.5)
        n[o["o_orderstatus"]] += 1
    for r in rows:
        assert r["total_cents"] == cents[r["o_orderstatus"]]
        assert r["n_orders"] == n[r["o_orderstatus"]]
        # double display column: exact integer < 2^53 divided by
        # 100.0 is a single deterministic IEEE rounding
        assert r["total_dollars"] == r["total_cents"] / 100.0
