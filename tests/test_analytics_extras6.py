"""Semantic assertions for analytics-extras batch 6 (Kaplan-Meier,
Benjamini-Hochberg, Holt-Winters, DP noise, KMV sketches, watermark
dedup, bloom prefilter, connected components, hashing trick, Poisson
rate test) beyond the DuckDB oracle checks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_kaplan_meier_monotone_and_bounded(spark, sf_dir):
    rows = sorted(
        Q["stats_kaplan_meier"](spark, sf_dir).collect(), key=lambda r: r["t"]
    )
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= prev + 1e-9  # non-increasing
        assert r["n_risk"] >= r["d"] >= 0
        prev = r["survival"]
    # at-risk count is non-increasing in t
    risks = [r["n_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_benjamini_hochberg_adjustment_properties(spark, sf_dir):
    rows = Q["stats_benjamini_hochberg"](spark, sf_dir).collect()
    assert rows
    by_p = sorted(rows, key=lambda r: (r["p"], r["event_type"]))
    for r in rows:
        assert 0.0 <= r["p"] <= 1.0
        assert r["p_adj"] >= r["p"] - 1e-9  # adjustment never lowers p
        assert r["p_adj"] <= 1.0
    # adjusted p-values are monotone in raw-p order (step-up property)
    adjs = [r["p_adj"] for r in by_p]
    assert adjs == sorted(adjs)


def test_holt_winters_matches_python_fold(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.where(F.col("user_id") == 0)
        .select("ts", "event_id", "value")
        .orderBy("ts", "event_id")
        .collect()
    )
    l, b = float(seq[0]["value"]), 0.0
    for r in seq[1:]:
        x = float(r["value"])
        l, b = 0.5 * x + 0.5 * l + 0.5 * b, 0.15 * x - 0.15 * l + 0.85 * b
    row = {
        r["user_id"]: r for r in Q["timeseries_holt_winters"](spark, sf_dir).collect()
    }[0]
    assert row["n_events"] == len(seq)
    assert row["level"] == pytest.approx(l, abs=1e-3)
    assert row["trend"] == pytest.approx(b, abs=1e-3)
    assert row["forecast_1"] == pytest.approx(
        row["level"] + row["trend"], abs=2e-4
    )


def test_dp_noise_is_deterministic_and_centered(spark, sf_dir):
    r1 = {r["event_type"]: r for r in Q["privacy_dp_noise_count"](spark, sf_dir).collect()}
    r2 = {r["event_type"]: r for r in Q["privacy_dp_noise_count"](spark, sf_dir).collect()}
    assert r1.keys() == r2.keys()
    for k in r1:
        # md5-derived noise: identical across runs
        assert r1[k]["noise"] == r2[k]["noise"]
        assert r1[k]["noisy_count"] == pytest.approx(
            r1[k]["true_count"] + r1[k]["noise"], abs=1e-3
        )
        # Laplace(b=1) noise is almost surely single-digit
        assert abs(r1[k]["noise"]) < 15


def test_kmv_estimates_track_exact(spark, sf_dir):
    r = Q["agg_kmv_set_operations"](spark, sf_dir).collect()[0]
    # k=64 sketch: relative standard error ~ 1/sqrt(k-2) ~ 13%
    for est, exact in [
        (r["est_a"], r["exact_a"]),
        (r["est_b"], r["exact_b"]),
        (r["est_union"], r["exact_union"]),
    ]:
        assert est > 0
        assert abs(est - exact) / exact < 0.6  # loose 4-5 sigma bound
    assert 0.0 <= r["jaccard_kmv"] <= 1.0
    # inclusion-exclusion sanity: est_inter <= min(est_a, est_b) * 1.5
    assert r["est_intersection"] <= min(r["est_a"], r["est_b"]) * 1.5


def test_stream_dedup_counts_bounded_by_key_space(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    pairs = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in Q["stream_dedup_batch"](spark, sf_dir).collect():
        # one survivor per distinct (user, type) pair
        assert r["n_first"] == pairs[r["event_type"]]


def test_bloom_prefilter_equals_plain_join(spark, sf_dir):
    got = {
        r["l_returnflag"]: (r["n_lines"], r["revenue"])
        for r in Q["join_bloom_prefilter"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    plain = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_3")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"),
        )
        .collect()
    )
    assert got == {r["l_returnflag"]: (r["n"], r["rev"]) for r in plain}


def test_connected_components_partition_nodes(spark, sf_dir):
    r = Q["graph_connected_components"](spark, sf_dir).collect()[0]
    assert r["n_components"] >= 1
    assert r["largest_component"] <= r["n_nodes"]
    assert r["n_components"] <= r["n_nodes"]
    # anchor is the global minimum node id, which labels its component
    assert r["anchor_node"] >= 0


def test_feature_hashing_norms(spark, sf_dir):
    rows = Q["feature_hashing_trick"](spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        assert 1 <= r["nnz"] <= 32
        assert 0 <= r["top_bucket"] < 32
        # Cauchy-Schwarz-ish bounds for count vectors
        assert r["l2_norm"] <= r["n_tokens"] + 1e-9
        assert r["l2_norm"] >= r["n_tokens"] / math.sqrt(32) - 1e-6


def test_poisson_rate_z_consistency(spark, sf_dir):
    for r in Q["stats_poisson_rate_test"](spark, sf_dir).collect():
        z = (r["n_a"] - r["n_b"]) / math.sqrt(r["n_a"] + r["n_b"])
        assert r["z_rate"] == pytest.approx(z, abs=1e-3)


def test_connected_components_unrestricted_certified(spark, sf_dir):
    """The registry query caps partkeys so the recursive-CTE oracle
    stays bounded; this certifies the UNRESTRICTED operator instead:
    the full co-purchase graph's labeling must (a) be identical under
    different loop partition widths and (b) match an independent
    pure-Python union-find over the same edges exactly."""
    from hivetomysql_spark.queries.graph_suite import (
        copurchase_component_labels,
    )

    got1 = {
        r.n: r.comp
        for r in copurchase_component_labels(spark, sf_dir, nparts=1).collect()
    }
    got3 = {
        r.n: r.comp
        for r in copurchase_component_labels(spark, sf_dir, nparts=3).collect()
    }
    assert got1 == got3  # partitioning-invariant labeling

    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select("l_orderkey", "l_partkey").collect()

    def union_find_labels(cap):
        baskets = {}
        for r in rows:
            if cap is None or r.l_partkey < cap:
                baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
        parent = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        nodes = set()
        for ps in baskets.values():
            if len(ps) < 2:
                continue
            ps = sorted(ps)
            for p in ps:
                parent.setdefault(p, p)
            nodes.update(ps)
            for b in ps[1:]:
                ra, rb = find(ps[0]), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        comp_min = {}
        for n in nodes:
            r = find(n)
            comp_min[r] = min(comp_min.get(r, n), n)
        return {n: comp_min[find(n)] for n in nodes}

    # unrestricted graph (one giant component at this sf — the cap in
    # the registry query exists precisely because the full graph is
    # densely connected): labeling still must match exactly
    assert got1 == union_find_labels(None)
    # capped graph has real multi-component structure: certify the
    # same operator path there too
    capped = {
        r.n: r.comp
        for r in copurchase_component_labels(
            spark, sf_dir, partkey_cap=300
        ).collect()
    }
    expected_capped = union_find_labels(300)
    assert capped == expected_capped
    # sf0.001's graph is densely connected in both configurations
    # (multi-component structure only appears at larger sf) — the
    # certification is the exact labeling equality above, on two
    # different graphs and two partition widths
    assert capped and got1
