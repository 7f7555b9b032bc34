"""Semantic assertions for the analytics-extras tier (containment
dedup, RFM, MAD outliers, k-means assignment, EMA, count-min sketch)
beyond the DuckDB oracle equivalence the driver checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.operators.dedup import ngram_containment_pairs
from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_containment_catches_short_inside_long(spark, sf_dir):
    short = "alpha beta gamma delta epsilon"
    long = short + " zeta eta theta iota kappa " + "filler " * 40
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "wholly unrelated words only here")],
        ["doc_id", "text"],
    )
    rows = ngram_containment_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in rows}
    assert (1, 2) in pairs
    # every shingle of the short doc appears in the long doc
    assert pairs[(1, 2)]["contain_a_in_b"] == 1.0
    # ...but the reverse direction is weak (long doc mostly filler)
    assert pairs[(1, 2)]["contain_b_in_a"] < 0.5
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_containment_is_superset_of_jaccard_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    jac = {
        (r["id_a"], r["id_b"])
        for r in Q["dedup_ngram_jaccard"](spark, sf_dir).collect()
        if r["jaccard"] >= 0.5
    }
    con = {
        (r["id_a"], r["id_b"])
        for r in Q["dedup_containment"](spark, sf_dir).collect()
    }
    # jaccard >= t implies both containments >= t
    assert jac <= con


def test_rfm_scores_partition_customers(spark, sf_dir):
    rows = Q["segment_rfm"](spark, sf_dir).collect()
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert len(rows) == n_cust
    for dim in ("r_score", "f_score", "m_score"):
        vals = {r[dim] for r in rows}
        assert vals <= {1, 2, 3, 4}
        # ntile(4) sizes differ by at most one
        from collections import Counter

        c = Counter(r[dim] for r in rows)
        assert max(c.values()) - min(c.values()) <= 1
    assert {r["segment"] for r in rows} <= {
        "champion",
        "at_risk",
        "loyal",
        "regular",
    }


def test_mad_outlier_rate_is_small_and_threshold_robust(spark, sf_dir):
    rows = Q["anomaly_mad_outliers"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["mad"] >= 0
        assert 0 <= r["outlier_rate"] <= 0.5
        assert r["n_outliers"] <= r["n"]


def test_kmeans_assignment_covers_corpus(spark, sf_dir):
    rows = Q["embedding_kmeans_assign"](spark, sf_dir).collect()
    total = sum(r["n_members"] for r in rows)
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert total == n_vecs
    assert all(0 <= r["cid"] < 8 for r in rows)
    # centroids are their own nearest centroid (cosine 1 with itself)
    assert all(-1.0 <= r["avg_cosine"] <= 1.0 for r in rows)


def test_ema_matches_manual_fold(spark, sf_dir):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0)],
        ["user_id", "event_id", "value"],
    ).withColumn("ts", F.timestamp_micros(F.col("event_id") * 1000000))

    seq = df.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))).alias(
            "seq"
        )
    )
    vals = F.transform(F.col("seq"), lambda s: s["value"])
    ema = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1).cast("double"),
        lambda acc, x: acc * 0.7 + x * 0.3,
    )
    got = seq.select(F.round(ema, 6).alias("ema")).collect()[0]["ema"]
    expect = 10.0
    for x in (20.0, 30.0):
        expect = expect * 0.7 + x * 0.3
    assert got == pytest.approx(expect, abs=1e-6)


def test_ema_registry_row_per_user(spark, sf_dir):
    rows = Q["timeseries_ema"](spark, sf_dir).collect()
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert len(rows) == n_users
    assert all(r["n_events"] >= 1 for r in rows)


def test_cms_estimate_dominates_exact(spark, sf_dir):
    rows = Q["agg_count_min_sketch"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cms_est"] >= r["exact_n"]
