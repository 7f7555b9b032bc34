"""Behavioral tests for the second LLM-pipeline batch (queries/llm2.py)
and the second TPC-H-shape batch (queries/tpch_shapes2.py) — the
oracle gate checks value parity; these check the *semantics* that the
SQL twin can't express (invariants, bounds, cross-query consistency).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_repetition_ratio_bounds_and_known_doc(spark, sf_dir):
    rows = Q["text_repetition_ratio"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    for r in rows:
        assert r["n_tokens"] >= 1
        assert 0.0 < r["uniq_token_ratio"] <= 1.0
        assert 0.0 <= r["dup_trigram_ratio"] < 1.0
    # a doc with all-distinct tokens has uniq ratio exactly 1 and no
    # duplicate trigrams; cross-check one doc against a direct compute
    sample = docs.select("doc_id", "text").first()
    toks = sample["text"].strip().lower().split()
    expected_uniq = round(len(set(toks)) / len(toks), 4)
    got = next(r for r in rows if r["doc_id"] == sample["doc_id"])
    assert got["uniq_token_ratio"] == expected_uniq


def test_lm_surprisal_is_positive_and_boilerplate_scores_low(spark, sf_dir):
    rows = Q["text_lm_unigram_score"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    scores = [r["lm_surprisal"] for r in rows]
    assert all(s > 0 for s in scores)
    # surprisal is bounded by ln(total tokens): p >= 1/total per token
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.trim(F.lower("text")), r"\s+")))
    ).first()[0]
    assert all(s <= math.log(total_tokens) + 1e-9 for s in scores)


def test_temperature_mix_upsamples_tail_languages(spark, sf_dir):
    rows = Q["sample_temperature_mix"](spark, sf_dir).collect()
    assert rows
    by_n = sorted(rows, key=lambda r: r["n_docs"])
    for r in rows:
        assert 0.0 < r["rate"] <= 1.0
        assert 0 <= r["n_sampled"] <= r["n_docs"]
    # alpha<1 ⇒ acceptance rate decreases as group size grows
    rates = [r["rate"] for r in by_n]
    assert rates == sorted(rates, reverse=True)
    # deterministic: re-run produces the identical sample counts
    again = {r["lang"]: r["n_sampled"] for r in Q["sample_temperature_mix"](spark, sf_dir).collect()}
    assert {r["lang"]: r["n_sampled"] for r in rows} == again


def test_contamination_none_from_benchmark_source(spark, sf_dir):
    df = Q["text_contamination_check"](spark, sf_dir)
    flagged = df.collect()
    docs = load_table(spark, sf_dir, "documents")
    bench_ids = {
        r["doc_id"] for r in docs.where(F.col("source") == "src0").select("doc_id").collect()
    }
    for r in flagged:
        assert r["doc_id"] not in bench_ids
        assert r["shared_grams"] >= 1


def test_top_supplier_ties_and_threshold(spark, sf_dir):
    rows = Q["subquery_top_supplier"](spark, sf_dir).collect()
    assert rows, "quarter window must select at least one supplier"
    revs = {r["total_revenue"] for r in rows}
    assert len(revs) == 1, "all returned suppliers share the max revenue"


def test_sole_late_supplier_counts_bounded_by_orders(spark, sf_dir):
    rows = Q["window_sole_late_supplier"](spark, sf_dir).collect()
    n_orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .count()
    )
    assert sum(r["numwait"] for r in rows) <= n_orders
    assert all(r["numwait"] >= 1 for r in rows)


def test_important_stock_threshold_consistency(spark, sf_dir):
    rows = Q["subquery_important_stock"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("v")
    )
    thr = 1.5 * pv.agg(F.avg("v")).first()[0]
    expected = pv.where(F.col("v") > thr).count()
    assert len(rows) == expected
