"""Semantic assertions for the corpus-statistics / governance tier
(beyond the DuckDB oracle equivalence the driver checks)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_tfidf_rare_terms_beat_ubiquitous(spark, sf_dir):
    rows = Q["text_tfidf_topterms"](spark, sf_dir).collect()
    assert rows and all(1 <= r["rk"] <= 3 for r in rows)
    # 'the' appears in nearly every document → near-zero idf → should
    # essentially never be a top-3 characteristic term.
    the_hits = sum(1 for r in rows if r["term"] == "the")
    assert the_hits < len(rows) * 0.05
    # scores within a doc are non-increasing with rank
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r["rk"])
        scores = [r["tfidf"] for r in doc_rows]
        assert scores == sorted(scores, reverse=True)


def test_cooccurrence_pmi_matches_manual_recount(spark, sf_dir):
    top = Q["text_cooccurrence_pmi"](spark, sf_dir).collect()
    assert len(top) == 20
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
    ).distinct()
    r = top[0]
    df_a = tok.where(F.col("term") == r["term_a"]).count()
    df_b = tok.where(F.col("term") == r["term_b"]).count()
    a_docs = {x["doc_id"] for x in tok.where(F.col("term") == r["term_a"]).collect()}
    b_docs = {x["doc_id"] for x in tok.where(F.col("term") == r["term_b"]).collect()}
    n_co = len(a_docs & b_docs)
    assert n_co == r["n_co"]
    assert r["pmi"] == pytest.approx(
        round(math.log(n_co * n_docs / (df_a * df_b)), 6), abs=1e-6
    )


def test_anonymize_leaks_no_digits_and_is_stable(spark, sf_dir):
    out = Q["privacy_anonymize"](spark, sf_dir)
    rows = out.collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert len(rows) == n_cust
    for r in rows[:50]:
        assert re.fullmatch(r"[0-9a-f]{16}", r["pseudo_id"])
        assert not re.search(r"[0-9]", r["masked_name"])
        assert r["bal_band"] % 1000 == 0
    # pseudonymization is injective on this keyspace (16 hex chars)
    assert len({r["pseudo_id"] for r in rows}) == n_cust
    # deterministic: re-running yields the identical mapping
    again = {r["pseudo_id"] for r in out.collect()}
    assert again == {r["pseudo_id"] for r in rows}


def test_stratified_sample_rate_near_nominal(spark, sf_dir):
    rows = Q["sample_stratified"](spark, sf_dir).collect()
    assert rows
    total = sum(r["n_total"] for r in rows)
    sampled = sum(r["n_sampled"] for r in rows)
    # 4/16 hex digits → 25% nominal; binomial 4σ tolerance overall
    p = sampled / total
    sigma = math.sqrt(0.25 * 0.75 / total)
    assert abs(p - 0.25) < 4 * sigma + 0.02
    for r in rows:
        assert 0 < r["n_sampled"] < r["n_total"]


def test_profile_matches_direct_queries(spark, sf_dir):
    prof = {r["col_name"]: r for r in Q["profile_table"](spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    assert prof["o_custkey"]["ndv"] == o.select("o_custkey").distinct().count()
    assert prof["o_orderstatus"]["n_nulls"] == 0
    assert prof["o_orderstatus"]["min_num"] is None
    assert prof["o_totalprice"]["max_num"] == pytest.approx(
        round(o.agg(F.max("o_totalprice")).first()[0], 6)
    )


def test_histogram_partitions_all_rows(spark, sf_dir):
    rows = Q["agg_histogram"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    assert sum(r["n"] for r in rows) == o.count()
    assert all(0 <= r["bucket"] <= 19 for r in rows)
    assert all(r["bucket_lo"] == r["bucket"] * 30000 for r in rows)


def test_er_blocked_pairs_share_block_and_are_close(spark, sf_dir):
    rows = Q["er_blocked_fuzzy"](spark, sf_dir).collect()
    assert rows, "fixture part names (adjective+noun) must yield candidate pairs"
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert r["name_a"].split(" ")[-1] == r["block"]
        assert r["name_b"].split(" ")[-1] == r["block"]
        assert 1 <= r["dist"] <= 4


def test_pii_scan_finds_seeded_pii_and_redacts(spark, sf_dir):
    """Seeded PII must be detected (nonzero counts on the seeded doc
    classes, zero elsewhere) and the redacted length must differ from
    the raw length exactly when matches exist."""
    from hivetomysql_spark.queries.privacy_suite import privacy_pii_scan

    rows = privacy_pii_scan(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (r.n_emails > 0) == (r.doc_id % 3 == 0)
        assert (r.n_phones > 0) == (r.doc_id % 5 == 0)
        assert (r.n_ips > 0) == (r.doc_id % 7 == 0)
    assert any(r.n_emails for r in rows) and any(r.n_ips for r in rows)
