"""Semantic assertions for analytics-extras batch 8 (Markov steady
state, reconciliation, shard manifest, CDC apply) beyond the DuckDB
oracle checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_markov_stationary_is_distribution(spark, sf_dir):
    r = Q["event_markov_stationary"](spark, sf_dir).collect()[0]
    probs = [r[c] for c in r.asDict() if c.startswith("p_")]
    assert len(probs) == 5
    assert all(p >= 0 for p in probs)
    assert sum(probs) == pytest.approx(1.0, abs=1e-3)
    assert r["n_transitions"] > 0
    # steady state of a healthy chain is non-degenerate
    assert max(probs) < 0.99


def test_reconciliation_accounting_identity(spark, sf_dir):
    rows = Q["dq_cross_table_reconciliation"](spark, sf_dir).collect()
    assert rows
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    assert sum(r["n_orders"] for r in rows) == o.count()
    assert sum(r["line_rows"] for r in rows) == li.count()
    for r in rows:
        assert r["orders_with_lines"] + r["orphan_orders"] == r["n_orders"]
        assert 0.0 <= r["coverage"] <= 1.0


def test_shard_manifest_partitions_corpus(spark, sf_dir):
    rows = sorted(
        Q["multimodal_shard_manifest"](spark, sf_dir).collect(),
        key=lambda r: r["shard_id"],
    )
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["shard_chars"] for r in rows) == total
    # contiguous position spans, no overlap
    for prev, cur in zip(rows, rows[1:]):
        assert cur["first_pos"] == prev["last_pos"] + 1
    # every shard except possibly the last exceeds the cutoff once its
    # last doc lands (greedy packing overshoots, never undershoots by
    # more than one doc)
    for r in rows[:-1]:
        assert r["shard_chars"] > 0


def test_cdc_apply_respects_tombstones(spark, sf_dir):
    rows = {r["user_id"]: r for r in Q["incremental_cdc_apply"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    last = (
        ev.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("user_id")
                .orderBy(F.desc("ts"), F.desc("event_id"))
            ),
        )
        .where(F.col("rn") == 1)
        .collect()
    )
    for r in last:
        uid = r["user_id"]
        if r["event_type"] == "error":
            assert uid not in rows  # tombstone wins
        else:
            assert uid in rows
            assert rows[uid]["final_value"] == pytest.approx(r["value"], abs=0.005)
