"""Plan-shape assertions: the scale-design claims must be visible in
the physical plans Catalyst produces, not just in docstrings."""

from __future__ import annotations

from pyspark.sql import functions as F

from hivetomysql_spark.config import DumpConf, DumpMap
from hivetomysql_spark.pipeline import apply_mapping
from hivetomysql_spark.plans import introspect as I
from hivetomysql_spark.tables import load_table


def test_parity_mapping_prunes_columns_at_scan(spark, sf_dir):
    """The reference exported select * and dropped columns later
    (HiveToMysql.java:227 vs 382-459); our mapping must push column
    pruning into the parquet scan."""
    conf = DumpConf.from_text("ds=20240105\n")
    mapping = DumpMap.from_text(
        "etype=event_type\nuid=user_id\nds=$ds\n", conf=conf
    )
    events = load_table(spark, sf_dir, "events")
    mapped = apply_mapping(events, mapping)
    scans = I.scan_columns(mapped)
    assert scans, "expected a parquet scan"
    # only the two mapped source columns read (ts is not mapped)
    assert set(scans[0]) == {"event_type", "user_id"}


def test_partition_filter_is_pushed(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    assert any("l_shipdate" in f for f in I.pushed_filters(li))


def test_dim_join_broadcasts(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    assert I.has_broadcast_join(joined)


def test_agg_has_mapside_partial(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    assert I.has_partial_aggregate(agg)
    assert I.count_shuffles(agg) == 1  # exactly the one agg exchange


def test_topk_avoids_global_sort(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    topk = o.orderBy(F.desc("o_totalprice")).limit(10)
    plan = I.physical_plan(topk)
    assert "TakeOrderedAndProject" in plan
    assert I.count_shuffles(topk) == 0  # no range-partition exchange
