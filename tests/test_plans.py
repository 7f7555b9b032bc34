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


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts
    must sort-merge-join with ZERO exchanges — the write-once
    co-location contract write_bucketed_table promises for 100 TB
    repeated joins."""
    from hivetomysql_spark.sinks.files import write_bucketed_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(
        o, "b_orders", str(tmp_path / "b_orders"), ["o_orderkey"], 4,
        sort_by=["o_orderkey"],
    )
    write_bucketed_table(
        li, "b_lineitem", str(tmp_path / "b_lineitem"), ["l_orderkey"], 4,
        sort_by=["l_orderkey"],
    )
    try:
        # MERGE hint: at test scale Catalyst would broadcast instead
        # (and note "Bucketed: false (disabled by query planner)");
        # at 100 TB neither side broadcasts, so SMJ is the real regime
        bo = spark.table("b_orders").hint("MERGE")
        bl = spark.table("b_lineitem")
        joined = bo.join(
            bl, bo.o_orderkey == bl.l_orderkey
        ).where(F.col("o_totalprice") > 0)
        assert I.count_shuffles(joined) == 0, I.physical_plan(joined)
        assert I.has_sort_merge_join(joined)
        # and it actually runs
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_dynamic_partition_overwrite_replaces_only_touched(spark, tmp_path):
    """overwrite_partitions replaces exactly the ds partitions in the
    incoming frame (reference delete-before-insert semantics,
    HiveToMysql.java:270-282, on a file sink)."""
    from hivetomysql_spark.sinks.files import overwrite_partitions

    path = str(tmp_path / "t")
    day1 = spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")], ["id", "v", "ds"]
    )
    overwrite_partitions(day1, path, ["ds"])
    # re-import d2 only, with different content
    fixed = spark.createDataFrame([(30, "C", "d2")], ["id", "v", "ds"])
    overwrite_partitions(fixed, path, ["ds"])
    out = {(r.id, r.v, r.ds) for r in spark.read.parquet(path).collect()}
    assert out == {(1, "a", "d1"), (2, "b", "d1"), (30, "C", "d2")}


def test_directory_partition_pruning(spark, sf_dir, tmp_path):
    """Hive-style directory partitioning: a ds= filter on a
    partitioned layout must prune at the directory level (the scan's
    partition filters, not post-scan data filters) — the read-side
    contract that makes the reference's ds= addressing O(1 partition)
    instead of O(table) at 100 TB."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events").withColumn(
        "ds", F.date_format("ts", "yyyyMMdd")
    )
    path = str(tmp_path / "events_part")
    events.write.partitionBy("ds").mode("overwrite").parquet(path)
    one_day = spark.read.parquet(path).where(F.col("ds") == "20240102")
    plan = I.executed_plan(one_day)
    assert "PartitionFilters" in plan and "20240102" in plan, plan
    n = one_day.count()
    assert 0 < n < events.count()


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling, observed at runtime: a hot key 20x the
    others must be split (SortMergeJoin(skew=true) + 'skewed'
    AQEShuffleRead in the FINAL adaptive plan). This is the automatic
    counterpart of join_salted_skew's manual salting. Note the plan
    must come from the executed DataFrame — a separate write action
    plans its own execution and the DataFrame's plan stays
    isFinalPlan=false."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(200_000).select(F.lit(0).alias("k"), F.rand(7).alias("x"))
        tail = spark.range(9_900).select(
            (F.col("id") % 99 + 1).alias("k"), F.rand(8).alias("x")
        )
        dim = spark.range(100).select(F.col("id").alias("k"))
        j = hot.unionByName(tail).join(dim, "k")
        assert len(j.collect()) == 209_900  # correct under the split
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_buckets_bound_both_dimensions(spark, sf_dir):
    """Z-order locality claim, quantified: bucketing by the Z key
    must shrink the average per-bucket partkey range far below the
    single-column-sort baseline (where every bucket spans ~the whole
    partkey domain)."""
    from hivetomysql_spark.operators.layout import zorder_key
    from pyspark.sql.window import Window as W

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    dom = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("pk_span")
    ).collect()[0].pk_span

    def avg_bucket_span(df, order_col):
        b = df.withColumn("bucket", F.ntile(16).over(W.orderBy(order_col)))
        spans = (
            b.groupBy("bucket")
            .agg((F.max("l_partkey") - F.min("l_partkey")).alias("s"))
            .collect()
        )
        return sum(r.s for r in spans) / len(spans)

    z = zorder_key(li, "l_orderkey", "l_partkey")
    z_span = avg_bucket_span(z, "__z")
    plain_span = avg_bucket_span(li, "l_orderkey")
    # single-column sort: each bucket spans ~full partkey domain
    assert plain_span > 0.9 * dom
    # z-order: buckets cover bounded rectangles
    assert z_span < 0.5 * dom, (z_span, plain_span, dom)


def test_scd2_runs_in_one_shuffle(spark, sf_dir):
    """Both SCD2 window passes and the island aggregate share the
    o_custkey partitioning — the whole history build is ONE exchange."""
    from hivetomysql_spark.queries import queries

    df = queries()["scd2_order_priority"](spark, sf_dir)
    assert I.count_shuffles(df) == 1


def test_merge_upsert_join_reuses_window_partitioning(spark, sf_dir):
    """Compacting base and delta costs one exchange each; the
    full-outer join must NOT add a third — both sides arrive already
    hash-partitioned on the business key."""
    from hivetomysql_spark.queries import queries

    df = queries()["merge_upsert"](spark, sf_dir)
    assert I.count_shuffles(df) == 2


def test_tfidf_broadcasts_vocabulary_side(spark, sf_dir):
    """Document-frequency and corpus-size tables are vocabulary-sized
    → must broadcast; the tf table itself never re-shuffles for the
    join."""
    from hivetomysql_spark.queries import queries

    df = queries()["text_tfidf_topterms"](spark, sf_dir)
    assert I.has_broadcast_join(df)
    assert I.has_partial_aggregate(df)


def test_anonymize_is_scan_stage_only(spark, sf_dir):
    """The governance projection is row-local: zero exchanges and a
    single whole-stage-codegen span over the scan."""
    from hivetomysql_spark.queries import queries

    df = queries()["privacy_anonymize"](spark, sf_dir)
    assert I.count_shuffles(df) == 0
    assert I.whole_stage_codegen_spans(df) >= 1


def test_histogram_reduces_on_bucket_keys_only(spark, sf_dir):
    """Equi-width histogram: map-side partial aggregation means the
    exchange carries O(buckets) rows per task, not O(table)."""
    from hivetomysql_spark.queries import queries

    df = queries()["agg_histogram"](spark, sf_dir)
    assert I.has_partial_aggregate(df)
    assert I.count_shuffles(df) == 1


def test_correlated_avg_is_decorrelated(spark, sf_dir):
    """Q17 shape: the correlated scalar subquery must become a
    per-part aggregate joined back (O(parts) shuffle rows), never a
    per-row nested-loop re-aggregation."""
    from hivetomysql_spark.queries.tpch_shapes import subquery_correlated_avg

    df = subquery_correlated_avg(spark, sf_dir)
    plan = I.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert I.has_partial_aggregate(df)  # the decorrelated per-part avg


def test_not_exists_becomes_anti_join(spark, sf_dir):
    """Q22 shape: NOT EXISTS must plan as a left-anti join with the
    date filter pushed below it (probe against the recent slice)."""
    from hivetomysql_spark.queries.tpch_shapes import subquery_not_exists_rollup

    df = subquery_not_exists_rollup(spark, sf_dir)
    plan = I.physical_plan(df)
    assert "LeftAnti" in plan
    assert any("o_orderdate" in f for f in I.pushed_filters(df))


def test_disjunctive_pred_single_fact_scan(spark, sf_dir):
    """Q19 shape: the OR'd regimes stay one predicate over one
    broadcast join — exactly one lineitem scan, no union of scans."""
    from hivetomysql_spark.queries.tpch_shapes import join_disjunctive_pred

    df = join_disjunctive_pred(spark, sf_dir)
    assert I.has_broadcast_join(df)
    assert len(I.scan_columns(df)) == 2  # lineitem + part, once each


def test_chunking_is_shuffle_free(spark, sf_dir):
    """Sliding-window chunking must run entirely inside the scan
    stage — the generator fan-out never justifies an exchange."""
    from hivetomysql_spark.queries.training_prep import chunk_documents

    df = chunk_documents(spark, sf_dir)
    assert I.count_shuffles(df) == 0


def test_packing_avoids_global_sort_window(spark, sf_dir):
    """The packing prefix sum must be two-level: a bucket-partitioned
    window plus a broadcast of O(buckets) offsets — never a global
    single-partition window over all documents."""
    from hivetomysql_spark.queries.training_prep import pack_sequences

    df = pack_sequences(spark, sf_dir)
    plan = I.physical_plan(df)
    assert I.has_broadcast_join(df)
    # the only empty-key window (single partition) is over bucket
    # subtotals, which come from an Aggregate, not the full table
    assert plan.count("Window") >= 2


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """DPP: joining a ds-partitioned fact to a filtered dim must
    prune fact partitions at runtime via the dim's filter (the
    dynamicpruning subquery in PartitionFilters) — the mechanism that
    turns a star-join over 100 TB of daily partitions into a scan of
    only the days the dim selects."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "ds", F.date_format("ts", "yyyyMMdd")
    )
    path = str(tmp_path / "events_dpp")
    events.write.partitionBy("ds").mode("overwrite").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("20240102", "keep"), ("20240103", "keep")], ["ds", "tag"]
    )
    saved = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try:
        j = fact.join(dim.where(F.col("tag") == "keep").hint("broadcast"), "ds")
        plan = I.physical_plan(j)
        assert "dynamicpruning" in plan.lower(), plan[:1500]
        assert j.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.useStats", saved
        )


def test_runtime_bloom_filter_injected(spark, tmp_path):
    """Runtime bloom-filter join pruning: a selective non-broadcast
    dim join must get a bloom filter injected on the fact side (rows
    dropped before the shuffle — the 100 TB semi-join accelerator
    Spark applies when broadcast is off the table)."""
    d1, d2 = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.range(500_000).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("x")
    ).write.mode("overwrite").parquet(d1)
    spark.range(50_000).select(
        F.col("id").alias("k"), F.rand(5).alias("y")
    ).write.mode("overwrite").parquet(d2)
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(d1)
        dim = spark.read.parquet(d2).where(F.col("y") < 0.01)
        j = fact.join(dim, "k")
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower()
        assert j.count() > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_hint_surface(spark, sf_dir):
    """The three join-strategy hints must each produce their
    operator: BROADCAST -> BroadcastHashJoin, MERGE -> SortMergeJoin,
    SHUFFLE_HASH -> ShuffledHashJoin. Hints are the per-query
    override when the optimizer's size estimates are wrong at
    100 TB (stale stats, post-filter skew)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cases = {
        "broadcast": "BroadcastHashJoin",
        "merge": "SortMergeJoin",
        "shuffle_hash": "ShuffledHashJoin",
    }
    for hint, op in cases.items():
        j = o.join(c.hint(hint), o.o_custkey == c.c_custkey)
        assert op in I.physical_plan(j), hint


def test_training_mix_shuffle_budget(spark, sf_dir):
    """The capstone composite must stay a linear carry-column chain:
    dedup groupBy + its join-back, the per-source cap window, and the
    final aggregate — a fixed shuffle budget, never the join-per-stage
    explosion (measured at 14 shuffles before carry columns)."""
    from hivetomysql_spark.queries.llm import pipeline_training_mix

    df = pipeline_training_mix(spark, sf_dir)
    assert I.count_shuffles(df) <= 5, I.physical_plan(df)
    assert len(I.scan_columns(df)) <= 2  # corpus read once per branch


def test_catalog_table_statistics(spark, sf_dir):
    """ANALYZE TABLE populates catalog statistics (row count + column
    NDV) — the inputs cost-based join reordering and broadcast
    decisions read when size estimates matter more than defaults."""
    load_table(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable(
        "stats_nation"
    )
    try:
        spark.sql(
            "ANALYZE TABLE stats_nation COMPUTE STATISTICS FOR COLUMNS n_nationkey"
        )
        desc = {
            r.col_name: r.data_type
            for r in spark.sql("DESCRIBE TABLE EXTENDED stats_nation").collect()
        }
        assert "Statistics" in desc and "rows" in desc["Statistics"]
        col = {
            r.info_name: r.info_value
            for r in spark.sql(
                "DESCRIBE TABLE EXTENDED stats_nation n_nationkey"
            ).collect()
        }
        assert col.get("distinct_count") == "25"
    finally:
        spark.sql("DROP TABLE IF EXISTS stats_nation")


def test_salted_skew_join_explodes_only_hot_keys(spark, sf_dir):
    """Two-path salting: exactly ONE explode (the hot-key build path)
    in the executed plan — the cold-key long tail must join without
    the 8x build-side duplication — and the result must equal the
    plain join."""
    from hivetomysql_spark.queries import queries

    df = queries()["join_salted_skew"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") == 1
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_poisson_bootstrap_digest_below_generator(spark, sf_dir):
    """Perf guard: the md5 seed must be computed ONCE per input row
    (below the replicate explode), not once per (row, replicate) —
    regressing this costs R=32x the digest work (4.5s -> 1.0s at
    sf0.1 when fixed)."""
    from hivetomysql_spark.queries import queries

    df = queries()["stats_poisson_bootstrap"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    gi, mi = plan.find("Generate"), plan.find("conv(")
    assert gi != -1 and mi != -1
    # executed-plan trees print top-down: the digest projection must
    # appear BELOW (after) the Generate node
    assert mi > gi


def test_random_walk_single_exchange(spark, sf_dir):
    """Perf guard: the 6 walk-step joins ride one broadcast adjacency
    table — without the explicit hint the statless localCheckpoint
    made the planner shuffle both sides of every step (43 exchanges)."""
    from hivetomysql_spark.queries import queries

    df = queries()["graph_random_walk_visits"](spark, sf_dir)
    assert I.count_shuffles(df) <= 2
    assert I.has_broadcast_join(df)


def test_gbdt_histogram_not_wide_aggregate(spark, sf_dir, monkeypatch):
    """Perf guard: the boosting rounds reduce through the 10-bucket
    histogram (r13: searched on the driver when all buckets are
    populated; distributed arm forced here), never a 36-expression
    conditional aggregate over the fact table."""
    from hivetomysql_spark.queries import ml_suite, queries

    # driver-dispatch arm (the shipping path): 5-column local frame
    df = queries()["ml_gbdt_stumps_boost"](spark, sf_dir)
    plan = I.physical_plan(df, "simple")
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
    # distributed arm keeps the histogram-path guard meaningful
    monkeypatch.setattr(ml_suite, "_GBDT_FORCE_DISTRIBUTED", True)
    df = queries()["ml_gbdt_stumps_boost"](spark, sf_dir)
    plan = I.physical_plan(df, "simple")
    # bucket key present => histogram path
    assert "bk" in plan
    # wide conditional aggregate would show nl_5 ... nl_45 columns
    assert "nl_45" not in plan


def test_range_bucketed_join_has_no_nested_loop(spark, sf_dir):
    """Scale guard: the bucketed range join must plan as a hash/SMJ
    equi join on the bucket key — a BroadcastNestedLoopJoin here
    means the rewrite regressed to the O(|events| x |windows|)
    theta-join plan."""
    from hivetomysql_spark.queries import queries

    df = queries()["join_range_bucketed"](spark, sf_dir)
    plan = I.physical_plan(df, "simple")
    assert "NestedLoop" not in plan
    assert "Cartesian" not in plan


def test_capped_ngram_dedup_plan_has_posting_cap(spark, sf_dir):
    """The registered production dedup configuration must actually
    carry the stop-shingle posting-list cap in its optimized plan —
    the filter the 100 TB safety argument rests on."""
    from hivetomysql_spark.queries.llm import (
        _NGRAM_CAP_FLOOR,
        dedup_ngram_jaccard_capped,
    )

    # at the 50-doc fixture, the df-fraction cap resolves to its floor
    df = dedup_ngram_jaccard_capped(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "size(lst" in plan and f"<= {_NGRAM_CAP_FLOOR})" in plan, plan[:2000]


def test_spread_for_compute_skips_post_shuffle_frames(spark, sf_dir):
    """A frame that already crossed a shuffle (groupBy upstream) must
    NOT pay a widening round-robin when piped into a compute-heavy
    operator; a narrow single-file scan still must."""
    from hivetomysql_spark.operators import dedup as D
    from hivetomysql_spark.operators.parallelism import spread_for_compute

    docs = load_table(spark, sf_dir, "documents")
    # post-shuffle: survivors of an exact-dedup groupBy joined back
    survivors = (
        docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    )
    piped = D.ngram_jaccard_pairs(survivors, "doc_id", "text")
    plan = piped._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" not in plan
    # raw narrow scan still widens
    spread = spread_for_compute(docs)
    plan2 = spread._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan2
    # explicit override suppresses the probe
    assert spread_for_compute(docs, already_wide=True) is docs


def test_spread_probe_version_canary(spark, sf_dir):
    """Version canary for the spread_for_compute width probe: node
    identification is by Catalyst class simple name, so a Spark
    upgrade that renames Aggregate/Window/Sort/Deduplicate/ResolvedHint
    must fail HERE, not silently revert widening behavior."""
    from pyspark.sql.window import Window

    from hivetomysql_spark.operators.parallelism import (
        _subtree_has_width_shuffle as wide,
    )

    def analyzed(df):
        return df._jdf.queryExecution().analyzed()

    docs = load_table(spark, sf_dir, "documents")
    # each width-node family must still be recognized on this Spark
    assert wide(analyzed(docs.groupBy("lang").count()))
    assert wide(
        analyzed(
            docs.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("lang").orderBy("doc_id")
                ),
            )
        )
    )
    assert wide(analyzed(docs.orderBy("doc_id")))  # global sort
    assert wide(analyzed(docs.dropDuplicates(["lang"])))
    assert wide(analyzed(docs.repartition(8, "lang")))
    # sortWithinPartitions plans no exchange — must NOT count as wide
    assert not wide(analyzed(docs.sortWithinPartitions("doc_id")))
    assert not wide(analyzed(docs.select("doc_id", "text")))


def test_spread_ignores_broadcast_side_shuffles(spark, sf_dir):
    """The ADVICE case: a file-narrow big side joined to an aggregated
    broadcast dim. The dim's Aggregate lives under the broadcast hint
    — its shuffle spreads only the small side — so the joined frame
    must still be treated as narrow and widened for compute."""
    from hivetomysql_spark.operators.parallelism import (
        _subtree_has_width_shuffle as wide,
        spread_for_compute,
    )

    docs = load_table(spark, sf_dir, "documents")
    dim = F.broadcast(
        load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("n_nations"))
    )
    joined = docs.join(
        dim, docs["doc_id"] % 5 == dim["n_regionkey"], "left"
    )
    assert not wide(joined._jdf.queryExecution().analyzed())
    plan = (
        spread_for_compute(joined)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "RoundRobinPartitioning" in plan
    # converse canary: a NON-broadcast strategy hint must NOT act as
    # a barrier — the hinted subtree's Aggregate still counts as wide
    # (pins the strategy-field comparison against HintInfo rendering
    # changes: only strategy == broadcast suppresses the walk)
    merged = docs.join(
        load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("n_nations"))
        .hint("merge"),
        docs["doc_id"] % 5 == F.col("n_regionkey"),
        "left",
    )
    assert wide(merged._jdf.queryExecution().analyzed())
