"""Canaries for the plan-budget tooling itself.

The budget gate only protects the registry if its metrics keep
recognizing Spark's plan nodes: if a Spark upgrade renamed
``RoundRobinPartitioning`` (or the Exchange rendering changed),
``count_roundrobin`` would silently return 0 everywhere and every rr
budget would trivially pass. These tests pin the renderings on the
running Spark so drift fails loudly, and pin the bench rotation's
determinism so the per-round window actually advances.
"""

from __future__ import annotations

from hivetomysql_spark.plans import introspect as I


def test_count_roundrobin_canary(spark):
    df = spark.range(100).repartition(4)
    assert I.count_roundrobin(df) == 1
    assert I.count_shuffles(df) == 0


def test_count_shuffles_canary(spark):
    df = spark.range(100).selectExpr("id % 7 AS k").groupBy("k").count()
    assert I.count_shuffles(df) == 1
    assert I.count_roundrobin(df) == 0


def test_budget_snapshot_loads_and_shapes():
    from hivetomysql_spark.plans.budgets import load_budgets

    budgets = load_budgets()
    assert len(budgets) >= 400
    assert all(
        set(v) == {"shuffle", "rr"}
        and isinstance(v["shuffle"], int)
        and isinstance(v["rr"], int)
        for v in budgets.values()
    )


def test_bench_rotation_is_deterministic_and_advances():
    import bench

    names = {f"q{i:03d}" for i in range(100)} | set(bench.HEADLINE)
    idx, window = bench.rotation_slice(names)
    idx2, window2 = bench.rotation_slice(names)
    # deterministic within a round (same BENCH_r files on disk)
    assert (idx, window) == (idx2, window2)
    assert len(window) == bench.ROTATION_SIZE
    assert not set(window) & set(bench.HEADLINE)
    # consecutive indices tile the tail with no overlap until wrap
    tail = sorted(names - set(bench.HEADLINE))
    start = (idx * bench.ROTATION_SIZE) % len(tail)
    assert window[0] == tail[start]


def test_bench_calibrate_contract(spark):
    """The host-speed probes must return positive, bounded numbers
    with stable keys: registry_sweep normalizes cross-round drift by
    ``jvm_sum_sec``, so a renamed key or a zero probe would silently
    disable host-speed normalization (divide-by-zero is guarded, but
    a missing key skips scaling entirely)."""
    import bench

    calib = bench.calibrate(spark)
    assert set(calib) == {"py_sha_sec", "jvm_sum_sec"}
    assert 0 < calib["py_sha_sec"] < 60
    assert 0 < calib["jvm_sum_sec"] < 120
