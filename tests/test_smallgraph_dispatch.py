"""Driver-side small-graph dispatch (operators/smallgraph.py, r13).

The iterative graph operators dispatch their refinement loop to the
driver when the REDUCED edge list is under DRIVER_EDGE_BOUND rows.
These tests pin (a) the driver finishers against hand-checked graphs,
(b) driver-vs-distributed-loop equivalence on the same inputs — the
dispatch must be invisible in results — and (c) that the registered
graph queries produce identical rows under both dispatch arms.
"""

from __future__ import annotations

import pytest

from hivetomysql_spark.operators import dedup as D
from hivetomysql_spark.operators import smallgraph as SG


def test_minlabel_components_chain_clique_pair():
    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5),   # chain, diameter 4
        (10, 11), (11, 12), (10, 12),     # clique
        (20, 21),                         # isolated pair
    ]
    assert SG.minlabel_components(edges) == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }
    # direction and duplicates are irrelevant
    assert SG.minlabel_components(
        [(2, 1), (2, 3), (3, 4), (5, 4), (4, 5)]
    ) == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}
    assert SG.minlabel_components([]) == {}


def test_kcore_degrees_hand_checked():
    # 4-clique (each degree 3) with a pendant chain hanging off it:
    # the 3-core is exactly the clique, pendant peels in two rounds
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (4, 5), (5, 6),                                   # pendant chain
    ]
    assert SG.kcore_degrees(edges, 3) == {1: 3, 2: 3, 3: 3, 4: 3}
    # 2-core keeps only cycles: the chain still peels
    assert SG.kcore_degrees(edges, 2) == {1: 3, 2: 3, 3: 3, 4: 3}
    # k=4 over K4 is empty (degree 3 < 4 everywhere)
    assert SG.kcore_degrees(edges, 4) == {}
    # duplicate / reversed rows collapse; self-loops ignored
    assert SG.kcore_degrees(
        [(1, 2), (2, 1), (1, 1), (2, 3), (1, 3)], 2
    ) == {1: 2, 2: 2, 3: 2}


def test_connected_components_driver_vs_loop(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (11, 12), (10, 12),
         (20, 21)],
        ["id_a", "id_b"],
    )
    via_driver = {
        (r.doc_id, r.cluster_id)
        for r in D.connected_components(pairs).collect()
    }
    via_loop = {
        (r.doc_id, r.cluster_id)
        for r in D.connected_components(
            pairs, driver_edge_bound=0
        ).collect()
    }
    assert via_driver == via_loop
    assert via_driver == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


@pytest.mark.parametrize("qname", ["graph_kcore", "graph_connected_components"])
def test_graph_query_driver_vs_loop(spark, sf_dir, qname, monkeypatch):
    """The registered queries return identical rows whether the
    refinement ran on the driver (default at fixture scale) or in the
    distributed loop (forced by zeroing the dispatch bound)."""
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[qname]
    driver_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
    monkeypatch.setattr(SG, "DRIVER_EDGE_BOUND", -1)
    loop_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert driver_rows == loop_rows
    assert driver_rows  # non-degenerate fixture

def test_bfs_distances_hand_checked():
    # chain 1-2-3-4-5 doubled + disconnected pair (10, 11): from
    # src=1 the pair is unreachable
    half = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    edges = half + [(v, u) for u, v in half]
    assert SG.bfs_distances(edges, 1) == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}
    assert SG.bfs_distances(edges, 10) == {10: 0, 11: 1}
    # direction respected (no reverse rows): 5 reaches nothing
    assert SG.bfs_distances(half, 5) == {5: 0}
    # the loud cap replicates the distributed loop: a node FIRST
    # reached at distance == max_rounds raises
    chain = [(i, i + 1) for i in range(41)]
    with pytest.raises(RuntimeError, match="frontier still growing"):
        SG.bfs_distances(chain, 0, max_rounds=40)
    # ... while max distance == max_rounds - 1 is fine
    assert SG.bfs_distances(chain[:39], 0, max_rounds=40)[39] == 39


@pytest.mark.parametrize(
    "qname", ["graph_bfs_distances"]
)
def test_bfs_query_driver_vs_loop(spark, sf_dir, qname, monkeypatch):
    """r13: the BFS query returns identical rows and schema under
    both dispatch arms (driver replay vs distributed rounds)."""
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[qname]
    driver_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
    driver_schema = fn(spark, sf_dir).schema
    monkeypatch.setattr(SG, "DRIVER_EDGE_BOUND", -1)
    loop_df = fn(spark, sf_dir)
    assert driver_rows == sorted(map(tuple, loop_df.collect()))
    assert driver_schema == loop_df.schema
    assert driver_rows  # non-degenerate fixture


def test_hits_topk_hand_checked():
    # star: hub customers 1,2 both buy part 10; only 1 buys part 11.
    # Authority of 10 must dominate; scores L1-normalize to 1.
    rows = SG.hits_topk([(1, 10), (1, 11), (2, 10)], rounds=6, k=10)
    assert [p for p, _, _ in rows] == [10, 11]
    assert [r for _, _, r in rows] == [1, 2]
    assert abs(sum(s for _, s, _ in rows) - 1.0) < 1e-6
    assert rows[0][1] > rows[1][1]
    # symmetric bipartite graph: equal raw scores, rank ties broken
    # by ascending node, top-k selection keeps rank order
    rows = SG.hits_topk([(1, 10), (2, 11)], rounds=3, k=10)
    assert rows == [(10, 0.5, 1), (11, 0.5, 2)]
    # k truncates AFTER global ranking
    rows = SG.hits_topk(
        [(1, 10), (1, 11), (1, 12), (2, 10), (3, 10), (3, 12)],
        rounds=6,
        k=2,
    )
    assert len(rows) == 2 and rows[0][2] == 1 and rows[1][2] == 2


def test_hits_query_driver_vs_loop(spark, sf_dir, monkeypatch):
    """r13: graph_hits_authority returns identical rows and schema
    under both dispatch arms — the sorted-order driver sums and the
    distributed partial aggregates meet at the 6-decimal ROUND."""
    import __spark_entry__ as entrymod

    fn = entrymod.queries()["graph_hits_authority"]
    driver_df = fn(spark, sf_dir)
    driver_rows = sorted(map(tuple, driver_df.collect()))
    monkeypatch.setattr(SG, "DRIVER_EDGE_BOUND", -1)
    loop_df = fn(spark, sf_dir)
    assert driver_rows == sorted(map(tuple, loop_df.collect()))
    assert driver_df.schema == loop_df.schema
    assert len(driver_rows) == 10
