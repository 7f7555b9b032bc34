"""Driver-side finishing for iteratively-refined SMALL graphs.

The graph operators here (connected components, k-core) all have the
same two-phase shape: one data-sized distributed reduction (groupBy /
distinct) collapses the input to an edge list, then an iterative
refinement loop runs over that REDUCED graph. The loop's per-round
cost is task-scheduling overhead, not data — each round is 2-4 tiny
jobs (join, aggregate, localCheckpoint, convergence probe) — so when
the reduced edge list is small the loop pays seconds of scheduler
latency to move kilobytes (measured at sf0.1: 16 pointer-jumping
rounds over 566 edges ≈ 4.3 s of the 5.1 s query; 4 peel rounds over
7.1k edges ≈ 3 s of 3.6 s).

Dispatch rule (the same measured-dispatch pattern as
``operators/ranks.py``): the reduction phase already counts the edge
list (it sizes the loop's shuffle width); when that count is at most
:data:`DRIVER_EDGE_BOUND` the refinement runs here on the driver —
union-find / bucket peeling over a few MB, microseconds per edge —
and the result returns through ``createDataFrame``. Larger graphs
take the distributed loop unchanged. The bound is a driver-memory
statement, not a local-mode tune: 200k edges ≈ 3 MB through Arrow,
trivially safe for any driver that can broadcast a 10 MB join side,
and a cluster gains exactly the same scheduler-round savings.

Both finishers are the textbook exact algorithms, so results are
bit-identical to the distributed fixpoint (pure integer arithmetic,
no float order sensitivity): min-label propagation converges to
"every node labeled with its component's minimum id", which is
precisely what union-find + per-component min computes; repeated
degree-< k peeling converges to the unique maximal k-core, which is
what queue-based peeling computes (Batagelj–Zaveršnik).
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Iterable

# Directed-edge-row bound under which iterative graph refinement runs
# on the driver. ~3 MB of Arrow traffic and <0.5 s of Python at the
# bound; a reduced graph above it keeps the distributed loop.
DRIVER_EDGE_BOUND = 200_000


def collect_edges(df, src: str = "src", dst: str = "dst") -> list[tuple[int, int]]:
    """Pull a (small, pre-counted) edge frame to the driver via Arrow.

    Callers MUST have counted the frame against
    :data:`DRIVER_EDGE_BOUND` first — this helper is the transfer, not
    the gate.
    """
    pdf = df.select(src, dst).toPandas()
    return list(zip(pdf[src].tolist(), pdf[dst].tolist()))


def minlabel_components(edges: Iterable[tuple[int, int]]) -> dict[int, int]:
    """Exact min-label connected components by union-find.

    Returns ``{node: min id of its component}`` over every node that
    appears in ``edges`` (direction and duplicates are irrelevant).
    Identical to the distributed min-label-propagation fixpoint.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # union toward the smaller root so roots stay component
            # minima as long as possible (pure micro-optimization —
            # the comp_min pass below is what guarantees min labels)
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        if n < comp_min.get(r, n + 1):
            comp_min[r] = n
    return {n: comp_min[find(n)] for n in parent}


def kcore_degrees(
    edges: Iterable[tuple[int, int]], k: int
) -> dict[int, int]:
    """Exact k-core by queue-based peeling (Batagelj–Zaveršnik).

    ``edges`` is an undirected edge set given as directed rows (one or
    both directions; duplicates collapse). Returns ``{node: in-core
    degree}`` for the maximal subgraph where every node has degree
    ≥ k — identical to the repeated-peel fixpoint. Empty dict when the
    k-core is empty.
    """
    adj: dict[int, set[int]] = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    deg = {n: len(s) for n, s in adj.items()}
    stack = [n for n, d in deg.items() if d < k]
    removed: set[int] = set()
    while stack:
        n = stack.pop()
        if n in removed:
            continue
        removed.add(n)
        for m in adj[n]:
            if m not in removed:
                deg[m] -= 1
                if deg[m] == k - 1:  # crossed below k exactly once
                    stack.append(m)
    return {n: d for n, d in deg.items() if n not in removed}
