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


def bfs_distances(
    edges: Iterable[tuple[int, int]], src: int, max_rounds: int = 40
) -> dict[int, int]:
    """Exact single-source BFS over directed edge rows.

    Returns ``{node: hop distance from src}`` for every node reachable
    along edge direction (callers pass the undirected doubling, same
    as the distributed loop consumes). Pure integer arithmetic — the
    identical min-distance fixpoint the per-round frontier-join loop
    computes. Raises on a frontier still alive at ``max_rounds``
    (same loud cap as the distributed loop: the oracle's recursive
    closure carries the same depth guard, so distances past it would
    silently diverge).
    """
    adj: dict[int, list[int]] = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
    dist = {src: 0}
    frontier = [src]
    d = 0
    while frontier:
        d += 1
        nxt: list[int] = []
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = d
                    nxt.append(m)
        if nxt and d >= max_rounds:
            # the distributed loop raises when the level-40 frontier
            # is non-empty; replicate exactly
            raise RuntimeError(
                "graph_bfs_distances: frontier still growing after "
                f"{max_rounds} rounds; graph diameter exceeds the cap"
            )
        frontier = nxt
    return dist

def hits_topk(
    edges: Iterable[tuple[int, int]], rounds: int, k: int = 10
) -> list[tuple[int, float, int]]:
    """HITS authority top-k replay over a collected bipartite edge list.

    ``edges`` are DISTINCT (hub, authority) rows. Replicates the
    alternating L1-normalized update term-for-term: h0 = 1.0/n_hubs
    (the same IEEE division), per-key sums by plain sequential float
    addition in SORTED partner order, one normalize division per
    half-round. The distributed loop's partial-aggregation order is
    nondeterministic run-to-run at the last bit anyway — the contract
    both arms meet is the 6-decimal ROUND in the output, where these
    perturbations are ~1e-15 relative and the certification gates
    (sf0.01/0.1/1) verify agreement. Output rows are the Spark
    query's exact shape: rank = row_number by (raw score desc, node),
    then top-k selected by (ROUND(score, 6) desc, node) — HALF_UP on
    the shortest decimal repr, Spark's F.round semantics.
    """
    from decimal import ROUND_HALF_UP, Decimal

    def rnd6(x: float) -> float:
        return float(
            Decimal(repr(float(x))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    by_a: dict[int, list[int]] = defaultdict(list)
    by_h: dict[int, list[int]] = defaultdict(list)
    for c, p in edges:
        by_a[p].append(c)
        by_h[c].append(p)
    for lst in by_a.values():
        lst.sort()
    for lst in by_h.values():
        lst.sort()
    n_c = len(by_h)
    h = {c: 1.0 / n_c for c in by_h}
    a: dict[int, float] = {}
    for _ in range(rounds):
        a_raw: dict[int, float] = {}
        for p in sorted(by_a):
            s = 0.0
            for c in by_a[p]:
                s += h[c]
            a_raw[p] = s
        a_tot = 0.0
        for p in sorted(a_raw):
            a_tot += a_raw[p]
        a = {p: a_raw[p] / a_tot for p in a_raw}
        h_raw: dict[int, float] = {}
        for c in sorted(by_h):
            s = 0.0
            for p in by_h[c]:
                s += a[p]
            h_raw[c] = s
        h_tot = 0.0
        for c in sorted(h_raw):
            h_tot += h_raw[c]
        h = {c: h_raw[c] / h_tot for c in h_raw}
    ranked = sorted(a.items(), key=lambda t: (-t[1], t[0]))
    rank = {p: i + 1 for i, (p, _) in enumerate(ranked)}
    out = [(int(p), rnd6(s), rank[p]) for p, s in a.items()]
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]
