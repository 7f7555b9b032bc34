"""Input-parallelism guard for compute-heavy narrow stages.

Parquet parallelism is bounded by row groups: a table written as few
large row groups (or many tiny single-group files that coalesce into
one split under ``spark.sql.files.maxPartitionBytes``) scans as a
handful of partitions, and every narrow operator chained on the scan
— shingling, minhashing, per-vector math — runs on that handful of
cores while the rest of the cluster idles. That is exactly the shape
of the fixture tables here (one ~0.5 MB file = one split), and it is
also a real 100 TB failure mode (the "small files" / "fat row group"
problem after compaction).

:func:`spread_for_compute` widens the input to cluster parallelism
*only when the scan is narrower than the cluster*: a round-robin
``repartition`` whose shuffle moves each row once. For scan-bound
ops that extra shuffle would be waste; for compute-bound ops (≥ μs
of expression work per row) it is the difference between 1 core and
all of them. Inputs that already carry ≥ cluster-width partitions
(the common case on a real cluster reading splittable storage) pass
through untouched, so the guard costs one driver-side partition-count
lookup and nothing at execution time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Logical nodes that ALWAYS plan a data-width exchange (hash or range)
# beneath them: any frame containing one is already spread across
# shuffle partitions, so a widening round-robin on top is pure waste.
# (Join is deliberately absent — a broadcast join preserves the big
# side's possibly-narrow scan partitioning, so post-join frames keep
# the file-count probe.)
_WIDTH_NODES = frozenset(
    {
        "Aggregate",
        "Window",
        "Deduplicate",
        "Distinct",
        "RepartitionByExpression",
        "Repartition",
        "RebalancePartitions",
    }
)


def _subtree_has_width_shuffle(node) -> bool:
    """Walk the analyzed logical plan (JVM node tree, not its string
    rendering) looking for a node that implies a data-width exchange.

    Two deliberate refinements over a plan-string regex:

    - **Broadcast-hinted subtrees are barriers.** An aggregated dim
      wrapped in ``F.broadcast(...)`` plans its shuffle on the SMALL
      side only; the big probe side keeps its (possibly file-narrow)
      scan partitioning, so an Aggregate found under a broadcast hint
      must NOT suppress widening of the frame as a whole.
    - **Sort counts only when global.** ``sortWithinPartitions``
      (Sort with global=false) plans no exchange and preserves input
      width; only a global Sort range-partitions.

    Node identification is by Catalyst class simple name — a Spark
    upgrade that renames one silently reverts the affected case to
    the widen-by-default behavior, so tests/test_plans.py carries a
    version canary asserting the probe still recognizes an aggregate,
    a window, and the broadcast-barrier case on the running Spark.
    """
    stack = [node]
    while stack:
        n = stack.pop()
        cls = n.getClass().getSimpleName()
        if cls == "ResolvedHint":
            # hint kinds: broadcast / merge / shuffle_hash /
            # shuffle_replicate_nl / rebalance / repartition. Only the
            # broadcast hint keeps the OTHER side narrow; for the rest
            # keep walking the child. Compare the strategy field
            # itself (HintInfo.strategy: Option[JoinStrategyHint]),
            # not a substring of HintInfo.toString() — a future hint
            # whose rendering merely CONTAINS "broadcast" (or a
            # format change) must not become a silent barrier.
            strat = n.hints().strategy()
            if strat.isDefined() and strat.get().toString() == "broadcast":
                continue
        elif cls == "Sort":
            if getattr(n, "global")():
                return True
        elif cls in _WIDTH_NODES:
            return True
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return False


def spread_for_compute(
    df: DataFrame,
    min_partitions: int | None = None,
    already_wide: bool = False,
) -> DataFrame:
    """Repartition ``df`` up to cluster parallelism if its current
    partitioning would leave cores idle in a compute-bound stage.

    Never shrinks an already-wide input. ``min_partitions`` overrides
    the default target (``sparkContext.defaultParallelism``);
    ``already_wide=True`` lets a call site that knows its input is
    spread skip the probe entirely.

    The width probe is ``df.inputFiles()`` — resolved from the
    already-analyzed logical plan, so repeated calls inside composite
    pipelines cost nothing extra (unlike ``df.rdd``, which forces a
    fresh physical plan + RDD conversion per call). File count lower-
    bounds split count: a scan over >= target files is already wide
    enough (splittable formats only get wider). A zero-file input is
    NOT automatically narrow, though: a post-shuffle frame (groupBy /
    window / distinct upstream) is already spread across shuffle
    partitions, so before repartitioning the analyzed logical plan is
    scanned for shuffle-implying nodes and such frames pass through
    untouched — piping an operator's output back into another
    operator must not pay a useless round-robin shuffle. Only inputs
    that are BOTH file-narrow and shuffle-free (single-file scans,
    in-memory test frames) get widened.
    """
    if already_wide:
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if len(df.inputFiles()) >= target:
        return df
    if _subtree_has_width_shuffle(df._jdf.queryExecution().analyzed()):
        return df
    return df.repartition(target)
