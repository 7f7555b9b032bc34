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

import re

from pyspark.sql import DataFrame

# Logical nodes that ALWAYS plan a data-width exchange (hash or range)
# beneath them: any frame containing one is already spread across
# shuffle partitions, so a widening round-robin on top is pure waste.
# (Join is deliberately absent — a broadcast join preserves the big
# side's possibly-narrow scan partitioning, so post-join frames keep
# the file-count probe.)
_SHUFFLED_NODE_RE = re.compile(
    r"(?m)^[\s+:-]*(Aggregate|Window|Deduplicate|Sort|"
    r"RepartitionByExpression|Repartition) "
)


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
    analyzed = df._jdf.queryExecution().analyzed().toString()
    if _SHUFFLED_NODE_RE.search(analyzed):
        return df
    return df.repartition(target)
