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


def spread_for_compute(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to cluster parallelism if its current
    partitioning would leave cores idle in a compute-bound stage.

    Never shrinks an already-wide input. ``min_partitions`` overrides
    the default target (``sparkContext.defaultParallelism``).

    The width probe is ``df.inputFiles()`` — resolved from the
    already-analyzed logical plan, so repeated calls inside composite
    pipelines cost nothing extra (unlike ``df.rdd``, which forces a
    fresh physical plan + RDD conversion per call). File count lower-
    bounds split count: a scan over >= target files is already wide
    enough (splittable formats only get wider). Inputs with no file
    lineage (in-memory test frames, post-shuffle stages narrowed by
    coalesce) report zero files and are conservatively spread — every
    call site here feeds a compute-bound stage where an unneeded
    one-pass round-robin shuffle is far cheaper than running the
    stage on one core.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if len(df.inputFiles()) < target:
        return df.repartition(target)
    return df
