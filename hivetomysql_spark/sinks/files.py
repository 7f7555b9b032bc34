"""File sinks (extension tier): parquet / CSV.

The reference's only sink is MySQL; at 100 TB the common landing zone
is columnar files, so the engine treats parquet as a first-class sink.
``partition_by`` columns become directory partitions — the write-side
mirror of the ``ds=`` partition pruning on the read side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Idempotent partition-scoped overwrite for file sinks — the
    data-lake mirror of the reference's delete-before-insert
    (HiveToMysql.java:270-282): re-running a day replaces exactly the
    partitions present in ``df``, leaving every other partition
    untouched.

    ``partitionOverwriteMode=dynamic`` is set as a writer option, so
    it applies to this write only — no session-level conf mutation.
    With static mode (the default) ``mode("overwrite")`` would wipe
    the whole root path; dynamic is what makes per-``ds`` re-imports
    safe at 100 TB where the root holds years of partitions.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    bucket_by: list[str],
    n_buckets: int = 8,
    sort_by: list[str] | None = None,
) -> None:
    """Persist a DataFrame as a bucketed (+ optionally sort-ordered)
    table: rows are hash-clustered into ``n_buckets`` files per
    partition by ``bucket_by``.

    This is the co-location contract for repeated big joins: two
    tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle (and without a sort, if ``sort_by`` matches) —
    the exchange that dominates a 100 TB join is paid once at write
    time instead of per query. Asserted plan-shape in
    tests/test_plans.py::test_bucketed_join_is_shuffle_free.
    """
    writer = df.write.mode("overwrite").option("path", path)
    writer = writer.bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    sep: str = ",",
    header: bool = True,
) -> None:
    (
        df.write.mode(mode)
        .option("sep", sep)
        .option("header", str(header).lower())
        .csv(path)
    )
