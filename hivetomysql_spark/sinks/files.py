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
