"""Fixture-table loader for the driver's testdata parquet dirs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # must work on ANY session (the driver builds its own):
        # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects
        # unless this legacy conf maps it to long
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS); with
    # spark.sql.legacy.parquet.nanosAsLong it arrives as epoch-nanos
    # long — convert to a proper timestamp (truncating to micros,
    # matching DuckDB's TIMESTAMP_NS→TIMESTAMP cast).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division — float division would lose precision on
        # epoch-nanos (~1.7e18 > 2^53)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
    # TIMESTAMP_NTZ on Spark 4 (inferTimestampNTZ default), which
    # functions like unix_micros reject. Normalize to TIMESTAMP;
    # the container/session tz is UTC so the wall-clock value is
    # preserved and matches DuckDB's naive-timestamp semantics.
    ntz_cols = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    if ntz_cols:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    return df


_ROW_COUNT_CACHE: dict[tuple[str, str], int] = {}


def table_row_count(sf_dir: str, name: str) -> int:
    """Row count of a fixture table from parquet FOOTER metadata —
    no Spark job, so query constructors that need a corpus-size
    scalar (e.g. the stop-shingle cap in
    ``dedup_ngram_jaccard_capped``) stay action-free for plan-only
    consumers (freeze_plans, the plan-budget gate, diffcheck plan
    derivation). Cached per (sf_dir, name); handles both a single
    ``<name>.parquet`` file and a directory of part files."""
    key = (sf_dir, name)
    if key not in _ROW_COUNT_CACHE:
        import os

        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):
            total = sum(
                pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                for root, _, files in os.walk(path)
                for f in files
                if f.endswith(".parquet")
            )
        else:
            total = pq.ParquetFile(path).metadata.num_rows
        _ROW_COUNT_CACHE[key] = int(total)
    return _ROW_COUNT_CACHE[key]


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql()."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
