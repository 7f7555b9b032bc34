"""Table-maintenance sink operations: small-files compaction and
partition retention (the housekeeping a 100 TB table needs beside the
write paths tested in test_pipeline/test_plans)."""

from __future__ import annotations

from hivetomysql_spark.tables import load_table


def test_compact_files(spark, sf_dir, tmp_path):
    """Compaction rewrites a fragmented directory into few files with
    identical content."""
    from hivetomysql_spark.sinks.files import compact_files

    src, dest = str(tmp_path / "frag"), str(tmp_path / "compact")
    o = load_table(spark, sf_dir, "orders")
    o.repartition(40).write.mode("overwrite").parquet(src)
    before, after = compact_files(spark, src, dest, target_file_bytes=1 << 30)
    assert before == 40 and after == 1
    a = spark.read.parquet(src)
    b = spark.read.parquet(dest)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0


def test_expire_partitions(spark, sf_dir, tmp_path):
    """Retention deletes only expired ds directories; survivors keep
    byte-identical content."""
    from pyspark.sql import functions as F

    from hivetomysql_spark.sinks.files import expire_partitions

    path = str(tmp_path / "part")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ds", F.date_format("ts", "yyyyMMdd")
    )
    ev.write.partitionBy("ds").mode("overwrite").parquet(path)
    # partition-column values come back type-inferred (int); the FS
    # directory names are strings - normalize
    all_ds = sorted(str(r.ds) for r in spark.read.parquet(path).select("ds").distinct().collect())
    keep = all_ds[-2:]
    dropped = expire_partitions(spark, path, "ds", keep)
    assert sorted(dropped) == all_ds[:-2]
    left = spark.read.parquet(path)
    assert sorted(str(r.ds) for r in left.select("ds").distinct().collect()) == keep
    assert left.count() == ev.where(F.col("ds").isin(keep)).count()
    assert left.count() > 0
