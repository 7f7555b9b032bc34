"""Extension-tier source readers: CSV / JSON round-trips and the rate
streaming source (SURVEY.md §2.2 "Scans/sources beyond Hive-CLI")."""

from __future__ import annotations

from hivetomysql_spark.sources import read_csv, read_json, read_orc
from hivetomysql_spark.tables import load_table


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    nation.write.orc(path)
    back = read_orc(spark, path)
    got = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in back.collect()}
    want = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in nation.collect()}
    assert got == want


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    nation.write.option("header", True).csv(path)
    back = read_csv(spark, path, header=True)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)
    # inferSchema restored integer types
    assert dict(back.dtypes)["n_nationkey"] == "int"


def test_json_roundtrip(spark, sf_dir, tmp_path):
    region = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_json")
    region.write.json(path)
    back = read_json(spark, path)
    got = {(r.r_regionkey, r.r_name) for r in back.collect()}
    want = {(r.r_regionkey, r.r_name) for r in region.collect()}
    assert got == want


def test_rate_stream_source(spark):
    """Rate source — the built-in load-generator stream (useful for
    soak-testing streaming operators without a broker)."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "100").load()
    )
    assert stream.isStreaming
    assert set(stream.columns) == {"timestamp", "value"}
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_smoke")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM rate_smoke").collect()[0].c
            if n > 0:
                break
            time.sleep(0.5)
        assert n > 0
    finally:
        q.stop()
