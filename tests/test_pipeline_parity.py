"""Parity tests for the reference's observable ETL semantics.

Fixtures follow FIXTURES.md §B: synthetic TSV dumps / conf / map that
exercise mapping, constants, NULL rule, header echoes, missing-field
drop-vs-abort, and empty input.
"""

from __future__ import annotations

import pytest

from hivetomysql_spark.config import DumpConf, DumpMap
from hivetomysql_spark.errors import MissingSourceFieldError, NoDataError
from hivetomysql_spark.pipeline import apply_mapping, run_pipeline, validate_mapping
from hivetomysql_spark.sources import read_tsv_dump

TSV = (
    "events.event_id\tevents.event_type\tevents.user_id\tevents.value\n"
    "1\tclick\t10\t1.5\n"
    "2\tview\tNULL\t2.0\n"
    # hive CLI header echo mid-stream — must be filtered
    "events.event_id\tevents.event_type\tevents.user_id\tevents.value\n"
    "3\tpurchase\t12\tNULL\n"
)

MAP_TEXT = "etype=event_type\nuid=user_id\namount=value\nds=$ds\nversion=#2.0\n"
CONF_TEXT = "ds=20240101\ndelete_before_dump=true\n"


@pytest.fixture()
def tsv_path(tmp_path):
    p = tmp_path / "dump.data"
    p.write_text(TSV, encoding="utf-8")
    return str(p)


def _conf_map(conf_text=CONF_TEXT, map_text=MAP_TEXT):
    conf = DumpConf.from_text(conf_text)
    return conf, DumpMap.from_text(map_text, conf=conf)


def test_tsv_reader_strips_prefix_nulls_and_header_echo(spark, tsv_path):
    df = read_tsv_dump(spark, tsv_path)
    assert df.columns == ["event_id", "event_type", "user_id", "value"]
    rows = {r.event_id: r for r in df.collect()}
    assert set(rows) == {"1", "2", "3"}  # echo row dropped
    assert rows["2"].user_id is None  # literal NULL decoded
    assert rows["3"].value is None
    assert all(t == "string" for _, t in df.dtypes)  # all-varchar model


def test_mapping_rename_constants_order(spark, tsv_path):
    conf, mapping = _conf_map()
    df = read_tsv_dump(spark, tsv_path)
    out = run_pipeline(df, conf, mapping)
    assert out.columns == ["etype", "uid", "amount", "ds", "version"]
    r = {row.etype: row for row in out.collect()}
    assert r["click"].uid == "10"
    assert r["click"].ds == "20240101"
    assert r["click"].version == "2.0"
    assert r["view"].uid is None


def test_missing_field_dropped_by_default(spark, tsv_path):
    conf, mapping = _conf_map(map_text=MAP_TEXT + "ghost=no_such_col\n")
    df = read_tsv_dump(spark, tsv_path)
    validated = validate_mapping(df, mapping, error_if_missing=False)
    out = apply_mapping(df, validated)
    assert "ghost" not in out.columns
    assert out.columns == ["etype", "uid", "amount", "ds", "version"]


def test_missing_field_aborts_when_flagged(spark, tsv_path):
    conf, mapping = _conf_map(
        conf_text=CONF_TEXT + "error_if_src_field_not_exsits=true\n",
        map_text=MAP_TEXT + "ghost=no_such_col\n",
    )
    df = read_tsv_dump(spark, tsv_path)
    with pytest.raises(MissingSourceFieldError) as ei:
        run_pipeline(df, conf, mapping)
    assert ei.value.exit_code == 9997


def test_empty_input_raises_when_flagged(spark, tmp_path):
    p = tmp_path / "empty.data"
    p.write_text("events.event_id\tevents.event_type\tevents.user_id\tevents.value\n")
    conf, mapping = _conf_map(conf_text=CONF_TEXT + "error_if_none_data=true\n")
    df = read_tsv_dump(spark, str(p))
    with pytest.raises(NoDataError) as ei:
        run_pipeline(df, conf, mapping)
    assert ei.value.exit_code == 9998


def test_empty_input_ok_when_not_flagged(spark, tmp_path):
    p = tmp_path / "empty.data"
    p.write_text("events.event_id\tevents.event_type\tevents.user_id\tevents.value\n")
    conf, mapping = _conf_map()
    df = read_tsv_dump(spark, str(p))
    out = run_pipeline(df, conf, mapping)
    assert out.count() == 0


def test_hll_sketch_estimate_close_to_exact(spark, sf_dir):
    """Merged per-partition HLL sketches must estimate the global
    distinct count within DataSketches' published error (~2.5% at
    default lgk=12; we allow 5%)."""
    import __spark_entry__ as m
    from hivetomysql_spark.queries.relational_extras import hll_merge_estimate

    est = hll_merge_estimate(spark, sf_dir).collect()[0].approx_distinct_custkeys
    gate = m.queries()["agg_hll_sketch_merge"](spark, sf_dir).collect()[0]
    assert gate.within_5pct is True
    from hivetomysql_spark.tables import load_table
    from pyspark.sql import functions as F

    exact = (
        load_table(spark, sf_dir, "orders")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()[0]
        .n
    )
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_pipeline_observe_metrics_single_pass(spark, tmp_path):
    """metrics_out is filled from df.observe during the sink's own
    pass: row count + per-column null counts, no second scan."""
    from hivetomysql_spark.pipeline import run_pipeline
    from hivetomysql_spark.config import DumpConf, DumpMap

    conf = DumpConf.from_text("ds=20240101\n")
    mapping = DumpMap.from_text("name=r_name\nkey=r_regionkey\nds=$ds\n", conf=conf)
    src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    metrics = {}
    out_dir = str(tmp_path / "obs_out")

    def sink(df, c, m):
        df.write.mode("overwrite").parquet(out_dir)

    run_pipeline(src, conf, mapping, sink=sink, metrics_out=metrics)
    assert metrics["rows_out"] == 5
    assert metrics["nulls_name"] == 0
    assert metrics["nulls_ds"] == 0  # constant column never null
