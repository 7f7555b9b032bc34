"""Semantic assertions for analytics-extras batch 21 (Bollinger
breakouts) beyond the DuckDB oracle checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from hivetomysql_spark.queries import queries
from hivetomysql_spark.tables import load_table

Q = queries()


def test_bollinger_counts_and_severity(spark, sf_dir):
    r = Q["timeseries_bollinger_breakouts"](spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders")
    n_days_total = o.select(F.to_date("o_orderdate")).distinct().count()
    # 19 warmup days drop out of the full-window filter
    assert r["n_days"] == n_days_total - 19
    assert r["n_upper_breakouts"] + r["n_lower_breakouts"] <= r["n_days"]
    # a 2-sigma band keeps breakouts rare (<10% of days for any
    # non-pathological series)
    assert (
        r["n_upper_breakouts"] + r["n_lower_breakouts"]
    ) <= 0.1 * r["n_days"] + 1
    if r["avg_breakout_sigma"] is not None:
        assert r["avg_breakout_sigma"] >= 2.0  # by definition of breakout
    assert r["avg_bandwidth"] > 0
