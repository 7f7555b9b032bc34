"""Driver-side GBDT split search (queries/ml_suite.py, r13).

``ml_gbdt_stumps_boost`` collapses boosting onto a 10-row bucket
histogram (r11); r13 moves the O(1) split-search rounds onto the
driver (one 10-row collect) when all 10 buckets are populated —
exactly the XGBoost split of labor (cluster builds the histogram,
driver searches the splits). These tests pin (a) driver-vs-forced-
distributed row equality on the registered query — the dispatch must
be invisible in results — and (b) that the Python HALF_UP rounding
helper reproduces Spark's ``F.round`` on representative doubles.
"""

from __future__ import annotations

import pytest

from hivetomysql_spark.queries import ml_suite


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_gbdt_driver_vs_distributed(spark, sf_dir, monkeypatch):
    fn_rows = _rows(ml_suite.ml_gbdt_stumps_boost(spark, sf_dir))
    monkeypatch.setattr(ml_suite, "_GBDT_FORCE_DISTRIBUTED", True)
    loop_rows = _rows(ml_suite.ml_gbdt_stumps_boost(spark, sf_dir))
    assert fn_rows == loop_rows
    assert len(fn_rows) == ml_suite._GBDT_ROUNDS
    # schema must be byte-identical too (the oracle hashes it)
    a = ml_suite.ml_gbdt_stumps_boost(spark, sf_dir)
    monkeypatch.setattr(ml_suite, "_GBDT_FORCE_DISTRIBUTED", False)
    b = ml_suite.ml_gbdt_stumps_boost(spark, sf_dir)
    assert a.schema == b.schema


@pytest.mark.parametrize(
    "x",
    [
        0.0,
        1.0,
        38273.12935,        # representative price-scale value
        1234.56785,         # repr ends exactly in ...5
        0.00005,
        2.675,              # classic binary-misrepresentation case
        99999.99995,
        3141.5926535,
        -7.12345,
        1e-8,
        123456789.987654,
    ],
)
def test_driver_round_matches_spark_round(spark, x):
    """``_gbdt_rounds_on_driver`` quantizes via Decimal(repr(x)) —
    assert that equals Spark's F.round (BigDecimal(Double.toString),
    HALF_UP) on values spanning the magnitudes the query emits."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    py = float(
        Decimal(repr(float(x))).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
    )
    jvm = (
        spark.range(1)
        .select(F.round(F.lit(float(x)), 4).alias("r"))
        .first()["r"]
    )
    assert py == jvm, (x, py, jvm)
