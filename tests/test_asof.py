from __future__ import annotations

import datetime as dt

from hivetomysql_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_strict(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "p1"),
            (1, _ts("2024-01-01T12:00:00"), "p2"),
            (2, _ts("2024-01-01T09:00:00"), "p3"),  # no prior right row
        ],
        ["uid", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 10.0),
            (1, _ts("2024-01-01T10:00:00"), 20.0),  # exact tie w/ p1
            (1, _ts("2024-01-01T11:00:00"), 30.0),
            (2, _ts("2024-01-01T09:30:00"), 40.0),  # after p3
        ],
        ["uid", "ts", "price"],
    )
    out = {
        r.tag: r
        for r in asof_join(
            left, right, on="uid", left_ts="ts", right_ts="ts",
            allow_exact_matches=False,
        ).collect()
    }
    assert out["p1"].price == 10.0  # strict: 10:00 right row excluded
    assert out["p2"].price == 30.0  # latest before 12:00
    assert out["p3"].price is None  # nothing earlier


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "p1")], ["uid", "ts", "tag"]
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 20.0)], ["uid", "ts", "price"]
    )
    out = asof_join(
        left, right, on="uid", left_ts="ts", right_ts="ts",
        allow_exact_matches=True,
    ).collect()
    assert out[0].price == 20.0  # inclusive picks the tie
