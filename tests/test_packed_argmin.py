"""operators/packed.py — the packed-array argmin that replaced the
crossJoin + row_number()-window form in the centroid-assignment
queries (r13). Pins the exact equivalence the rewrites rely on:
``array_min``/``array_max`` over (score, tiebreak) structs picks the
same winner as ``row_number() OVER (ORDER BY ...) = 1``, including
ties and NaN scores, and an EMPTY packed side drops every data row
exactly as a crossJoin against the empty unpacked frame does."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.operators.packed import attach_packed, pack_structs


def _ref(spark, rows):
    return spark.createDataFrame(rows, "cid bigint, score_bias double")


def _data(spark):
    return spark.createDataFrame(
        [Row(rid=i, v=float(i)) for i in range(6)], "rid bigint, v double"
    )


def _window_winner(data, ref, score):
    """The classic form: crossJoin + ORDER BY (score DESC, cid ASC)."""
    j = data.crossJoin(F.broadcast(ref)).select(
        "rid", "cid", score.alias("s")
    )
    w = Window.partitionBy("rid").orderBy(F.desc("s"), "cid")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("rid", "cid", "s")
    )


def _packed_winner(data, ref, score_fn):
    j = attach_packed(data, pack_structs(ref, "cid", "score_bias"))
    scored = F.transform(
        F.col("cs"),
        lambda c: F.struct(
            score_fn(c).alias("s"), (-c["cid"]).alias("ncid")
        ),
    )
    return j.select("rid", F.array_max(scored).alias("b")).select(
        "rid", (-F.col("b.ncid")).alias("cid"), F.col("b.s").alias("s")
    )


def test_packed_argmax_matches_window_with_ties(spark):
    # cid 1 and 2 share identical scores for every row (tie -> min cid);
    # cid 0 wins only for rid >= 4
    ref = _ref(spark, [(0, 0.0), (1, 2.0), (2, 2.0)])
    data = _data(spark)
    score = F.col("v") * 0.5 + F.col("score_bias")
    win = {
        (r.rid): (r.cid, r.s)
        for r in _window_winner(data, ref, score).collect()
    }
    packed = {
        (r.rid): (r.cid, r.s)
        for r in _packed_winner(
            data, ref, lambda c: F.col("v") * 0.5 + c["score_bias"]
        ).collect()
    }
    assert win == packed
    # the tie really exercises the tiebreak: winners include cid 1, never 2
    assert {c for c, _ in packed.values()} <= {0, 1}
    assert any(c == 1 for c, _ in packed.values())


def test_packed_argmax_nan_agrees_with_window(spark):
    # one reference row scores NaN: Spark orders NaN greatest in BOTH
    # window ORDER BY ... DESC and struct comparison, so the two forms
    # must pick the same (NaN) winner
    ref = _ref(spark, [(0, 1.0), (7, float("nan"))])
    data = _data(spark)
    score = F.col("v") + F.col("score_bias")
    win = sorted(
        (r.rid, r.cid) for r in _window_winner(data, ref, score).collect()
    )
    packed = sorted(
        (r.rid, r.cid)
        for r in _packed_winner(
            data, ref, lambda c: F.col("v") + c["score_bias"]
        ).collect()
    )
    assert win == packed
    assert all(c == 7 for _, c in win)


def test_empty_packed_side_drops_all_rows(spark):
    ref = _ref(spark, []).where(F.lit(False))
    data = _data(spark)
    # crossJoin against the empty unpacked frame: zero rows
    assert data.crossJoin(F.broadcast(ref)).count() == 0
    # packed form must agree (agg still emits one row holding [])
    j = attach_packed(data, pack_structs(ref, "cid", "score_bias"))
    assert j.count() == 0


def test_packed_argmin_struct_order_is_score_then_tiebreak(spark):
    # array_min over (d2, cl) structs: equal d2 -> smaller cl, the
    # ORDER BY d2, cl contract the kmeans assignment relies on
    df = spark.range(1).select(
        F.array_min(
            F.array(
                F.struct(F.lit(2.0).alias("d2"), F.lit(9).alias("cl")),
                F.struct(F.lit(1.0).alias("d2"), F.lit(5).alias("cl")),
                F.struct(F.lit(1.0).alias("d2"), F.lit(3).alias("cl")),
            )
        ).alias("b")
    )
    row = df.collect()[0]["b"]
    assert (row["d2"], row["cl"]) == (1.0, 3)


def test_pack_at_row_cap_passes(spark):
    # r14 (verdict r13 #7): the row-width budget — a pack of exactly
    # max_rows entries builds and attaches normally.
    ref = _ref(spark, [(i, float(i)) for i in range(5)])
    packed = pack_structs(ref, "cid", "score_bias", max_rows=5)
    got = attach_packed(_data(spark), packed).count()
    assert got == 6


def test_pack_over_row_cap_raises_loudly(spark):
    ref = _ref(spark, [(i, float(i)) for i in range(6)])
    packed = pack_structs(ref, "cid", "score_bias", max_rows=5)
    with pytest.raises(Exception) as err:
        attach_packed(_data(spark), packed).collect()
    msg = str(err.value)
    assert "pack_structs" in msg
    assert "window" in msg  # prescribes the fallback form


def test_default_row_cap_covers_every_caller_by_orders_of_magnitude(spark):
    # The engine's widest packed reference sets are centroid tables
    # (k <= 64); the default cap is the 64 MB row budget / ~550 B
    # measured per 64-dim-vector struct.
    from hivetomysql_spark.operators.packed import (
        PACKED_MAX_ROWS,
        PACKED_ROW_BYTE_BUDGET,
    )

    assert PACKED_MAX_ROWS >= 100_000
    assert PACKED_MAX_ROWS * 550 <= PACKED_ROW_BYTE_BUDGET * 1.05
