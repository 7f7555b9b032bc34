"""Pin the _copurchase_epair basket-size guard (verdict r13 #4).

The helper expands each order's basket into C(n,2) pair structs held
in ONE row until the explode — safe under the TPC-H ≤ 7-lines-per-
order invariant, but a pathological basket would build a multi-MB row
before Spark could distribute anything. The guard must (a) leave
normal baskets' results bit-identical to the reference
distinct + self-join form and (b) fail loudly, naming the order, on a
basket over _EPAIR_BASKET_CAP.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.queries import graph_suite


def _li(spark, rows):
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def _reference_self_join(li):
    """The pre-r13 distinct + o-keyed self-join form of the helper."""
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = op.alias("a"), op.alias("b")
    return (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("nco"))
        .where(F.col("nco") >= 2)
        .select("u", "v")
    )


def test_normal_baskets_match_self_join_form(spark):
    # 3 orders; pair (1,2) co-occurs in orders 10 and 20 (support 2),
    # pair (1,3) only in order 10 (support 1, dropped); duplicates
    # inside an order dedup via collect_set exactly as distinct did.
    rows = [
        (10, 1), (10, 2), (10, 3), (10, 2),
        (20, 1), (20, 2),
        (30, 4), (30, 5),
        (40, 4), (40, 5),
    ]
    li = _li(spark, rows)
    got = sorted(graph_suite._copurchase_epair(li).collect())
    want = sorted(_reference_self_join(li).collect())
    assert got == want
    assert got == [(1, 2), (4, 5)]


def test_basket_at_cap_still_expands(spark):
    n = graph_suite._EPAIR_BASKET_CAP
    rows = [(1, p) for p in range(n)] + [(2, 0), (2, 1)]
    li = _li(spark, rows)
    # support-1 pairs are dropped; only (0,1) appears in both orders
    got = graph_suite._copurchase_epair(li).collect()
    assert [tuple(r) for r in got] == [(0, 1)]


def test_giant_basket_raises_loudly(spark):
    n = graph_suite._EPAIR_BASKET_CAP + 1
    li = _li(spark, [(99, p) for p in range(n)])
    with pytest.raises(Exception) as err:
        graph_suite._copurchase_epair(li).collect()
    msg = str(err.value)
    assert "_copurchase_epair" in msg
    assert "99" in msg  # names the offending order
    assert "self-join" in msg  # points at the fallback form
