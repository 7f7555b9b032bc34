"""operators/ranks.py grouped two-level primitives — must be
bit-equal to their Window.partitionBy(group).orderBy(key)
counterparts (the form they exist to replace: a bounded group key
puts O(data/k) rows into ONE sort task per group — the r11 window
audit's hazard signature), including NULL keys and tie groups that
straddle would-be bucket boundaries."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hivetomysql_spark.operators import ranks as R


def _frame(spark, n=10007):
    # 7 groups (a bounded key), a heavily-tied value key (97 distinct
    # values per ~1430-row group, so tie groups are large), and a
    # unique tie-break.
    return spark.range(n).select(
        (F.col("id") % 7).alias("g"),
        (F.xxhash64("id") % 97).cast("double").alias("k"),
        F.col("id").alias("tb"),
        (F.col("id") % 5).cast("double").alias("v"),
    )


def _with_nulls(spark):
    base = _frame(spark, 2003)
    return base.select(
        "g",
        F.when(F.col("tb") % 11 == 0, F.lit(None)).otherwise(F.col("k")).alias("k"),
        "tb",
        "v",
    )


def test_grouped_row_number_matches_window(spark):
    df = _frame(spark)
    got = R.grouped_row_number(df, ["g"], "k", ["tb"], out="r")
    exp = df.withColumn(
        "r2", F.row_number().over(W.partitionBy("g").orderBy("k", "tb"))
    )
    assert got.join(exp, ["g", "k", "tb"]).where("r != r2").count() == 0


def test_grouped_row_number_null_keys_match_window(spark):
    df = _with_nulls(spark)
    got = R.grouped_row_number(df, ["g"], "k", ["tb"], out="r")
    exp = df.withColumn(
        "r2", F.row_number().over(W.partitionBy("g").orderBy("k", "tb"))
    )
    assert (
        got.join(exp, ["g", "tb"]).where("r != r2").count() == 0
    )


def test_grouped_dense_rank_matches_window(spark):
    df = _frame(spark)
    got = R.grouped_dense_rank(df, ["g"], "k", out="d")
    exp = df.withColumn(
        "d2", F.dense_rank().over(W.partitionBy("g").orderBy("k"))
    )
    assert got.join(exp, ["g", "k", "tb"]).where("d != d2").count() == 0


def test_grouped_dense_rank_null_keys_consume_one_rank(spark):
    df = _with_nulls(spark)
    got = R.grouped_dense_rank(df, ["g"], "k", out="d")
    exp = df.withColumn(
        "d2", F.dense_rank().over(W.partitionBy("g").orderBy("k"))
    )
    assert got.join(exp, ["g", "tb"]).where("d != d2").count() == 0


def test_grouped_ntile_matches_window(spark):
    df = _frame(spark)
    got = R.grouped_ntile(df, ["g"], 4, "k", ["tb"], out="t")
    exp = df.withColumn(
        "t2", F.ntile(4).over(W.partitionBy("g").orderBy("k", "tb"))
    )
    assert got.join(exp, ["g", "k", "tb"]).where("t != t2").count() == 0


def test_grouped_ntile_fewer_rows_than_tiles(spark):
    df = spark.range(3).select(
        F.lit(0).alias("g"), F.col("id").cast("double").alias("k"),
        F.col("id").alias("tb"),
    )
    got = R.grouped_ntile(df, ["g"], 7, "k", ["tb"], out="t")
    exp = df.withColumn(
        "t2", F.ntile(7).over(W.partitionBy("g").orderBy("k", "tb"))
    )
    assert got.join(exp, ["g", "tb"]).where("t != t2").count() == 0


def test_grouped_running_max_exclusive_matches_window(spark):
    df = _frame(spark)
    got = R.grouped_running_max_exclusive(
        df, ["g"], "k", ["tb"], value="v", out="m"
    )
    exp = df.withColumn(
        "m2",
        F.max("v").over(
            W.partitionBy("g")
            .orderBy("k", "tb")
            .rowsBetween(W.unboundedPreceding, -1)
        ),
    )
    # first row per group: both NULL
    assert (
        got.join(exp, ["g", "k", "tb"])
        .where("coalesce(m, -1e18) != coalesce(m2, -1e18)")
        .count()
        == 0
    )


def test_grouped_running_max_exclusive_null_keys(spark):
    df = _with_nulls(spark)
    got = R.grouped_running_max_exclusive(
        df, ["g"], "k", ["tb"], value="v", out="m"
    )
    exp = df.withColumn(
        "m2",
        F.max("v").over(
            W.partitionBy("g")
            .orderBy("k", "tb")
            .rowsBetween(W.unboundedPreceding, -1)
        ),
    )
    assert (
        got.join(exp, ["g", "tb"])
        .where("coalesce(m, -1e18) != coalesce(m2, -1e18)")
        .count()
        == 0
    )


def test_grouped_primitives_quantile_mode(spark):
    df = _frame(spark)
    got = R.grouped_row_number(
        df, ["g"], "k", ["tb"], out="r", bucket_mode="quantile"
    )
    exp = df.withColumn(
        "r2", F.row_number().over(W.partitionBy("g").orderBy("k", "tb"))
    )
    assert got.join(exp, ["g", "k", "tb"]).where("r != r2").count() == 0
