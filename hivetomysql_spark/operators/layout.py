"""Physical-layout operators: Z-order (Morton) clustering keys.

The data-skipping layout technique Delta's OPTIMIZE ZORDER and
Iceberg's sort orders use (public docs/papers): interleave the bits
of several normalized dimensions into one sort key, sort/partition by
it, and min-max file statistics become selective for predicates on
ANY of the dimensions — a single-column sort makes only that column
skippable. All pure integer expressions (shifts/masks), so the key
computation is codegen'd map-side work; the sort itself is the same
range-partitioned exchange any global sort pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16


def normalize_to_bits(col: Column, lo: Column, hi: Column, bits: int = BITS) -> Column:
    """Min-max normalize a numeric column onto [0, 2^bits - 1]."""
    span = F.when(hi != lo, hi - lo).otherwise(F.lit(1))
    # explicit floor: Spark's cast-to-long truncates while DuckDB's
    # rounds — floor() agrees everywhere
    scaled = F.floor((col - lo) / span * ((1 << bits) - 1)).cast("long")
    return F.greatest(F.lit(0), F.least(scaled, F.lit((1 << bits) - 1)))


def interleave_bits(x: Column, y: Column, bits: int = BITS) -> Column:
    """Morton interleave: bit i of x → bit 2i+1, bit i of y → bit 2i."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        out = out + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i)
    return out


def zorder_key(df: DataFrame, col_x: str, col_y: str, bits: int = BITS) -> DataFrame:
    """Attach a 2-D Z-order key column ``__z`` over (col_x, col_y).

    Normalization bounds come from one global min/max aggregate
    (broadcast back — the same stats pass OPTIMIZE runs); the
    interleave itself is map-side integer arithmetic.
    """
    bounds = df.agg(
        F.min(col_x).alias("__xlo"),
        F.max(col_x).alias("__xhi"),
        F.min(col_y).alias("__ylo"),
        F.max(col_y).alias("__yhi"),
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    z = interleave_bits(
        normalize_to_bits(F.col(col_x), F.col("__xlo"), F.col("__xhi"), bits),
        normalize_to_bits(F.col(col_y), F.col("__ylo"), F.col("__yhi"), bits),
        bits,
    )
    return with_bounds.withColumn("__z", z).drop("__xlo", "__xhi", "__ylo", "__yhi")
