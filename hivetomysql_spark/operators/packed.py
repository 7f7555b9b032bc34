"""Pack a BOUNDED reference frame into one array row for per-row argmin.

The recurring shape this serves: "score every data row against a small
reference set (centroids, seeds, candidate thresholds) and keep the
best reference per data row". The textbook form — ``crossJoin`` the
broadcast reference set, then ``row_number()`` over a window
partitioned by the data row id, then ``rn = 1`` — multiplies the fact
table by the reference count and pushes the product through a hash
exchange keyed on the row id, a DATA-SIZED shuffle (N x k rows) whose
only purpose is to bring each row's k scored copies back together.

Packing the reference side into ONE row holding ``array<struct<...>>``
turns the attach into a 1-row broadcast nested-loop join and the
argmin into an in-row ``array_min``/``array_max`` over struct
lexicographic order: the scan stays narrow, whole-stage codegen fuses
the scoring, and the only shuffle left in such a query is whatever
aggregate CONSUMES the winners (usually O(k) partial rows after
map-side combine). At 100 TB this removes a shuffle of N x k rows per
assignment pass; ``ivf_assign`` (operators/similarity.py) is the same
layout with driver-side literal centroids — this module is its lazy,
in-plan twin for reference sets that come from the DATA.

Correctness notes callers rely on:

* ``collect_list`` order is nondeterministic — consumers MUST reduce
  order-insensitively (``array_min``/``array_max`` over the packed
  array). Struct comparison is field-by-field lexicographic, so a
  ``struct(score, tiebreak)`` argmin reproduces exactly the winner a
  ``row_number() OVER (ORDER BY score, tiebreak) = 1`` filter picks
  (for DESC order, negate the field or use ``array_max``): Spark
  orders NaN greater than any double in BOTH struct comparison and
  window ORDER BY, so even NaN scores agree.
* :func:`attach_packed` drops all data rows when the packed array is
  EMPTY — exactly what a crossJoin against the empty unpacked frame
  produces, so empty-reference semantics are unchanged.
* The pack is an O(k) ``collect_list`` aggregate: callers must only
  pack frames whose row count is bounded by construction (seeded
  centroid sets, decile tables). The collect-aggregate audit
  (tools/collect_agg_audit.py) measures every collect_list site,
  these included.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Row-width budget for the packed row (verdict r13 #7). The packed
# array travels as ONE row: it is built on one executor, collected to
# the driver for the broadcast, and then held by EVERY task of the
# probe stage, so its bytes are a per-task memory tax and are subject
# to the 2 GiB single-row / single-array hard limits long before the
# 8 GB broadcast-relation cap. Budget: 64 MB for the row (the same
# bound powerpca.DRIVER_MATRIX_BOUND uses for driver pulls — measured
# safe on an 8 GB driver, invisible next to executor task memory).
# The widest caller packs struct<cid:bigint, vec:array<double x 64>>
# ≈ 550 B serialized per entry (measured: a 1,000-entry packed row of
# that shape collects as ~0.55 MB through Arrow), so the budget caps
# k at 64 MB / 550 B ≈ 122k references — two orders of magnitude
# above any reference set this engine packs (centroid sets are ≤ 64).
# Past the cap the N x k window form must return: at that k the
# per-row scoring loop dominates anyway and the exchange is no longer
# the bottleneck. Enforced in-row (one when() on the 1-row frame —
# no action, no shuffle): a too-wide pack raises with the count
# instead of OOMing the broadcast build.
PACKED_ROW_BYTE_BUDGET = 64 * 1024 * 1024
PACKED_MAX_ROWS = 122_880  # byte budget / ~550 B widest caller struct


def pack_structs(
    df: DataFrame,
    *cols: str | Column,
    out: str = "cs",
    max_rows: int = PACKED_MAX_ROWS,
) -> DataFrame:
    """ONE row holding the whole (bounded!) frame as array<struct<cols>>.

    The array order is whatever ``collect_list`` saw — reduce over it
    order-insensitively (see module docstring). A frame wider than
    ``max_rows`` (default: the PACKED_ROW_BYTE_BUDGET row-width
    budget) raises in-row instead of building a broadcast row that
    every probe task must hold — callers with reference sets that
    big must use the window/argmin form the module docstring
    describes.
    """
    packed = df.agg(F.collect_list(F.struct(*cols)).alias(out))
    return packed.select(
        F.when(F.size(F.col(out)) <= max_rows, F.col(out))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("pack_structs: reference frame has "),
                    F.size(F.col(out)).cast("string"),
                    F.lit(
                        f" rows (> {max_rows}); the packed row would "
                        "exceed the broadcast row-width budget "
                        f"({PACKED_ROW_BYTE_BUDGET >> 20} MB) — use the "
                        "window-ranked argmin form for reference sets "
                        "this large"
                    ),
                )
            )
        )
        .alias(out)
    )


def attach_packed(
    data: DataFrame, packed: DataFrame, out: str = "cs"
) -> DataFrame:
    """Attach a :func:`pack_structs` row to every data row via a 1-row
    broadcast nested-loop join.

    An EMPTY packed array drops every data row, matching the crossJoin
    semantics of the unpacked empty frame (``agg`` always emits one
    row, so without the guard an empty reference set would instead
    keep all rows with NULL winners).
    """
    return data.crossJoin(F.broadcast(packed)).where(F.size(F.col(out)) > 0)
