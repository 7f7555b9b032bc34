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


def pack_structs(df: DataFrame, *cols: str | Column, out: str = "cs") -> DataFrame:
    """ONE row holding the whole (bounded!) frame as array<struct<cols>>.

    The array order is whatever ``collect_list`` saw — reduce over it
    order-insensitively (see module docstring).
    """
    return df.agg(F.collect_list(F.struct(*cols)).alias(out))


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
