"""collect_list/collect_set aggregate-buffer audit: measure the max
group size feeding every array-building aggregate, at two scales.

``collect_list``/``collect_set`` build the whole group's values into
ONE aggregation buffer row — the JVM cousin of the grouped-map pandas
batch the r11 pandas audit bounded: keyed by a low-cardinality
column over data-sized elements it is an O(data/k) array in a single
buffer (and in a single task's memory during final aggregation).
The anti-pattern sweeps read these sites by hand; this measures
them: the number of input rows in the largest group is an upper
bound on the array length (exact for collect_list; collect_set can
only be smaller).

Mechanism: patch the concrete classic ``DataFrame.groupBy`` to tag
the returned GroupedData with its source frame and keys, and
``GroupedData.agg`` to detect collect_ aggregates in its expression
strings; for each detected site, compute
``max(count) over groupBy(keys)`` on the tagged source at build time
and record it. Window-based collects (over a moving frame) are out
of scope here — their frame, not the group, bounds the buffer; the
global-window gate covers unpartitioned windows separately.

Usage: python tools/collect_agg_audit.py [SF_SMALL] [SF_BIG]
           [--threshold R] [--queries a,b,...]
Defaults: /root/testdata/sf0.01 /root/testdata/sf0.1 (doc-tier
fixtures are floored below sf0.01), threshold 3.0, absolute floor
2,000 rows at the big scale.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from pyspark.sql.group import GroupedData  # noqa: E402

from hivetomysql_spark.session import get_spark  # noqa: E402

SMALL_DEFAULT = "/root/testdata/sf0.01"
BIG_DEFAULT = "/root/testdata/sf0.1"
ABS_FLOOR = 2_000

_REAL_GROUPBY = DataFrame.groupBy
_REAL_AGG = GroupedData.agg


def capture(
    spark, sf_dir: str, names: list[str], verbose: bool = True
) -> dict[str, list[tuple[str, int]]]:
    """{query: [(keys, max_group_rows) per collect-agg call, in build
    order]}. Importable by a pytest gate."""
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    captured: list[tuple[str, int]] = []
    depth = [0]

    def groupby(self, *cols, **kw):
        gd = _REAL_GROUPBY(self, *cols, **kw)
        gd._audit_src = self
        gd._audit_cols = cols
        return gd

    def agg(self, *exprs, **kw):
        has_collect = any(
            "collect_list(" in str(e) or "collect_set(" in str(e)
            for e in exprs
        )
        if has_collect and not depth[0] and hasattr(self, "_audit_src"):
            depth[0] += 1
            try:
                src, cols = self._audit_src, self._audit_cols
                try:
                    row = (
                        _REAL_AGG(
                            _REAL_GROUPBY(src, *cols),
                            F.count(F.lit(1)).alias("__c"),
                        )
                        .agg(F.max("__c").alias("__m"))
                        .collect()[0]
                    )
                    mx = int(row["__m"]) if row["__m"] is not None else 0
                except Exception:  # noqa: BLE001
                    mx = -1
                keys = ",".join(str(c) for c in cols)
                captured.append((keys, mx))
            finally:
                depth[0] -= 1
        return _REAL_AGG(self, *exprs, **kw)

    DataFrame.groupBy = groupby
    GroupedData.agg = agg
    out: dict[str, list[tuple[str, int]]] = {}
    try:
        for name in names:
            captured.clear()
            try:
                qmap[name](spark, sf_dir)  # plan build fires the sites
            except Exception as exc:  # noqa: BLE001
                print(f"build-failed {name}: {exc!r}", flush=True)
                continue
            if captured:
                out[name] = list(captured)
                if verbose:
                    print(f"scanned {name}: {out[name]}", flush=True)
    finally:
        DataFrame.groupBy = _REAL_GROUPBY
        GroupedData.agg = _REAL_AGG
    return out


def main() -> int:
    args = list(sys.argv[1:])
    threshold = 3.0
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = float(args[i + 1])
        del args[i : i + 2]
    only = None
    if "--queries" in args:
        i = args.index("--queries")
        only = [n for n in args[i + 1].split(",") if n]
        del args[i : i + 2]
    small = args[0] if args else SMALL_DEFAULT
    big = args[1] if len(args) > 1 else BIG_DEFAULT

    import __spark_entry__ as entrymod

    names = only or sorted(entrymod.queries())
    spark = get_spark(app_name="collect_agg_audit")
    spark.sparkContext.setLogLevel("ERROR")
    a = capture(spark, small, names)
    b = capture(spark, big, names)

    print(f"\n# collect_list/set max group size {small} -> {big} (10x step)")
    print(f"{'query':<40} {'call':>4} {'max_s':>9} {'max_b':>9} {'ratio':>7}  keys")
    bounded, sized = [], []
    for name in sorted(set(a) & set(b)):
        ca, cb = a[name], b[name]
        if len(ca) != len(cb):
            print(f"{name}: call-count mismatch {len(ca)} vs {len(cb)}")
        for i, ((keys, xm), (_k2, ym)) in enumerate(zip(ca, cb)):
            if xm < 0 or ym < 0:
                continue
            ratio = (ym / xm) if xm else float(ym > 0) * 99.0
            mark = ""
            if ratio > threshold and ym > ABS_FLOOR:
                sized.append((name, i, keys, xm, ym, ratio))
                mark = "  <-- group scales with data"
            else:
                bounded.append((name, i, xm, ym))
            print(
                f"{name:<40} {i:>4} {xm:>9} {ym:>9} {ratio:>6.2f}x  {keys[:60]}{mark}"
            )
    print(
        f"\n{len(bounded)} bounded collect-agg call(s); {len(sized)} "
        "with data-sized groups"
    )
    for name, i, keys, xm, ym, ratio in sized:
        print(f"  {name} call {i} keys=({keys}): {xm} -> {ym} ({ratio:.1f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
