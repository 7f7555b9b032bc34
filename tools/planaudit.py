"""Plan audit: dump plan-shape metrics for every registry query.

Usage: python tools/planaudit.py [sf_dir]

For each query: shuffle count, broadcast/SMJ presence, whole-stage
codegen spans, pushed filters and scan columns per parquet scan.
The `.explain("formatted")` feedback loop, automated — run after
adding or changing operators and eyeball anything that moved.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from hivetomysql_spark.plans import introspect as I  # noqa: E402
from hivetomysql_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(entrymod.queries())
    spark = get_spark(app_name="planaudit")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entrymod.queries()
    print(f"{'query':34s} {'shuf':>4s} {'wscg':>4s} {'bhj':>3s} {'smj':>3s}  scans(cols) / pushed")
    for name in names:
        try:
            df = qmap[name](spark, sf_dir)
            scans = I.scan_columns(df)
            pushed = I.pushed_filters(df)
            flags = (
                "y" if I.has_broadcast_join(df) else "-",
                "y" if I.has_sort_merge_join(df) else "-",
            )
            scan_desc = ",".join(str(len(s)) for s in scans) or "-"
            print(
                f"{name:34s} {I.count_shuffles(df):4d} "
                f"{I.whole_stage_codegen_spans(df):4d} "
                f"{flags[0]:>3s} {flags[1]:>3s}  "
                f"scans[{scan_desc}] pushed={len(pushed)}"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name:34s} ERROR {type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
