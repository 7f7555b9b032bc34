"""Broadcast-growth audit: find explicit ``F.broadcast()`` frames
that grow with data — the forced-broadcast OOM class at 100 TB.

AQE's auto-broadcast adapts at runtime (a too-big build side falls
back to a shuffle join), but an EXPLICIT ``F.broadcast(df)`` is a
promise that ``df`` stays driver/executor-memory-sized at any scale.
The repo makes that promise ~250 times (dimension tables, O(1)
bounds rows, O(buckets) offsets, O(k) centroids/LUTs). This audit
verifies the promise empirically: it monkeypatches
``pyspark.sql.functions.broadcast`` with a recording spy, builds
every registry query's plan at TWO scales, counts each captured
frame at both, and reports the growth ratio across the 10x data
step. A bounded frame shows ~1x; a data-sized frame shows ~10x and
is flagged.

Usage: python tools/broadcast_audit.py [SF_SMALL] [SF_BIG]
           [--threshold R] [--queries a,b,...]
Defaults: /root/testdata/sf0.01 /root/testdata/sf0.1, threshold 3.0
(a catalog-keyed frame may deepen slightly as more of the key domain
is touched; 3x across a 10x step separates that saturation tail from
linear growth).

Output: one line per (query, frame) with rows at both scales and the
ratio; exit 1 if any frame exceeds the threshold AND its big-scale
row count is above 10k (tiny frames can jump ratios on saturation —
e.g. 64-row offsets frames filling in — without being a memory
risk).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as PF  # noqa: E402

from hivetomysql_spark.session import get_spark  # noqa: E402

SMALL_DEFAULT = "/root/testdata/sf0.01"
BIG_DEFAULT = "/root/testdata/sf0.1"
ABS_FLOOR = 10_000  # rows at the big scale below which growth is moot


def capture_counts(
    spark, sf_dir: str, names: list[str], verbose: bool = True
) -> dict:
    """{query: [rows per captured broadcast frame, in call order]}.
    Importable by the pytest gate (tests/test_broadcast_gate.py) so
    tool and test share one capture mechanism."""
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    captured: list = []
    orig = PF.broadcast

    def spy(df):
        captured.append(df)
        return orig(df)

    PF.broadcast = spy
    out: dict[str, list[int]] = {}
    try:
        for name in names:
            captured.clear()
            try:
                qmap[name](spark, sf_dir)  # plan build fires the sites
            except Exception as exc:  # noqa: BLE001
                print(f"build-failed {name}: {exc!r}", flush=True)
                continue
            frames = list(captured)
            counts = []
            for df in frames:
                try:
                    counts.append(df.count())
                except Exception as exc:  # noqa: BLE001
                    print(f"count-failed {name}: {exc!r}", flush=True)
                    counts.append(-1)
            if counts:
                out[name] = counts
            if verbose:
                print(f"scanned {name}: {counts}", flush=True)
    finally:
        PF.broadcast = orig
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
    spark = get_spark(app_name="broadcast_audit")
    a = capture_counts(spark, small, names)
    b = capture_counts(spark, big, names)

    print(f"\n# broadcast growth {small} -> {big} (10x data step)")
    print(f"{'query':<40} {'frame':>5} {'small':>10} {'big':>10} {'ratio':>7}")
    flagged = []
    for name in sorted(set(a) & set(b)):
        ca, cb = a[name], b[name]
        # frame lists can differ in length if a plan branches on data
        # (none known); compare the common prefix and note mismatches
        if len(ca) != len(cb):
            print(f"{name}: frame-count mismatch {len(ca)} vs {len(cb)}")
        for i, (x, y) in enumerate(zip(ca, cb)):
            if x < 0 or y < 0:
                continue
            ratio = (y / x) if x else float(y > 0) * 99.0
            mark = ""
            if ratio > threshold and y > ABS_FLOOR:
                flagged.append((name, i, x, y, ratio))
                mark = "  <-- GROWS WITH DATA (forced broadcast!)"
            print(f"{name:<40} {i:>5} {x:>10} {y:>10} {ratio:>6.2f}x{mark}")
    if flagged:
        print(f"\n{len(flagged)} data-sized broadcast frame(s): {flagged}")
        return 1
    print(
        f"\nall explicit broadcast frames bounded "
        f"(ratio <= {threshold}x or < {ABS_FLOOR} rows at {big})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
