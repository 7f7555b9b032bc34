"""Pandas-batch surface audit: measure every batch of rows that
enters a Python worker, at two scales.

The repo's UDF policy (SURVEY §2.2, zero row-at-a-time Python UDFs)
moves Python work onto Arrow batches — but the batch SIZE is what
decides whether the pattern survives 100 TB, and it differs by API:

- ``mapInPandas`` / ``mapInArrow``: batches are sliced by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (10k default) —
  bounded by config, independent of data scale (bytes can still grow
  with blob width; measured here too).
- grouped-map ``applyInPandas`` and cogrouped ``applyInPandas``: ONE
  pandas frame per group, whatever the group size. A low-cardinality
  grouping key makes the batch O(data/k) — one Python worker must
  hold it in memory, the OOM-at-scale shape that windows and
  aggregates never have.
- grouped-agg ``pandas_udf`` (custom UDAF): the whole group's column
  arrives as ONE pandas Series — same O(data/k) hazard, and unlike
  built-in aggregates it gets NO partial (map-side) aggregation.

The r10 broadcast audit / r11 checkpoint+explode audits measured the
other asserted-bounded classes; this tool closes the pandas-batch
class. It spies on the four concrete entry points (Spark 4
dispatches ``mapInPandas`` through the classic DataFrame subclass —
the collect-audit lesson; ``GroupedData``/``PandasCogroupedOps`` are
single concrete classes here), wraps each user function so every
invocation reports ``(rows, bytes)`` of its input batch through a
Spark accumulator, and compares per-site maxima across a 10x data
step.

Out of scope: ``applyInPandasWithState`` / ``transformWithState``
(streaming) — their batch is bounded by the micro-batch, not the
table; and ``F.udf(useArrow=True)`` scalar UDFs — per-batch bounded
by maxRecordsPerBatch like mapInPandas.

Usage: python tools/pandas_batch_audit.py [SF_SMALL] [SF_BIG]
           [--threshold R] [--queries a,b,...] [--detect-only]
Defaults: /root/testdata/sf0.01 /root/testdata/sf0.1, threshold 3.0,
absolute floor 20k rows at the big scale. NOTE the doc-tier fixture
floor: documents/embeddings carry the same 500 docs at sf0.001 and
sf0.01, so doc-tier growth is only visible on the sf0.01 -> sf0.1
step — which is why those are the defaults.

Output: a detection list (which registry queries reach a pandas
batch API at plan-build time — full-registry, cheap), then per
(query, site): invocation count, max batch rows and bytes at both
scales, growth ratio, and the two classes: bounded (frozen by
``tests/test_pandas_batch_gate.py``) vs data-sized (must be
registered there with a rationale, or fixed).
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as SF  # noqa: E402
from pyspark.accumulators import AccumulatorParam  # noqa: E402

# Spark 4 routes mapInPandas through the CONCRETE classic DataFrame;
# GroupedData and PandasCogroupedOps are already the concrete classes
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from pyspark.sql.group import GroupedData  # noqa: E402
from pyspark.sql.pandas.group_ops import PandasCogroupedOps  # noqa: E402

from hivetomysql_spark.session import get_spark  # noqa: E402

SMALL_DEFAULT = "/root/testdata/sf0.01"
BIG_DEFAULT = "/root/testdata/sf0.1"
ABS_FLOOR = 20_000  # max batch rows at the big scale below which growth is moot

# The instrumented wrappers close over functions DEFINED HERE. Run as
# a script that is fine (__main__ pickles by value), but imported as a
# module (the pytest gate) cloudpickle serializes them by REFERENCE
# and the executor's Python worker cannot import tools/ — so force
# by-value pickling for this module.
try:
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # noqa: BLE001 — older layouts; script mode still works
    pass

_REAL = {
    "grouped_map": GroupedData.applyInPandas,
    "cogrouped_map": PandasCogroupedOps.applyInPandas,
    "map_in_pandas": DataFrame.mapInPandas,
    "map_in_arrow": DataFrame.mapInArrow,
    "pandas_udf": SF.pandas_udf,
}


class _ListParam(AccumulatorParam):
    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


def _measure(obj) -> tuple[int, int]:
    """(rows, bytes) of one pandas Series/DataFrame or arrow batch."""
    try:
        if hasattr(obj, "num_rows"):  # pyarrow RecordBatch
            return int(obj.num_rows), int(obj.nbytes)
        mu = obj.memory_usage(deep=True)
        nbytes = int(mu.sum()) if hasattr(mu, "sum") else int(mu)
        return len(obj), nbytes
    except Exception:  # noqa: BLE001
        return -1, -1


def _batch_reporter(acc, api: str, site: int):
    """Wrap-point shared by all four APIs: report the pandas/arrow
    args of one user-function invocation as one accumulator record
    (rows = max over args, bytes = sum over args — a cogroup holds
    BOTH sides at once, so the sum is what the worker holds)."""

    def report(args) -> None:
        rows, nbytes = 0, 0
        seen = False
        for a in args:
            if hasattr(a, "memory_usage") or hasattr(a, "num_rows"):
                r, b = _measure(a)
                seen = True
                rows = max(rows, r)
                nbytes += max(b, 0)
        if seen:
            acc.add([(api, site, rows, nbytes)])

    return report


def _install(acc, sites: list[str], record_only: bool = False):
    """Patch the four entry points. ``sites`` collects one label per
    *call site* in build order (the driver-side detection record);
    with ``record_only`` the user function is not wrapped (cheap
    plan-build detection pass).

    Two traps this handles: PySpark *inspects* the user function —
    ``getfullargspec`` arity checks for grouped/cogrouped map (which
    do NOT follow ``__wrapped__``, so a ``*args`` wrapper fails
    validation: the wrappers here are arity-exact), and type-hint
    eval-type inference for pandas_udf (``functools.wraps``
    propagates ``__annotations__``/``__wrapped__``, which that path
    follows). And ``applyInPandas`` internally calls
    ``pyspark.sql.functions.pandas_udf`` (the patched symbol), so the
    pandas_udf spy must pass straight through while another spy is on
    the stack or every grouped-map would double-instrument."""
    import inspect

    depth = [0]

    def _arity_exact(func, report):
        try:
            n = len(inspect.getfullargspec(func).args)
        except TypeError:
            n = 1
        if n == 2:

            def wrapped(a, b):
                report((a, b))
                return func(a, b)

        elif n == 3:

            def wrapped(a, b, c):
                report((a, b, c))
                return func(a, b, c)

        else:

            def wrapped(a):
                report((a,))
                return func(a)

        return wrapped

    def _group_like(api):
        def patched(self, func, schema):
            site = len(sites)
            sites.append(api)
            if record_only:
                wrapped = func
            else:
                wrapped = _arity_exact(func, _batch_reporter(acc, api, site))
            depth[0] += 1
            try:
                return _REAL[api](self, wrapped, schema)
            finally:
                depth[0] -= 1

        return patched

    grouped_map = _group_like("grouped_map")
    cogrouped_map = _group_like("cogrouped_map")

    def _map_like(api):
        def patched(self, func, schema, *a, **kw):
            site = len(sites)
            sites.append(api)
            if record_only:
                wrapped = func
            else:
                report = _batch_reporter(acc, api, site)

                @functools.wraps(func)
                def wrapped(it):
                    def gen():
                        for batch in it:
                            report((batch,))
                            yield batch

                    return func(gen())

            depth[0] += 1
            try:
                return _REAL[api](self, wrapped, schema, *a, **kw)
            finally:
                depth[0] -= 1

        return patched

    def pandas_udf(f=None, returnType=None, functionType=None):
        if depth[0]:  # internal call from a grouped/cogrouped spy
            return _REAL["pandas_udf"](f, returnType, functionType)
        site = len(sites)
        sites.append("pandas_udf")
        if record_only:
            return _REAL["pandas_udf"](f, returnType, functionType)
        report = _batch_reporter(acc, "pandas_udf", site)

        def wrap(fn):
            @functools.wraps(fn)
            def wrapped(*args):
                report(args)
                return fn(*args)

            return wrapped

        if callable(f):
            return _REAL["pandas_udf"](wrap(f), returnType, functionType)
        dec = _REAL["pandas_udf"](f, returnType, functionType)
        return lambda fn: dec(wrap(fn))

    GroupedData.applyInPandas = grouped_map
    PandasCogroupedOps.applyInPandas = cogrouped_map
    DataFrame.mapInPandas = _map_like("map_in_pandas")
    DataFrame.mapInArrow = _map_like("map_in_arrow")
    SF.pandas_udf = pandas_udf


def _uninstall() -> None:
    GroupedData.applyInPandas = _REAL["grouped_map"]
    PandasCogroupedOps.applyInPandas = _REAL["cogrouped_map"]
    DataFrame.mapInPandas = _REAL["map_in_pandas"]
    DataFrame.mapInArrow = _REAL["map_in_arrow"]
    SF.pandas_udf = _REAL["pandas_udf"]


def detect(spark, sf_dir: str, names: list[str]) -> dict[str, list[str]]:
    """{query: [api per call site, in build order]} — plan build only
    (no execution), so this sweeps the full registry cheaply."""
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    out: dict[str, list[str]] = {}
    for name in names:
        sites: list[str] = []
        _install(None, sites, record_only=True)
        try:
            qmap[name](spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"build-failed {name}: {exc!r}", flush=True)
            continue
        finally:
            _uninstall()
        if sites:
            out[name] = sites
    return out


def capture(
    spark, sf_dir: str, names: list[str], verbose: bool = True
) -> dict[str, dict[tuple[str, int], tuple[int, int, int]]]:
    """Execute each query with instrumented user functions.
    {query: {(api, site): (invocations, max_rows, max_bytes)}}.
    Importable by the pytest gate (shared capture mechanism)."""
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    out: dict[str, dict[tuple[str, int], tuple[int, int, int]]] = {}
    for name in names:
        acc = spark.sparkContext.accumulator([], _ListParam())
        sites: list[str] = []
        _install(acc, sites)
        try:
            # noop sink: full-column evaluation without a driver
            # transfer — .count() would let Catalyst PRUNE the UDF
            # columns right out of the plan (observed: a grouped-agg
            # pandas_udf never ran under count())
            qmap[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001
            print(f"run-failed {name}: {exc!r}", flush=True)
            continue
        finally:
            _uninstall()
        per: dict[tuple[str, int], tuple[int, int, int]] = {}
        for api, site, rows, nbytes in acc.value:
            n, mr, mb = per.get((api, site), (0, 0, 0))
            per[(api, site)] = (n + 1, max(mr, rows), max(mb, nbytes))
        if per:
            out[name] = per
            if verbose:
                print(f"ran {name}: {per}", flush=True)
    return out


def _fmt_bytes(n: int) -> str:
    if n < 0:
        return "?"
    x = float(n)
    for unit in ("B", "KB", "MB", "GB"):
        if x < 1024:
            return f"{x:.0f}{unit}"
        x /= 1024.0
    return f"{x:.1f}TB"


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
    detect_only = "--detect-only" in args
    if detect_only:
        args.remove("--detect-only")
    small = args[0] if args else SMALL_DEFAULT
    big = args[1] if len(args) > 1 else BIG_DEFAULT

    import __spark_entry__ as entrymod

    names = only or sorted(entrymod.queries())
    spark = get_spark(app_name="pandas_batch_audit")
    spark.sparkContext.setLogLevel("ERROR")

    hits = detect(spark, small, names)
    print(f"\n# detection: {len(hits)} of {len(names)} queries reach a pandas batch API")
    for name in sorted(hits):
        print(f"  {name}: {hits[name]}")
    if detect_only:
        return 0

    targets = sorted(hits)
    a = capture(spark, small, targets)
    b = capture(spark, big, targets)

    print(f"\n# pandas batch growth {small} -> {big} (10x data step)")
    print(
        f"{'query':<36} {'api':<14} {'site':>4} {'inv_b':>6} "
        f"{'rows_s':>9} {'rows_b':>9} {'ratio':>7} {'bytes_b':>9}"
    )
    bounded, sized = [], []
    for name in sorted(set(a) & set(b)):
        keys = sorted(set(a[name]) | set(b[name]))
        for key in keys:
            if key not in a[name] or key not in b[name]:
                print(
                    f"{name} {key}: fired at only one scale "
                    "(conditional site) — classify by the big scale"
                )
            na, xr, _xb = a[name].get(key, (0, 0, 0))
            nb, yr, yb = b[name].get(key, (0, 0, 0))
            ratio = (yr / xr) if xr else float(yr > 0) * 99.0
            mark = ""
            if ratio > threshold and yr > ABS_FLOOR:
                sized.append((name, key, xr, yr, ratio, yb))
                mark = "  <-- batch scales with data"
            else:
                bounded.append((name, key, xr, yr))
            api, site = key
            print(
                f"{name:<36} {api:<14} {site:>4} {nb:>6} {xr:>9} "
                f"{yr:>9} {ratio:>6.2f}x {_fmt_bytes(yb):>9}{mark}"
            )
    print(
        f"\n{len(bounded)} bounded batch site(s); {len(sized)} "
        "data-sized batch site(s)"
    )
    if sized:
        print(
            "every data-sized site must be registered in "
            "tests/test_pandas_batch_gate.py DATA_SIZED_BY_DESIGN "
            "with its rationale, or fixed:"
        )
        for name, key, xr, yr, ratio, yb in sized:
            print(
                f"  {name} {key}: {xr} -> {yr} rows "
                f"({ratio:.1f}x), {_fmt_bytes(yb)}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
