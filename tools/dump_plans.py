"""Dump .explain("formatted") for headline (or named) queries.

Usage: python tools/dump_plans.py <outdir> [suffix] [query ...]

Writes ``<outdir>/<query>_<suffix>.txt`` for each query (default
suffix "before"; default query set = bench.py's HEADLINE list). The
optimization-round judge checks plan claims against these files, so
they are captured from the same entry points the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from hivetomysql_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    qmap = entrymod.queries()
    if len(sys.argv) > 3:
        names = sys.argv[3:]
    else:
        import bench  # noqa: PLC0415

        names = bench.HEADLINE
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = qmap[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
