"""Pin every python oracle bit-identical to its SQL twin at sf0.01.

At derived (directory-shaped) fixtures, diffcheck substitutes a
registered python oracle UNCONDITIONALLY — the SQL twin never runs
there. So sf1 "certification" of a substituted query is only as good
as the py oracle's agreement with the SQL twin; if the two silently
drift, the sf1 gate is comparing Spark against the wrong answer.
This test computes BOTH oracles on the driver's sf0.01 fixture for
every ``PY_ORACLES`` entry and asserts identical sorted rows after
the same cell canon diffcheck uses (r8 advice #3).

No Spark involved — DuckDB + NumPy only, a few seconds.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))
sys.path.insert(0, ROOT)

SF_DIR = "/root/testdata/sf0.01"


def _canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _table(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon(r[i]) for i in idx) for r in rows
    )


@pytest.fixture(scope="module")
def con():
    from hivetomysql_spark.tables import TABLE_NAMES

    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_py_oracle_matches_its_sql_twin(con):
    from py_oracles import PY_ORACLES
    import __spark_entry__ as m

    omap = m.oracle_sql()
    assert PY_ORACLES, "PY_ORACLES unexpectedly empty"
    for name, py_fn in sorted(PY_ORACLES.items()):
        assert name in omap, (
            f"{name} has a py oracle but no SQL twin — the sf0.01 "
            "driver gate would never exercise the SQL path"
        )
        rel = con.sql(omap[name])
        sql_rows, sql_cols = rel.fetchall(), list(rel.columns)
        py_rows, py_cols = py_fn(con)
        assert sorted(sql_cols) == sorted(py_cols), (
            f"{name}: column drift sql={sorted(sql_cols)} "
            f"py={sorted(py_cols)}"
        )
        assert _table(sql_rows, sql_cols) == _table(py_rows, py_cols), (
            f"{name}: py oracle diverged from SQL twin at sf0.01 — "
            "sf1 certification for this query is vacuous until they "
            "re-agree (tools/py_oracles.py)"
        )
