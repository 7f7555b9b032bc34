"""Every registry query must execute end-to-end at sf0.001.

The r03 bench crash (unix_micros on TIMESTAMP_NTZ after the driver
regenerated testdata with new parquet physical types) happened in a
query no unit test executed at bench settings — this smoke closes
that class: each queries() entry is collect()ed, so any
analysis/codegen/runtime error in any registered plan fails here
first, not in a round-ending bench or driver run.

Also enforces the decimal-output ban repo-wide: DECIMAL columns in
query output can never hash-match the driver's pandas comparator
(DuckDB DECIMAL renders as float64, Spark DECIMAL as object-Decimal
— the agg_decimal_money r02-r04 red row), so they are rejected at
test time, not discovered at the gate.
"""

from __future__ import annotations

from hivetomysql_spark.queries import queries


def test_every_registry_query_runs_and_is_decimal_free(spark, sf_dir):
    failures = []
    for name, fn in queries().items():
        try:
            df = fn(spark, sf_dir)
            dec = [c for c, t in df.dtypes if t.startswith("decimal")]
            if dec:
                failures.append(f"{name}: decimal output columns {dec}")
                continue
            df.collect()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)
