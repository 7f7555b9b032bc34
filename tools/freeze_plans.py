"""Regenerate the full-registry shuffle-budget snapshot.

Usage: python tools/freeze_plans.py [sf_dir]

Derives every registry query's physical-plan shuffle count at sf0.001
(the pytest fixture scale) and rewrites
``hivetomysql_spark/plans/shuffle_budgets.json``, the snapshot that
``tests/test_plan_budget.py::test_full_registry_shuffle_budget``
enforces. Run after an INTENTIONAL plan change (new stage, added
verification twin) and commit the diff with the reason; the test
failing without a snapshot diff means a broadcast was lost or an
exchange crept in.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from hivetomysql_spark.plans import introspect as I  # noqa: E402
from hivetomysql_spark.plans.budgets import SNAPSHOT_PATH  # noqa: E402
from hivetomysql_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="freeze_plans", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name, fn in sorted(entrymod.queries().items()):
        df = fn(spark, sf_dir)
        out[name] = {
            "shuffle": I.count_shuffles(df),
            "rr": I.count_roundrobin(df),
        }
    with open(SNAPSHOT_PATH, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"froze {len(out)} budgets -> {SNAPSHOT_PATH}")


if __name__ == "__main__":
    main()
