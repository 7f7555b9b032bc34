"""Checked-in shuffle-count snapshot for the FULL query registry.

``shuffle_budgets.json`` freezes, per registry query, the number of
hash/range shuffle exchanges (``"shuffle"``) AND round-robin /
single-partition exchanges (``"rr"``) in its physical plan at sf0.001
(the pytest fixture scale). The budgets are upper bounds enforced by
``tests/test_plan_budget.py``: plans may improve freely, but any query
whose plan GAINS an exchange — a lost broadcast hint, a spurious
repartition, an un-reused partitioning — fails pytest at plan-build
time, long before it could surface as a bench regression at sf0.1 or
a shuffle blowup at 100 TB. Regenerate with ``tools/freeze_plans.py``
after an intentional plan change and commit the diff with the reason.
"""

from __future__ import annotations

import json
import os

SNAPSHOT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "shuffle_budgets.json"
)


def load_budgets() -> dict[str, dict[str, int]]:
    with open(SNAPSHOT_PATH) as f:
        return json.load(f)
