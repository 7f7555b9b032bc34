"""Pre-snapshot consistency gate (verdict r9 #7).

The r9 snapshot commit edited `operators/dedup.py` AFTER the round's
certification runs, shipping a stale sf1 ledger entry as the round's
last (least-verified) commit. This gate makes that impossible to do
silently: run it as the final act before any end-of-round snapshot
(or any commit touching `hivetomysql_spark/operators/` or
`hivetomysql_spark/queries/`). It is pure source inspection — no
Spark, milliseconds — and fails loudly with the exact repair command.

Checks:
1. every sf1-certified query's content hash (fn source + oracle SQL +
   py-oracle source + used operator-module sources,
   `certify.query_hash`) matches the ledger — i.e. nothing committed
   in the working tree invalidates a recorded certification;
2. every certified query still exists in the registry;
3. the working tree is clean OR --allow-dirty was passed (a snapshot
   should gate the tree that will actually be committed).

Exit 0 = safe to snapshot. Exit 1 = stale ledger (run
`python tools/sf1_rotation.py --recheck --tag rN` first).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def main() -> int:
    sys.path.insert(0, ROOT)
    import glob

    from hivetomysql_spark.certify import registry_hashes

    current = registry_hashes()
    stale, ghosts = [], []
    n_certified = 0
    # every scale-point ledger present gates the snapshot (r12:
    # SF1_CERTIFIED.json + SF10_CERTIFIED.json)
    for path in sorted(glob.glob(os.path.join(ROOT, "SF*_CERTIFIED.json"))):
        state = json.load(open(path))
        hashes = state.get("hashes", {})
        tag = os.path.basename(path)
        n_certified += len(state["certified"])
        stale += sorted(
            f"{n} [{tag}]"
            for n in state["certified"]
            if n in current and hashes.get(n) != current[n]
        )
        ghosts += sorted(
            f"{n} [{tag}]"
            for n in set(state["certified"]) - set(current)
        )
    if "--allow-dirty" not in sys.argv:
        dirty = subprocess.run(
            ["git", "status", "--porcelain"],
            capture_output=True,
            text=True,
            cwd=ROOT,
        ).stdout.strip()
        if dirty:
            print(
                "NOTE: working tree is dirty — gating the tree as it "
                "stands (pass --allow-dirty to silence):\n" + dirty
            )
    if ghosts:
        print(f"FAIL: {len(ghosts)} certified queries not in registry: {ghosts}")
        return 1
    if stale:
        print(
            f"FAIL: {len(stale)} certifications are STALE for this "
            f"tree — the snapshot would ship unverified claims.\n"
            f"Repair: python tools/sf1_rotation.py --recheck --tag rN "
            f"(add --point sf10 for the sf10 ledger)\n"
            f"Stale: {stale}"
        )
        return 1
    print(
        f"ok: {n_certified} certifications current for this "
        "tree; safe to snapshot"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
