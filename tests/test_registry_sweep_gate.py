"""Staleness/shape gate for the full-registry timing-sweep artifact.

`registry_sweep.json` is the per-round wall-time record for every
registered query (tools/registry_sweep.py) — the artifact the next
round diffs against to catch constant-factor blowups the plan gates
can't see. An artifact that silently stops covering the registry
(queries added after the sweep ran) or carries errors would turn
that diff into a no-op, so pin the contract here. Slack of 12 names
allows mid-round additions between the sweep run and round end; the
next sweep re-zeros it.
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(ROOT, "registry_sweep.json")

SLACK = 12


def test_sweep_artifact_current_and_clean():
    assert os.path.exists(PATH), (
        "registry_sweep.json missing — run `python "
        "tools/registry_sweep.py --tag r<N>` once per round"
    )
    d = json.load(open(PATH))
    assert d.get("errors") == {}, f"sweep recorded errors: {d['errors']}"
    swept = set(d["queries"])
    registry = set(entrymod.queries())
    unswept = sorted(registry - swept)
    assert len(unswept) <= SLACK, (
        f"{len(unswept)} registry queries have no sweep timing "
        f"(> slack {SLACK}): {unswept[:20]} — re-run registry_sweep"
    )
    ghosts = sorted(swept - registry)
    assert not ghosts, f"sweep carries non-registry names: {ghosts[:10]}"
    # host-speed probes must be present for next round's normalization
    assert d["calib"].get("jvm_sum_sec", 0) > 0
    assert d["calib"].get("py_sha_sec", 0) > 0
