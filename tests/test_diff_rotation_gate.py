"""Staleness + validity gate for the rotating differential artifact
(verdict r12 #7).

``diff_rotation.json`` claims a deterministic 50-query window of the
non-headline registry hash-matched its DuckDB oracles at sf0.01 —
that claim goes stale when a checked query's body or oracle is
edited, and it is meaningless if the recorded window isn't the slice
its round index prescribes. Pure source inspection (no Spark jobs)
except for the slice recomputation, so it runs in milliseconds.

Repair path: ``python tools/diff_rotation.py``.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

from hivetomysql_spark.certify import registry_hashes

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(ROOT, "diff_rotation.json")

sys.path.insert(0, os.path.join(ROOT, "tools"))


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(ARTIFACT):
        pytest.fail(
            "diff_rotation.json missing — run tools/diff_rotation.py"
        )
    return json.load(open(ARTIFACT))


def test_no_recorded_failures(artifact):
    red = sorted(
        n for n, r in artifact["results"].items() if not r.get("pass")
    )
    assert not red, (
        f"diff_rotation.json records {len(red)} FAILING differentials — "
        f"fix the queries, then re-run tools/diff_rotation.py: {red}"
    )


def test_window_matches_recorded_round_index(artifact):
    import diff_rotation as DR
    import __spark_entry__ as entrymod

    names = sorted(entrymod.queries())
    tail = sorted(set(names) - set(__import__("bench").HEADLINE))
    idx = artifact["round_index"]
    start = (idx * DR.WINDOW_SIZE) % len(tail)
    expected = [
        tail[(start + i) % len(tail)]
        for i in range(min(DR.WINDOW_SIZE, len(tail)))
    ]
    got = sorted(artifact["results"])
    assert got == sorted(expected), (
        "recorded window is not the deterministic slice for round "
        f"index {idx} (registry changed?) — re-run tools/diff_rotation.py"
    )


def test_no_stale_entries(artifact):
    current = registry_hashes()
    recorded = artifact.get("hashes", {})
    missing = sorted(set(artifact["results"]) - set(recorded))
    assert not missing, (
        f"results without content hashes (regenerate): {missing[:5]}"
    )
    stale = sorted(
        n for n, h in recorded.items() if current.get(n) != h
    )
    assert not stale, (
        f"{len(stale)} rotation differentials are STALE (query body or "
        "oracle edited since the artifact was generated) — re-run "
        f"tools/diff_rotation.py: {stale}"
    )
