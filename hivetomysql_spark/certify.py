"""Content hashes for sf1 value-certification staleness (verdict r8 #2).

``SF1_CERTIFIED.json`` records which registry queries have had their
complete output hash-matched against an oracle at the derived sf1
point — but a certification is only as fresh as the code it ran
against. ``query_hash`` fingerprints everything the certification
compared: the registered query function's source, its DuckDB oracle
SQL, and (when the sf1 run substitutes one) the python oracle's
source. The pytest gate (``tests/test_sf1_cert_gate.py``) recomputes
the hash for every certified query and fails on drift, forcing
re-certification via ``tools/sf1_rotation.py --recheck``.

Known blind spot, by design: the hash covers the registered
function's own source, not helpers it calls in ``operators/`` or
elsewhere — an edit to a shared helper does not trip the gate. The
full-registry sf0.01 diffcheck (run after every edit batch) is the
net for those; this gate targets the common case of editing a query
body or its oracle in place.
"""

from __future__ import annotations

import hashlib
import inspect


def query_hash(name: str, fn, oracle: str | None, py_oracle=None) -> str:
    """sha256 over (fn source, oracle SQL, py-oracle source).

    ``inspect.getsource`` includes the decorator line, so an edit to
    an inline oracle string registered via the decorator is caught
    twice (once in the source, once in the oracle arg) — harmless.
    """
    h = hashlib.sha256()
    h.update(name.encode())
    h.update(b"\x00")
    h.update(inspect.getsource(fn).encode())
    h.update(b"\x00")
    h.update((oracle or "").encode())
    h.update(b"\x00")
    if py_oracle is not None:
        h.update(inspect.getsource(py_oracle).encode())
    return h.hexdigest()[:16]


def registry_hashes() -> dict[str, str]:
    """Current content hash for every registered query."""
    from hivetomysql_spark.queries import REGISTRY, _load_all

    try:
        import sys
        import os

        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
        )
        from py_oracles import PY_ORACLES  # type: ignore
    except ImportError:  # tools/ not on path (installed package)
        PY_ORACLES = {}
    _load_all()
    return {
        name: query_hash(name, q.fn, q.oracle, PY_ORACLES.get(name))
        for name, q in REGISTRY.items()
    }
