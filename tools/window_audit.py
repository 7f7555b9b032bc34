"""Partitioned-window group-size audit across the whole registry.

The last window class without a measurement: the r9/r10 global-window
program measured and gated every UNPARTITIONED window (k=1 ⇒ a
single-task sort unless the input is pre-reduced), but a PARTITIONED
window is only better if the key's cardinality grows with the data.
``PARTITION BY l_returnflag`` over raw lineitem funnels N/3 rows into
one sort task — at 100 TB a multi-TB single-task sort, the identical
hazard one notch up. Docstrings assert the partition keys are
high-cardinality; this audit measures them.

Usage: python tools/window_audit.py [--small DIR] [--big DIR] [names...]

Pass 1 builds every registry plan at ``--small`` (default sf0.01),
walks the analyzed plan for partitioned Window nodes
(plans/introspect.partitioned_window_stats), and measures each node's
child: rows in, groups, max group. Pass 2 re-measures only the
queries with sites at ``--big`` (default sf0.1) and prints the
growth table. The hazard signature is BOUNDED KEY OVER GROWING DATA:
groups grew < GROUPS_FLAT (key cardinality saturated) while the max
group grew > MAX_GROWTH (partitions inherit the data's growth). Both
are reported; the classification threshold lives here and in the
pytest gate (tests/test_window_gate.py) which freezes the bounded
class.

Exit 1 if any site matches the hazard signature and is not on the
documented allowlist below.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from hivetomysql_spark.plans import introspect as I  # noqa: E402
from hivetomysql_spark.session import get_spark  # noqa: E402

GROUPS_FLAT = 2.0   # key cardinality grew less than this across 10x
MAX_GROWTH = 3.0    # ...while the max group grew more than this

# Sites where a bounded-key window over growing input is by design,
# each with the reason the single task stays small at 100 TB.
# Key: (query, tuple-of-partition-keys-sql).
ALLOWED: dict[tuple[str, tuple[str, ...]], str] = {
    # r12 adaptive dispatch (operators/ranks._resolve_dispatch): the
    # query measures the largest p_brand group per run and takes this
    # plain-window plan only while it fits one sort task
    # (<= PLAIN_WINDOW_BOUND = 2M rows; 861 rows/brand at sf0.1,
    # flat at the derived sf1/sf10 points). On a deployment where
    # part scales with the data (true TPC-H: 200k x SF), the same
    # call sites flip to the two-level __rk_bucket shape the moment
    # the measured bound is crossed — the audit then sees bucket
    # frames here instead of this site.
    ("window_rank_ntile", ("p_brand",)):
        "adaptive dispatch: measured max_group <= 2M picks plain "
        "window; two-level above (ranks.py r12)",
    # CALENDAR SERIES (r12 sf1 extension): the window input is
    # domain-reduced to a time grain before the window, so the group
    # is one key's DAILY SERIES — its size is the calendar length
    # (3650 rows per decade of retention), not the data volume. The
    # derived fixtures extend the timeline 10x per scale step
    # (make_sfup shifts each copy by one span), so max group tracks
    # days exactly — the safe shape showing the hazard signature.
    ("events_ab_peeking_bias", ("grp",)):
        "2-arm daily series: group = days (calendar-bounded)",
    ("timeseries_autocorr", ("event_type",)):
        "per-type daily series: group = days (calendar-bounded)",
    ("timeseries_cusum_changepoint", ("event_type",)):
        "per-type daily series: group = days (calendar-bounded)",
}

# ENTITY-HISTORY keys (r12 sf1 extension): the derived scale model
# holds dimension key domains FIXED while facts multiply ("K x more
# transactions over the same catalog"), so per-entity groups deepen
# 10x per derived step and every user_id/custkey-keyed sequence
# window shows the bounded-key signature there. That is the model's
# fan-in deepening, not a plan defect: a per-entity sequence
# operator (sessionize, funnel, lifecycle, as-of, running balance)
# irreducibly needs ONE entity's ordered history in one place, and
# its group size at 100 TB is bounded by per-entity retention (an
# ops/data-model knob), not by table size. On the driver's own
# fixtures (sf0.01 -> sf0.1) these key domains GROW with the data
# and the sites pass the growth rule outright. Sites keyed solely on
# these are classified, not flagged — and still measured/printed.
ENTITY_HISTORY_KEYS = {"user_id", "o_custkey", "c_custkey"}

# operators/ranks two-level frames: every primitive windows over
# (group..., __rk_bucket) with a FIXED bucket count, so each bucket
# holds ~N/(k x n_buckets) BY DESIGN — that IS the decomposition
# (parallelism n_buckets instead of 1; raise n_buckets at warehouse
# scale). Occupancy balance is separately measured and gated by
# tools/skew_audit.py + tests/test_skew_gate.py.
BUCKET_COL = "__rk_bucket"


def _is_bucket_frame(site_keys: tuple[str, ...]) -> bool:
    return any(k.strip("`") == BUCKET_COL for k in site_keys)


def audit(spark, sf_dir: str, names: list[str]) -> dict[str, dict]:
    """{query: {"sites": [...], "wgl": [[keys, k], ...]}} for every
    query with >=1 partitioned Window node; queries whose plan build
    fails are recorded under ``err``. Importable by the pytest gate."""
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        wgl: list = []
        try:
            df = qmap[name](spark, sf_dir)
            sites = I.partitioned_window_stats(df)
            if sites:
                wgl = [
                    [sorted(keys), k]
                    for keys, k in I.partial_window_group_limits(df)
                ]
        except Exception as exc:  # noqa: BLE001
            sites = [{"keys": ["<plan build failed>"], "rows": None,
                      "groups": None, "max_group": None,
                      "err": f"{type(exc).__name__}: {exc}"[:200]}]
        if sites:
            out[name] = {"sites": sites, "wgl": wgl}
    return out


def _mitigated(site_keys: tuple[str, ...], wgl: list) -> bool:
    """True if every partition key of the site is covered by a
    Partial WindowGroupLimit node — the per-group sort input is then
    k x n_map_tasks rows regardless of the key's cardinality."""
    bare = {k.strip("`") for k in site_keys}
    return any(bare <= set(keys) for keys, _k in wgl)


def main() -> int:
    args = sys.argv[1:]
    small, big = "/root/testdata/sf0.01", "/root/testdata/sf0.1"
    sf1 = None
    if "--small" in args:
        i = args.index("--small"); small = args[i + 1]; del args[i:i + 2]
    if "--big" in args:
        i = args.index("--big"); big = args[i + 1]; del args[i:i + 2]
    if "--sf1" in args:
        # optional THIRD scale point (r12, verdict #7): the bounded-
        # key signature is clearer per decade — growth is checked on
        # BOTH steps (small->big and big->sf1) with the same rules
        i = args.index("--sf1"); sf1 = args[i + 1]; del args[i:i + 2]

    import __spark_entry__ as entrymod

    names = args or sorted(entrymod.queries())
    spark = get_spark(app_name="window_audit")
    spark.sparkContext.setLogLevel("ERROR")

    a = audit(spark, small, names)
    print(f"# pass 1: {len(a)}/{len(names)} queries have partitioned "
          f"Window nodes at {small}")
    b = audit(spark, big, sorted(a))
    c = audit(spark, sf1, sorted(a)) if sf1 else None

    print(f"\n{'query':<34} {'partition keys':<28} "
          f"{'rows@S':>9} {'rows@B':>9} {'grp@S':>7} {'grp@B':>7} "
          f"{'max@S':>7} {'max@B':>7} {'g_grp':>6} {'g_max':>6}")
    hazards: list[tuple[str, tuple[str, ...], float, float]] = []
    errs = 0
    def collapse(sites: list[dict]) -> list[dict]:
        # Catalyst stacks multi-function windows as nested Window
        # nodes with the same spec over the same rows — one line each
        # is noise (one fix fixes the stack). Collapse identical
        # (keys, rows, groups, max) measurements per query.
        out, seen = [], set()
        for s in sites:
            k = (tuple(s["keys"]), s["rows"], s["groups"], s["max_group"])
            if k not in seen:
                seen.add(k)
                out.append(s)
        return out

    def step_flag(x, y, keys, wgl, name):
        """Apply the hazard signature to one scale step; returns
        (flag-text, growths) and records hazards."""
        g_grp = (y["groups"] / x["groups"]) if x["groups"] else float("inf")
        g_max = (
            (y["max_group"] / x["max_group"]) if x["max_group"] else float("inf")
        )
        flag = ""
        if (
            y["rows"] > x["rows"] * GROUPS_FLAT  # input actually grew
            and g_grp < GROUPS_FLAT
            and g_max > MAX_GROWTH
        ):
            if _is_bucket_frame(keys):
                flag = "  (two-level bucket frame: N/buckets by design)"
            elif _mitigated(keys, wgl):
                flag = "  (WindowGroupLimit partial: mitigated)"
            elif (name, keys) in ALLOWED:
                flag = "  (allowed: " + ALLOWED[(name, keys)][:40] + ")"
            elif {k.strip("`") for k in keys} <= ENTITY_HISTORY_KEYS:
                flag = ("  (entity history: derived model deepens "
                        "per-entity groups; bound = retention)")
            else:
                hazards.append((name, keys, g_grp, g_max))
                flag = "  <-- BOUNDED KEY OVER GROWING DATA"
        return flag, g_grp, g_max

    for name in sorted(a):
        sa = collapse(a[name]["sites"])
        sb = collapse(b.get(name, {}).get("sites", []))
        sc = collapse(c.get(name, {}).get("sites", [])) if c else None
        wgl = b.get(name, {}).get("wgl", []) or a[name]["wgl"]
        if len(sa) != len(sb) or (sc is not None and len(sb) != len(sc)):
            # zipping misaligned lists would pair unrelated sites and
            # compute nonsense ratios (r11 review) — surface and skip
            lens = f"{len(sa)} vs {len(sb)}" + (
                f" vs {len(sc)}" if sc is not None else ""
            )
            print(f"{name:<34} SITE-COUNT MISMATCH {lens} "
                  f"— scale-dependent plan, inspect by hand")
            hazards.append(
                (name, ("<site-count-mismatch>",), float("nan"), float("nan"))
            )
            continue
        for idx, (x, y) in enumerate(zip(sa, sb)):
            z = sc[idx] if sc is not None else None
            keys = tuple(x["keys"])
            kdesc = ",".join(keys)[:28]
            if x["err"] or (y and y["err"]) or (z and z["err"]):
                print(f"{name:<34} {kdesc:<28} ERR "
                      f"{x['err'] or y['err'] or (z and z['err'])}")
                errs += 1
                continue
            if not y:
                continue
            flag, g_grp, g_max = step_flag(x, y, keys, wgl, name)
            extra = ""
            if z is not None:
                flag2, g2_grp, g2_max = step_flag(y, z, keys, wgl, name)
                extra = (f" | sf1 {z['groups']:>8} {z['max_group']:>8} "
                         f"{g2_grp:>5.1f}x {g2_max:>5.1f}x")
                flag = flag or flag2
            print(f"{name:<34} {kdesc:<28} "
                  f"{x['rows']:>9} {y['rows']:>9} {x['groups']:>7} "
                  f"{y['groups']:>7} {x['max_group']:>7} {y['max_group']:>7} "
                  f"{g_grp:>5.1f}x {g_max:>5.1f}x{extra}{flag}")

    record = {"small": a, "big": b}
    if c is not None:
        record["sf1"] = c
    with open("window_audit.json", "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"\nfull record -> window_audit.json")
    # ERR rows are UNMEASURED, not passing (r11 review: a run where
    # every site errors must not print the all-clear and exit 0)
    if errs:
        print(f"{errs} site(s) could not be measured (ERR above) — "
              "unmeasured is not passing; fix and re-run")
    if hazards:
        print(f"{len(hazards)} hazard site(s):")
        for name, keys, g_grp, g_max in hazards:
            print(f"  {name} PARTITION BY {','.join(keys)}: groups "
                  f"{g_grp:.1f}x but max group {g_max:.1f}x across the step")
        return 1
    if errs:
        return 2
    print("no bounded-key-over-growing-data window sites outside the allowlist")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
