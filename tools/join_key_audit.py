"""Shuffle-join key-multiplicity audit across the whole registry.

The join-shaped sibling of the r11 partitioned-window audit: a
shuffled equi-join concentrates each key's rows on ONE reducer, so a
join keyed on a bounded or heavy key has the same N/k-per-task shape
a bounded-key window does — plus an output-blowup dimension (a key
with m_l x m_r matching rows emits their product). Docstrings assert
the registry's join keys are fine (df-capped posting lists, banded
buckets, unique dimension keys); this audit measures them.

Usage: python tools/join_key_audit.py [--small DIR] [--big DIR] [names...]

For every equi Join node in each query's optimized plan, it rebuilds
both children (``Dataset.ofRows``), counts per-key multiplicities on
each side, joins the two count frames on the key, and records:

  rows_l/rows_r     child input rows
  keys              distinct join keys present on BOTH sides
  max_pair          max over keys of (m_l x m_r)  — worst per-key
                    OUTPUT (the blowup number)
  sum_pair          total join output rows
  max_in            max over keys of (m_l + m_r)  — worst per-key
                    reducer INPUT (the concentration number)

at two scales, then flags sites whose key count stays flat while
max_in grows (bounded/heavy key over growing data) or whose
max_pair grows faster than its inputs (quadratic per-key blowup).
Sites are deduped per (keys, child hashes); condition parsing that
cannot be re-resolved on the bare children records an err row
instead of hiding the site.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hivetomysql_spark.session import get_spark  # noqa: E402

GROWTH = 3.0     # max_in growth across the step that triggers a flag
KEYS_FLAT = 2.0  # ...while key count grew less than this

def _side_info(side):
    """One join-condition side: the single attribute it references
    (None when zero or several), whether the side IS that bare
    attribute, and its SQL text for expression-key evaluation."""
    it = side.references().iterator()
    refs = []
    while it.hasNext():
        a = it.next()
        refs.append((a.name(), int(a.exprId().id())))
    if len(refs) != 1:
        return None
    name, eid = refs[0]
    # value-preserving wrappers Catalyst puts around float join keys
    # (they only canonicalize NaN / -0.0): a side that is wrappers
    # around one attribute NAMES as that attribute
    core = side
    while core.getClass().getSimpleName() in (
        "KnownFloatingPointNormalized", "NormalizeNaNAndZero"
    ):
        core = core.children().apply(0)
    is_attr = core.getClass().getSimpleName() == "AttributeReference"
    return {
        "name": name,
        "eid": eid,
        "attr": is_attr,
        "sql": name if is_attr else side.sql(),
        "expr": side,
    }


def _equi_pairs(cond, lid_pos: dict, rid_pos: dict):
    """Walk the condition's expression TREE for EqualTo /
    EqualNullSafe clauses and attribute each side to a join child by
    exprId — robust to wrappers the old text regex missed (CAST, the
    knownfloatingpointnormalized/normalizenanandzero pair Spark puts
    around double keys; r11 review). Returns ([pair-dict],
    n_unparsed); each pair carries both sides' display name, whether
    the side is a bare attribute (possibly under float-normalization
    wrappers), null-safety, and the catalyst expression itself. When
    a side is an EXPRESSION over one attribute (dayofweek(d) = dow),
    the true shuffle key is the expression's VALUE — measuring the
    raw attribute both under-counts concentration (7 dow values vs
    365 dates) and can type-mismatch the count-frame join, so the
    caller evaluates the expression via ExpressionUtils.column (r12;
    exprId-bound, so duplicate column names in self-joins resolve
    exactly). Clauses whose sides carry zero or multiple attributes
    are counted unparsed so the caller can emit an err row instead
    of silently skipping the site."""
    pairs, unparsed = [], 0
    stack = [cond]
    while stack:
        e = stack.pop()
        cls = e.getClass().getSimpleName()
        if cls == "And":
            stack += [e.left(), e.right()]
        elif cls in ("EqualTo", "EqualNullSafe"):
            a, b = _side_info(e.left()), _side_info(e.right())
            # null-safe? EqualNullSafe MATCHES NULL keys (all NULLs
            # meet on one reducer), so the measurement must join its
            # count frames null-safely too or it under-counts exactly
            # that concentration (r11 review)
            ns = cls == "EqualNullSafe"
            if a is not None and b is not None:
                if a["eid"] in lid_pos and b["eid"] in rid_pos:
                    lt, rt = a, b
                elif b["eid"] in lid_pos and a["eid"] in rid_pos:
                    lt, rt = b, a
                else:
                    unparsed += 1
                    continue
                pairs.append({
                    "ln": lt["name"], "lpos": lid_pos[lt["eid"]],
                    "lattr": lt["attr"], "lsql": lt["sql"],
                    "lexpr": lt["expr"],
                    "rn": rt["name"], "rpos": rid_pos[rt["eid"]],
                    "rattr": rt["attr"], "rsql": rt["sql"],
                    "rexpr": rt["expr"],
                    "ns": ns,
                })
            else:
                unparsed += 1
        # non-equi residual predicates are not keyed shuffles; skip
    return pairs, unparsed


def _attr_ids(node) -> dict[int, str]:
    out = {}
    seq = node.output()
    for i in range(seq.size()):
        a = seq.apply(i)
        out[int(a.exprId().id())] = a.name()
    return out


def _attr_positions(node) -> dict[int, int]:
    """exprId -> output position; used to ATTRIBUTE each condition
    side to a join child (the measurement itself binds by exprId via
    ExpressionUtils.column, so self-joins with duplicate column names
    — graph triangle v-v joins — stay measurable)."""
    out = {}
    seq = node.output()
    for i in range(seq.size()):
        out[int(seq.apply(i).exprId().id())] = i
    return out


def join_sites(df: DataFrame) -> list[dict]:
    """Measured stats for every equi Join node in the optimized plan.
    Importable by tests; one count job pair + one count-join per
    site."""
    spark = df.sparkSession
    out: list[dict] = []
    seen: set = set()
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        n = stack.pop()
        if n.getClass().getSimpleName() == "Join" and not n.condition().isEmpty():
            left, right = n.left(), n.right()
            lpos_map, rpos_map = _attr_positions(left), _attr_positions(right)
            pairs, unparsed = _equi_pairs(
                n.condition().get(), lpos_map, rpos_map
            )
            # display name: the expression SQL when the side is not a
            # bare column — the snapshot then records the TRUE key
            lkeys = [p["lsql"] if not p["lattr"] else p["ln"] for p in pairs]
            rkeys = [p["rsql"] if not p["rattr"] else p["rn"] for p in pairs]
            nullsafe = [p["ns"] for p in pairs]
            if not lkeys:
                if unparsed:
                    out.append({
                        "lkeys": ["<unparsed-equi-cond>"], "rkeys": [],
                        "rows_l": None, "rows_r": None, "keys": None,
                        "max_pair": None, "sum_pair": None, "max_in": None,
                        "err": f"{unparsed} equi clause(s) with non-single-"
                               "attribute sides — measure by hand",
                    })
                ch = n.children()
                for i in range(ch.size()):
                    stack.append(ch.apply(i))
                continue
            dedup = (
                tuple(lkeys), tuple(rkeys),
                int(left.semanticHash()), int(right.semanticHash()),
            )
            if dedup not in seen:
                seen.add(dedup)
                rec: dict = {
                    "lkeys": lkeys, "rkeys": rkeys, "nullsafe": nullsafe
                }
                try:
                    jl = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                        spark._jsparkSession, left
                    )
                    jr = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                        spark._jsparkSession, right
                    )
                    dl, dr = DataFrame(jl, spark), DataFrame(jr, spark)
                    # key columns are built from the condition's OWN
                    # catalyst expressions (ExpressionUtils.column):
                    # expression keys (dayofweek(d) = dow) count their
                    # true shuffle values, and exprId binding resolves
                    # exactly even when a self-join repeats column
                    # names — no positional rename needed
                    from pyspark.sql.column import Column as PyCol

                    eu = (
                        spark._jvm.org.apache.spark.sql.classic
                        .ExpressionUtils
                    )
                    lcols = [
                        PyCol(eu.column(p["lexpr"])).alias(f"__k{i}")
                        for i, p in enumerate(pairs)
                    ]
                    rcols = [
                        PyCol(eu.column(p["rexpr"])).alias(f"__kr{i}")
                        for i, p in enumerate(pairs)
                    ]
                    cl = dl.groupBy(*lcols).agg(
                        F.count(F.lit(1)).alias("__ml")
                    )
                    cr = dr.groupBy(*rcols).agg(
                        F.count(F.lit(1)).alias("__mr")
                    )
                    # per-clause null-safety mirrors the site's own
                    # condition: an EqualNullSafe clause concentrates
                    # all NULL keys on ONE reducer, and only a
                    # null-safe count-frame join measures that
                    cond = None
                    for i in range(len(lkeys)):
                        kl, kr = F.col(f"__k{i}"), F.col(f"__kr{i}")
                        e = kl.eqNullSafe(kr) if nullsafe[i] else kl == kr
                        cond = e if cond is None else cond & e
                    both = cl.join(cr, cond)
                    row = both.agg(
                        F.count(F.lit(1)).alias("keys"),
                        F.max(F.col("__ml") * F.col("__mr")).alias("mxp"),
                        F.sum(F.col("__ml") * F.col("__mr")).alias("smp"),
                        F.max(F.col("__ml") + F.col("__mr")).alias("mxi"),
                    ).collect()[0]
                    nl, nr = dl.count(), dr.count()
                    rec.update(
                        rows_l=int(nl), rows_r=int(nr),
                        keys=int(row["keys"] or 0),
                        max_pair=int(row["mxp"] or 0),
                        sum_pair=int(row["smp"] or 0),
                        max_in=int(row["mxi"] or 0),
                        err=None,
                    )
                except Exception as exc:  # noqa: BLE001
                    rec.update(
                        rows_l=None, rows_r=None, keys=None, max_pair=None,
                        sum_pair=None, max_in=None,
                        err=f"{type(exc).__name__}: {exc}"[:160],
                    )
                out.append(rec)
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


def audit(spark, sf_dir: str, names: list[str]) -> dict[str, list[dict]]:
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    out: dict[str, list[dict]] = {}
    for name in names:
        try:
            sites = join_sites(qmap[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            sites = [{"lkeys": ["<plan build failed>"], "rkeys": [],
                      "rows_l": None, "rows_r": None, "keys": None,
                      "max_pair": None, "sum_pair": None, "max_in": None,
                      "err": f"{type(exc).__name__}: {exc}"[:160]}]
        if sites:
            out[name] = sites
    return out


def main() -> int:
    args = sys.argv[1:]
    small, big = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    sf1 = None
    if "--small" in args:
        i = args.index("--small"); small = args[i + 1]; del args[i:i + 2]
    if "--big" in args:
        i = args.index("--big"); big = args[i + 1]; del args[i:i + 2]
    if "--sf1" in args:
        # optional THIRD scale point (r12, verdict #7): growth is
        # checked on BOTH steps with the same rules
        i = args.index("--sf1"); sf1 = args[i + 1]; del args[i:i + 2]

    import __spark_entry__ as entrymod

    names = args or sorted(entrymod.queries())
    spark = get_spark(app_name="join_key_audit")
    spark.sparkContext.setLogLevel("ERROR")

    a = audit(spark, small, names)
    print(f"# pass 1: {len(a)}/{len(names)} queries have equi Join "
          f"nodes at {small}")
    b = audit(spark, big, sorted(a))
    c = audit(spark, sf1, sorted(a)) if sf1 else None

    print(f"\n{'query':<34} {'keys (l=r)':<26} "
          f"{'in_l@B':>9} {'in_r@B':>9} {'keys@S':>7} {'keys@B':>8} "
          f"{'mxin@S':>7} {'mxin@B':>7} {'mxpair@B':>9} {'g_keys':>6} {'g_in':>6}")
    flags = []
    errs = 0

    def step_flag(x, y, name):
        """Hazard signature for one scale step: bounded/heavy key
        (key count flat) while the max per-key reducer input grows
        with the data. Records flags; returns (flag-text, growths)."""
        g_keys = y["keys"] / x["keys"]
        g_in = (y["max_in"] / x["max_in"]) if x["max_in"] else 0.0
        flag = ""
        grew = (
            y["rows_l"] > x["rows_l"] * KEYS_FLAT
            or y["rows_r"] > x["rows_r"] * KEYS_FLAT
        )
        # a small side that stays small is broadcast by AQE at
        # runtime (the r10 unhint rule): a broadcast hash join
        # never shuffles the stream side, so key multiplicity
        # concentrates nothing — dimension tables and the
        # grouped primitives' O(keys)/O(keys x buckets) offset
        # frames are this class
        sm_small, sm_big = min(x["rows_l"], x["rows_r"]), min(
            y["rows_l"], y["rows_r"]
        )
        bounded_small_side = (
            sm_big < 100_000 and sm_big < sm_small * KEYS_FLAT
        )
        if grew and g_keys < KEYS_FLAT and g_in > GROWTH:
            if bounded_small_side:
                flag = "  (bounded small side: AQE broadcasts)"
            else:
                flags.append((name, x["lkeys"], g_keys, g_in))
                flag = "  <-- BOUNDED/HEAVY JOIN KEY OVER GROWING DATA"
        return flag, g_keys, g_in

    for name in sorted(a):
        sa, sb = a[name], b.get(name, [])
        sc = c.get(name, []) if c is not None else None
        if len(sa) != len(sb) or (sc is not None and len(sb) != len(sc)):
            lens = f"{len(sa)} vs {len(sb)}" + (
                f" vs {len(sc)}" if sc is not None else ""
            )
            print(f"{name:<34} SITE-COUNT MISMATCH {lens} "
                  f"— scale-dependent plan, inspect by hand")
            errs += 1
            continue
        for idx, (x, y) in enumerate(zip(sa, sb)):
            z = sc[idx] if sc is not None else None
            kdesc = ",".join(x["lkeys"])[:26]
            if x["err"] or y["err"] or (z and z["err"]):
                print(f"{name:<34} {kdesc:<26} ERR "
                      f"{x['err'] or y['err'] or (z and z['err'])}")
                errs += 1
                continue
            # keys present on both sides can be 0 (anti-join probes
            # with no match at this scale) — treat as unmeasurable
            if not x["keys"] or not y["keys"]:
                continue
            flag, g_keys, g_in = step_flag(x, y, name)
            extra = ""
            if z is not None and z["keys"]:
                flag2, g2_keys, g2_in = step_flag(y, z, name)
                extra = (f" | sf1 {z['keys']:>8} {z['max_in']:>7} "
                         f"{g2_keys:>5.1f}x {g2_in:>5.1f}x")
                flag = flag or flag2
            print(f"{name:<34} {kdesc:<26} "
                  f"{y['rows_l']:>9} {y['rows_r']:>9} {x['keys']:>7} "
                  f"{y['keys']:>8} {x['max_in']:>7} {y['max_in']:>7} "
                  f"{y['max_pair']:>9} {g_keys:>5.1f}x {g_in:>5.1f}x"
                  f"{extra}{flag}")

    record = {"small": a, "big": b}
    if c is not None:
        record["sf1"] = c
    with open("join_key_audit.json", "w") as fh:
        json.dump(record, fh, indent=1)
    print("\nfull record -> join_key_audit.json")
    # ERR/mismatch rows are UNMEASURED, not passing (r11 review: a
    # run where every site errors must not print the all-clear)
    if errs:
        print(f"{errs} site(s) could not be measured (ERR/MISMATCH "
              "above) — unmeasured is not passing; fix and re-run")
    if flags:
        print(f"{len(flags)} flagged site(s):")
        for name, keys, gk, gi in flags:
            print(f"  {name} ON {','.join(keys)}: keys {gk:.1f}x but "
                  f"max per-key reducer input {gi:.1f}x across the step")
        return 1
    if errs:
        return 2
    print("no bounded/heavy-key shuffle-join sites flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
