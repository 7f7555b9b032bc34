"""Explode/fan-out growth audit: measure every generator's actual
fan-out factor (rows out / rows in) — the row-explosion class at
100 TB
(verdict r10 #7, the stretch item completing the measured-gate
program: broadcast r10, collect r10, localCheckpoint r11).

Docstrings CLAIM the repo's 1:N fan-outs are bounded — shingle
explodes emit O(tokens) per doc, multimodal frame sampling emits
≤ max_frames per asset, posting-list pair unfolds are df-capped.
This tool measures the claim: it executes every registry query via
the noop sink with the SQL status store watching, walks each
execution's plan graph, and for every ``Generate`` node records
rows-IN (nearest descendant with a row metric) and rows-OUT (the
generator's own ``number of output rows``) at TWO scales. The
fan-out factor and its growth across the 10x data step classify each
site:

* bounded fan-out — factor ~flat across scales (per-row bound:
  tokens/doc, frames/asset, k neighbors); rows-out grows ~linearly
  with data. Fine at any scale.
* growing fan-out — factor itself grows with data: a per-row
  explosion whose width is data-sized (the O(df^2) uncapped posting
  list class). Flagged.

Usage: python tools/explode_audit.py [SF_SMALL] [SF_BIG]
           [--threshold R] [--queries a,b,...]
Defaults: /root/testdata/sf0.01 /root/testdata/sf0.1 — NOT the
cheaper sf0.001→sf0.01 step, because the documents/embeddings tables
are floored at 500 docs until sf0.01 (both small fixtures carry the
SAME 500 docs), so the text/dedup/similarity fan-outs only show real
growth from sf0.01 up. Flag when the fan-out factor grows > 3x
across the step AND rows-out at the big scale exceeds 10k (tiny
generators jump ratios on saturation without being a risk).

Implementation notes: metrics come from
``sharedState().statusStore()`` (the UI-less SQLAppStatusStore —
works with spark.ui.enabled=false); a query may trigger several
executions (localCheckpoint materializations + the main sink write),
so generators are aggregated across ALL executions it fires, in
(execution, node-id) order, which is stable for a fixed plan. Row
metrics inside WholeStageCodegen clusters attach to the inner nodes,
so the walk uses the full allNodes set; a Generate whose descendant
chain carries no row metric (none known) reports rows-in = -1 and is
skipped in ratio math.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from hivetomysql_spark.session import get_spark  # noqa: E402

SMALL_DEFAULT = "/root/testdata/sf0.01"
BIG_DEFAULT = "/root/testdata/sf0.1"
ABS_FLOOR = 10_000  # rows-out at the big scale below which growth is moot


def _row_metric(node, metric_values) -> int:
    """The node's 'number of output rows' metric value, -1 if absent
    or not yet populated."""
    ms = node.metrics()
    for j in range(ms.size()):
        met = ms.apply(j)
        if met.name() == "number of output rows":
            v = metric_values.get(met.accumulatorId())
            if v is None or v.isEmpty():
                return -1
            # formatted like "1,234" (possibly with min/med/max text
            # for timing metrics, but numOutputRows is a plain sum)
            digits = "".join(c for c in str(v.get()) if c.isdigit())
            return int(digits) if digits else -1
    return -1


def _generators(spark, after_eid: int = -1) -> list[tuple[int, int]]:
    """(rows_in, rows_out) for every Generate node across the SQL
    executions with id > after_eid, in stable (eid, node-id) order.
    Keying by execution id (not list position) keeps the walk correct
    when the store evicts old executions (retainedExecutions)."""
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    out: list[tuple[int, int]] = []
    for k in range(execs.size()):
        e = execs.apply(k)
        eid = e.executionId()
        if eid <= after_eid:
            continue
        try:
            g = store.planGraph(eid)
            mv = store.executionMetrics(eid)
        except Exception:  # noqa: BLE001  (execution still live)
            continue
        nodes = g.allNodes()
        by_id, children = {}, {}
        for i in range(nodes.size()):
            n = nodes.apply(i)
            by_id[n.id()] = n
        edges = g.edges()
        for i in range(edges.size()):
            ed = edges.apply(i)
            children.setdefault(ed.toId(), []).append(ed.fromId())
        for nid in sorted(by_id):
            n = by_id[nid]
            if n.name() != "Generate":
                continue
            rows_out = _row_metric(n, mv)
            # nearest descendant carrying a row metric = rows in
            rows_in, frontier, seen = -1, list(children.get(nid, [])), set()
            while frontier:
                cid = frontier.pop(0)
                if cid in seen or cid not in by_id:
                    continue
                seen.add(cid)
                r = _row_metric(by_id[cid], mv)
                if r >= 0:
                    rows_in = r
                    break
                frontier.extend(children.get(cid, []))
            out.append((rows_in, rows_out))
    return out


def capture(
    spark, sf_dir: str, names: list[str], verbose: bool = True
) -> dict:
    """{query: [(rows_in, rows_out) per Generate node, stable order]}.
    Importable by the pytest gate. Each query reads only the
    executions ITS run fired: the max execution id is recorded before
    the run and the walk starts past it (id-keyed, eviction-safe)."""
    import __spark_entry__ as entrymod

    def _max_eid() -> int:
        store = spark._jsparkSession.sharedState().statusStore()
        execs = store.executionsList()
        n = execs.size()
        return execs.apply(n - 1).executionId() if n else -1

    qmap = entrymod.queries()
    out: dict[str, list[tuple[int, int]]] = {}
    for name in names:
        before = _max_eid()
        try:
            df = qmap[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"run-failed {name}: {exc!r}", flush=True)
            continue
        gens = _generators(spark, after_eid=before)
        if gens:
            out[name] = gens
            if verbose:
                print(f"scanned {name}: {gens}", flush=True)
    return out


def main() -> int:
    args = list(sys.argv[1:])
    threshold = 3.0
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = float(args[i + 1])
        del args[i : i + 2]
    only = None
    if "--queries" in args:
        i = args.index("--queries")
        only = [n for n in args[i + 1].split(",") if n]
        del args[i : i + 2]
    small = args[0] if args else SMALL_DEFAULT
    big = args[1] if len(args) > 1 else BIG_DEFAULT

    import __spark_entry__ as entrymod

    names = only or sorted(entrymod.queries())
    spark = get_spark(app_name="explode_audit")
    spark.sparkContext.setLogLevel("ERROR")
    a = capture(spark, small, names)
    b = capture(spark, big, names)

    print(f"\n# generator fan-out {small} -> {big} (10x data step)")
    print(
        f"{'query':<40} {'gen':>4} {'in_s':>9} {'out_s':>10} "
        f"{'fan_s':>7} {'in_b':>9} {'out_b':>10} {'fan_b':>7} {'fgrow':>7}"
    )
    flagged = []
    for name in sorted(set(a) & set(b)):
        ca, cb = a[name], b[name]
        if len(ca) != len(cb):
            print(
                f"{name}: generator-count mismatch {len(ca)} vs "
                f"{len(cb)} (adaptive plan) — comparing common prefix"
            )
        for i, ((xi, xo), (yi, yo)) in enumerate(zip(ca, cb)):
            if min(xi, xo, yi, yo) < 0:
                continue
            fan_s = (xo / xi) if xi else float("nan")
            fan_b = (yo / yi) if yi else float("nan")
            fgrow = (fan_b / fan_s) if (xi and yi and fan_s) else float("nan")
            mark = ""
            if fgrow == fgrow and fgrow > threshold and yo > ABS_FLOOR:
                flagged.append((name, i, fan_s, fan_b, yo))
                mark = "  <-- FAN-OUT GROWS WITH DATA"
            print(
                f"{name:<40} {i:>4} {xi:>9} {xo:>10} {fan_s:>6.1f}x "
                f"{yi:>9} {yo:>10} {fan_b:>6.1f}x {fgrow:>6.2f}x{mark}"
            )
    if flagged:
        print(f"\n{len(flagged)} data-sized fan-out(s): {flagged}")
        return 1
    print(
        f"\nall generator fan-out factors bounded (growth <= "
        f"{threshold}x or rows-out < {ABS_FLOOR} at {big})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
