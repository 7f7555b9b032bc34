"""One-shot refactor: fold queries/analytics_extras1..80 (append-only
round archaeology) into named domain modules so related operators live
together (graph next to graph, stats next to stats).

Mechanics (content-preserving, block-level):

* every ``@register``-decorated function is classified by ITS query
  name's prefix (not its batch file's majority), so e.g. graph_kcore
  lands in the graph module even when its batch was embedding-heavy;
* each function block moves verbatim with its transitive top-level
  dependencies (constants, helper functions) from the same batch;
  a helper shared by functions that land in different domains is
  duplicated into each (module-private, so no coupling);
* the batch's import lines are replayed at the top of every segment
  that received code from it (duplicate imports are harmless);
* top-level names colliding with an earlier segment in the same
  domain module are suffixed ``_b<batch>`` throughout the segment;
* queries/__init__.py's import list is rewritten.

Run once from the repo root; asserts the registered-name set is
unchanged before touching disk.
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

QDIR = Path("hivetomysql_spark/queries")

PREFIX_DOMAIN = {
    "graph": "graph_suite",
    "stats": "stats_suite",
    "anomaly": "stats_suite",
    "timeseries": "timeseries_suite",
    "seasonal": "timeseries_suite",
    "privacy": "privacy_suite",
    "er": "privacy_suite",
    "ml": "ml_suite",
    "feature": "ml_suite",
    "tokenizer": "ml_suite",
    "embedding": "similarity_suite",
    "similarity": "similarity_suite",
    "text": "text_suite",
    "dq": "dataquality_suite",
    "events": "events_suite",
    "event": "events_suite",
    "stream": "events_suite",
    "window": "events_suite",
    "attribution": "events_suite",
    "funnel": "events_suite",
    "sessionization": "events_suite",
    "finance": "business_suite",
    "pricing": "business_suite",
    "orders": "business_suite",
    "supply": "business_suite",
    "inventory": "business_suite",
    "supplier": "business_suite",
    "recsys": "business_suite",
    "basket": "business_suite",
    "cohort": "business_suite",
    "agg": "sketches_suite",
    "multimodal": "multimodal_suite",
    "dedup": "llmops_suite",
    "sample": "llmops_suite",
    "pipeline": "llmops_suite",
    "incremental": "llmops_suite",
    "corpus": "llmops_suite",
    "chunk": "llmops_suite",
    "pack": "llmops_suite",
    "pairs": "llmops_suite",
    "func": "relational_suite",
    "join": "relational_suite",
    "sql": "relational_suite",
    "udtf": "relational_suite",
    "sort": "relational_suite",
    "subquery": "relational_suite",
    "set": "relational_suite",
    "pivot": "relational_suite",
}

HEADER = '''"""{title}.

Folded from the round-build batch modules (analytics_extras*): every
query whose name matches this domain moved here verbatim together
with its batch-local helpers, so related operators read side by side.
Section banners record the source batch; helpers shared across
domains were duplicated module-private; colliding private names carry
a _b<batch> suffix.
"""

from __future__ import annotations
'''

TITLES = {
    "graph_suite": "Graph analytics suite (components, centrality, cores, walks)",
    "stats_suite": "Statistical testing and estimation suite",
    "timeseries_suite": "Time-series analytics suite",
    "privacy_suite": "Privacy, governance and entity-resolution suite",
    "ml_suite": "Distributed ML training/feature suite",
    "similarity_suite": "Embedding similarity / ANN suite",
    "text_suite": "Text analytics suite",
    "dataquality_suite": "Data-quality expectation suite",
    "events_suite": "Event-stream analytics suite",
    "business_suite": "Business/finance analytics suite",
    "sketches_suite": "Sketch and approximate-aggregate suite",
    "multimodal_suite": "Multimodal (image/audio/video) analytics suite",
    "llmops_suite": "LLM data-pipeline extras suite",
    "relational_suite": "Relational/SQL-surface extras suite",
    "misc_suite": "Miscellaneous analytics suite",
}


def reg_name(node: ast.FunctionDef) -> str | None:
    for dec in node.decorator_list:
        if (
            isinstance(dec, ast.Call)
            and getattr(dec.func, "id", "") == "register"
            and dec.args
            and isinstance(dec.args[0], ast.Constant)
        ):
            return dec.args[0].value
    return None


def node_span(node: ast.AST) -> tuple[int, int]:
    start = node.lineno - 1
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        for dec in node.decorator_list:
            start = min(start, dec.lineno - 2)  # include the '@' line
    return start, node.end_lineno


def defined_names(node: ast.AST) -> set[str]:
    out: set[str] = set()
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        out.add(node.name)
    elif isinstance(node, ast.Assign):
        for t in node.targets:
            for sub in ast.walk(t):
                if isinstance(sub, ast.Name):
                    out.add(sub.id)
    elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        out.add(node.target.id)
    return out


def main() -> None:
    batch_files = sorted(
        QDIR.glob("analytics_extras*.py"),
        key=lambda p: int(re.search(r"(\d+)", p.stem).group(1))
        if re.search(r"(\d+)", p.stem)
        else 1,
    )
    before: set[str] = set()
    # domain -> list of (batch_no, stem, import_text, body_text, names)
    segments: dict[str, list[tuple[int, str, str, str, set[str]]]] = {}

    for p in batch_files:
        src = p.read_text()
        lines = src.splitlines()
        tree = ast.parse(src)
        m = re.search(r"(\d+)", p.stem)
        batch_no = int(m.group(1)) if m else 1

        imports, blocks = [], []  # blocks: (names, text, is_query, domain)
        for node in tree.body:
            s, e = node_span(node)
            text = "\n".join(lines[s:e])
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                if getattr(node, "module", "") != "__future__":
                    imports.append(text)
                continue
            if (
                isinstance(node, ast.Expr)
                and isinstance(node.value, ast.Constant)
                and isinstance(node.value.value, str)
            ):
                continue  # module docstring
            qname = reg_name(node) if isinstance(node, ast.FunctionDef) else None
            domain = None
            if qname:
                before.add(qname)
                domain = PREFIX_DOMAIN.get(qname.split("_")[0], "misc_suite")
            blocks.append([defined_names(node), text, qname, domain])

        # a query that CALLS another registered query must live in the
        # same module (no cross-suite imports): adopt the referenced
        # query's domain, to fixpoint
        qblocks = [b for b in blocks if b[2]]
        changed = True
        while changed:
            changed = False
            for a in qblocks:
                for b in qblocks:
                    if a is b:
                        continue
                    fname = next(iter(n for n in b[0]), None)
                    if (
                        fname
                        and re.search(rf"\b{re.escape(fname)}\b", a[1])
                        and a[3] != b[3]
                    ):
                        a[3] = b[3]
                        changed = True

        # transitive dependency closure per query block (register
        # blocks are never duplicated as deps — they are their own
        # blocks, colocated by the pass above)
        name_to_block = {}
        for b in blocks:
            for n in b[0]:
                name_to_block[n] = b
        import_text = "\n".join(imports)
        per_domain: dict[str, list] = {}
        for b in blocks:
            if not b[2]:
                continue
            deps: list = []
            seen_ids = {id(b)}
            frontier = [b]
            while frontier:
                cur = frontier.pop()
                for n, tgt in name_to_block.items():
                    if id(tgt) in seen_ids or tgt[2]:
                        continue
                    if re.search(rf"\b{re.escape(n)}\b", cur[1]):
                        seen_ids.add(id(tgt))
                        deps.append(tgt)
                        frontier.append(tgt)
            per_domain.setdefault(b[3], []).append((deps, b))

        for domain, qblocks in per_domain.items():
            emitted_ids: set[int] = set()
            parts: list[str] = []
            names: set[str] = set()
            for deps, b in qblocks:
                # deps in original file order, once each
                for d in sorted(deps, key=lambda x: blocks.index(x)):
                    if id(d) not in emitted_ids:
                        emitted_ids.add(id(d))
                        parts.append(d[1])
                        names |= d[0]
                emitted_ids.add(id(b))
                parts.append(b[1])
                names |= b[0]
            segments.setdefault(domain, []).append(
                (batch_no, p.stem, import_text, "\n\n\n".join(parts), names)
            )

    written: dict[str, str] = {}
    for domain, segs in sorted(segments.items()):
        used: set[str] = set()
        parts = [HEADER.format(title=TITLES[domain])]
        for batch_no, stem, import_text, body, names in segs:
            renamed = {}
            for name in sorted(names, key=len, reverse=True):
                if name in used:
                    body = re.sub(
                        rf"\b{re.escape(name)}\b", f"{name}_b{batch_no}", body
                    )
                    renamed[name] = f"{name}_b{batch_no}"
            used.update(renamed.get(n, n) for n in names)
            banner = f"\n\n# {'=' * 72}\n# from {stem}.py\n# {'=' * 72}\n"
            seg = banner + (import_text + "\n\n\n" if import_text else "") + body
            parts.append(seg)
        written[domain] = "\n".join(parts) + "\n"

    after: set[str] = set()
    for domain, src in written.items():
        tree = ast.parse(src)  # syntax check
        for node in ast.walk(tree):
            if isinstance(node, ast.FunctionDef):
                n = reg_name(node)
                if n:
                    after.add(n)
    assert after == before, (sorted(before - after), sorted(after - before))

    for domain, src in written.items():
        (QDIR / f"{domain}.py").write_text(src)
    for p in batch_files:
        p.unlink()

    init = (QDIR / "__init__.py").read_text()
    assert re.search(r"\n        analytics_extras\d*,", init)
    init = re.sub(r"\n        analytics_extras\d*,", "", init)
    new_imports = "".join(f"\n        {d}," for d in sorted(written))
    init = init.replace(
        "\n        corpus_stats,", new_imports + "\n        corpus_stats,"
    )
    (QDIR / "__init__.py").write_text(init)
    print(
        f"merged {len(batch_files)} batch files into {len(written)} "
        f"domain modules ({len(before)} queries)"
    )
    for d in sorted(written):
        n = sum(1 for s in segments[d] for _ in [0])
        print(f"  {d}: {n} batch segments")


if __name__ == "__main__":
    main()
