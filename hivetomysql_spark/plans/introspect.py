"""Physical-plan introspection helpers.

The 100 TB design contract is only real if the plans actually have
the right shape — filters reaching the scan, small dimensions
broadcast, aggregates partial-before-shuffle. These helpers let tests
(tests/test_plans.py) assert those properties instead of trusting
comments, and give operators a cheap way to print/inspect what
Catalyst chose.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    jmode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def executed_plan(df: DataFrame) -> str:
    """Plan string AFTER execution — includes AQE's final choices
    (a broadcast join AQE converted at runtime only shows here)."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Data-source filters that reached the scan (parquet row-group
    pruning). Empty list ⇒ the scan reads everything."""
    text = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", text):
        if m.group(1).strip():
            out.extend(f.strip() for f in m.group(1).split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan — column pruning check: a
    2-column projection must not scan 16 columns."""
    text = physical_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """Map-side combine present (HashAggregate with partial_*
    functions below the exchange)."""
    return bool(re.search(r"partial_\w+", physical_plan(df)))

def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan — the metric to
    minimize; every one is a full network rewrite of its input."""
    # simple mode renders "Exchange hashpartitioning(...)" inline
    return len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning)",
            physical_plan(df, "simple"),
        )
    )


def count_roundrobin(df: DataFrame) -> int:
    """Round-robin exchanges (repartition(n) / rebalance) in the plan.
    Tracked separately from :func:`count_shuffles`: a round-robin is
    sometimes deliberate (spread_for_compute widening a file-narrow
    scan) but an UNPLANNED one is a full rewrite of its input with no
    co-location benefit — the budget snapshot freezes the count so a
    crept-in repartition fails pytest like a lost broadcast does."""
    return len(
        re.findall(
            r"\bExchange (?:RoundRobinPartitioning|SinglePartition)",
            physical_plan(df, "simple"),
        )
    )


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """How many WholeStageCodegen regions the plan compiled — wider
    spans = fewer virtual calls; higher-order functions and python
    UDFs break spans."""
    return len(set(re.findall(r"codegen id : (\d+)", physical_plan(df))))


def rdd_leaf_partition_counts(df: DataFrame) -> list[int]:
    """Partition count of every LogicalRDD leaf in the analyzed plan.

    An eager ``localCheckpoint()`` collapses its subtree into a
    LogicalRDD — the widening round-robin that ran INSIDE the
    checkpoint job disappears from the plan text, but its effect
    survives as the checkpointed RDD's partition count. This reads
    that count (no job: ``getNumPartitions`` is metadata even for a
    lazy checkpoint), letting the spread-floor guard cover queries
    whose spread_for_compute is otherwise invisible to plan regexes.
    """
    counts: list[int] = []
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        n = stack.pop()
        if n.getClass().getSimpleName() == "LogicalRDD":
            counts.append(int(n.rdd().getNumPartitions()))
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return counts


_REDUCE_NODES = frozenset(
    {"Aggregate", "GlobalLimit", "Deduplicate", "Distinct", "LogicalRDD"}
)


def global_windows(df: DataFrame):
    """JVM logical-plan nodes of every global (unpartitioned) Window
    in the analyzed plan, outermost first."""
    out = []
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        n = stack.pop()
        if (
            n.getClass().getSimpleName() == "Window"
            and n.partitionSpec().isEmpty()
        ):
            out.append(n)
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


def global_window_input_counts(df: DataFrame) -> list[int]:
    """MEASURED input row count for every global (unpartitioned)
    Window in the analyzed plan — one count job per window child.

    This is the empirical complement to the shape gate
    (:func:`unreduced_global_windows`): the shape gate trusts that an
    Aggregate/LogicalRDD below the window reduces cardinality, but a
    localCheckpoint also pins DATA-SIZED frames as LogicalRDD (the
    per-doc gram-array checkpoints), so a corpus-sized global window
    over a checkpointed RDD passes the shape gate undetected. Counting
    the actual child rows at fixture scale closes that blind spot —
    tests/test_global_window_bounds.py freezes a per-query bound."""
    spark = df.sparkSession
    counts: list[int] = []
    for n in global_windows(df):
        child = n.children().apply(0)
        jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, child
        )
        counts.append(int(jdf.count()))
    return counts


def unreduced_global_windows(df: DataFrame) -> int:
    """Global (unpartitioned) Window nodes with NO cardinality-
    reducing node anywhere below them in the analyzed plan.

    A global window single-partitions its input, which is fine over
    an O(groups)-row frame produced by a prior reduce (Aggregate /
    GlobalLimit / Deduplicate / a checkpointed LogicalRDD) but a
    scale-killer over raw data-sized rows. The registry audit allows
    the second class only on an explicit, documented allowlist
    (tests/test_plan_budget.py) so a future edit can't silently move
    a global sort onto a raw frame.

    TWO KNOWN BLIND SPOTS in this shape check (r8 advice), both
    closed empirically by the MEASURED gate
    (tests/test_global_window_bounds.py, which counts each global
    window's actual input rows at fixture scale):
    1. any Aggregate below exempts — including one on a JOINED side
       that doesn't reduce the windowed branch (the r9 audit found
       layout_zorder_clustering sorting all of lineitem this way);
    2. LogicalRDD exempts — but localCheckpoint also pins DATA-SIZED
       frames as LogicalRDD, and worse, hides any window INSIDE the
       checkpointed subtree from this walk entirely."""
    count = 0
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        n = stack.pop()
        if (
            n.getClass().getSimpleName() == "Window"
            and n.partitionSpec().isEmpty()
        ):
            reduced = False
            inner = [n]
            while inner:
                k = inner.pop()
                if (
                    k is not n
                    and k.getClass().getSimpleName() in _REDUCE_NODES
                ):
                    reduced = True
                    break
                kch = k.children()
                for i in range(kch.size()):
                    inner.append(kch.apply(i))
            if not reduced:
                count += 1
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return count


def partitioned_window_stats(df: DataFrame) -> list[dict]:
    """MEASURED partition-group sizes for every PARTITIONED Window
    node in the analyzed plan (the partitioned complement of
    :func:`global_window_input_counts`).

    A partitioned window is only scale-safe if its partition key's
    cardinality grows with the data: ``PARTITION BY c_custkey`` over
    orders keeps groups small as N grows, but ``PARTITION BY
    l_returnflag`` over raw lineitem funnels N/3 rows into ONE sort
    task — at 100 TB that is a multi-TB single-task sort, the same
    killer the global-window eliminations (SCALING.md r9/r10) fixed
    for k=1. This helper rebuilds each window's child plan
    (``Dataset.ofRows``), groups it by the node's actual
    ``partitionSpec`` expressions, and returns per distinct node:
    ``{keys, rows, groups, max_group}``. Duplicate nodes (Catalyst
    splits multi-function windows into stacked Window nodes with the
    same spec) are deduped by (keys, child semanticHash).

    Sites whose spec expressions cannot be re-resolved on the bare
    child (ambiguous self-join names) are returned with ``rows=None``
    and an ``err`` so the audit reports them instead of hiding them.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    out: list[dict] = []
    seen: set = set()
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        n = stack.pop()
        if (
            n.getClass().getSimpleName() == "Window"
            and not n.partitionSpec().isEmpty()
        ):
            spec = n.partitionSpec()
            keys = tuple(spec.apply(i).sql() for i in range(spec.size()))
            child = n.children().apply(0)
            dedup = (keys, int(child.semanticHash()))
            if dedup not in seen:
                seen.add(dedup)
                rec: dict = {"keys": list(keys)}
                try:
                    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                        spark._jsparkSession, child
                    )
                    pdf = DataFrame(jdf, spark)
                    row = (
                        pdf.groupBy(*[F.expr(s) for s in keys])
                        .agg(F.count(F.lit(1)).alias("c"))
                        .agg(
                            F.sum("c").alias("n"),
                            F.count(F.lit(1)).alias("g"),
                            F.max("c").alias("mx"),
                        )
                        .collect()[0]
                    )
                    rec.update(
                        rows=int(row["n"] or 0),
                        groups=int(row["g"] or 0),
                        max_group=int(row["mx"] or 0),
                        err=None,
                    )
                except Exception as exc:  # noqa: BLE001
                    rec.update(
                        rows=None, groups=None, max_group=None,
                        err=f"{type(exc).__name__}: {exc}"[:200],
                    )
                out.append(rec)
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


def partial_window_group_limits(df: DataFrame) -> list[tuple[frozenset, int]]:
    """(partition-key-names, k) per PARTIAL WindowGroupLimit in the
    physical plan. A rank/row_number window followed by ``rk <= k``
    gets Spark's WindowGroupLimit pushdown: each MAP task pre-trims
    every group to its local top-k before the shuffle, so the final
    per-group sort sees at most k x n_map_tasks rows — a bounded
    partition key (l_returnflag, c_mktsegment) is scale-safe there
    even though the window's analyzed-plan input is data-sized. The
    window audit (tools/window_audit.py) uses this to separate
    'top-k over bounded key' (mitigated) from 'full ranking over
    bounded key' (the real single-task-sort hazard)."""
    text = physical_plan(df, "simple")
    out = []
    for m in re.finditer(
        r"WindowGroupLimit \[([^\]]*)\], \[[^\]]*\], \w+\([^)]*\), (\d+), Partial",
        text,
    ):
        keys = frozenset(
            re.sub(r"#\d+L?", "", c.strip()) for c in m.group(1).split(",")
        )
        out.append((keys, int(m.group(2))))
    return out


def partitioned_window_keys(df: DataFrame) -> list[tuple[tuple, bool]]:
    """STRUCTURAL walk (no jobs): (partition-key-sqls, reduce-below?)
    per partitioned Window node in the analyzed plan. ``reduce-below``
    is true when a cardinality-reducing node (_REDUCE_NODES or a
    grouped pandas map) appears under the window — the same
    approximation unreduced_global_windows uses for k=1, with the
    same documented blind spots; the MEASURED audit
    (tools/window_audit.py) is the per-round backstop that actually
    counts rows at two scales."""
    out: list[tuple[tuple, bool]] = []
    reduce_nodes = _REDUCE_NODES | {"FlatMapGroupsInPandas"}
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        n = stack.pop()
        if (
            n.getClass().getSimpleName() == "Window"
            and not n.partitionSpec().isEmpty()
        ):
            spec = n.partitionSpec()
            keys = tuple(spec.apply(i).sql() for i in range(spec.size()))
            reduced = False
            inner = [n.children().apply(0)]
            while inner:
                k = inner.pop()
                if k.getClass().getSimpleName() in reduce_nodes:
                    reduced = True
                    break
                kch = k.children()
                for i in range(kch.size()):
                    inner.append(kch.apply(i))
            out.append((keys, reduced))
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out
