"""Distributed global ordering primitives — rank / running sum
without a single-partition sort.

A global ``Window.orderBy(...)`` is the classic Spark scale-killer:
Catalyst plans it as ``Exchange SinglePartition`` + one sorted
partition, so one task sorts the entire input regardless of cluster
size. The reference has nothing like this (HiveToMysql.java:1-641
copies rows); these helpers exist because a dozen registry queries
(NTILE layouts, ROC/lift curves, KS statistics, sweep lines) need a
TOTAL order over data-sized frames, and the scalable form is always
the same two-level shape:

1. bucket rows by value range (``width_bucket`` over a broadcast
   min/max — ONE tiny aggregate, no sampling pass like
   ``repartitionByRange``);
2. rank / running-sum WITHIN each bucket (hash exchange on the
   bucket id — fully parallel, the only data-sized shuffle);
3. per-bucket totals — an O(buckets) aggregate that reuses the same
   shuffle keys — cumulated by a global window over O(buckets) rows
   and broadcast-joined back as offsets.

The only single-partition work is step 3's window over bucket
subtotals (hundreds of rows at any scale). Equal keys always land in
the same bucket (width_bucket is deterministic on the value), so
within-bucket tie-breakers complete a total order exactly as a
global sort would.

Skew note: value-range buckets inherit the key's distribution — an
exponential key concentrates ~ln(N)/n of all rows in the first
bucket, partially recreating the single-partition sort. For such
keys pass ``bucket_mode="quantile"``: boundaries come from
``approx_percentile`` (one extra tiny aggregate, still no data-sized
extra pass) and bucket occupancy is near-uniform regardless of the
key's distribution (``tests/test_ranks.py`` pins occupancy ≤ 2× the
mean on an exponential fixture). The registry's uniform-ish keys
(Morton codes, timestamps, scores) stay on the default range mode —
one aggregate instead of two.

NULL keys sort FIRST (bucket 0), exactly matching the ascending
``Window.orderBy`` default the primitives are pinned against.

DESCENDING order and the negation idiom — a NULLS trap (r11 review):
the primitives expose no desc option; call sites that need DESC pass
a NEGATED key (``-price``, ``-unix_micros(ts)``). On a NULL-free key
that is exactly ``F.desc`` — but ``F.desc`` is NULLS LAST while a
negated NULL stays NULL and lands in bucket 0, i.e. NULLS FIRST. So
on a NULLABLE key the negation idiom diverges from the window form
it replaces (and from an ANSI ``ORDER BY k DESC`` oracle). Before
copying the idiom onto a nullable key, either prove the column
non-null (all current call sites are non-null TPC-H columns) or
pre-map NULLs to an explicit sentinel that sorts where the window
form puts them (e.g. ``coalesce(-k, lit(inf))`` for NULLS LAST).

Adaptive dispatch (r12): every grouped primitive also carries the
plain ``Window.partitionBy(group).orderBy(...)`` form and can pick
between the two at runtime from a measured per-group bound —
``dispatch="auto"`` runs one partially-aggregated count
(:func:`max_group_rows`, or the caller passes a pre-measured
``max_group``) and uses the plain window when the largest group fits
one sort task — ``<= PLAIN_WINDOW_BOUND`` rows AND
``<= PLAIN_WINDOW_TASK_BYTES`` estimated bytes (rows x sampled
average row width, :func:`sampled_row_bytes`), so a wide-struct
input can't smuggle a memory-blowing group past a row-count bound —
else the two-level shape above. Both measurements are memoized per
(analyzed plan, keys) within the session, so repeated builds of the
same query pay each job once. Catalog-bounded group domains (brands over ``part``) stay on
the cheap plain plan at every scale; data-sized inputs flip to
two-level exactly when the hazard appears. The same result either
way (tests/test_grouped_ranks.py pins branch equivalence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BUCKET = "__rk_bucket"

# Largest per-group row count the plain Window.partitionBy form is
# allowed to sort in ONE task under dispatch="auto": ~2M rows is
# seconds of sort time and a few hundred MB of task memory at
# typical row widths — comfortably bounded — while the two-level
# shape's extra shuffle + offset join only pays for itself above
# it (measured: window_rank_ntile two-level costs +1.5 s at sf0.1
# and 4.4x at sf10 on a catalog-bounded key, SCALING.md r11/r12).
PLAIN_WINDOW_BOUND = 1 << 21

# The row bound alone is blind to row WIDTH (r12 verdict): 2M rows
# of a wide struct can exceed one sort task's memory even though the
# count passes. dispatch="auto" therefore also requires
# max_group x sampled-average-row-bytes <= this byte budget before
# it picks the plain window — 256 MiB is a comfortable in-task sort
# at the default executor sizing (well under a 1 GiB task's usable
# execution memory, spill-free for typical configs).
PLAIN_WINDOW_TASK_BYTES = 256 << 20

# Session-scoped memo for the measurement jobs below (r12 verdict:
# max_group_rows was an eager driver action at query-BUILD time, so
# repeated builds of the same query re-paid a full input scan).
# Keyed by (session id, analyzed-plan semanticHash, kind, keys):
# semanticHash is Catalyst's own plan-identity hash, so two builds
# of the same logical frame share the entry while any change to the
# plan (new filter, different source) misses. A hash collision could
# only swap the measurement of one frame for another's, which at
# worst flips the dispatch branch — and both branches are
# result-equivalent by the pinned tests, so correctness never
# depends on the memo. Bounded; cleared wholesale when full.
_MEMO_MAX = 256
_memo: dict[tuple, int] = {}

# test hook: number of actual Spark measurement jobs run (memo
# misses). tests/test_grouped_ranks.py counts this to pin "one job
# per (frame, keys), not one per query build".
_measurement_jobs = 0


def _plan_key(df: DataFrame, *extra) -> tuple | None:
    """Memo key for ``df`` within its session, or None when the
    plan-identity hash is unavailable (e.g. a connect-style session
    without ``_jdf``) — callers skip the memo on None."""
    try:
        h = int(df._jdf.queryExecution().analyzed().semanticHash())
        return (id(df.sparkSession), h, *extra)
    except Exception:  # pragma: no cover - classic sessions have _jdf
        return None


def _memo_put(key: tuple | None, val: int) -> int:
    if key is not None:
        if len(_memo) >= _MEMO_MAX:
            _memo.clear()
        _memo[key] = val
    return val


def max_group_rows(df: DataFrame, group_cols: list[str]) -> int:
    """Largest per-group row count — ONE job whose shuffle is the
    partially-aggregated O(groups) count frame (map-side combine
    reduces each task to one row per group before the exchange), so
    the measurement is a cheap scan even on data-sized inputs.
    Used by ``dispatch="auto"``; memoized per (analyzed plan, keys)
    within the session so repeated builds of the same query pay the
    job once. Callers sharing one grouping across several primitives
    can still pass the result as ``max_group`` to skip even the memo
    lookup (window_rank_ntile measures once for three)."""
    key = _plan_key(df, "mg", *group_cols)
    if key is not None and key in _memo:
        return _memo[key]
    global _measurement_jobs
    _measurement_jobs += 1
    row = (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n"))
        .first()
    )
    return _memo_put(key, int(row[0] or 0))


def _value_bytes(v) -> int:
    """Rough in-memory width of one collected value — only used to
    scale the byte budget, so order-of-magnitude fidelity is enough."""
    if v is None:
        return 1
    if isinstance(v, str):
        return 8 + len(v)
    if isinstance(v, (bytes, bytearray)):
        return 8 + len(v)
    if isinstance(v, (list, tuple)):
        return 8 + sum(_value_bytes(x) for x in v)
    if isinstance(v, dict):
        return 8 + sum(_value_bytes(k) + _value_bytes(x) for k, x in v.items())
    if hasattr(v, "__fields__"):  # Row
        return 8 + sum(_value_bytes(x) for x in v)
    return 8  # numerics / bool / date / timestamp / decimal


def sampled_row_bytes(df: DataFrame, sample_rows: int = 64) -> int:
    """Average row width in bytes from the frame's first
    ``sample_rows`` rows — ``limit(n).collect()`` reads only the
    head of the first non-empty partition, so this is a bounded
    driver action (<= 64 rows) even on a data-sized frame, and it is
    memoized per analyzed plan like :func:`max_group_rows`. An empty
    frame estimates 64 bytes (the dispatch question is then moot)."""
    key = _plan_key(df, "rb")
    if key is not None and key in _memo:
        return _memo[key]
    global _measurement_jobs
    _measurement_jobs += 1
    rows = df.limit(sample_rows).collect()
    if not rows:
        return _memo_put(key, 64)
    total = sum(_value_bytes(v) for r in rows for v in r)
    return _memo_put(key, max(8, total // len(rows)))


def _resolve_dispatch(
    df: DataFrame,
    group_cols: list[str],
    dispatch: str,
    max_group: int | None,
) -> str:
    """'auto' -> 'window' when the measured (or caller-provided)
    largest group fits one sort task by BOTH the row bound and the
    byte budget (rows x sampled average row width), else
    'two_level'."""
    if dispatch == "auto":
        mg = max_group if max_group is not None else max_group_rows(df, group_cols)
        if mg > PLAIN_WINDOW_BOUND:
            return "two_level"
        if mg * sampled_row_bytes(df) > PLAIN_WINDOW_TASK_BYTES:
            return "two_level"
        return "window"
    if dispatch not in ("window", "two_level"):
        raise ValueError(f"unknown dispatch {dispatch!r}")
    return dispatch


def with_value_buckets(
    df: DataFrame, key: str, n_buckets: int = 64, mode: str = "range"
) -> DataFrame:
    """Add an order-preserving bucket id over ``key``: NULL keys get
    bucket 0 (Spark's ascending NULLS FIRST), non-null keys 1..n.

    ``mode="range"`` (default): equal-width value-range buckets from
    one broadcast min/max aggregate; constant keys (hi == lo)
    collapse to bucket 1. ``mode="quantile"``: boundaries from one
    ``approx_percentile`` aggregate — near-uniform occupancy for
    skewed/heavy-tailed keys at the cost of the slightly heavier
    sketch. Both assign buckets from the VALUE alone, so equal keys
    always share a bucket and tie groups never split."""
    kd = F.col(key).cast("double")
    if mode == "quantile":
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = df.agg(
            F.percentile_approx(
                kd, F.array(*[F.lit(p) for p in probs]), F.lit(10000)
            ).alias("__qs")
        )
        b = df.crossJoin(F.broadcast(bounds))
        # count of boundaries strictly below the value — a pure
        # function of the value, deterministic across rows
        bucket = F.aggregate(
            F.col("__qs"),
            F.lit(1),
            lambda acc, q: acc + F.when(q < kd, 1).otherwise(0),
        )
        bucket = F.when(F.col(key).isNull(), F.lit(0)).otherwise(
            F.coalesce(bucket, F.lit(1))  # all-null sketch (no rows)
        )
        return b.withColumn(BUCKET, bucket).drop("__qs")
    if mode != "range":
        raise ValueError(f"unknown bucket mode {mode!r}")
    bounds = df.agg(
        F.min(key).cast("double").alias("__lo"),
        F.max(key).cast("double").alias("__hi"),
    )
    b = df.crossJoin(F.broadcast(bounds))
    bucket = F.when(F.col(key).isNull(), F.lit(0)).otherwise(
        F.when(F.col("__hi") <= F.col("__lo"), F.lit(1)).otherwise(
            F.least(
                F.lit(n_buckets),
                F.width_bucket(kd, F.col("__lo"), F.col("__hi"), F.lit(n_buckets)),
            )
        )
    )
    return b.withColumn(BUCKET, bucket).drop("__lo", "__hi")


def _bucket_offsets(
    bucketed: DataFrame, agg: Column, out: str
) -> DataFrame:
    """Exclusive per-bucket prefix totals — O(buckets) rows, cumulated
    by a global window over that reduced frame (the safe class).
    NULL when no preceding bucket has a non-null total (the strictly
    empty prefix), exactly as an exclusive SUM window frame — callers
    combine with NULL-aware addition to keep window semantics for
    nullable values."""
    totals = bucketed.groupBy(BUCKET).agg(agg.alias("__tot"))
    w = Window.orderBy(BUCKET).rowsBetween(Window.unboundedPreceding, -1)
    return totals.select(BUCKET, F.sum("__tot").over(w).alias(out))


def _null_aware_add(a: Column, b: Column) -> Column:
    """a + b where NULL means 'no values yet', not unknown: NULL only
    when BOTH sides are NULL — SUM-over-window accumulation."""
    return F.when(
        a.isNull() & b.isNull(), F.lit(None)
    ).otherwise(F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)))


def global_row_number(
    df: DataFrame,
    key: str,
    tiebreaks: list[str] | None = None,
    out: str = "r",
    n_buckets: int = 64,
    bucket_mode: str = "range",
) -> DataFrame:
    """Global 1-based ROW_NUMBER ordered by (key, *tiebreaks) in the
    two-level shape. With tiebreaks completing a total order the
    result is exactly a global-sort row_number; with ties left
    unbroken the multiset of (key, r) pairs is still deterministic
    (only the assignment within a tie group floats), which is enough
    for rank statistics evaluated per key value (KS, ROC)."""
    tiebreaks = tiebreaks or []
    bucketed = with_value_buckets(df, key, n_buckets, mode=bucket_mode)
    local = F.row_number().over(
        Window.partitionBy(BUCKET).orderBy(key, *tiebreaks)
    )
    offsets = _bucket_offsets(bucketed, F.count(F.lit(1)), "__off")
    return (
        bucketed.withColumn("__lr", local)
        .join(F.broadcast(offsets), BUCKET)
        .withColumn(
            out,
            (F.coalesce("__off", F.lit(0)) + F.col("__lr")).cast("long"),
        )
        .drop(BUCKET, "__lr", "__off")
    )


def global_running_sum(
    df: DataFrame,
    key: str,
    value: str,
    tiebreaks: list[str] | None = None,
    out: str = "cum",
    n_buckets: int = 64,
    bucket_mode: str = "range",
) -> DataFrame:
    """Global running SUM(value) ordered by (key, *tiebreaks) — the
    distributed sweep-line / prefix-sum primitive."""
    tiebreaks = tiebreaks or []
    bucketed = with_value_buckets(df, key, n_buckets, mode=bucket_mode)
    local = F.sum(value).over(
        Window.partitionBy(BUCKET)
        .orderBy(key, *tiebreaks)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = _bucket_offsets(bucketed, F.sum(value), "__off")
    return (
        bucketed.withColumn("__ls", local)
        .join(F.broadcast(offsets), BUCKET)
        .withColumn(out, _null_aware_add(F.col("__off"), F.col("__ls")))
        .drop(BUCKET, "__ls", "__off")
    )


def global_lag(
    df: DataFrame,
    key: str,
    tiebreaks: list[str] | None = None,
    value: str | None = None,
    out: str = "prev",
    n_buckets: int = 64,
    bucket_mode: str = "range",
) -> DataFrame:
    """LAG(value) over the global (key, *tiebreaks) order in the
    two-level shape: within-bucket lag (hash exchange on the bucket
    id) plus a boundary exchange — each bucket's LAST value, an
    O(buckets) aggregate, shifted one bucket and joined back to fill
    each bucket's first row. Equal keys always share a bucket, so
    the boundary hand-off never splits a tie group. The very first
    row's lag is NULL, exactly as the window form.

    NULL values propagate exactly (advice r9): the boundary value
    rides in a one-field struct (so a bucket whose last value is NULL
    hands off NULL, where a bare ``max_by`` would skip it), and only
    the true FIRST row of each bucket takes the hand-off — a NULL
    within-bucket lag on any later row means the predecessor's value
    really was NULL and stays NULL."""
    tiebreaks = tiebreaks or []
    value = value or key
    bucketed = with_value_buckets(df, key, n_buckets, mode=bucket_mode)
    w = Window.partitionBy(BUCKET).orderBy(key, *tiebreaks)
    lasts = bucketed.groupBy(BUCKET).agg(
        F.max_by(
            F.struct(F.col(value).alias("v")), F.struct(key, *tiebreaks)
        ).alias("__last")
    )
    prev = lasts.select(
        BUCKET,
        F.lag("__last").over(Window.orderBy(BUCKET)).alias("__prev"),
    )
    return (
        bucketed.withColumn("__ll", F.lag(value).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(prev), BUCKET)
        .withColumn(
            out,
            F.when(F.col("__rn") == 1, F.col("__prev.v")).otherwise(
                F.col("__ll")
            ),
        )
        .drop(BUCKET, "__ll", "__rn", "__prev")
    )


def global_running_max_exclusive(
    df: DataFrame,
    key: str,
    tiebreaks: list[str] | None = None,
    value: str | None = None,
    out: str = "seen_max",
    n_buckets: int = 64,
    bucket_mode: str = "range",
) -> DataFrame:
    """MAX(value) over all STRICTLY EARLIER rows in the global
    (key, *tiebreaks) order — the running high-water-mark /
    forward-carry primitive (NULL values are ignored by MAX, so a
    conditional value column gives LAST_VALUE ... IGNORE NULLS
    semantics whenever the carried value is monotone in the order,
    e.g. carrying the last error TIMESTAMP through a time-ordered
    stream). Two-level: within-bucket running max (hash exchange) +
    each earlier bucket's max (O(buckets) frame) joined back; the
    global first row gets NULL, exactly as the window form."""
    tiebreaks = tiebreaks or []
    value = value or key
    bucketed = with_value_buckets(df, key, n_buckets, mode=bucket_mode)
    local = F.max(value).over(
        Window.partitionBy(BUCKET)
        .orderBy(key, *tiebreaks)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bmax = bucketed.groupBy(BUCKET).agg(F.max(value).alias("__bm"))
    prev = bmax.select(
        BUCKET,
        F.max("__bm")
        .over(
            Window.orderBy(BUCKET).rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        .alias("__pm"),
    )
    return (
        bucketed.withColumn("__lm", local)
        .join(F.broadcast(prev), BUCKET)
        .withColumn(out, F.greatest("__lm", "__pm"))
        .drop(BUCKET, "__lm", "__pm")
    )


def fractional_rank_map(
    df: DataFrame,
    col: str,
    out: str = "frank",
    n_buckets: int = 64,
    bucket_mode: str = "range",
) -> DataFrame:
    """O(distinct)-row map value -> tie-averaged (fractional) global
    rank: for a value with ``cnt`` occurrences and ``before`` rows
    strictly smaller, the average of the positions it occupies is
    before + (cnt+1)/2 — exactly RANK() + (COUNT() OVER value - 1)/2.
    Computed as a groupBy + a distributed prefix sum over the
    distinct-value frame (which for near-unique keys is itself
    data-sized — hence the bucketed form, not a global window), then
    joined back by the caller. Small maps broadcast automatically."""
    vc = df.groupBy(col).agg(F.count(F.lit(1)).alias("__cnt"))
    cum = global_running_sum(
        vc, col, "__cnt", out="__cum", n_buckets=n_buckets, bucket_mode=bucket_mode
    )
    return cum.select(
        col,
        (
            F.col("__cum") - F.col("__cnt") + (F.col("__cnt") + 1) / 2.0
        ).alias(out),
    )


def global_order_stats(
    df: DataFrame,
    key: str,
    tiebreaks: list[str] | None = None,
    sum_col: str | None = None,
    rank_out: str = "r",
    sum_out: str = "cum",
    n_buckets: int = 64,
    bucket_mode: str = "range",
) -> DataFrame:
    """Fused global ROW_NUMBER + running SUM(sum_col) over one
    (key, *tiebreaks) order — one bucketing, one within-bucket window
    pass, one O(buckets) offsets frame carrying both the count and
    the sum prefix. Use instead of chaining global_row_number over
    global_running_sum, which would re-bucket (and re-evaluate the
    input lineage) twice."""
    tiebreaks = tiebreaks or []
    bucketed = with_value_buckets(df, key, n_buckets, mode=bucket_mode)
    w = Window.partitionBy(BUCKET).orderBy(key, *tiebreaks)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = bucketed.withColumn("__lr", F.row_number().over(w))
    if sum_col is not None:
        local = local.withColumn("__ls", F.sum(sum_col).over(wsum))
    aggs = [F.count(F.lit(1)).alias("__tc")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("__ts"))
    totals = bucketed.groupBy(BUCKET).agg(*aggs)
    wb = Window.orderBy(BUCKET).rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [BUCKET, F.sum("__tc").over(wb).alias("__oc")]
    if sum_col is not None:
        off_cols.append(F.sum("__ts").over(wb).alias("__os"))
    offsets = totals.select(*off_cols)
    out = local.join(F.broadcast(offsets), BUCKET).withColumn(
        rank_out,
        (F.coalesce("__oc", F.lit(0)) + F.col("__lr")).cast("long"),
    )
    drop = [BUCKET, "__lr", "__oc"]
    if sum_col is not None:
        out = out.withColumn(
            sum_out, _null_aware_add(F.col("__os"), F.col("__ls"))
        )
        drop += ["__ls", "__os"]
    return out.drop(*drop)


def global_ntile(
    df: DataFrame,
    n: int,
    key: str,
    tiebreaks: list[str] | None = None,
    out: str = "bucket",
    n_buckets: int = 64,
    bucket_mode: str = "range",
) -> DataFrame:
    """Global NTILE(n) ordered by (key, *tiebreaks) from the
    distributed row_number: with N total rows, base = N div n and
    rem = N mod n, the first rem tiles hold base+1 rows — identical
    to the SQL NTILE definition, with no single-partition sort."""
    ranked = global_row_number(
        df, key, tiebreaks, out="__r", n_buckets=n_buckets, bucket_mode=bucket_mode
    )
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    j = ranked.crossJoin(F.broadcast(total))
    base = (F.col("__n") / n).cast("long")
    rem = F.col("__n") % n
    first_span = rem * (base + 1)
    tile = F.when(
        F.col("__r") <= first_span,
        ((F.col("__r") - 1) / (base + 1)).cast("long") + 1,
    ).otherwise(
        rem + ((F.col("__r") - first_span - 1) / base).cast("long") + 1
    )
    return j.withColumn(out, tile.cast("int")).drop("__r", "__n")


def _join_back(
    data: DataFrame,
    small: DataFrame,
    group_cols: list[str],
    extra_cols: list[str],
) -> DataFrame:
    """Join an O(groups)/O(groups x buckets) side frame (offsets,
    boundary hand-offs, sizes) back onto the data with NULL-SAFE
    equality on the group columns: ``Window.partitionBy`` treats a
    NULL group value as a regular partition, and the plain name-list
    equi-join the primitives first shipped with silently DROPPED
    those rows (r11 review). ``extra_cols`` (the bucket id — never
    NULL by construction) join with plain equality; EqualNullSafe is
    a first-class equi-join key, so broadcast/hash strategies are
    unaffected."""
    sm = small
    for c in [*group_cols, *extra_cols]:
        sm = sm.withColumnRenamed(c, f"__jb_{c}")
    cond = None
    for c in group_cols:
        e = data[c].eqNullSafe(sm[f"__jb_{c}"])
        cond = e if cond is None else cond & e
    for c in extra_cols:
        e = data[c] == sm[f"__jb_{c}"]
        cond = e if cond is None else cond & e
    return data.join(sm, cond).drop(
        *[f"__jb_{c}" for c in [*group_cols, *extra_cols]]
    )


# Public name for query-level domain-reduction join-backs (r12): a
# query that aggregates per group and joins the per-group answer
# back onto the scan replaces a Window.partitionBy — which treats a
# NULL group as a regular partition — so the join must be null-safe
# too or NULL-group rows silently vanish (the same r11 finding the
# primitives' _join_back fixed). Current TPC-H call sites are
# non-null; routing them through this keeps the equivalence a
# property of the idiom, not of the data.
join_back = _join_back


def grouped_min_rank(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    out: str = "grank",
    n_buckets: int = 64,
    bucket_mode: str = "range",
    dispatch: str = "two_level",
    max_group: int | None = None,
) -> DataFrame:
    """Per-group RANK() (min-rank, ties share the smallest position)
    over ``key`` WITHIN each group, without a per-group
    single-partition sort — the grouped member of the two-level
    family above, for the low-cardinality-group case where
    ``Window.partitionBy(group).orderBy(key)`` would put O(data/k)
    rows into each of k sorted tasks (the same shape the r11
    pandas-batch audit measured as one 20k-rows-and-growing pandas
    frame per group in grouped-map applyInPandas).

    Bucket boundaries are GLOBAL (one tiny aggregate, shared by all
    groups): bucket id is monotone in the value, so within any group
    min-rank = (group's rows in earlier buckets) + within-(group,
    bucket) RANK(). Equal keys share a bucket (width_bucket /
    boundary-count are pure functions of the value), so tie groups
    never split across buckets and the offset+local decomposition is
    exact. The only data-sized shuffle is the hash exchange on
    (group, bucket) — parallelism k x n_buckets instead of k; the
    offsets frame is O(k x n_buckets) rows, unhinted (AQE broadcasts
    it at runtime while it is small; the r10 broadcast-audit rule).

    NULL keys land in bucket 0 and rank FIRST within their group,
    matching the ascending ``Window.orderBy`` default."""
    group_cols = list(group_cols)
    if _resolve_dispatch(df, group_cols, dispatch, max_group) == "window":
        return df.withColumn(
            out,
            F.rank()
            .over(Window.partitionBy(*group_cols).orderBy(key))
            .cast("long"),
        )
    bucketed = with_value_buckets(df, key, n_buckets, mode=bucket_mode)
    w = Window.partitionBy(*group_cols, BUCKET).orderBy(key)
    local = bucketed.withColumn("__lr", F.rank().over(w))
    totals = bucketed.groupBy(*group_cols, BUCKET).agg(
        F.count(F.lit(1)).alias("__tc")
    )
    wb = (
        Window.partitionBy(*group_cols)
        .orderBy(BUCKET)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *group_cols, BUCKET, F.sum("__tc").over(wb).alias("__oc")
    )
    out_df = _join_back(local, offsets, group_cols, [BUCKET]).withColumn(
        out,
        (F.coalesce("__oc", F.lit(0)) + F.col("__lr")).cast("long"),
    )
    return out_df.drop(BUCKET, "__lr", "__oc")


def grouped_row_number(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    tiebreaks: list[str] | None = None,
    out: str = "r",
    n_buckets: int = 64,
    bucket_mode: str = "range",
    with_group_size: str | None = None,
    dispatch: str = "two_level",
    max_group: int | None = None,
) -> DataFrame:
    """Per-group ROW_NUMBER() over (key, *tiebreaks) without a
    per-group single-partition sort — ``Window.partitionBy(group)
    .orderBy(key)`` sorts O(data/k) rows in ONE task per group when
    the group key is bounded (the r11 window audit's hazard
    signature). Same decomposition as :func:`grouped_min_rank` with a
    count offset instead of a rank offset; with tiebreaks completing
    a total order the result is exactly the window form's.
    ``with_group_size`` additionally emits each group's row count
    under that name, derived from the ALREADY-COMPUTED per-(group,
    bucket) totals (an O(groups x buckets) -> O(groups) aggregate) —
    use it instead of a second full-input groupBy when percent_rank
    / cume_dist / NTILE arithmetic needs n."""
    group_cols = list(group_cols)
    tiebreaks = tiebreaks or []
    if _resolve_dispatch(df, group_cols, dispatch, max_group) == "window":
        out_df = df.withColumn(
            out,
            F.row_number()
            .over(Window.partitionBy(*group_cols).orderBy(key, *tiebreaks))
            .cast("long"),
        )
        if with_group_size is not None:
            out_df = out_df.withColumn(
                with_group_size,
                F.count(F.lit(1)).over(Window.partitionBy(*group_cols)),
            )
        return out_df
    bucketed = with_value_buckets(df, key, n_buckets, mode=bucket_mode)
    w = Window.partitionBy(*group_cols, BUCKET).orderBy(key, *tiebreaks)
    local = bucketed.withColumn("__lr", F.row_number().over(w))
    totals = bucketed.groupBy(*group_cols, BUCKET).agg(
        F.count(F.lit(1)).alias("__tc")
    )
    wb = (
        Window.partitionBy(*group_cols)
        .orderBy(BUCKET)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *group_cols, BUCKET, F.sum("__tc").over(wb).alias("__oc")
    )
    out_df = (
        _join_back(local, offsets, group_cols, [BUCKET])
        .withColumn(
            out,
            (F.coalesce("__oc", F.lit(0)) + F.col("__lr")).cast("long"),
        )
        .drop(BUCKET, "__lr", "__oc")
    )
    if with_group_size is not None:
        sizes = totals.groupBy(*group_cols).agg(
            F.sum("__tc").alias(with_group_size)
        )
        out_df = _join_back(out_df, sizes, group_cols, [])
    return out_df


def grouped_dense_rank(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    out: str = "drank",
    n_buckets: int = 64,
    bucket_mode: str = "range",
    dispatch: str = "two_level",
    max_group: int | None = None,
) -> DataFrame:
    """Per-group DENSE_RANK() over ``key`` in the two-level shape:
    within-(group, bucket) dense_rank plus an offset of DISTINCT key
    values in the group's earlier buckets. Equal keys never split
    across buckets (width_bucket is a pure function of the value), so
    distinct counts add exactly. The distinct count uses
    ``COUNT(DISTINCT struct(key))`` so a NULL key group (bucket 0,
    where all NULLs tie at dense rank 1, Spark's NULLS FIRST) still
    consumes exactly one dense rank for downstream buckets — a bare
    ``COUNT(DISTINCT key)`` would skip it."""
    group_cols = list(group_cols)
    if _resolve_dispatch(df, group_cols, dispatch, max_group) == "window":
        return df.withColumn(
            out,
            F.dense_rank()
            .over(Window.partitionBy(*group_cols).orderBy(key))
            .cast("long"),
        )
    bucketed = with_value_buckets(df, key, n_buckets, mode=bucket_mode)
    w = Window.partitionBy(*group_cols, BUCKET).orderBy(key)
    local = bucketed.withColumn("__ld", F.dense_rank().over(w))
    totals = bucketed.groupBy(*group_cols, BUCKET).agg(
        F.countDistinct(F.struct(key)).alias("__td")
    )
    wb = (
        Window.partitionBy(*group_cols)
        .orderBy(BUCKET)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *group_cols, BUCKET, F.sum("__td").over(wb).alias("__od")
    )
    return (
        _join_back(local, offsets, group_cols, [BUCKET])
        .withColumn(
            out,
            (F.coalesce("__od", F.lit(0)) + F.col("__ld")).cast("long"),
        )
        .drop(BUCKET, "__ld", "__od")
    )


def grouped_ntile(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    key: str,
    tiebreaks: list[str] | None = None,
    out: str = "tile",
    n_buckets: int = 64,
    bucket_mode: str = "range",
    dispatch: str = "two_level",
    max_group: int | None = None,
) -> DataFrame:
    """Per-group NTILE(n) over (key, *tiebreaks) from the distributed
    grouped row_number: with N rows in the group, base = N div n and
    rem = N mod n, the first rem tiles hold base+1 rows — the SQL
    NTILE definition, with no per-group single-partition sort. The
    per-group totals frame is O(groups) rows, unhinted (AQE
    broadcasts it while small — the r10 broadcast-audit rule)."""
    group_cols = list(group_cols)
    if _resolve_dispatch(df, group_cols, dispatch, max_group) == "window":
        return df.withColumn(
            out,
            F.ntile(n).over(
                Window.partitionBy(*group_cols).orderBy(key, *(tiebreaks or []))
            ),
        )
    j = grouped_row_number(
        df, group_cols, key, tiebreaks, out="__r",
        n_buckets=n_buckets, bucket_mode=bucket_mode,
        with_group_size="__n",
    )
    base = (F.col("__n") / n).cast("long")
    rem = F.col("__n") % n
    first_span = rem * (base + 1)
    tile = F.when(
        F.col("__r") <= first_span,
        ((F.col("__r") - 1) / (base + 1)).cast("long") + 1,
    ).otherwise(
        rem + ((F.col("__r") - first_span - 1) / base).cast("long") + 1
    )
    return j.withColumn(out, tile.cast("int")).drop("__r", "__n")


def grouped_running_max_exclusive(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    tiebreaks: list[str] | None = None,
    value: str | None = None,
    out: str = "seen_max",
    n_buckets: int = 64,
    bucket_mode: str = "range",
    dispatch: str = "two_level",
    max_group: int | None = None,
) -> DataFrame:
    """Per-group MAX(value) over all STRICTLY EARLIER rows in the
    group's (key, *tiebreaks) order — the grouped running
    high-water-mark (sweep lines, Pareto frontiers, drawdowns over a
    handful of classes). Two-level: within-(group, bucket) exclusive
    running max + each earlier bucket's per-group max, prefix-maxed
    over the O(groups x buckets) totals frame and joined back. The
    group's first row gets NULL, exactly as the window form."""
    group_cols = list(group_cols)
    tiebreaks = tiebreaks or []
    value = value or key
    if _resolve_dispatch(df, group_cols, dispatch, max_group) == "window":
        return df.withColumn(
            out,
            F.max(value).over(
                Window.partitionBy(*group_cols)
                .orderBy(key, *tiebreaks)
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
    bucketed = with_value_buckets(df, key, n_buckets, mode=bucket_mode)
    local = F.max(value).over(
        Window.partitionBy(*group_cols, BUCKET)
        .orderBy(key, *tiebreaks)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bmax = bucketed.groupBy(*group_cols, BUCKET).agg(
        F.max(value).alias("__bm")
    )
    prev = bmax.select(
        *group_cols,
        BUCKET,
        F.max("__bm")
        .over(
            Window.partitionBy(*group_cols)
            .orderBy(BUCKET)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        .alias("__pm"),
    )
    return (
        _join_back(bucketed.withColumn("__lm", local), prev, group_cols, [BUCKET])
        .withColumn(out, F.greatest("__lm", "__pm"))
        .drop(BUCKET, "__lm", "__pm")
    )


def grouped_running_sums(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    tiebreaks: list[str] | None = None,
    sums: dict[str, str] | None = None,
    n_buckets: int = 64,
    bucket_mode: str = "range",
    dispatch: str = "two_level",
    max_group: int | None = None,
) -> DataFrame:
    """Per-group running SUM over (key, *tiebreaks) for one or more
    value columns in ONE bucketing pass (``sums`` maps output name ->
    value column) — the grouped member of the prefix-sum family, for
    cumulative-weight / dual-CDF shapes (weighted medians, KS tests)
    whose group key is bounded. Chaining grouped_running_sum twice
    would re-shuffle the data once per column; this fuses them."""
    group_cols = list(group_cols)
    tiebreaks = tiebreaks or []
    sums = dict(sums or {})
    if _resolve_dispatch(df, group_cols, dispatch, max_group) == "window":
        w = (
            Window.partitionBy(*group_cols)
            .orderBy(key, *tiebreaks)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out_df = df
        for o, col in sums.items():
            out_df = out_df.withColumn(o, F.sum(col).over(w))
        return out_df
    bucketed = with_value_buckets(df, key, n_buckets, mode=bucket_mode)
    w = (
        Window.partitionBy(*group_cols, BUCKET)
        .orderBy(key, *tiebreaks)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed
    for i, (_out, col) in enumerate(sums.items()):
        local = local.withColumn(f"__ls{i}", F.sum(col).over(w))
    totals = bucketed.groupBy(*group_cols, BUCKET).agg(
        *[F.sum(col).alias(f"__ts{i}") for i, col in enumerate(sums.values())]
    )
    wb = (
        Window.partitionBy(*group_cols)
        .orderBy(BUCKET)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *group_cols,
        BUCKET,
        *[
            F.sum(f"__ts{i}").over(wb).alias(f"__os{i}")
            for i in range(len(sums))
        ],
    )
    out_df = _join_back(local, offsets, group_cols, [BUCKET])
    drop = [BUCKET]
    for i, out in enumerate(sums):
        out_df = out_df.withColumn(
            out, _null_aware_add(F.col(f"__os{i}"), F.col(f"__ls{i}"))
        )
        drop += [f"__ls{i}", f"__os{i}"]
    return out_df.drop(*drop)


def grouped_lag(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    tiebreaks: list[str] | None = None,
    value: str | None = None,
    out: str = "prev",
    n_buckets: int = 64,
    bucket_mode: str = "range",
    dispatch: str = "two_level",
    max_group: int | None = None,
) -> DataFrame:
    """LAG(value) over each group's (key, *tiebreaks) order — the
    grouped twin of :func:`global_lag` (same boundary hand-off: each
    (group, bucket)'s LAST value rides a one-field struct to the
    group's next PRESENT bucket's first row, so NULL values propagate
    exactly and sparse buckets are skipped, lag over the per-group
    bucket frame being presence-ordered). Each group's first row gets
    NULL, exactly as the window form."""
    group_cols = list(group_cols)
    tiebreaks = tiebreaks or []
    value = value or key
    if _resolve_dispatch(df, group_cols, dispatch, max_group) == "window":
        return df.withColumn(
            out,
            F.lag(value).over(
                Window.partitionBy(*group_cols).orderBy(key, *tiebreaks)
            ),
        )
    bucketed = with_value_buckets(df, key, n_buckets, mode=bucket_mode)
    w = Window.partitionBy(*group_cols, BUCKET).orderBy(key, *tiebreaks)
    lasts = bucketed.groupBy(*group_cols, BUCKET).agg(
        F.max_by(
            F.struct(F.col(value).alias("v")), F.struct(key, *tiebreaks)
        ).alias("__last")
    )
    prev = lasts.select(
        *group_cols,
        BUCKET,
        F.lag("__last")
        .over(Window.partitionBy(*group_cols).orderBy(BUCKET))
        .alias("__prev"),
    )
    return (
        _join_back(
            bucketed.withColumn("__ll", F.lag(value).over(w))
            .withColumn("__rn", F.row_number().over(w)),
            prev,
            group_cols,
            [BUCKET],
        )
        .withColumn(
            out,
            F.when(F.col("__rn") == 1, F.col("__prev.v")).otherwise(
                F.col("__ll")
            ),
        )
        .drop(BUCKET, "__ll", "__rn", "__prev")
    )


def grouped_lead(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    tiebreaks: list[str] | None = None,
    value: str | None = None,
    out: str = "next",
    n_buckets: int = 64,
    bucket_mode: str = "range",
    dispatch: str = "two_level",
    max_group: int | None = None,
) -> DataFrame:
    """LEAD(value) over each group's (key, *tiebreaks) order — mirror
    of :func:`grouped_lag`: each (group, bucket)'s FIRST value is
    handed BACK to the group's previous present bucket's last row
    (``lead`` over the per-group bucket frame). Each group's last row
    gets NULL, exactly as the window form."""
    group_cols = list(group_cols)
    tiebreaks = tiebreaks or []
    value = value or key
    if _resolve_dispatch(df, group_cols, dispatch, max_group) == "window":
        return df.withColumn(
            out,
            F.lead(value).over(
                Window.partitionBy(*group_cols).orderBy(key, *tiebreaks)
            ),
        )
    bucketed = with_value_buckets(df, key, n_buckets, mode=bucket_mode)
    w = Window.partitionBy(*group_cols, BUCKET).orderBy(key, *tiebreaks)
    firsts = bucketed.groupBy(*group_cols, BUCKET).agg(
        F.min_by(
            F.struct(F.col(value).alias("v")), F.struct(key, *tiebreaks)
        ).alias("__first")
    )
    nxt = firsts.select(
        *group_cols,
        BUCKET,
        F.lead("__first")
        .over(Window.partitionBy(*group_cols).orderBy(BUCKET))
        .alias("__next"),
    )
    led = (
        bucketed.withColumn("__lv", F.lead(value).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "__sz",
            F.count(F.lit(1)).over(
                Window.partitionBy(*group_cols, BUCKET)
            ),
        )
    )
    return (
        _join_back(led, nxt, group_cols, [BUCKET])
        .withColumn(
            out,
            F.when(
                F.col("__rn") == F.col("__sz"), F.col("__next.v")
            ).otherwise(F.col("__lv")),
        )
        .drop(BUCKET, "__lv", "__rn", "__sz", "__next")
    )
