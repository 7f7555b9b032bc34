"""Deduplication operators for training-data pipelines.

Four tiers, in increasing fuzziness (all absent from the reference —
SURVEY.md §2.2 "LLM-data-pipeline ops"):

* :func:`exact_dedup_groups` — content-hash exact dedup. One hash
  shuffle on the digest; at 100 TB, dedup by digest ships 32-byte
  keys, never document bodies.
* :func:`ngram_jaccard_pairs` — exact n-gram-shingle Jaccard via an
  inverted-index self-join (explode shingles → join on shingle →
  count). Exact but quadratic in the worst case; used as the oracle/
  ground truth for the approximate tiers at test scale.
* :func:`minhash_lsh_pairs` — MinHash signatures + banded LSH. The
  100 TB path: cost is O(N · H) for signatures plus a join that only
  collides near-duplicates. Recall is tunable via (bands, rows).
* :func:`simhash` — 64-bit SimHash fingerprints; near-dups differ in
  a few bits (hamming distance via xor+bit_count).

Everything is built-in expressions (hash / transform / aggregate /
explode) — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hivetomysql_spark.operators.parallelism import spread_for_compute
from pyspark.sql.window import Window


def _tokens(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(F.lower(c)), r"\s+")


def _shingles(text_col: str | Column, n: int) -> Column:
    """Distinct word n-gram shingles of the text (array<string>).

    Documents shorter than ``n`` tokens contribute their whole text
    as a single shingle.
    """
    w = _tokens(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, n)))
    return F.array_distinct(grams)


def exact_dedup_groups(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """Group exact duplicates by content digest.

    Returns one row per distinct content: ``(content_hash, keep_id,
    n_copies)`` with the smallest id as the deterministic survivor.
    ``dropDuplicates`` would pick an arbitrary survivor — min-id makes
    re-runs (and oracle comparison) stable.
    """
    return (
        df.select(F.md5(F.col(content_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_posting_len: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Inverted index as posting lists: explode distinct shingles,
    groupBy shingle into a (doc, size) posting list, emit ordered
    pairs within each list, count pair occurrences (= |A∩B|), then
    ``|A∩B| / (|A|+|B|-|A∩B|)``. Returns ``(id_a, id_b, jaccard)``
    with ``id_a < id_b``.

    Plan-shape notes (each was measured, see git history):

    * the shingle array is materialized in its own projection — an
      inlined expression is recomputed per exploded row (380 s → 16 s
      at sf0.1);
    * ``explode_outer`` instead of ``explode`` — plain explode plants
      a ``size(arr) > 0`` pushed-down filter that re-evaluates the
      whole array expression per row (our arrays are never empty);
    * posting lists instead of a shingle self-join — shingles are
      computed once, not once per join side.

    Scale: exact, but a hot shingle (boilerplate) makes its posting
    list quadratic — ``max_posting_len`` drops shingles shared by
    more than that many documents (the stop-shingle filter: a
    shingle in 10k docs is boilerplate, not signal, and would emit
    ~10k²/2 pairs). With the cap the result is a documented
    under-approximation: a pair's intersection count loses only its
    boilerplate shingles, mirroring what C4/Gopher near-dup pipelines
    ship. ``None`` (default) keeps the operator exact — the oracle
    checks that path; the capped path is tested for containment in
    tests/test_llm_ops.py.
    """
    sh = spread_for_compute(df).select(
        F.col(id_col).alias("doc"), _shingles(text_col, n).alias("sh")
    ).select(
        "doc",
        F.size("sh").alias("n_sh"),
        F.explode_outer("sh").alias("shingle"),
    )
    # shuffle 8-byte xxhash64 keys, not shingle strings — measured
    # 2.5× on the whole pipeline at sf0.1. A hash collision would
    # merge two shingles corpus-wide (P ≈ d²/2⁶⁵ for d distinct
    # shingles — negligible even at 100 TB, and it perturbs one
    # intersection count by 1, not a pair's existence).
    sh = sh.select("doc", "n_sh", F.xxhash64("shingle").alias("shingle"))
    posting = (
        sh.groupBy("shingle")
        .agg(F.collect_list(F.struct("doc", "n_sh")).alias("lst"))
        .where(F.size("lst") > 1)
    )
    if max_posting_len is not None:
        posting = posting.where(F.size("lst") <= max_posting_len)
    pairs = posting.select(
        F.explode_outer(
            F.flatten(
                F.transform(
                    "lst",
                    lambda x: F.filter(
                        F.transform(
                            "lst", lambda y: F.struct(x.alias("a"), y.alias("b"))
                        ),
                        lambda p: p["a"]["doc"] < p["b"]["doc"],
                    ),
                )
            )
        ).alias("p")
    )
    inter = pairs.groupBy(
        F.col("p.a.doc").alias("id_a"),
        F.col("p.b.doc").alias("id_b"),
        F.col("p.a.n_sh").alias("na"),
        F.col("p.b.n_sh").alias("nb"),
    ).agg(F.count(F.lit(1)).alias("inter"))
    jaccard = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.where(jaccard >= threshold)
        .select("id_a", "id_b", F.round(jaccard, 4).alias("jaccard"))
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Asymmetric n-gram containment: ``C(A→B) = |A∩B| / |A|``.

    Jaccard under-scores a short document quoted inside a long one
    (the union is dominated by the long side); containment is the
    sub-document-duplication signal production pipelines (RefinedWeb,
    Dolma) use to catch exactly that. Same inverted-index posting-list
    plan as :func:`ngram_jaccard_pairs` — one explode, one groupBy on
    an 8-byte shingle hash, pair emission inside the posting list —
    so the added operator costs no new shuffle shape. Returns
    unordered pairs ``(id_a < id_b)`` with BOTH directions'
    containment; a pair survives if either direction ≥ ``threshold``.
    """
    sh = spread_for_compute(df).select(
        F.col(id_col).alias("doc"), _shingles(text_col, n).alias("sh")
    ).select(
        "doc",
        F.size("sh").alias("n_sh"),
        F.explode_outer("sh").alias("shingle"),
    )
    sh = sh.select("doc", "n_sh", F.xxhash64("shingle").alias("shingle"))
    posting = (
        sh.groupBy("shingle")
        .agg(F.collect_list(F.struct("doc", "n_sh")).alias("lst"))
        .where(F.size("lst") > 1)
    )
    pairs = posting.select(
        F.explode_outer(
            F.flatten(
                F.transform(
                    "lst",
                    lambda x: F.filter(
                        F.transform(
                            "lst", lambda y: F.struct(x.alias("a"), y.alias("b"))
                        ),
                        lambda p: p["a"]["doc"] < p["b"]["doc"],
                    ),
                )
            )
        ).alias("p")
    )
    inter = pairs.groupBy(
        F.col("p.a.doc").alias("id_a"),
        F.col("p.b.doc").alias("id_b"),
        F.col("p.a.n_sh").alias("na"),
        F.col("p.b.n_sh").alias("nb"),
    ).agg(F.count(F.lit(1)).alias("inter"))
    c_ab = F.col("inter") / F.col("na")
    c_ba = F.col("inter") / F.col("nb")
    return (
        inter.where(F.greatest(c_ab, c_ba) >= threshold)
        .select(
            "id_a",
            "id_b",
            F.round(c_ab, 4).alias("contain_a_in_b"),
            F.round(c_ba, 4).alias("contain_b_in_a"),
        )
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    driver_edge_bound: int | None = None,
) -> DataFrame:
    """Connected components over a near-dup pair graph by min-label
    propagation: every node repeatedly adopts the smallest label among
    itself and its neighbors until fixpoint. Returns
    ``(doc_id, cluster_id)`` with ``cluster_id`` = the component's
    minimum doc id — the survivor the cluster keeps in a dedup pass.

    Scale shape: each round is one equi-join + one groupBy-min (both
    shuffle on the node id, so successive rounds reuse the same hash
    partitioning), and the round count is the graph DIAMETER — near-dup
    graphs are overwhelmingly tiny cliques/chains, so 3-5 rounds
    closes practically everything; ``max_iter`` bounds adversarial
    chains. Each round materializes via ``localCheckpoint`` to cut
    the O(rounds)-deep lineage that would otherwise make Catalyst
    re-analyze an exponentially growing plan (the standard iterative-
    algorithm pattern on Spark; GraphX/GraphFrames does the same
    under the hood, and large-star/small-star is the published
    heavy-hitter variant when single components span executors).

    Small graphs dispatch to driver-side union-find (the identical
    min-label fixpoint — see ``operators/smallgraph.py``): near-dup
    pair sets are usually orders of magnitude smaller than the corpus,
    and below ``driver_edge_bound`` directed edges (default
    ``smallgraph.DRIVER_EDGE_BOUND``) the loop's per-round scheduler
    cost dwarfs the kilobytes it moves. Pass ``0`` to force the
    distributed loop (the loop-equivalence pytest does).
    """
    from hivetomysql_spark.operators import smallgraph  # noqa: PLC0415

    if driver_edge_bound is None:
        driver_edge_bound = smallgraph.DRIVER_EDGE_BOUND
    # checkpoint the DIRECTED pair list before doubling: the union's
    # two branches are both views over `pairs`, and unmaterialized
    # each branch re-runs the caller's (typically expensive) pair
    # pipeline — the LSH/posting-list join — once more
    fwd = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).localCheckpoint(eager=True)
    if 2 * fwd.count() <= driver_edge_bound:
        from pyspark.sql.types import StructField, StructType  # noqa: PLC0415

        comp = smallgraph.minlabel_components(smallgraph.collect_edges(fwd))
        node_t = fwd.schema["src"].dataType
        schema = StructType(
            [
                StructField("doc_id", node_t, False),
                StructField("cluster_id", node_t, False),
            ]
        )
        return pairs.sparkSession.createDataFrame(
            sorted(comp.items()), schema
        )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


# Carter-Wegman mixing constants for the md5 minhash family: one md5
# per shingle supplies a 60-bit base value, and signature position i
# applies an affine mix over its two 30-bit halves modulo the
# Mersenne prime 2^31-1. Constants derive from md5 so both engines
# (and the DuckDB oracle builder in queries/llm.py) reproduce them.
MH_MOD = (1 << 31) - 1


def mh_mix_consts(i: int) -> tuple[int, int, int]:
    import hashlib as _hl

    def c(tag: str) -> int:
        h = int(_hl.md5(f"mh{i}:{tag}".encode()).hexdigest()[:8], 16)
        # uniform draw from [1, MH_MOD-1]: the earlier (h % MH_MOD) | 1
        # could yield MH_MOD itself (≡ 0 mod the prime) when
        # h % MH_MOD == MH_MOD - 1, silently zeroing that coefficient
        # and making the affected signature position ignore one 30-bit
        # half — a weakened universal-hash guarantee with no oracle
        # signal (both engines derive from this same function).
        return (h % (MH_MOD - 1)) + 1

    return c("a"), c("b"), c("c")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_size: int = 3,
    hash_family: str = "murmur3",
) -> DataFrame:
    """MinHash signature per document: ``minhash_i = min over shingles
    of hash_i(shingle)``.

    ``hash_family`` picks the hash: ``"murmur3"`` (Spark's built-in
    ``hash()``, the fast production default) or ``"md5"`` —
    engine-portable so a DuckDB oracle re-derives identical
    signatures. The md5 family computes ONE md5 per shingle (a 60-bit
    base value materialized as an array) and derives all ``num_hashes``
    functions by Carter-Wegman affine mixes of its 30-bit halves mod
    2^31-1 — the classic universal-hashing MinHash construction
    (Broder), replacing the earlier md5-per-(shingle, seed) family
    whose 32× digest cost dominated the signature stage.

    One narrow projection — O(N) digests + O(N·H) integer mixes, no
    shuffle.
    """
    base = spread_for_compute(df).select(
        F.col(id_col).alias("doc_id"),
        _shingles(text_col, shingle_size).alias("sh"),
    )
    if hash_family == "md5":
        hs = F.transform(
            "sh",
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast(
                "long"
            ),
        )
        # hs referenced num_hashes times below — CollapseProject keeps
        # the multi-referenced alias un-inlined, so md5 runs once per
        # shingle (same pattern as the simhash vote rewrite)
        base = base.select("doc_id", hs.alias("hs"))

        def _min_for_seed(i: int) -> Column:
            k1, k2, c = mh_mix_consts(i)
            return F.array_min(
                F.transform(
                    "hs",
                    lambda h: (
                        F.shiftright(h, 30) * k1
                        + h.bitwiseAND(F.lit((1 << 30) - 1)) * k2
                        + c
                    )
                    % MH_MOD,
                )
            )

    else:

        def _min_for_seed(i: int) -> Column:
            # the transform lambda MUST be single-argument: a two-arg
            # Python lambda (e.g. `lambda s, i=i:`) is treated by
            # PySpark as an (element, index) lambda and the array
            # index silently shadows the seed — the bug that made
            # every signature position compute the same function
            # until the md5 oracle exposed it
            return F.array_min(
                F.transform("sh", lambda s: F.hash(s, F.lit(i)))
            )

    sig = F.array(*[_min_for_seed(i) for i in range(num_hashes)])
    return base.select("doc_id", sig.alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
    threshold: float = 0.2,
    max_bucket_size: int = 1000,
    hash_family: str = "murmur3",
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    Signature is split into ``bands`` bands of ``num_hashes/bands``
    rows; documents colliding in ≥1 band bucket become candidates;
    candidates are scored by signature agreement (an unbiased Jaccard
    estimate) and filtered by ``threshold``.

    ``hash_family="md5"`` pins the signature hashes to an
    engine-portable family (see `minhash_signatures`) and uses the
    raw band slice (joined as a string) as the bucket key instead of
    re-hashing it — identical collision semantics, reproducible in
    ANSI SQL.

    Scale design: the only shuffle joins on (band, bucket-hash) —
    near-dups collide, everything else doesn't, so the join output is
    ~linear in the number of true near-dup pairs. ``max_bucket_size``
    caps degenerate buckets (e.g. empty documents) to keep one bucket
    from going quadratic — the same guard HyperLogLog-style dedup
    systems apply before pair generation.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_size, hash_family
    )

    def _bucket(b: int) -> Column:
        sl = F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
        if hash_family == "md5":
            # raw slice as the key — engine-portable, same collisions
            return F.array_join(
                F.transform(sl, lambda x: x.cast("string")), "#"
            )
        return F.hash(sl).cast("string")

    band_entries = sigs.select(
        "doc_id",
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _bucket(b).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "signature", "bb.band", "bb.bucket")

    # cap degenerate buckets before the self-join
    counted = band_entries.withColumn(
        "bucket_n",
        F.count(F.lit(1)).over(Window.partitionBy("band", "bucket")),
    ).where(F.col("bucket_n") <= max_bucket_size)

    a = counted.select(
        F.col("doc_id").alias("id_a"), F.col("signature").alias("sig_a"), "band", "bucket"
    )
    b = counted.select(
        F.col("doc_id").alias("id_b"), F.col("signature").alias("sig_b"), "band", "bucket"
    )
    candidates = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(num_hashes)
    )
    return candidates.select(
        "id_a", "id_b", F.round(est, 4).alias("est_jaccard")
    ).where(F.col("est_jaccard") >= threshold)


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 60
) -> DataFrame:
    """64-bit-family SimHash fingerprint (``bits`` ≤ 60 usable bits).

    Token hashes come from md5 hex (first 15 hex chars → 60 bits) so
    the fingerprint is engine-portable; each bit of the fingerprint
    is the sign of the per-bit vote sum across tokens. Near-duplicate
    texts differ in O(few) bits — compare with
    ``bit_count(a XOR b)``.

    Cost: ZERO shuffles — the token-hash array materializes once per
    document (md5 evaluated once per token; CollapseProject keeps the
    60-reference alias un-inlined) and the per-bit votes run as 60
    array-aggregate lambdas over that array in the same narrow stage.
    This replaced the explode + groupBy(doc) plan: same arithmetic,
    but no 1-row-per-token shuffle — measured 3.8× at sf0.1 (7.3 s →
    1.9 s same-session) and it composes shuffle-free under the banded
    pair join's own exchange.
    """
    ths = F.transform(
        _tokens(text_col),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
    )
    base = spread_for_compute(df).select(
        F.col(id_col).alias("doc_id"), ths.alias("ths")
    )
    # one F.expr per vote / one for the bit-pack — building these as
    # nested Column trees costs ~5 py4j calls per bit (measured ~1.5 s
    # of driver latency at 60 bits); expr strings parse JVM-side
    votes = [
        F.expr(
            f"aggregate(ths, 0L, (acc, th) -> acc + "
            f"CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        )
        for b in range(bits)
    ]
    agg = base.select("doc_id", *votes)
    fingerprint = F.expr(
        " + ".join(
            f"shiftleft(CAST((CASE WHEN v{b} > 0 THEN 1 ELSE 0 END) AS BIGINT), {b})"
            for b in range(bits)
        )
    )
    return agg.select("doc_id", fingerprint.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    n_bands: int | None = None,
    bits: int = 60,
) -> DataFrame:
    """SimHash near-dup pairs with FULL recall via Manku et al.'s
    block-COMBINATION blocking (the production refinement of the
    plain band split; the same family `multimodal_phash_dedup_pairs`
    ships for images): the fingerprint splits into
    ``m = max_hamming + 2`` disjoint blocks; a pair with hamming
    distance ≤ ``max_hamming`` corrupts at most ``max_hamming``
    blocks, leaving ≥ 2 intact — so among the C(m, 2) tables, each
    keyed on ONE PAIR of blocks, at least one table sees both keys
    identical. Recall is exactly 100% by pigeonhole, and candidates
    are verified by full ``bit_count(xor)``.

    Why pairs instead of the single-band split (t=1, m = r+1): the
    key is TWICE as wide, so accidental collisions drop by the whole
    width of a block. At radius 4 over 60 bits the band split hashes
    into 5 × 2^12 buckets while the pair scheme uses 15 × 2^20 —
    measured A/B on the derived fixtures (SCALING.md r10 table): raw
    candidates 314M → 53M at 500k docs (5.9× cut; the clustered
    fingerprints of real near-dup corpora keep it below the ~80×
    uniform-occupancy bound), wall 48.6 s → 14.9 s at sf10 min-of-2,
    and per-10×-step growth 19.6× → 5.9×. The 3× explode fan-out
    (15 vs 5 rows/doc) costs ~0.1 s at sf0.1 and is repaid 3.3× over
    at sf10. Same output, plan shape unchanged: one explode + one
    equi-join on (table, word) + verify.
    """
    if n_bands is None:
        n_bands = max_hamming + 2
    elif n_bands < max_hamming + 2:
        # under PAIR-of-blocks tables the pigeonhole needs >= 2 intact
        # blocks, so full recall requires m >= max_hamming + 2 — a
        # caller passing the old single-band full-recall value
        # (max_hamming + 1) would silently lose the guarantee
        raise ValueError(
            f"n_bands={n_bands} < max_hamming+2={max_hamming + 2}: the "
            "block-combination scheme keys on PAIRS of blocks, so full "
            f"recall at hamming<={max_hamming} needs at least "
            f"{max_hamming + 2} blocks"
        )
    fp = simhash(df, id_col, text_col, bits=bits).localCheckpoint(eager=False)
    bounds = [(b * bits) // n_bands for b in range(n_bands + 1)]

    def block(b: int):
        return F.shiftright("simhash", bounds[b]).bitwiseAND(
            F.lit((1 << (bounds[b + 1] - bounds[b])) - 1)
        )

    tables = []
    t = 0
    for i in range(n_bands):
        for j in range(i + 1, n_bands):
            word = F.shiftleft(block(i), bounds[j + 1] - bounds[j]) + block(j)
            tables.append(
                F.struct(F.lit(t).alias("band"), word.alias("word"))
            )
            t += 1
    words = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*tables)).alias("bw"),
    ).select(
        "doc_id",
        "simhash",
        F.col("bw.band").alias("band"),
        F.col("bw.word").alias("word"),
    )
    a = words.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("h_a"), "band", "word"
    )
    b = words.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("h_b"), "band", "word"
    )
    dist = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(b, ["band", "word"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", dist.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
