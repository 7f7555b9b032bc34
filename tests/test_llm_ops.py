"""Correctness of the approximate LLM-pipeline operators, measured
against their exact counterparts (the checks DuckDB oracles can't
express — hash-implementation-specific sketches)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.operators import dedup as D
from hivetomysql_spark.operators import multimodal as M
from hivetomysql_spark.operators import similarity as S


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_minhash_lsh_recall_vs_exact_jaccard(docs):
    exact = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.2).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=32, bands=8, threshold=0.2
        ).collect()
    }
    assert exact, "fixture should contain near-duplicates"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall:.2f} (measured 1.0 at build)"


def test_simhash_deterministic_and_sensitive(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # identical
        (3, "the quick brown fox leaps over the lazy dog"),  # 1 token diff
        (4, "completely different content about spark engines"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = {r.doc_id: r.simhash for r in D.simhash(df, "doc_id", "text").collect()}
    assert fp[1] == fp[2]  # identical text ⇒ identical fingerprint
    ham_near = bin(fp[1] ^ fp[3]).count("1")
    ham_far = bin(fp[1] ^ fp[4]).count("1")
    assert ham_near < ham_far  # near-dup closer than unrelated
    # re-run gives identical fingerprints (no RNG state)
    fp2 = {r.doc_id: r.simhash for r in D.simhash(df, "doc_id", "text").collect()}
    assert fp == fp2


def test_exact_dedup_finds_planted_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa")], ["doc_id", "text"]
    )
    groups = {
        r.keep_id: r.n_copies
        for r in D.exact_dedup_groups(df, "text", "doc_id").collect()
    }
    assert groups == {1: 3, 2: 1}  # min-id survivor, copy counts


def test_lsh_ann_recall_vs_bruteforce(emb):
    bf = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk_bruteforce(
            emb, query_pred=F.col("__id") < 20, k=5
        ).collect()
    }
    ls = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_cosine_topk(
            emb, query_pred=F.col("__id") < 20, k=5, n_planes=4, n_tables=8
        ).collect()
    }
    recall = len(bf & ls) / len(bf)
    # random fixture vectors are weakly similar (top cosine ≈ 0.35);
    # 8 tables × 4 planes measured 0.76 at build time
    assert recall >= 0.6, f"LSH ANN recall {recall:.2f}"


def test_ivf_ann_recall_vs_bruteforce(emb):
    bf = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk_bruteforce(
            emb, query_pred=F.col("__id") < 20, k=5
        ).collect()
    }
    iv = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_cosine_topk(
            emb, query_pred=F.col("__id") < 20, k=5, n_cells=16, nprobe=4
        ).collect()
    }
    recall = len(bf & iv) / len(bf)
    assert recall >= 0.5, f"IVF ANN recall {recall:.2f}"


def test_embedding_cosine_pairs_planted_near_dup(spark):
    v = [1.0] + [0.0] * 63
    near = [0.999] + [0.045] * 63  # cosine ≈ 0.97 with v
    far = [0.0] * 32 + [1.0] + [0.0] * 31
    df = spark.createDataFrame(
        [(1, v), (2, near), (3, far)], ["vec_id", "embedding"]
    )
    pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in S.embedding_cosine_pairs(df, threshold=0.9).collect()
    }
    assert set(pairs) == {(1, 2)} and pairs[(1, 2)] > 0.9


def test_bruteforce_topk_is_exact_on_planted_neighbor(spark):
    base = [0.0] * 64
    near = [0.01] * 64
    near[0] = 1.0
    v1 = [1.0] + [0.0] * 63
    rows = [(1, v1), (2, near), (3, [0.5] * 64), (4, [-1.0] + [0.0] * 63)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    top = S.cosine_topk_bruteforce(df, query_pred=F.col("__id") == 1, k=1).collect()
    assert len(top) == 1 and top[0].neighbor_id == 2


def test_multimodal_features_deterministic_and_shaped(docs):
    binary = M.attach_binary_payload(docs.limit(50), "doc_id", "text")
    feats = M.extract_features(binary)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.feature) == M.FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r.feature)
    # deterministic across runs
    again = {r.doc_id: r.sha1 for r in M.extract_features(binary).collect()}
    assert {r.doc_id: r.sha1 for r in rows} == again


def test_multimodal_decode_stub_rejects_real_formats():
    with pytest.raises(NotImplementedError):
        M.decode_stub(b"\x89PNG", "png")
    with pytest.raises(NotImplementedError):
        M.resize_stub(b"\x89PNG", "png", 64)


def test_multimodal_resize_bounded_and_deterministic(docs):
    binary = M.attach_binary_payload(docs.limit(50), "doc_id", "text")
    out = M.resize_payloads(binary, target_px=64).collect()
    assert len(out) == 50
    assert all(r.n_bytes <= 64 and len(r.payload) == r.n_bytes for r in out)
    again = {r.doc_id: bytes(r.payload) for r in M.resize_payloads(binary, 64).collect()}
    assert {r.doc_id: bytes(r.payload) for r in out} == again


def test_multimodal_frame_sample_fanout_bounds(docs):
    binary = M.attach_binary_payload(docs.limit(50), "doc_id", "text")
    frames = M.sample_frames(binary, every_n_bytes=256, max_frames=4).collect()
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert set(per_doc) == {r.doc_id for r in binary.select("doc_id").collect()}
    for idxs in per_doc.values():
        assert 1 <= len(idxs) <= 4
        assert sorted(idxs) == list(range(len(idxs)))  # dense, ordered


def test_jaccard_stop_shingle_cap_is_contained(docs):
    """Capped Jaccard must be an under-approximation of exact: every
    capped pair exists exactly (with jaccard <= exact value), and a
    generous cap changes nothing."""
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, "doc_id", "text").collect()
    }
    generous = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(
            docs, "doc_id", "text", max_posting_len=10**6
        ).collect()
    }
    assert generous == exact
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(
            docs, "doc_id", "text", max_posting_len=3
        ).collect()
    }
    assert set(capped) <= set(exact)
    for pair, j in capped.items():
        assert j <= exact[pair] + 1e-9


def test_connected_components_chain_and_clique(spark):
    """A 5-node chain (diameter 4 — forces multiple propagation
    rounds), a 3-clique, and an isolated pair must each collapse to
    their min-id label."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),        # chain
         (10, 11), (11, 12), (10, 12),          # clique
         (20, 21)],                             # pair
        ["id_a", "id_b"],
    )
    got = {r.doc_id: r.cluster_id for r in D.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_winnowing_guarantee_shared_substring(spark):
    """Winnowing guarantee (Schleimer et al. §2): two docs sharing a
    substring of >= k + window - 1 tokens (here 3+4-1=6) must share
    at least one fingerprint; disjoint docs share none."""
    from hivetomysql_spark.operators.text import winnow_fingerprints, _tokens  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    rows = [
        (1, f"one two {shared} three four"),
        (2, f"five six seven {shared} eight"),
        (3, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # recompute the raw fingerprint SETS (the operator aggregates)
    from hivetomysql_spark.operators import text as T

    c = T.winnow_fingerprints(df, "doc_id", "text", k=3, window=4)
    # use the checksum+count as a proxy is not enough — pull sets via
    # a temporary un-aggregated variant
    toks = T._tokens("text")
    kgrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
    )
    ex = df.select(F.col("doc_id"), F.posexplode(kgrams).alias("pos", "kg")).select(
        "doc_id", "pos",
        F.conv(F.substring(F.md5("kg"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    win = W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.currentRow, 3)
    fps = (
        ex.withColumn("fp", F.min("h").over(win))
        .withColumn("maxpos", F.max("pos").over(W.partitionBy("doc_id")))
        .where(F.col("pos") <= F.col("maxpos") - 3)
        .select("doc_id", "fp").distinct().collect()
    )
    sets = {}
    for r in fps:
        sets.setdefault(r.doc_id, set()).add(r.fp)
    assert sets[1] & sets[2], "shared 6-token substring must share a fingerprint"
    assert not (sets[1] & sets[3]) and not (sets[2] & sets[3])
    assert c.count() == 3


def test_freq_items_superset_guarantee(spark, sf_dir):
    """freqItems must return a SUPERSET of the truly frequent items
    (Misra-Gries guarantee): every event_type above the support
    threshold appears among the candidates."""
    from hivetomysql_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    exact = {
        r.event_type
        for r in ev.groupBy("event_type").count().collect()
        if r["count"] / n > 0.15
    }
    got = set(
        ev.stat.freqItems(["event_type"], support=0.15)
        .collect()[0]["event_type_freqItems"]
    )
    assert exact <= got


def test_cms_heavy_hitters_superset_and_overcount(spark, sf_dir):
    """The registered CMS heavy-hitter query keeps the Misra-Gries
    contract: every truly frequent event_type is reported (CMS never
    under-counts, so est > threshold whenever exact > threshold) and
    every estimate is >= its exact count."""
    from hivetomysql_spark.queries.llm import agg_heavy_hitters
    from hivetomysql_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    exact_hot = {
        r.event_type
        for r in ev.groupBy("event_type").count().collect()
        if r["count"] / n > 0.15
    }
    rows = agg_heavy_hitters(spark, sf_dir).collect()
    got = {r.event_type for r in rows}
    assert exact_hot <= got
    assert all(r.cms_est >= r.exact_n for r in rows)
    assert all(r.n_total == n for r in rows)


def test_audio_windows_overlap_and_bounds(spark, sf_dir):
    """Audio windowing: ~2 windows per hop-span, window starts on the
    hop grid, levels within byte range."""
    from hivetomysql_spark.operators import multimodal as M
    from hivetomysql_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    binary = M.attach_binary_payload(docs, "doc_id", "text")
    wins = M.window_audio(binary, window_bytes=200, hop_bytes=100).collect()
    assert wins
    assert all(r.start_byte == r.win_idx * 100 for r in wins)
    assert all(0.0 <= r.level <= 255.0 for r in wins)
    by_doc = {}
    for r in wins:
        by_doc.setdefault(r.doc_id, []).append(r)
    payload_lens = {r.doc_id: r.n_bytes for r in binary.select("doc_id", "n_bytes").collect()}
    for doc_id, rows in by_doc.items():
        expected = -(-max(1, payload_lens[doc_id]) // 100)
        assert len(rows) in (expected, expected - 1)


def test_compression_quality_orders_spam_below_prose(spark, sf_dir):
    """zlib ratio invariants: bounded, and repeated-token spam
    compresses (much) better than diverse text."""
    from hivetomysql_spark.queries.llm import (
        text_compression_quality,
        text_compression_ratios,
    )

    rows = text_compression_ratios(spark, sf_dir).collect()
    assert rows and all(0.0 < r.zlib_ratio <= 1.5 for r in rows)
    gate = text_compression_quality(spark, sf_dir).collect()
    assert gate and all(r.ratio_in_bounds for r in gate)
    spam = spark.createDataFrame(
        [(1, "spam " * 200, "x", 1000), (2, " ".join(f"w{i}" for i in range(200)), "x", 1000)],
        "doc_id long, text string, source string, n_chars long",
    )
    spam.createOrReplaceTempView("cmp_docs")
    from pyspark.sql.functions import udf

    @udf(returnType="double", useArrow=True)
    def ratio(text: str) -> float:
        import zlib

        raw = text.encode()
        return len(zlib.compress(raw, 6)) / len(raw)

    got = {r.doc_id: r.r for r in spam.select("doc_id", ratio("text").alias("r")).collect()}
    assert got[1] < got[2] / 2  # spam compresses at least 2x better


@pytest.mark.parametrize("radius", [4, 8])
def test_simhash_banded_pairs_full_recall(spark, sf_dir, radius):
    """Pigeonhole guarantee at the shipped radius (4) and a wider one
    (8): the banded hamming join must return EXACTLY the pairs the
    exact quadratic scan finds at the same threshold — zero recall
    loss, zero false survivors."""
    from hivetomysql_spark.operators import dedup as D
    from hivetomysql_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.simhash_near_pairs(
            docs, "doc_id", "text", max_hamming=radius
        ).collect()
    }
    fps = {r.doc_id: r.simhash for r in D.simhash(docs, "doc_id", "text").collect()}
    ids = sorted(fps)
    exact = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= radius
    }
    assert banded == exact
    assert exact, "corpus should contain at least one near-dup pair"


def test_winnowing_short_docs_drop_cleanly(spark):
    """Docs with fewer than window full k-grams must DROP, including
    the sub-k-token edge: sequence(0, size-k) with size < k counts
    DOWN in Spark, so the pre-round-7 plan built garbage k-grams from
    negative slice offsets for 0-2-token docs and could emit
    fingerprints the DuckDB oracle (whose generate_series yields
    empty there) never would. The token-count pre-filter closes that
    divergence before the hash array is ever built."""
    from hivetomysql_spark.operators import text as T

    df = spark.createDataFrame(
        [
            (1, ""),                      # 0 tokens
            (2, "alpha"),                 # 1 token
            (3, "alpha beta"),            # 2 tokens  (< k)
            (4, "a b c d e"),             # 3 kgrams  (< window)
            (5, "a b c d e f"),           # exactly window kgrams
            (6, "a b c d e f g h i j"),   # comfortably above
        ],
        "doc_id: long, text: string",
    )
    out = T.winnow_fingerprints(df, "doc_id", "text", k=3, window=4)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {5, 6}
    assert all(r.n_fps >= 1 for r in rows.values())


def test_simhash_pairs_rejects_insufficient_blocks(spark):
    """Advice r10: under pair-of-blocks tables full recall needs
    m >= max_hamming + 2 — the old single-band full-recall value
    (max_hamming + 1) must raise, not silently lose the guarantee."""
    import pytest

    from hivetomysql_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id: long, text: string"
    )
    with pytest.raises(ValueError, match="block-combination"):
        D.simhash_near_pairs(df, "doc_id", "text", max_hamming=4, n_bands=5)
    # the minimum legal value still builds a plan
    D.simhash_near_pairs(df, "doc_id", "text", max_hamming=4, n_bands=6)


def test_ivf_sweep_equals_independent_calls(emb):
    """r13: ivf_cosine_topk_sweep shares one index build across probe
    points; every point must be ROW-IDENTICAL (values incl. rounded
    cosine and rank) to an independent ivf_cosine_topk call."""
    sweep = dict(
        S.ivf_cosine_topk_sweep(
            emb, query_pred=F.col("__id") < 20, k=5, n_cells=16,
            probes=(1, 2, 4),
        )
    )
    for p in (1, 2, 4):
        solo = sorted(
            map(
                tuple,
                S.ivf_cosine_topk(
                    emb,
                    query_pred=F.col("__id") < 20,
                    k=5,
                    n_cells=16,
                    nprobe=p,
                ).collect(),
            )
        )
        assert solo == sorted(map(tuple, sweep[p].collect())), f"nprobe={p}"
        assert solo  # non-degenerate fixture
