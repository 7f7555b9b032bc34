"""Parallelism FLOOR guard for compute-heavy narrow stages.

The shuffle-budget snapshot enforces ceilings (no plan may gain an
exchange), but the round-7 timing sweep showed the opposite failure
mode is just as real: a compute-heavy narrow stage that LOSES its
spread_for_compute widening silently runs the whole digest/decode
work on however many splits the scan has — one, for the single-file
fixtures — and no budget or correctness check notices. These queries'
dominant cost is per-row narrow compute off the documents/embeddings
scan, so at the single-file fixture scale their executed plans MUST
carry the widening round-robin; losing it is a 4-10x regression at
sf0.1 (measured in SCALING.md round 7) and an idle-cluster bug at
100 TB.
"""

from __future__ import annotations

import pytest

from hivetomysql_spark.plans import introspect as I

# queries whose dominant cost is narrow per-row compute over a
# (single-file at fixture scale) scan; each measured 2-10x slower
# without the widening in the round-7 sweep
SPREAD_REQUIRED = [
    "text_winnow_fingerprint",
    "multimodal_features",
    "multimodal_phash",
    "multimodal_video_ssim",
    "multimodal_video_shot_detection",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_binary_quantization",
    "embedding_matryoshka_truncation",
]


@pytest.mark.parametrize("name", SPREAD_REQUIRED)
def test_compute_heavy_query_is_widened(spark, sf_dir, name):
    import __spark_entry__ as m

    df = m.queries()[name](spark, sf_dir)
    assert I.count_roundrobin(df) >= 1, (
        f"{name}: no widening exchange in the plan at the single-file "
        "fixture scale — a spread_for_compute was lost; its narrow "
        "compute stage now runs on one core per input split"
    )


# queries that ALSO require the spread but localCheckpoint right
# after it: the widening runs inside the checkpoint job and vanishes
# from the final plan text, so the round-robin probe above can't see
# it. The checkpointed RDD's partition count DOES survive, so the
# floor is asserted on LogicalRDD width instead (verdict r7 #4).
# Each entry maps to the frame whose width proves the spread:
# - text_ngram_novelty_ratio: its eager gram-array checkpoint is a
#   visible leaf of the final plan;
# - text_idf_weighted_jaccard: the lazy posting checkpoint swallows
#   the gram-array leaf (and is itself legitimately AQE-coalesced at
#   fixture scale), so the probe targets the _idf_gram_arrays stage
#   the query is built from.
def _novelty_frame(spark, sf_dir):
    import __spark_entry__ as m

    return m.queries()["text_ngram_novelty_ratio"](spark, sf_dir)


def _idf_arr_frame(spark, sf_dir):
    from hivetomysql_spark.queries.text_suite import _idf_gram_arrays

    return _idf_gram_arrays(spark, sf_dir)


SPREAD_BEHIND_CHECKPOINT = [
    ("text_idf_weighted_jaccard", _idf_arr_frame),
    ("text_ngram_novelty_ratio", _novelty_frame),
]


@pytest.mark.parametrize(
    "name,frame", SPREAD_BEHIND_CHECKPOINT, ids=lambda p: str(p)
)
def test_checkpointed_compute_query_is_widened(spark, sf_dir, name, frame):
    df = frame(spark, sf_dir)
    target = spark.sparkContext.defaultParallelism
    counts = I.rdd_leaf_partition_counts(df)
    assert counts, (
        f"{name}: expected at least one localCheckpoint LogicalRDD "
        "leaf — the pinning strategy changed; move the query to "
        "SPREAD_REQUIRED if the spread is now plan-visible"
    )
    assert max(counts) >= target, (
        f"{name}: checkpointed array stage has {max(counts)} "
        f"partitions < defaultParallelism {target} — the "
        "spread_for_compute BEFORE the checkpoint was lost; the "
        "dominant narrow gram build now runs on the scan's splits"
    )
