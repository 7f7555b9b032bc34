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
# (text_idf_weighted_jaccard and text_ngram_novelty_ratio also
# require the spread but EAGERLY localCheckpoint right after it — the
# widening runs in the build-time checkpoint job and is invisible in
# the final plan, so this probe can't see it; their coverage is the
# timing sweep + budget snapshot.)
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
