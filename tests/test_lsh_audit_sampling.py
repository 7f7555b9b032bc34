"""Unbiasedness gate for the sampled LSH quality audit (verdict r12 #5).

``dedup_lsh_quality_audit_sampled`` claims its deterministic ~25% md5
doc sample keeps each PAIR with probability p^2 independently of
whether the bands catch it, making sampled precision/recall unbiased
estimates of the full audit's values. This test pins the claim at
both driver scales, in two layers:

1. MECHANISM (exact, set-level): both the exact-Jaccard tier and the
   banded-MinHash candidate tier are doc-local computations, so the
   sampled pair set must EQUAL the full pair set filtered to
   both-endpoints-sampled. This is the property that makes retention
   exactly Bernoulli(p^2) per pair — if a tier ever became
   sample-dependent (e.g. quantile-derived shingle cutoffs), the set
   equality breaks before any statistic drifts.
2. STATISTICS (binomial CI): sampled pair retention within 4 sigma of
   n_full * p_hat^2 (pairs sharing endpoints are positively
   correlated, hence the wide z plus a small absolute pad), and the
   full precision/recall inside the sampled estimates' Wilson(z=4)
   intervals (Wilson, not Wald: the fixture corpus is degenerate at
   precision = recall = 1.0 where a Wald interval has zero width).

Measured r13: sf0.01 full 25 pairs -> 1 sampled (expected 1.49,
p_hat=0.244); sf0.1 full 256 -> 15 sampled (expected 15.66,
p_hat=0.247); precision/recall 1.0 on both sides at both scales.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.operators import dedup as D
from hivetomysql_spark.queries.llmops_suite import _LQ_TAU, _LQS_MOD
from hivetomysql_spark.tables import load_table
import __spark_entry__ as entrymod

def sample_pred():
    # Column construction needs an active session — keep it lazy
    return (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        ).cast("int")
        % _LQS_MOD
        == 0
    )


def _pair_sets(spark, sf_dir, docs):
    exact = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=_LQ_TAU
        ).select("id_a", "id_b").collect()
    }
    cand = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=32, bands=8,
            threshold=0.0, hash_family="md5",
        ).select("id_a", "id_b").distinct().collect()
    }
    return exact, cand


def wilson(k: int, n: int, z: float = 4.0) -> tuple[float, float]:
    if n == 0:
        return 0.0, 1.0
    p = k / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = (z / denom) * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    return center - half, center + half


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_lsh_audit_sampling_unbiased(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    sampled_ids = {
        r.doc_id for r in docs.where(sample_pred()).select("doc_id").collect()
    }
    p_hat = len(sampled_ids) / n_docs

    full_exact, full_cand = _pair_sets(spark, sf_dir, docs)
    samp_exact, samp_cand = _pair_sets(
        spark, sf_dir, docs.where(sample_pred())
    )

    # 1. mechanism: sampling commutes with both doc-local tiers
    kept = lambda pairs: {  # noqa: E731
        (a, b) for a, b in pairs
        if a in sampled_ids and b in sampled_ids
    }
    assert samp_exact == kept(full_exact), (
        "sampled exact-Jaccard pairs != full pairs filtered to sampled "
        "endpoints — the exact tier is no longer doc-local and the p^2 "
        "retention claim does not hold"
    )
    assert samp_cand == kept(full_cand), (
        "sampled LSH candidate pairs != full candidates filtered to "
        "sampled endpoints — the banding is no longer doc-local"
    )

    # 2a. retention CI: E[kept] = n_full * p_hat^2; shared-endpoint
    # correlation widens the spread, so z=4 plus an absolute pad of 2
    p2 = p_hat * p_hat
    for pairs, got in ((full_exact, len(samp_exact)),
                       (full_cand, len(samp_cand))):
        n = len(pairs)
        mu = n * p2
        sd = math.sqrt(max(n * p2 * (1 - p2), 1e-12))
        assert abs(got - mu) <= 4 * sd + 2, (
            f"pair retention {got} vs expected {mu:.2f} "
            f"(n={n}, p_hat={p_hat:.4f}) outside 4 sigma"
        )

    # 2b. precision/recall: full value inside the sampled Wilson CI
    q = entrymod.queries()
    full = q["dedup_lsh_quality_audit"](spark, sf_dir).collect()[0]
    samp = q["dedup_lsh_quality_audit_sampled"](spark, sf_dir).collect()[0]
    for metric, n_attr in (("precision", "n_candidates"),
                           ("recall", "n_exact_pairs")):
        lo, hi = wilson(samp["tp"], samp[n_attr])
        assert lo <= full[metric] <= hi, (
            f"full {metric} {full[metric]} outside the sampled "
            f"Wilson(z=4) interval [{lo:.4f}, {hi:.4f}] "
            f"(tp={samp['tp']}, n={samp[n_attr]})"
        )
