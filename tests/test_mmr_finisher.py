"""Driver-side MMR greedy finisher (queries/similarity_suite.py, r13).

``similarity_mmr_rerank``'s former greedy loop ran 5 join+sort
scheduler rounds over the k-bounded candidate frame, collecting each
1-row winner; r13 collects the whole candidate matrix once and runs
the identical arithmetic in ``_mmr_greedy``. These tests pin the
finisher on a hand-computed example (first-pick tie AND a mid-round
tie, both broken by ascending id) and the registered query's
invariants stay covered by tests/test_analytics_extras30.py plus the
DuckDB oracle.
"""

from __future__ import annotations

from hivetomysql_spark.queries.similarity_suite import (
    _MMR_K,
    _MMR_LAMBDA,
    _mmr_greedy,
)


def _sims(ids, special):
    out = []
    for a in ids:
        for b in ids:
            if a != b:
                out.append((a, b, special.get((a, b), 0.0)))
    return out


def test_mmr_greedy_hand_example_with_ties():
    # ids 1 and 2 tie on relevance (first pick -> lower id);
    # 2 is a perfect near-dup of 1 so MMR must skip it afterwards;
    # 3 and 4 tie on round-2 score (-> lower id first)
    cand = [(1, 0.9), (2, 0.9), (3, 0.8), (4, 0.8), (5, 0.6), (6, 0.5)]
    sims = _sims([c[0] for c in cand], {(1, 2): 1.0, (2, 1): 1.0})
    picked = _mmr_greedy(cand, sims)
    assert [p[0] for p in picked] == list(range(1, _MMR_K + 1))
    assert [p[1] for p in picked] == [1, 3, 4, 5, 6]
    # scores it compared: round 2 saw 2 at 0.7*0.9-0.3*1.0 = 0.33
    # vs 3/4 at 0.56 — the near-dup was correctly suppressed
    assert picked[1][2] == 0.8


def test_mmr_greedy_matches_spark_expression_arithmetic():
    """The finisher must use the same Python-float constants the
    Catalyst expression embedded: lambda and (1 - lambda)."""
    lam = _MMR_LAMBDA
    rel, ms = 0.8123456789, 0.7777777
    expected = lam * rel - (1 - lam) * ms
    cand = [(1, 0.9), (2, rel), (3, 0.1), (4, 0.1), (5, 0.1), (6, 0.1)]
    sims = _sims(
        [c[0] for c in cand],
        {(2, 1): ms, (1, 2): ms},
    )
    picked = _mmr_greedy(cand, sims)
    # round 2: candidate 2's score is exactly `expected`; others
    # score 0.07 - candidate 2 wins iff expected > 0.07 (it is)
    assert expected > 0.07
    assert picked[1][1] == 2
