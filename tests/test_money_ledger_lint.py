"""Source lint: no NEW float ROUND(SUM(...)) aggregates.

The r8 sf1 sweep proved ROUND over a float SUM is a latent
cross-engine divergence (half-cases once the true sum carries more
decimals than the round, or once groups are large enough for
accumulated float error to cross the half-gap) — four live failures:
agg_nation_pair_volume, agg_product_profit, promo_day_lift,
embedding_standardize_dims (via float mean/stddev). The fix is a
ledger: per-row DECIMAL cast or integer units (floor(x*scale + 0.5)
BIGINT) so the sum is exact and order-independent — see
agg_pricing_summary for the fast integer form.

This lint freezes the per-file count of remaining float-round-sum
sites (each triaged safe: small bounded groups of 2-decimal values,
already-exact inputs, or count ratios — and every one sf1-certified).
Adding a NEW one fails here with the recipe; removing one means
lowering the frozen count in the same commit.
"""

from __future__ import annotations

import os
import re

QUERY_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "hivetomysql_spark",
    "queries",
)

# F.round(F.sum(<arg-with-no-ledger>) — the sum argument is scanned
# up to the round's closing depth for a decimal cast / floor-units
PATTERN = re.compile(r"F\.round\(\s*\n?\s*F\.sum\(", re.MULTILINE)

# frozen at round 8 after the registry-wide ledger conversion. The
# counts include sites whose ledger lives UPSTREAM (a decimal column
# summed by name — e.g. incremental's p_sum partials) and sites
# triaged safe (small bounded groups of 2-decimal values, count
# ratios); every one is sf1-certified (see SCALING.md round 8).
ALLOWED = {
    "business_suite.py": 4,
    "corpus_stats.py": 1,
    "dataquality_suite.py": 1,
    "events_analytics.py": 4,
    "events_suite.py": 2,
    "incremental.py": 3,
    "misc_suite.py": 1,
    "ml_suite.py": 1,
    "privacy_suite.py": 2,
    "relational.py": 1,
    # 3rd site exposed by the r9 span parser (previously masked by a
    # neighbor's marker): window_ratio_to_report.cum_share — a ratio
    # of sums over the upstream-decimal-ledgered `total`; safe class
    # 4th (r11): udaf_regression_slope.slope — a RATIO of sums of
    # batch-centered OLS partials (Chan merge), not money; the old
    # form rounded the same ratio inside the pandas UDAF where this
    # lint cannot see. Value-matched vs DuckDB REGR_SLOPE at sf0.01
    # AND sf1 this round (SCALING.md round 11)
    "relational_extras.py": 4,
    "relational_suite.py": 1,
    "similarity_suite.py": 1,
    "sketches_suite.py": 4,
    "stats_suite.py": 3,
    "streaming_batch.py": 2,
    "text_suite.py": 5,
    "timeseries_suite.py": 1,
    "tpch_shapes.py": 1,
    "windows.py": 2,
}


def _sum_argument_span(src: str, open_idx: int) -> str:
    """The text between F.sum's opening paren at ``open_idx`` and its
    balancing close — the EXACT argument expression, so a ledger
    marker in a neighboring aggregate or comment can't mask a new
    unledgered site (r8 advice: the old fixed 400-char window could
    be fooled in either direction)."""
    depth = 0
    for i in range(open_idx, len(src)):
        c = src[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return src[open_idx + 1 : i]
    return src[open_idx + 1 :]


def _unledgered_round_sums(src: str) -> int:
    count = 0
    for m in PATTERN.finditer(src):
        # ledger marker must appear INSIDE the sum's own argument: a
        # decimal cast or integer-units floor. Sites whose ledger
        # lives upstream (a decimal/units column summed by name) are
        # counted here and carried by the frozen per-file allowance.
        span = _sum_argument_span(src, m.end() - 1).lower()
        if "decimal" in span or "floor(" in span:
            continue
        count += 1
    return count


def test_span_parser_balances_parens():
    src = 'F.round(F.sum(F.col("x") * (F.lit(2) + 1)), 2), "decimal"'
    m = PATTERN.search(src)
    span = _sum_argument_span(src, m.end() - 1)
    assert span == 'F.col("x") * (F.lit(2) + 1)'
    # a marker OUTSIDE the argument span must not mask the site
    assert _unledgered_round_sums(src) == 1
    ledgered = 'F.round(F.sum(F.col("x").cast("decimal(18,4)")), 2)'
    assert _unledgered_round_sums(ledgered) == 0


def test_no_new_float_round_sums():
    violations = []
    for fname in sorted(os.listdir(QUERY_DIR)):
        if not fname.endswith(".py"):
            continue
        src = open(os.path.join(QUERY_DIR, fname)).read()
        got = _unledgered_round_sums(src)
        allowed = ALLOWED.get(fname, 0)
        if got > allowed:
            violations.append(f"{fname}: {got} > frozen {allowed}")
    assert not violations, (
        "new float ROUND(SUM(...)) aggregate(s) — a latent cross-"
        "engine half-case divergence at scale. Use a ledger: per-row "
        '.cast("decimal(18,k)") or integer units '
        "floor(x*scale + 0.5).cast('long') (see agg_pricing_summary); "
        "then certify at sf1 and update the frozen count:\n"
        + "\n".join(violations)
    )
