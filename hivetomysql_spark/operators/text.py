"""Text-analysis operators for training-data curation.

Language ID (stopword-vote heuristic), quality scoring, token
statistics, and content fingerprinting — the per-document scoring
passes an LLM data pipeline runs before dedup/filtering. All pure
column expressions (whole-stage codegen; zero Python in the row
path), so each operator is a single narrow projection that scales to
any corpus size without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hivetomysql_spark.operators.parallelism import spread_for_compute

# Tiny function-word lists for the vote heuristic. Real pipelines use
# fastText/CLD3 — the Spark-side shape (per-language score columns →
# argmax) is identical, only the scorer changes.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "es": ["el", "la", "los", "de", "que", "es"],
    "fr": ["le", "la", "les", "et", "est", "une"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def _tokens(text_col) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics: token count, char count, bytes,
    mean token length, distinct-token ratio (type/token ratio)."""
    toks = _tokens(text_col)
    n_toks = F.size(toks)
    total_tok_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return df.select(
        F.col(id_col),
        n_toks.alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        F.octet_length(text_col).alias("n_bytes"),
        F.round(total_tok_len / n_toks, 4).alias("avg_token_len"),
        F.round(F.size(F.array_distinct(toks)) / n_toks, 4).alias("ttr"),
    )


def quality_score(
    df: DataFrame, id_col: str, text_col: str, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Heuristic quality score in [0,1] from length, stopword ratio,
    and repetition (Gopher/C4-style cheap filters):

    * length_score — saturating at 200 tokens,
    * stopword_ratio — natural prose has some function words,
    * repetition — 1 - distinct/total token ratio (high = spammy).

    score = 0.4·length + 0.3·min(stopword·5, 1) + 0.3·(1 - repetition)
    """
    toks = _tokens(text_col)
    n_toks = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    length_score = F.least(n_toks / F.lit(200.0), F.lit(1.0))
    stop_ratio = n_stop / n_toks
    repetition = F.lit(1.0) - F.size(F.array_distinct(toks)) / n_toks
    score = (
        F.lit(0.4) * length_score
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - repetition)
    )
    # + 1e-9 before rounding: the score is a small-denominator
    # rational that lands EXACTLY on .xxxx5 for some docs (6 of 5000
    # at sf0.1), where Spark (shortest-decimal-repr HALF_UP) and
    # binary-rounding engines disagree by 1 ulp of the 4th decimal.
    # The nudge is >> double noise (1e-16) and << the rational value
    # spacing near boundaries (>= ~1e-7), so both engines round every
    # value identically. Mirrored in every oracle that rounds this.
    eps = F.lit(1e-9)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        n_toks.alias("n_tokens"),
        F.round(stop_ratio + eps, 4).alias("stopword_ratio"),
        F.round(repetition + eps, 4).alias("repetition"),
        F.round(score + eps, 4).alias("quality"),
    )


def language_id(
    df: DataFrame, id_col: str, text_col: str, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Predict language by function-word votes; 'und' (undetermined)
    when no list scores > 0. Deterministic argmax (ties broken by
    language code order)."""
    toks = _tokens(text_col)

    def contains(arr):
        # single-arg lambda — a two-arg lambda would make F.filter
        # pass the element index as the second parameter
        return lambda t: F.array_contains(arr, t)

    scores = []
    for lang, words in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, contains(arr))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    # argmax: struct comparison is lexicographic (score, then lang);
    # invert lang order for deterministic ties → sort desc by score,
    # asc by lang == max of (score, reversed-lang) … simpler: greatest
    # of structs picks highest score, ties → lexicographically larger
    # lang; we accept that tie rule and mirror it in oracles.
    best = F.greatest(*scores)
    pred = F.when(best.getField("score") > 0, best.getField("lang")).otherwise(
        F.lit("und")
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.col("lang").alias("lang_declared"),
        best.getField("score").alias("marker_hits"),
        pred.alias("lang_predicted"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content fingerprint: md5 over whitespace-normalized lowercase
    text (stable under reflow/case changes), plus a 60-bit numeric
    prefix usable as a shard/bucket key."""
    normalized = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    digest = F.md5(normalized)
    return df.select(
        F.col(id_col),
        digest.alias("fp_md5"),
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("long").alias("fp_prefix60"),
    )


# GPT-2-style pre-tokenizer, lookahead-free so the identical pattern
# runs on java.util.regex (Spark) and RE2 (DuckDB oracle):
# contractions | space-prefixed words | numbers | punctuation runs
BPE_PRETOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def bpe_token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Tokenizer-aware size estimation: BPE-ish pre-token count next
    to the whitespace word count. Pre-token count tracks real BPE
    vocabulary token counts within a few percent on English prose —
    the cheap way to budget '2T tokens' style corpus targets without
    shipping a tokenizer model to every executor. Pure regexp
    expression work, no UDF."""
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0)
    words = _tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(words).alias("n_words"),
        F.round(F.size(bpe) / F.size(words), 4).alias("tokens_per_word"),
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-gram, slide a
    window of ``window`` consecutive hashes, keep each window's
    minimum. Guarantees: any shared substring of length
    ≥ k + window - 1 produces at least one shared fingerprint, and
    the kept set is ~2/(window+1) of all k-grams — the rolling-hash
    fingerprint family for plagiarism/near-dup detection at corpus
    scale.

    Hashes are md5-derived 60-bit ints (portable across engines, so
    the DuckDB oracle computes bit-identical fingerprints). Returns
    per-doc fingerprint-set summaries with ZERO shuffles: the k-gram
    hash array materializes once per document and the sliding-window
    minima / distinct / checksum all run as array expressions in the
    same narrow stage — replacing the earlier posexplode + per-doc
    position window + distinct + groupBy plan (two shuffles and a
    per-doc sort that dominates at corpus scale). Documents with
    fewer than ``window`` full k-gram windows drop from the output,
    matching the prior full-window filter.
    """
    toks = _tokens(text_col)
    kgrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    hs = F.transform(
        kgrams,
        lambda kg: F.conv(F.substring(F.md5(kg), 1, 15), 16, 10).cast("long"),
    )
    # Filter on the TOKEN count (size(hs) >= window ⇔ size(toks) >=
    # window + k - 1) and BEFORE projecting the hash array: a filter
    # on size(hs) placed above the projection gets pushed back through
    # it with the alias re-inlined, and the whole kgram+md5 chain
    # evaluates TWICE per row (measured: 3.4 s → 6.7 s at sf0.1).
    # Token re-evaluation in the pushed predicate costs ~0.2 s. This
    # also never builds the hash array for short docs, where
    # sequence(0, size-k) with size < k would count DOWN and produce
    # garbage k-grams instead of an empty array.
    # the kgram+md5 build is the dominant cost and is pure narrow
    # compute — a single-file scan would run it on one core
    base = spread_for_compute(df).where(
        F.size(toks) >= window + k - 1
    ).select(F.col(id_col).alias("doc_id"), hs.alias("hs"))
    wins = F.transform(
        F.sequence(F.lit(1), F.size("hs") - (window - 1)),
        lambda i: F.array_min(F.slice("hs", i, window)),
    )
    fps = base.select("doc_id", F.array_distinct(wins).alias("fps"))
    checksum = F.expr(
        f"aggregate(fps, 0L, (acc, fp) -> (acc + fp % {2**31}) % {2**31})"
    )
    return fps.select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fps"),
        checksum.alias("fp_checksum"),
    )
