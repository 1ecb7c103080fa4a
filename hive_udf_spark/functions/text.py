"""Text-analysis primitives for LLM-data pipelines (BASELINE north star).

All pure Catalyst expressions (split/transform/aggregate/size) — no Python
in the hot path, so these run at scan speed inside whole-stage codegen and
survive a 100 TB corpus unchanged.

The corpus is the ``documents`` table: space-separated word soup
(FIXTURES.md). Tokenization is whitespace-based by design; a BPE-ish
regex tokenizer is provided for token *counting* parity with LLM
preprocessing pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# GPT-2-style pre-tokenizer shape: word pieces, numbers, punctuation runs.
BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def tokenize(text: Column | str) -> Column:
    """Whitespace tokens with empties removed (split collapses runs)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def word_set(text: Column | str) -> Column:
    """Distinct whitespace tokens — the shingle set for set-based dedup."""
    return F.array_distinct(tokenize(text))


def ngrams(tokens: Column, n: int, sep: str = " ") -> Column:
    """Word n-grams as join-of-slices; empty array when len(tokens) < n."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        return tokens
    # Guarded: sequence(1, 0) would materialize DESCENDING [1, 0] and the
    # slice(tokens, 0, n) would raise INVALID_PARAMETER_VALUE.START, so short
    # arrays must short-circuit to an empty index list, not an empty range.
    idx = F.when(
        F.size(tokens) >= n,
        F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.array_join(F.slice(tokens, i, n), sep))


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokenize(text))


def bpeish_token_count(text: Column | str) -> Column:
    """Count of BPE-ish pre-tokens (letters runs / digit runs / punct runs).

    ``regexp_count`` is JVM-side; this is the cheap deterministic stand-in
    for an LLM tokenizer's token count at corpus-audit scale.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPEISH_PATTERN))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Deterministic quality-scoring features (all SQL-expressible).

    Returns named columns; callers pick/alias. Mirrors the usual LLM-data
    quality heuristics: length, token shape, lexical diversity.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = tokenize(c)
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    return {
        "n_chars": F.length(c),
        "n_tokens": n_tok,
        "n_unique_tokens": n_uniq,
        "uniq_ratio": F.round(n_uniq.cast("double") / n_tok.cast("double"), 6),
        "avg_token_len": F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).cast("double")
            / n_tok.cast("double"),
            6,
        ),
    }


def doc_fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text. Engine-portable (DuckDB: md5(lower(...)))."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))


# ---------------------------------------------------------------------------
# PII-style redaction (training-data scrubbing)
# ---------------------------------------------------------------------------

# Conservative patterns chosen for cross-engine regex compatibility
# (Java regex and RE2 agree on these constructs — no backrefs/lookarounds).
REDACTION_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{6,}[0-9]",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "ssn_like": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def redact_pii(
    text: Column | str,
    kinds: tuple[str, ...] = ("email", "phone", "ipv4", "ssn_like"),
    token_fmt: str = "<{kind}>",
) -> Column:
    """Replace PII-shaped substrings with typed placeholder tokens — the
    standard scrub step before text enters a training corpus.

    Chained ``regexp_replace`` (JVM-side, codegen): one pass per kind in
    the declared order (email before phone, so digit runs inside an
    address aren't half-eaten). Deterministic and engine-portable; each
    pattern avoids constructs where regex dialects diverge.
    """
    c = F.col(text) if isinstance(text, str) else text
    for kind in kinds:
        if kind not in REDACTION_PATTERNS:
            raise ValueError(f"unknown redaction kind {kind!r}")
        c = F.regexp_replace(c, REDACTION_PATTERNS[kind], token_fmt.format(kind=kind))
    return c


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts (corpus audit: how much is there to
    scrub?). ``regexp_count`` over the same patterns."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        kind: F.regexp_count(c, F.lit(pat)) for kind, pat in REDACTION_PATTERNS.items()
    }
