"""HTML → text extraction as pure JVM column expressions.

The first step of nearly every web-scale training-data pipeline
(CommonCrawl-style corpora arrive as markup). This implementation is a
deterministic regexp chain — no Python, no UDFs, whole-stage-codegen
friendly — covering the extraction core: script/style/noscript block
removal, comment removal, tag stripping, named-entity decoding, and
whitespace normalization.

Engine-portability constraints (the SQL oracle runs the SAME chain in
DuckDB/RE2): no backreferences (RE2 lacks them — the script/style/
noscript blocks are three explicit patterns instead of ``<(x|y)…</\\1>``),
inline ``(?is)`` flags instead of engine-specific option arguments, and
non-greedy ``.*?`` (supported by both Java regex and RE2).

Scope: this is the regexp-extraction tier (what CCNet/Gopher-era
pipelines shipped), not a DOM parser — malformed nesting degrades
gracefully (a tag is anything matching ``<[^>]+>``), and numeric
character references are out of scope (documented; a decode would need
per-match codepoint synthesis, which neither engine's regexp_replace
can express).

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated text-analysis extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["html_to_text", "html_escape_text", "HTML_TO_TEXT_SQL_STEPS"]

# (pattern, replacement) chain, applied in order. Kept as data so the
# DuckDB oracle can be generated from the SAME list (single source of
# truth — the two engines cannot drift apart silently).
_BLOCK_STRIP = [
    (r"(?is)<script\b.*?</script\s*>", " "),
    (r"(?is)<style\b.*?</style\s*>", " "),
    (r"(?is)<noscript\b.*?</noscript\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]+>", " "),
]
# Named entities: every other entity first, ampersand LAST — decoding
# ``&amp;`` first would turn ``&amp;lt;`` into ``<`` (double-decode).
_ENTITIES = [
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&apos;", "'"),
    (r"&#39;", "'"),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
]
_WS = [(r"\s+", " ")]

HTML_TO_TEXT_SQL_STEPS = _BLOCK_STRIP + _ENTITIES + _WS


def html_to_text(col: Column | str) -> Column:
    """Markup → plain text: strip script/style/noscript/comment blocks,
    strip tags, decode named entities, collapse whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in HTML_TO_TEXT_SQL_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(c)


def html_escape_text(col: Column | str) -> Column:
    """Entity-encode text for embedding into markup (&, <, > — in that
    order, ampersand first). The fixture twin of the entity-decode step;
    also the correct escaper for building HTML sinks."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"&", "&amp;")
    c = F.regexp_replace(c, r"<", "&lt;")
    c = F.regexp_replace(c, r">", "&gt;")
    return c
