"""Mojibake (encoding-corruption) detection and repair for text corpora.

The dominant real-world corruption in crawled text: UTF-8 bytes decoded
as Windows-1252, so U+2019 RIGHT SINGLE QUOTATION MARK surfaces as
``â€™`` and U+00E9 ``é`` as ``Ã©``.  This module models exactly that
transform over a curated character inventory:

- ``forward(ch) = ch.encode('utf-8').decode('cp1252')`` — computed at
  import (never hand-typed), restricted to characters whose UTF-8 bytes
  all exist in cp1252 (bytes 81/8D/8F/90/9D are undefined there, which
  excludes e.g. U+201D from the inventory; real pipelines see those as
  replacement chars and they are not reversible anyway).
- repair = the inverse replace chain, longest expansions first; a scalar
  ``replace()`` cascade in both engines.
- detection = count of expansion matches via ``regexp_extract_all``.

Like ``functions/url.py``, every operation renders into BOTH dialects
(Spark ``F.expr`` → whole-stage codegen; DuckDB SQL for the oracle) from
one inventory, so the registry oracle executes the identical chain.

Heuristic caveat (documented contract): text that LEGITIMATELY contains
an expansion sequence (e.g. the literal string ``Ã©`` in a discussion of
encodings) is "repaired" too — inherent to any dictionary repair, same
trade ftfy makes.  Detection-then-repair lets callers gate on score.

Also included: control-character / exotic-whitespace cleanup (C0 strip,
NBSP family → space), the standard pre-tokenization hygiene pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "MOJIBAKE_INVENTORY",
    "MOJIBAKE_PAIRS",
    "corrupt_sql",
    "repair_sql",
    "score_sql",
    "cleanup_sql",
    "mojibake_score",
    "mojibake_repair",
    "text_cleanup",
]

# Characters a web corpus actually contains, whose UTF-8 byte sequences
# are fully defined under cp1252 (asserted below).
MOJIBAKE_INVENTORY = (
    "’‘“—–…€™•"  # ’ ‘ “ — – … € ™ •
    "éèêàäöüñç"  # é è ê à ä ö ü ñ ç
    "íóú°£½®©"        # í ó ú ° £ ½ ® ©
)

_UNDEFINED_CP1252 = {0x81, 0x8D, 0x8F, 0x90, 0x9D}


def _forward(ch: str) -> str:
    raw = ch.encode("utf-8")
    if any(b in _UNDEFINED_CP1252 for b in raw):
        raise ValueError(f"U+{ord(ch):04X} hits a cp1252-undefined byte")
    return raw.decode("cp1252")


# (clean_char, mojibake_expansion), longest expansions first so the
# repair cascade never leaves a partial match behind.
MOJIBAKE_PAIRS: list[tuple[str, str]] = sorted(
    ((ch, _forward(ch)) for ch in MOJIBAKE_INVENTORY),
    key=lambda p: (-len(p[1]), p[1]),
)
assert len({exp for _, exp in MOJIBAKE_PAIRS}) == len(MOJIBAKE_PAIRS)
# No expansion may be a substring of another (cascade order safety).
assert not any(
    a != b and a in b for _, a in MOJIBAKE_PAIRS for _, b in MOJIBAKE_PAIRS
)

_SCORE_PATTERN = "|".join(exp for _, exp in MOJIBAKE_PAIRS)


def _chain(x: str, pairs: list[tuple[str, str]]) -> str:
    for search, rep in pairs:
        x = f"replace({x}, '{search}', '{rep}')"
    return x


def corrupt_sql(x: str) -> str:
    """Forward transform (fixture generator): clean → mojibake.
    Dialect-free — plain nested replace()."""
    return _chain(x, [(ch, exp) for ch, exp in MOJIBAKE_PAIRS])


def repair_sql(x: str) -> str:
    """Inverse transform: mojibake expansions → original characters."""
    return _chain(x, [(exp, ch) for ch, exp in MOJIBAKE_PAIRS])


def score_sql(x: str, dialect: str) -> str:
    """Count of mojibake expansion occurrences (detection signal)."""
    if dialect == "spark":
        return f"size(regexp_extract_all({x}, '{_SCORE_PATTERN}', 0))"
    return f"len(regexp_extract_all({x}, '{_SCORE_PATTERN}', 0))"


# C0 controls (minus \t\n\r) and DEL stripped; NBSP/zero-width family
# and exotic spaces normalized to a plain space / removed.  Built from
# explicit codepoints so invisible characters are never hand-typed.
_CTRL_PATTERN = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_SPACE_PATTERN = "[" + "".join(
    chr(c) for c in (0x00A0, 0x2002, 0x2003, 0x2009, 0x202F, 0x3000)
) + "]"
_ZW_PATTERN = "[" + "".join(
    chr(c) for c in (0x200B, 0x200C, 0x200D, 0xFEFF)
) + "]"


def cleanup_sql(x: str, dialect: str) -> str:
    g = ", 'g'" if dialect == "duckdb" else ""
    ctrl = _CTRL_PATTERN.replace("\\", "\\\\") if dialect == "spark" else _CTRL_PATTERN
    x = f"regexp_replace({x}, '{ctrl}', ''{g})"
    x = f"regexp_replace({x}, '{_SPACE_PATTERN}', ' '{g})"
    x = f"regexp_replace({x}, '{_ZW_PATTERN}', ''{g})"
    return x


def mojibake_score(col: str | Column) -> Column:
    name = col if isinstance(col, str) else None
    expr = score_sql(name, "spark") if name else None
    if expr is None:
        raise TypeError("mojibake_score needs a column NAME (F.expr-based)")
    return F.expr(expr)


def mojibake_repair(col: str) -> Column:
    return F.expr(repair_sql(col))


def text_cleanup(col: str) -> Column:
    return F.expr(cleanup_sql(col, "spark"))
