"""Line-level corpus hygiene: C4/RefinedWeb line filtering and
CCNet-style corpus-frequency boilerplate removal.

Real crawled pages carry navigation chrome, cookie banners, and script
warnings that survive HTML extraction as short repeated lines.  Two
published remedies, both implemented here as dual-dialect SQL generated
from ONE rule table:

* **C4 line rules** (Raffel et al. 2020 §2.2, plus RefinedWeb's
  cookie/boilerplate term list): keep only lines that end in terminal
  punctuation, contain at least ``C4_MIN_WORDS`` words, and mention
  none of the drop terms; drop the whole page when fewer than
  ``C4_MIN_LINES`` lines survive, or when the page contains code
  braces or "lorem ipsum" (page-level rules in C4).
* **CCNet paragraph dedup** (Wenzek et al. 2020 §3.1): a line that
  occurs in more than ``BOILERPLATE_DOC_FRAC`` of documents is
  boilerplate by definition — drop every occurrence corpus-wide,
  keeping surviving lines in original order.

Scale notes (100 TB): the C4 filter is a pure per-row projection
(split → filter λ → join) — zero shuffle, runs at scan speed inside
whole-stage codegen.  CCNet needs corpus statistics: one shuffle on the
line value to count document frequency, then the above-threshold set is
by construction tiny (each member appears in >10% of all documents, so
there are at most 10 such lines per corpus-slice of distinct content) —
it broadcasts, and the removal pass is a broadcast anti-join followed by
one groupBy(doc_id) reassembly.  No all-pairs anything.

The `documents` fixture is single-line word soup, so queries synthesize
a deterministic multi-line page around each row — 7-word sentence lines
plus injected boilerplate (script warning, cookie banner, short line,
and per-residue lorem-ipsum / code-brace lines) — identically in both
engines via :func:`synth_lines_sql`.

Reference parity: the reference engine (MLnick/hive-udf) has no text
operators; this module is part of the mandated LLM-pipeline extension
surface (SURVEY.md §2.3).
"""

from __future__ import annotations

__all__ = [
    "C4_MIN_WORDS",
    "C4_MIN_LINES",
    "C4_DROP_TERMS",
    "BOILERPLATE_DOC_FRAC",
    "JS_LINE",
    "SHORT_LINE",
    "COOKIE_LINE",
    "LOREM_LINE",
    "BRACE_LINE",
    "synth_lines_sql",
    "split_lines_sql",
    "c4_line_pred_sql",
    "c4_kept_lines_sql",
    "c4_page_drop_pred_sql",
    "join_lines_sql",
]

# ---------------------------------------------------------------------------
# Shared rule constants (single source of truth for Spark + DuckDB + tests)
# ---------------------------------------------------------------------------

C4_MIN_WORDS = 5     # C4: "only retained lines that contained at least 5 words"
C4_MIN_LINES = 3     # C4: "discarded any page with fewer than 3 sentences"
# Line-level drop terms: C4's javascript rule + RefinedWeb's cookie banners.
C4_DROP_TERMS = ("javascript", "cookie")
# Page-level drops: C4 removes pages containing '{' (code) or "lorem ipsum".
C4_PAGE_DROP_SUBSTRINGS = ("{", "lorem ipsum")

# CCNet document-frequency threshold: a line present in more than this
# fraction of documents is boilerplate.
BOILERPLATE_DOC_FRAC = 0.10

# Injected fixture lines — chosen so each C4 rule fires on exactly one:
JS_LINE = "please enable javascript and cookies to continue"  # no '.', term hit
SHORT_LINE = "ok go now."                                     # < 5 words
COOKIE_LINE = "we use cookies to improve your experience accept all."  # term
LOREM_LINE = "lorem ipsum dolor sit amet consectetur adipiscing elit."  # page
BRACE_LINE = "var config = { mode: full }"                    # page (brace)

_TERMINAL_PUNCT = '[.!?"]$'
_CHUNK_PAT = r"((\S+ ){6}\S+) "  # 7-word sentences; remainder keeps no '.'


def _esc(dialect: str, pat: str) -> str:
    """Embed a regex in a SQL literal (Spark's parser eats backslashes)."""
    return pat.replace("\\", "\\\\") if dialect == "spark" else pat


def synth_lines_sql(expr: str, dialect: str) -> str:
    """Deterministic multi-line page around a one-line text column.

    Content is chunked into 7-word sentence lines each ending ``.``;
    the chunk remainder (< 7 words) keeps no punctuation.  Boilerplate
    is injected: script warning + short line before the content, cookie
    banner after; every 5th doc gains a lorem-ipsum line and every 7th
    a code-brace line (page-level rule triggers).  ``~`` is the interim
    separator (fixture text is ``[a-z ]`` only) swapped to a real
    newline at the end, so the regex machinery never has to embed a
    newline in a replacement literal.
    """
    pat = _esc(dialect, _CHUNK_PAT)
    rep = "$1.~" if dialect == "spark" else r"\1.~"
    chunked = (
        f"regexp_replace({expr}, '{pat}', '{rep}')"
        if dialect == "spark"
        else f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    )
    lorem = f"CASE WHEN doc_id % 5 = 0 THEN '~{LOREM_LINE}' ELSE '' END"
    brace = f"CASE WHEN doc_id % 7 = 0 THEN '~{BRACE_LINE}' ELSE '' END"
    assembled = (
        f"'{JS_LINE}~{SHORT_LINE}~' || {chunked} || '~{COOKIE_LINE}' "
        f"|| {lorem} || {brace}"
    )
    return f"replace({assembled}, '~', chr(10))"


def split_lines_sql(expr: str, dialect: str) -> str:
    """Split a page into its line array (newline separator)."""
    if dialect == "spark":
        return f"split({expr}, '\\\\n')"
    return f"string_split({expr}, chr(10))"


def c4_line_pred_sql(var: str, dialect: str) -> str:
    """The per-line KEEP predicate over lambda variable ``var``."""
    rlike = "regexp_like" if dialect == "spark" else "regexp_matches"
    size = "size" if dialect == "spark" else "len"
    split = "split" if dialect == "spark" else "string_split"
    terms = " AND ".join(f"instr({var}, '{t}') = 0" for t in C4_DROP_TERMS)
    return (
        f"{rlike}({var}, '{_TERMINAL_PUNCT}') "
        f"AND {size}({split}({var}, ' ')) >= {C4_MIN_WORDS} AND {terms}"
    )


def c4_kept_lines_sql(lines_expr: str, dialect: str) -> str:
    """Array of lines surviving the C4 line rules (order preserved)."""
    fn = "filter" if dialect == "spark" else "list_filter"
    return f"{fn}({lines_expr}, x -> {c4_line_pred_sql('x', dialect)})"


def c4_page_drop_pred_sql(page_expr: str, n_kept_expr: str) -> str:
    """Page-level DROP predicate (identical text in both dialects)."""
    subs = " OR ".join(
        f"instr({page_expr}, '{s}') > 0" for s in C4_PAGE_DROP_SUBSTRINGS
    )
    return f"({n_kept_expr} < {C4_MIN_LINES} OR {subs})"


def join_lines_sql(arr_expr: str, dialect: str) -> str:
    """Rejoin a line array with newlines ('' for empty, both engines)."""
    if dialect == "spark":
        return f"array_join({arr_expr}, chr(10))"
    # DuckDB's array_to_string([]) is NULL where Spark's array_join is ''.
    return f"coalesce(array_to_string({arr_expr}, chr(10)), '')"
