"""Markdown → text extraction as pure JVM column expressions.

GitHub/docs corpora arrive as Markdown; training pipelines want the
prose with the syntax stripped but the CONTENT of inline constructs
(link text, emphasis bodies, inline code) kept.  Same architecture as
``functions/html.py``: a (pattern, replacement) chain kept as DATA so
the DuckDB oracle renders from the SAME list — replacements may carry
one capture group, written ``$1`` here and re-rendered ``\\1`` for
DuckDB (a group reference in the REPLACEMENT is fine in both engines;
backreferences in the PATTERN remain banned — RE2).

Order matters and is load-bearing:

* fenced code blocks drop FIRST (their content is not prose and may
  contain every other construct);
* images before links (``![alt](u)`` is a link pattern plus ``!``);
* inline code keeps its content but runs after fences so a fence's
  backticks can't pair across blocks;
* line-anchored markers (headers, blockquotes, bullets, ordered lists,
  horizontal rules, table separator rows) use ``(?m)`` — supported by
  both Java regex and RE2;
* whitespace collapse is LAST.

Scope: the regexp tier (CommonMark cornerstones, not a CommonMark
parser) — nested emphasis and reference-style links degrade gracefully
to their visible text.  No reference analogue (the reference is a
cardinality-UDAF package); mandated text-analysis extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["markdown_to_text", "MARKDOWN_TO_TEXT_STEPS", "markdown_chain_sql"]

# (pattern, replacement) — replacement may reference one group as $1.
MARKDOWN_TO_TEXT_STEPS: list[tuple[str, str]] = [
    (r"(?s)```.*?```", " "),                      # fenced code blocks
    (r"`([^`\n]+)`", "$1"),                       # inline code -> content
    (r"!\[([^\]]*)\]\([^)]*\)", "$1"),            # images -> alt text
    (r"\[([^\]]*)\]\([^)]*\)", "$1"),             # links -> link text
    (r"<https?://[^>\s]*>", " "),                 # autolinks
    (r"(?m)^#{1,6}[ \t]+", ""),                   # ATX headers
    (r"(?m)^>[ \t]?", ""),                        # blockquote markers
    (r"(?m)^[ \t]*[-*+][ \t]+", ""),              # unordered list bullets
    (r"(?m)^[ \t]*[0-9]+\.[ \t]+", ""),           # ordered list markers
    (r"(?m)^[ \t]*[-*_][ \t]*[-*_][ \t]*[-*_][-*_ \t]*$", " "),  # hrules
    (r"(?m)^[ \t]*:?-{3,}[ \t:|-]*$", " "),       # table separator rows
    (r"\*{1,3}([^*\n]+)\*{1,3}", "$1"),           # * emphasis -> content
    (r"__([^_\n]+)__", "$1"),                     # __ strong -> content
    (r"\|", " "),                                 # table pipes
    (r"\s+", " "),                                # whitespace collapse
]


def markdown_to_text(col: Column | str) -> Column:
    """Markdown → plain text (Spark side of the shared chain)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in MARKDOWN_TO_TEXT_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(c)


def markdown_chain_sql(expr: str, dialect: str) -> str:
    """Render the SAME chain for either engine (Spark escapes
    backslashes in SQL literals; DuckDB replacement groups are \\1)."""
    for pat, rep in MARKDOWN_TO_TEXT_STEPS:
        if dialect == "spark":
            p = pat.replace("\\", "\\\\").replace("'", "''")
            r = rep.replace("'", "''")
            expr = f"regexp_replace({expr}, '{p}', '{r}')"
        else:
            p = pat.replace("'", "''")
            r = rep.replace("$1", r"\1").replace("'", "''")
            expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return f"trim({expr})"
