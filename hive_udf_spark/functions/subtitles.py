"""SRT subtitle parsing as pure column expressions (no UDF).

Caption files are a standard speech/ASR training-data source: cues of
``seq\\nHH:MM:SS,mmm --> HH:MM:SS,mmm\\ntext...\\n\\n``.  Parsing is
split-on-blank-line + one regexp per field, so it stays inside
whole-stage codegen in Spark and renders into DuckDB from the same
constants.  Timestamps convert to integer milliseconds (exact in both
engines).

No reference analogue (the reference is a cardinality-UDAF package);
mandated multimodal/text extension surface (SURVEY.md §2.3).
"""

from __future__ import annotations

__all__ = [
    "SRT_SEQ_PAT",
    "SRT_TIME_PAT",
    "SRT_TEXT_PAT",
    "srt_time_ms_sql",
    "VTT_TIME_PAT",
    "VTT_TEXT_PAT",
    "vtt_cue_id_sql",
    "vtt_time_ms_sql",
]

# field extractors over ONE cue block (seq line, timing line, text lines)
SRT_SEQ_PAT = r"^\s*([0-9]+)\s*\n"
SRT_TIME_PAT = (
    r"([0-9]{2}):([0-9]{2}):([0-9]{2}),([0-9]{3})"
    r" --> "
    r"([0-9]{2}):([0-9]{2}):([0-9]{2}),([0-9]{3})"
)
# everything after the timing line (multi-line cue text)
SRT_TEXT_PAT = r"(?s)^[^\n]*\n[^\n]*\n(.*)$"


# --- WebVTT (the SRT differences: WEBVTT header block, NOTE comment
# blocks, '.' millisecond separator, OPTIONAL hours, optional cue
# identifier line above the timing line, cue settings after the end
# timestamp).  Same discipline: split-on-blank-line + one regexp per
# field, all inside whole-stage codegen; both engines return '' for an
# unmatched optional group, so the optional-hours arm folds to 0 with
# COALESCE(NULLIF(g, ''), '0') identically in both dialects.

VTT_TIME_PAT = (
    r"(?:([0-9]+):)?([0-9]{2}):([0-9]{2})\.([0-9]{3})"
    r" --> "
    r"(?:([0-9]+):)?([0-9]{2}):([0-9]{2})\.([0-9]{3})"
)
# cue text: everything after the line containing the arrow (the lazy ??
# skips an optional id line; RE2 and java.util.regex both support it —
# lookaheads deliberately avoided: RE2 has none)
VTT_TEXT_PAT = r"(?s)^(?:[^\n]*\n)??[^\n]*-->[^\n]*\n(.*)$"
_FIRST_LINE_PAT = r"^([^\n]*)"


def vtt_cue_id_sql(cue_expr: str, dialect: str) -> str:
    """The optional cue-identifier line: the cue's first line unless it
    IS the timing line ('' when absent).  CASE + LIKE — no lookahead,
    identical in both dialects."""
    first = f"regexp_extract({cue_expr}, '{_FIRST_LINE_PAT}', 1)"
    return (
        f"CASE WHEN {first} LIKE '%-->%' THEN '' ELSE {first} END"
    )


def vtt_time_ms_sql(cue_expr: str, group_base: int, dialect: str) -> str:
    """Integer milliseconds of one side of a WebVTT timing line:
    ``group_base`` 1 → start (groups 1-4), 5 → end (groups 5-8);
    group 1/5 (hours) is optional and folds to 0 when absent."""
    pat = VTT_TIME_PAT.replace("\\", "\\\\") if dialect == "spark" else VTT_TIME_PAT
    g = [
        f"regexp_extract({cue_expr}, '{pat}', {group_base + i})" for i in range(4)
    ]
    hours = f"CAST(COALESCE(NULLIF({g[0]}, ''), '0') AS BIGINT)"
    parts = [f"CAST({x} AS BIGINT)" for x in g[1:]]
    return (
        f"({hours} * 3600000 + {parts[0]} * 60000 "
        f"+ {parts[1]} * 1000 + {parts[2]})"
    )


def srt_time_ms_sql(cue_expr: str, group_base: int, dialect: str) -> str:
    """Integer milliseconds of one side of the timing line:
    ``group_base`` 1 → start (groups 1-4), 5 → end (groups 5-8)."""
    pat = SRT_TIME_PAT.replace("\\", "\\\\") if dialect == "spark" else SRT_TIME_PAT
    parts = [
        f"CAST(regexp_extract({cue_expr}, '{pat}', {group_base + i}) AS BIGINT)"
        for i in range(4)
    ]
    return (
        f"({parts[0]} * 3600000 + {parts[1]} * 60000 "
        f"+ {parts[2]} * 1000 + {parts[3]})"
    )
