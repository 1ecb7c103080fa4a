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
