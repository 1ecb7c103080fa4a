"""SRT parsing: hand-written cue files through the production query path."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_udf_spark.functions.subtitles import (
    SRT_SEQ_PAT,
    SRT_TEXT_PAT,
    srt_time_ms_sql,
)

_SRT = (
    "1\n00:00:01,250 --> 00:00:03,000\nhello there\n\n"
    "2\n01:02:03,004 --> 01:02:05,999\nline one\nline two\n\n"
)


def test_hand_written_cues(spark):
    df = spark.createDataFrame([(_SRT,)], "srt string")
    cues = df.select(
        F.posexplode(
            F.filter(F.split("srt", r"\n\n"), lambda x: x != F.lit(""))
        ).alias("idx", "cue")
    )
    seq_pat = SRT_SEQ_PAT.replace("\\", "\\\\")
    text_pat = SRT_TEXT_PAT.replace("\\", "\\\\")
    rows = cues.select(
        F.expr(f"CAST(regexp_extract(cue, '{seq_pat}', 1) AS INT)").alias("seq"),
        F.expr(srt_time_ms_sql("cue", 1, "spark")).alias("s"),
        F.expr(srt_time_ms_sql("cue", 5, "spark")).alias("e"),
        F.expr(f"regexp_extract(cue, '{text_pat}', 1)").alias("t"),
    ).collect()
    assert [(r.seq, r.s, r.e, r.t) for r in rows] == [
        (1, 1250, 3000, "hello there"),
        (2, 3723004, 3725999, "line one\nline two"),
    ]
