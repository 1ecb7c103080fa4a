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


_VTT = (
    "WEBVTT - some metadata\n\n"
    "NOTE\nthis comment must vanish\n\n"
    "00:00:01.250 --> 00:00:03.000\nhello there\n\n"
    "cue-b\n02:03.004 --> 02:05.999 align:start line:0\nshort form\n\n"
    "7\n10:00:00.000 --> 10:00:01.500\nline one\nline two\n\n"
)


def test_vtt_hand_written_cues(spark):
    """WebVTT divergences: header + NOTE blocks dropped, optional cue
    ids, hour-less timestamps, settings after the end time."""
    from hive_udf_spark.functions.subtitles import (
        VTT_TEXT_PAT,
        vtt_cue_id_sql,
        vtt_time_ms_sql,
    )

    df = spark.createDataFrame([(_VTT,)], "vtt string")
    cues = df.select(
        F.posexplode(
            F.filter(F.split("vtt", r"\n\n"), lambda x: x.contains("-->"))
        ).alias("idx", "cue")
    )
    text_pat = VTT_TEXT_PAT.replace("\\", "\\\\")
    rows = cues.select(
        "idx",
        F.expr(vtt_cue_id_sql("cue", "spark")).alias("cid"),
        F.expr(vtt_time_ms_sql("cue", 1, "spark")).alias("s"),
        F.expr(vtt_time_ms_sql("cue", 5, "spark")).alias("e"),
        F.expr(f"regexp_extract(cue, '{text_pat}', 1)").alias("t"),
    ).collect()
    assert [(r.idx, r.cid, r.s, r.e, r.t) for r in rows] == [
        (0, "", 1250, 3000, "hello there"),
        (1, "cue-b", 123004, 125999, "short form"),
        (2, "7", 36000000, 36001500, "line one\nline two"),
    ]


def test_vtt_oracle_sql_matches_duckdb():
    """The same helpers render into DuckDB (RE2): dialect parity on the
    optional-hours fold and the id CASE."""
    import duckdb

    from hive_udf_spark.functions.subtitles import (
        VTT_TEXT_PAT,
        vtt_cue_id_sql,
        vtt_time_ms_sql,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE c(cue VARCHAR)")
    con.execute(
        "INSERT INTO c VALUES (?), (?)",
        [
            "00:00:01.250 --> 00:00:03.000\nhello there",
            "cue-b\n02:03.004 --> 02:05.999 align:start\nshort form",
        ],
    )
    rows = con.execute(
        f"SELECT {vtt_cue_id_sql('cue', 'duckdb')}, "
        f"{vtt_time_ms_sql('cue', 1, 'duckdb')}, "
        f"{vtt_time_ms_sql('cue', 5, 'duckdb')}, "
        f"regexp_extract(cue, '{VTT_TEXT_PAT}', 1) FROM c"
    ).fetchall()
    assert rows == [
        ("", 1250, 3000, "hello there"),
        ("cue-b", 123004, 125999, "short form"),
    ]
