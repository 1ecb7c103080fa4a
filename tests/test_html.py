"""HTML → text extraction (functions/html.py, r6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_udf_spark.functions.html import html_escape_text, html_to_text


def _extract(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "html string")
    return df.select(html_to_text("html").alias("t")).collect()[0].t


def test_tags_stripped_and_text_kept(spark):
    assert (
        _extract(spark, "<html><body><h1>Title</h1><p>Hello <b>world</b></p></body></html>")
        == "Title Hello world"
    )


def test_script_style_blocks_removed_entirely(spark):
    s = (
        '<style>p { content: "not text" }</style><p>keep</p>'
        "<script>var s = '<p>fake</p>';</script>"
        "<SCRIPT>upper();</SCRIPT><noscript><p>no js</p></noscript>"
    )
    assert _extract(spark, s) == "keep"


def test_script_containing_closing_markup_in_string(spark):
    # the classic trap: "</p>" inside a script string must not leak
    s = '<p>a</p><script>var x = 1 < 2 && "</p>";</script><p>b</p>'
    assert _extract(spark, s) == "a b"


def test_comments_removed_multiline(spark):
    assert _extract(spark, "x<!-- one\ntwo\nthree -->y") == "x y"


def test_entities_decoded_in_correct_order(spark):
    # &amp;lt; must decode to literal "&lt;", NOT to "<" (double decode)
    assert _extract(spark, "a &amp;lt; b &lt;tag&gt; &quot;q&quot; &nbsp;c") == (
        'a &lt; b <tag> "q" c'
    )


def test_escape_then_extract_roundtrip(spark):
    raw = '5 < 6 && "x" > y &amp; <script>not a block</script>'
    df = spark.createDataFrame([(raw,)], "t string")
    wrapped = df.select(
        F.concat(F.lit("<p>"), html_escape_text("t"), F.lit("</p>")).alias("html")
    )
    got = wrapped.select(html_to_text("html").alias("x")).collect()[0].x
    # escaped markup survives extraction as TEXT (no block/tag munching)
    assert got == raw


def test_whitespace_collapse_and_trim(spark):
    assert _extract(spark, "  <p>\n\n a\t\tb </p>\n ") == "a b"


def test_plan_is_pure_jvm(spark):
    """The extraction chain must stay in whole-stage codegen — no
    Python/Arrow stages anywhere (this is the 100 TB hot path)."""
    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = df.select(html_to_text("html").alias("t"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
