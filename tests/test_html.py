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


def test_numeric_character_references(spark):
    # decimal, hex (both cases), 2/3/4-byte UTF-8 synthesis
    assert _extract(spark, "A&#72;&#105;!") == "AHi!"
    assert _extract(spark, "caf&#233; caf&#xE9; caf&#xe9;") == "café café café"
    assert _extract(spark, "q&#8217;s &#x2019;s") == "q’s ’s"
    assert _extract(spark, "x&#128169;y") == "x💩y"
    # nbsp (named, decimal, hex) folds to plain space and collapses
    assert _extract(spark, "a&nbsp;&#160;&#xA0;b") == "a b"
    # whitespace-producing numerics collapse with their neighbors
    assert _extract(spark, "a&#9;&#10;b") == "a b"


def test_invalid_references_stay_literal(spark):
    assert _extract(spark, "a &#0; b") == "a &#0; b"
    assert _extract(spark, "a &#xD800; b") == "a &#xD800; b"  # surrogate
    assert _extract(spark, "a &#9999999; b") == "a &#9999999; b"  # > 10FFFF
    assert _extract(spark, "a &bogusname; b") == "a &bogusname; b"
    assert _extract(spark, "&") == "&"
    assert _extract(spark, "&&amp;&") == "&&&"


def test_legacy_no_semicolon_forms(spark):
    """WHATWG error-recovery: the 106 historic names decode WITHOUT a
    semicolon by longest-prefix match; non-legacy names do not."""
    # bare legacy forms decode ("&amp x" → "& x"), as html.unescape does
    assert _extract(spark, "bare & amp &amp no-semicolon") == (
        "bare & amp & no-semicolon"
    )
    assert _extract(spark, "fish &amp chips &copy 2026") == "fish & chips © 2026"
    # longest munch: &notit → ¬ + "it" (not "no"+...); &notin; is a full name
    assert _extract(spark, "x &notit; y") == "x ¬it; y"
    assert _extract(spark, "x &notin; y") == "x ∉ y"
    # unknown semicolon name with a legacy prefix: prefix still applies
    assert _extract(spark, "&copy2;") == "©2;"
    # non-legacy names stay literal without a semicolon
    assert _extract(spark, "&hellip oops") == "&hellip oops"


def test_full_whatwg_table_and_multicodepoint(spark):
    """The long WHATWG tail decodes: multi-codepoint values, combining
    sequences, and capitalized variants the common set never had."""
    import html as pyhtml

    from hive_udf_spark.functions.html import NAMED_ENTITIES

    assert len(NAMED_ENTITIES) > 2000
    cases = "&acE; &bnequiv; &fjlig; &CounterClockwiseContourIntegral; &nvap;"
    assert _extract(spark, cases) == pyhtml.unescape(cases)


def test_named_entities_table(spark):
    assert _extract(spark, "&Eacute;l&eacute;phant &frac12; &ne; &hellip;") == (
        "Éléphant ½ ≠ …"
    )
    assert _extract(spark, "&copy; 2026 &mdash; &laquo;x&raquo;") == (
        "© 2026 — «x»"
    )


def test_unterminated_blocks_strip_to_eof(spark):
    """A truncated page whose <script>/<style>/<!-- never closes must
    not leak its body into the text (r8 verdict item 2)."""
    assert _extract(spark, "<p>keep</p><script>var t = 'leaky tail';") == "keep"
    assert _extract(spark, "<p>keep</p><style>p { color: red;") == "keep"
    assert _extract(spark, "<p>keep</p><!-- truncated comment") == "keep"
    # a CLOSED block after text still strips pairwise, text survives
    assert _extract(spark, "<script>a()</script><p>x</p><style>s</style>") == "x"


def test_cross_engine_parity_and_unescape_property(spark):
    """The DuckDB oracle chain and the Spark chain must be byte-equal on
    adversarial inputs, and both must agree with Python's
    ``html.unescape`` on the covered set (well-formed refs from the
    shipped table + valid numerics, excluding the documented nbsp →
    space normalization and ws-collapsing outputs)."""
    import html as pyhtml
    import random

    import duckdb
    import pandas as pd

    from hive_udf_spark.functions.html import (
        NAMED_ENTITIES,
        html_to_text_sql,
    )

    rng = random.Random(90210)
    # exclude whitespace-valued names: nbsp is normalized to ' ' by the
    # chain (documented), and Python re's \s is unicode-aware where the
    # engines' \s is ASCII — unicode-space outputs would diverge in the
    # reference collapse, not in the engines
    names = [n for n, v in NAMED_ENTITIES.items() if not v.isspace()]
    cases = []
    for _ in range(120):
        parts = []
        for _ in range(rng.randint(1, 6)):
            kind = rng.randint(0, 5)
            if kind == 0:
                parts.append("&" + rng.choice(names) + ";")
            elif kind == 1:
                # (no noncharacters: html.unescape DELETES e.g. U+10FFFF
                # where the chain keeps it — outside the covered set)
                cp = rng.choice([33, 65, 233, 0x2019, 0x4E2D, 0x1F600, 0x10348])
                parts.append(f"&#{cp};")
            elif kind == 2:
                cp = rng.choice([0x21, 0xE9, 0x2019, 0x1F4A9])
                parts.append(f"&#x{cp:X};" if rng.random() < 0.5 else f"&#x{cp:x};")
            elif kind == 3:
                parts.append(rng.choice(["w", "xy", "a&b", "z&", "&amp;lt;"]))
            elif kind == 4:
                # legacy no-semicolon forms (longest-prefix error recovery)
                from hive_udf_spark.functions.html import LEGACY_ENTITIES

                legacy = [
                    k for k, v in LEGACY_ENTITIES.items() if not v.isspace()
                ]
                parts.append("&" + rng.choice(legacy) + rng.choice(["", "tail"]))
            else:
                parts.append(rng.choice(["&#bad;", "&#xZZ;", "&unknown;"]))
        cases.append("g ".join(parts))
    pdf = pd.DataFrame({"i": range(len(cases)), "html": cases})
    got_spark = {
        r.i: r.t
        for r in spark.createDataFrame(pdf)
        .select("i", html_to_text("html").alias("t"))
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = dict(
        con.execute(f"SELECT i, {html_to_text_sql('html')} FROM t").fetchall()
    )
    import re

    for i, c in enumerate(cases):
        assert got_spark[i] == got_duck[i], (c, got_spark[i], got_duck[i])
        # reference decode on the covered set: unescape, then the same
        # ws collapse/trim the chain applies
        if "&#bad" in c or "&#xZZ" in c or "&unknown" in c or "&amp;lt;" in c:
            continue  # unescape recovers some malformed refs; out of covered set
        want = re.sub(r"\s+", " ", pyhtml.unescape(c)).strip()
        assert got_spark[i] == want, (c, got_spark[i], want)


def test_plan_is_pure_jvm(spark):
    """The extraction chain must stay in whole-stage codegen — no
    Python/Arrow stages anywhere (this is the 100 TB hot path)."""
    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = df.select(html_to_text("html").alias("t"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
