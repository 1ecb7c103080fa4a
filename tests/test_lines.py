"""C4 line filter + CCNet boilerplate removal: rule semantics and the
dual-dialect contract (Spark expression == DuckDB expression on the same
synthesized pages)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from hive_udf_spark.functions.lines import (
    BRACE_LINE,
    C4_MIN_LINES,
    C4_MIN_WORDS,
    COOKIE_LINE,
    JS_LINE,
    LOREM_LINE,
    SHORT_LINE,
    c4_kept_lines_sql,
    c4_page_drop_pred_sql,
    join_lines_sql,
    split_lines_sql,
    synth_lines_sql,
)

_WORDS = " ".join(f"w{i}" for i in range(1, 24))  # 23 words -> 3 lines + tail


def _page(spark, doc_id: int, text: str) -> str:
    df = spark.createDataFrame([(doc_id, text)], "doc_id bigint, text string")
    return df.select(
        F.expr(synth_lines_sql("text", "spark")).alias("p")
    ).collect()[0].p


def _kept(spark, doc_id: int, text: str) -> list[str]:
    df = spark.createDataFrame([(doc_id, text)], "doc_id bigint, text string")
    expr = c4_kept_lines_sql(split_lines_sql("page", "spark"), "spark")
    return (
        df.withColumn("page", F.expr(synth_lines_sql("text", "spark")))
        .select(F.expr(expr).alias("k"))
        .collect()[0]
        .k
    )


def test_synth_structure(spark):
    page = _page(spark, 1, _WORDS)
    lines = page.split("\n")
    # js + short + 3 content + tail + cookie (doc 1: no lorem, no brace)
    assert lines[0] == JS_LINE
    assert lines[1] == SHORT_LINE
    assert lines[-1] == COOKIE_LINE
    content = lines[2:-1]
    assert content[-1] == "w22 w23"  # tail: no terminal punctuation
    assert all(ln.endswith(".") for ln in content[:-1])
    assert all(len(ln.split(" ")) == 7 for ln in content[:-1])


def test_synth_page_rule_lines(spark):
    assert LOREM_LINE in _page(spark, 5, _WORDS).split("\n")
    assert BRACE_LINE in _page(spark, 7, _WORDS).split("\n")
    p1 = _page(spark, 1, _WORDS)
    assert LOREM_LINE not in p1 and BRACE_LINE not in p1


def test_c4_line_rules(spark):
    kept = _kept(spark, 1, _WORDS)
    # Only the three full 7-word sentences survive: js (no punct + term),
    # short (< 5 words), cookie (term), tail (no punct) all drop.
    assert kept == [
        "w1 w2 w3 w4 w5 w6 w7.",
        "w8 w9 w10 w11 w12 w13 w14.",
        "w15 w16 w17 w18 w19 w20 w21.",
    ]
    assert all(len(ln.split(" ")) >= C4_MIN_WORDS for ln in kept)


def test_c4_page_rules(spark):
    # doc 7 carries a '{' line -> page dropped even with 3 kept lines.
    df = spark.createDataFrame(
        [(1, _WORDS), (7, _WORDS), (3, "only two lines worth here")],
        "doc_id bigint, text string",
    )
    d = df.withColumn("page", F.expr(synth_lines_sql("text", "spark")))
    d = d.withColumn(
        "kept", F.expr(c4_kept_lines_sql(split_lines_sql("page", "spark"), "spark"))
    )
    drop = c4_page_drop_pred_sql("page", "size(kept)")
    rows = {
        r.doc_id: (not r.dropped, r.n_kept)
        for r in d.select(
            "doc_id", F.expr(drop).alias("dropped"), F.size("kept").alias("n_kept")
        ).collect()
    }
    assert rows[1] == (True, 3)
    assert rows[7][0] is False  # brace page rule
    assert rows[3] == (False, 0)  # < C4_MIN_LINES survive
    assert C4_MIN_LINES == 3


def test_dual_dialect_agreement(spark):
    texts = [
        (1, _WORDS),
        (5, _WORDS),
        (7, _WORDS),
        (35, _WORDS),  # lorem AND brace
        (2, "tiny"),
        (3, ""),
        (4, "double  space   run here x y z w v u t s r q p o n m"),
    ]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    kept_expr_s = c4_kept_lines_sql(split_lines_sql("page", "spark"), "spark")
    got_s = {
        r.doc_id: (r.page, r.kept)
        for r in df.withColumn("page", F.expr(synth_lines_sql("text", "spark")))
        .select("doc_id", "page", F.expr(join_lines_sql(kept_expr_s, "spark")).alias("kept"))
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", texts)
    kept_expr_d = c4_kept_lines_sql(split_lines_sql("page", "duckdb"), "duckdb")
    got_d = {
        int(r[0]): (r[1], r[2])
        for r in con.execute(
            f"SELECT doc_id, page, {join_lines_sql(kept_expr_d, 'duckdb')} AS kept "
            f"FROM (SELECT doc_id, {synth_lines_sql('text', 'duckdb')} AS page FROM t)"
        ).fetchall()
    }
    assert got_s == got_d


def test_empty_text_deterministic(spark):
    # '' -> no chunk match -> content is one empty line; nothing survives.
    kept = _kept(spark, 3, "")
    assert kept == []


def test_line_repetition_metrics(spark):
    from hive_udf_spark.plans.text_queries import _line_rep_metrics

    # 4 lines, 'dup' repeated: n=4, distinct=3; chars 3+3+5+3=14, distinct 11.
    df = spark.createDataFrame(
        [("dup\ndup\nother\nxyz",)], "page string"
    )
    m = _line_rep_metrics(split_lines_sql("page", "spark"), "spark")
    r = df.select(
        F.expr(m["n_lines"]).alias("n"),
        F.expr(m["dup_line_ppm"]).alias("dl"),
        F.expr(m["dup_char_ppm"]).alias("dc"),
    ).collect()[0]
    assert r.n == 4
    assert r.dl == int(1e6 * 1 / 4)
    assert r.dc == int(1e6 * 3 / 14)


def test_line_repetition_dual_dialect(spark):
    from hive_udf_spark.plans.text_queries import _line_rep_metrics

    page = "a b c.\nx y z.\na b c.\nshort"
    ms = _line_rep_metrics(split_lines_sql("p", "spark"), "spark")
    got_s = (
        spark.createDataFrame([(page,)], "p string")
        .select(F.expr(ms["dup_line_ppm"]).alias("dl"), F.expr(ms["dup_char_ppm"]).alias("dc"))
        .collect()[0]
    )
    md = _line_rep_metrics(split_lines_sql("p", "duckdb"), "duckdb")
    got_d = duckdb.connect().execute(
        f"SELECT {md['dup_line_ppm']} AS dl, {md['dup_char_ppm']} AS dc "
        f"FROM (SELECT ? AS p)",
        [page],
    ).fetchone()
    assert (got_s.dl, got_s.dc) == got_d


def test_token_entropy_hand_computed(spark):
    import math

    from hive_udf_spark.plans import QUERIES

    # "a a b" -> n=3, counts {a:2, b:1}; H = ln3 - (2ln2 + 0)/3
    import tempfile, os
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(1, "a a b", "en", "s", 5), (2, "x", "en", "s", 1)],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).write.parquet(f"{tmp}/documents.parquet")
        for name in ("region nation customer supplier part orders lineitem "
                     "events embeddings").split():
            src = f"/root/testdata/sf0.001/{name}.parquet"
            os.symlink(src, f"{tmp}/{name}.parquet")
        out = {
            r.doc_id: r
            for r in QUERIES["text_token_entropy"].fn(spark, tmp).collect()
        }
    h = round(math.log(3) - (2 * math.log(2)) / 3, 6)
    assert (out[1].n_tokens, out[1].n_distinct, out[1].entropy_nats) == (3, 2, h)
    assert (out[2].n_tokens, out[2].n_distinct, out[2].entropy_nats) == (1, 1, 0.0)
