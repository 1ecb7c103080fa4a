"""EPUB extraction: container walk, chapter ordering, quarantine."""

from __future__ import annotations

import pytest

from hive_udf_spark.operators.epub import (
    encode_epub,
    epub_chapters,
    epub_chapters_table,
)


def test_chapter_order_and_names():
    b = encode_epub(["<p>one</p>", "<p>two</p>", "<p>three</p>"])
    chapters = epub_chapters(b)
    assert [n for n, _ in chapters] == [
        "OEBPS/chapter1.xhtml", "OEBPS/chapter2.xhtml", "OEBPS/chapter3.xhtml"
    ]
    assert "<p>two</p>" in chapters[1][1]


def test_missing_mimetype_raises():
    from hive_udf_spark.operators.zipcodec import encode_zip

    with pytest.raises(ValueError):
        epub_chapters(encode_zip([("OEBPS/chapter1.xhtml", b"<html/>")]))


def test_wrong_mimetype_raises():
    from hive_udf_spark.operators.zipcodec import encode_zip

    with pytest.raises(ValueError):
        epub_chapters(
            encode_zip([("mimetype", b"application/zip"),
                        ("OEBPS/c.xhtml", b"<html/>")])
        )


def test_no_chapters_raises():
    from hive_udf_spark.operators.zipcodec import encode_zip

    with pytest.raises(ValueError):
        epub_chapters(encode_zip([("mimetype", b"application/epub+zip")]))


def test_quarantine_routing(spark):
    good = encode_epub(["<p>x</p>"])
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"nope"))],
        "doc_id bigint, blob binary",
    )
    rows = {r.doc_id: r for r in
            epub_chapters_table(df, on_error="quarantine").collect()}
    assert rows[1].chapter_idx == 0 and "<p>x</p>" in rows[1].xhtml
    assert rows[2].chapter_idx == -1 and rows[2].xhtml is None
