"""DOCX extraction: round trips, entity decoding, quarantine contract."""

from __future__ import annotations

import pytest

from hive_udf_spark.operators.docx import (
    docx_text_table,
    encode_docx,
    extract_docx_text,
)


def test_round_trip_runs_and_paragraphs():
    b = encode_docx([["hello ", "world"], ["second"], []])
    t, n = extract_docx_text(b)
    assert t == "hello world\nsecond\n"
    assert n == 3


def test_entities_round_trip():
    s = "a&b<c>\"d'e &amp; nested"
    t, _ = extract_docx_text(encode_docx([[s]]))
    assert t == s


def test_missing_document_xml_raises():
    from hive_udf_spark.operators.zipcodec import encode_zip

    with pytest.raises(ValueError):
        extract_docx_text(encode_zip([("other.xml", b"<x/>")]))


def test_not_wordprocessingml_raises():
    from hive_udf_spark.operators.zipcodec import encode_zip

    with pytest.raises(ValueError):
        extract_docx_text(encode_zip([("word/document.xml", b"<html/>")]))


def test_garbage_raises():
    with pytest.raises(ValueError):
        extract_docx_text(b"PK\x03\x04 not really a zip")


def test_quarantine_routing(spark):
    good = encode_docx([["ok"]])
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"garbage"))],
        "doc_id bigint, blob binary",
    )
    rows = {r.doc_id: r for r in docx_text_table(df, on_error="quarantine").collect()}
    assert rows[1].text == "ok" and rows[1].n_paragraphs == 1
    assert rows[2].text is None and rows[2].n_paragraphs == -1
    with pytest.raises(Exception):
        docx_text_table(df, on_error="raise").collect()


def test_truncated_archive_quarantines(spark):
    good = encode_docx([["ok"]])
    df = spark.createDataFrame(
        [(1, bytearray(good[: len(good) // 2]))], "doc_id bigint, blob binary"
    )
    rows = docx_text_table(df, on_error="quarantine").collect()
    assert rows[0].n_paragraphs == -1


def test_unclosed_paragraph_raises_not_drops():
    from hive_udf_spark.operators.zipcodec import encode_zip

    xml = (
        b'<w:document><w:body><w:p><w:r><w:t>kept</w:t></w:r></w:p>'
        b"<w:p><w:r><w:t>truncated"  # opened, never closed
        b"</w:body></w:document>"
    )
    blob = encode_zip([("word/document.xml", xml)])
    with pytest.raises(ValueError, match="paragraph opens"):
        extract_docx_text(blob)
