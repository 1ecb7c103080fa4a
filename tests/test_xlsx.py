"""XLSX extraction: shared-strings indirection, numerics, quarantine."""

from __future__ import annotations

import pytest

from hive_udf_spark.operators.xlsx import (
    encode_xlsx,
    extract_xlsx_cells,
    xlsx_cells_table,
)


def test_shared_string_dedup_and_order():
    b = encode_xlsx([["x", "y", "x"], ["y", 7]])
    assert extract_xlsx_cells(b) == [
        ("A1", "x", None), ("B1", "y", None), ("C1", "x", None),
        ("A2", "y", None), ("B2", None, 7.0),
    ]


def test_entities_round_trip():
    s = "a&b<c>\"d'e"
    assert extract_xlsx_cells(encode_xlsx([[s]]))[0] == ("A1", s, None)


def test_wide_row_column_names():
    b = encode_xlsx([[float(i) for i in range(28)]])
    refs = [c for c, _, _ in extract_xlsx_cells(b)]
    assert refs[0] == "A1" and refs[25] == "Z1"
    assert refs[26] == "AA1" and refs[27] == "AB1"


def test_out_of_range_shared_index_raises():
    from hive_udf_spark.operators.zipcodec import encode_zip

    sheet = (
        b'<worksheet><sheetData><row><c r="A1" t="s"><v>5</v></c></row>'
        b"</sheetData></worksheet>"
    )
    blob = encode_zip([("xl/worksheets/sheet1.xml", sheet)])
    with pytest.raises(ValueError):
        extract_xlsx_cells(blob)


def test_missing_sheet_raises():
    from hive_udf_spark.operators.zipcodec import encode_zip

    with pytest.raises(ValueError):
        extract_xlsx_cells(encode_zip([("other.xml", b"<x/>")]))


def test_quarantine_routing(spark):
    good = encode_xlsx([["ok", 1]])
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"junk"))],
        "doc_id bigint, blob binary",
    )
    rows = xlsx_cells_table(df, on_error="quarantine").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 2 and by_doc[1][0].s_value == "ok"
    assert len(by_doc[2]) == 1 and by_doc[2][0].cell is None


def test_unrecognized_cell_shape_raises_not_drops():
    from hive_udf_spark.operators.zipcodec import encode_zip

    # a styled cell (s= attr before r=) outside the vendored shape must
    # raise, never silently vanish from the output
    sheet = (
        b'<worksheet><sheetData><row>'
        b'<c r="A1"><v>1</v></c>'
        b'<c s="3" r="B1"><v>2</v></c>'
        b"</row></sheetData></worksheet>"
    )
    blob = encode_zip([("xl/worksheets/sheet1.xml", sheet)])
    with pytest.raises(ValueError, match="unsupported cell shape"):
        extract_xlsx_cells(blob)
