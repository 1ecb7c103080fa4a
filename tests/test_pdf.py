"""pdfcodec: round trips, malformation rejection, quarantine, fuzz."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from hive_udf_spark.operators.pdfcodec import (
    encode_pdf,
    extract_pdf_pages,
    pdf_pages_table,
)


def test_round_trip_matrix():
    cases = [
        ["hello world", "second page text"],
        ["with (parens) and \\ backslash", "tabs\tand\nnewlines"],
        ["", "only second"],
        ["single"],
        ["a" * 500, "b" * 3, "mixed (deep ((nesting)) ok)"],
    ]
    for flate in (False, True):
        for pages in cases:
            assert extract_pdf_pages(encode_pdf(pages, flate=flate)) == pages


def test_string_escape_forms():
    """Hand-built content streams: octal escapes, line continuations,
    hex strings, unknown escapes (backslash dropped per spec)."""
    from hive_udf_spark.operators.pdfcodec import _page_text

    assert _page_text(b"BT (\\101\\102C) Tj ET") == "ABC"
    assert _page_text(b"BT (a\\\nb) Tj ET") == "ab"  # continuation
    assert _page_text(b"BT (\\q) Tj ET") == "q"  # unknown escape
    assert _page_text(b"BT <48 49> Tj ET") == "HI"  # hex with ws
    assert _page_text(b"BT <484> Tj ET") == "H@"  # odd length pads 0
    assert _page_text(b"BT [(x) -250 (y)] TJ (z) ' ET") == "xyz"


def test_malformed_rejections():
    ok = encode_pdf(["page one", "page two"], flate=True)
    # each mutation must raise ValueError, never escape as another type
    muts = [
        b"hello world",
        ok.replace(b"%PDF-1.4", b"%PDF-1.4") [: len(ok) // 3],
        ok.replace(b"/Root 1 0 R", b"/Size 9 /Z 1 0"),
        ok.replace(b"/FlateDecode", b"/LZWDecode12"),
        ok.replace(b"xref", b"zref", 1),
    ]
    for m in muts:
        with pytest.raises(ValueError):
            extract_pdf_pages(m)
    # /Prev chains are FOLLOWED since r9 — a /Prev pointing into the
    # middle of nowhere is a loud structural error, not silent loss
    prev = ok.replace(b"/Root 1 0 R", b"/Root 1 0 R /Prev 7")
    with pytest.raises(ValueError, match="xref"):
        extract_pdf_pages(prev)
    # truncated deflate stream inside a declared-length window
    flated = encode_pdf(["x" * 200], flate=True)
    comp = zlib.compress(b"BT (hi) Tj ET")
    cut = comp[:-4]
    bad = flated  # build a fresh doc with a broken stream
    from hive_udf_spark.operators import pdfcodec as P

    body = b"%PDF-1.4\n"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length " + str(len(cut)).encode() + b" /Filter /FlateDecode >>\n"
        b"stream\n" + cut + b"\nendstream",
    ]
    buf = bytearray(body)
    offs = []
    for num, o in enumerate(objs, start=1):
        offs.append(len(buf))
        buf += f"{num} 0 obj\n".encode() + o + b"\nendobj\n"
    xo = len(buf)
    buf += f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n"
    for off in offs:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += f"trailer\n<< /Size {len(objs)+1} /Root 1 0 R >>\nstartxref\n{xo}\n%%EOF".encode()
    with pytest.raises(ValueError, match="truncated|inflate"):
        extract_pdf_pages(bytes(buf))


def test_fuzz_byte_flips_never_escape():
    """Random single-byte corruptions: every outcome is a clean decode
    or ValueError — nothing else escapes the decode boundary."""
    rng = np.random.default_rng(11)
    base = bytearray(encode_pdf(["fuzz target page", "page 2 (x)"], flate=True))
    for _ in range(300):
        b = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            pages = extract_pdf_pages(bytes(b))
            assert isinstance(pages, list)
            assert all(isinstance(p, str) for p in pages)
        except ValueError:
            pass


def test_pages_table_and_quarantine(spark):
    rows = [(1, bytes(encode_pdf(["ab", "cd"]))), (2, b"not a pdf at all")]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    with pytest.raises(Exception):
        pdf_pages_table(df, on_error="raise").collect()
    out = pdf_pages_table(df, on_error="quarantine").collect()
    good = {(r.doc_id, r.page_idx, r.text) for r in out if r.decode_error is None}
    bad = [(r.doc_id, r.page_idx) for r in out if r.decode_error is not None]
    assert good == {(1, 0, "ab"), (1, 1, "cd")}
    assert bad == [(2, -1)]
    with pytest.raises(ValueError):
        pdf_pages_table(df, on_error="explode")


# ---------------------------------------------------------------------------
# PDF 1.5: xref streams, object streams, /Prev chains (r9)
# ---------------------------------------------------------------------------

from hive_udf_spark.operators.pdfcodec import encode_pdf_15  # noqa: E402


def test_pdf15_variants_roundtrip():
    pages = ["Hello (world) \\ first!", "second page, kerned", ""]
    for kw in (
        dict(objstm=True, predictor=12),
        dict(objstm=True, predictor=1),
        dict(objstm=False, predictor=12),
        dict(objstm=True, predictor=12, prev_chain=True),
        dict(objstm=False, predictor=1, prev_chain=True),
        dict(objstm=True, predictor=15, prev_chain=True),
    ):
        assert extract_pdf_pages(encode_pdf_15(pages, **kw)) == pages, kw
    # offsets past 65535 exercise the 3-byte W field
    big = ["x" * 40000, "y" * 40000]
    assert extract_pdf_pages(encode_pdf_15(big, prev_chain=True)) == big


def test_pdf15_malformed_xref_streams_raise():
    good = encode_pdf_15(["page one text", "page two text"])
    # corrupt the W array
    bad = good.replace(b"/W [1 3 2]", b"/W [9 9 9]")
    with pytest.raises(ValueError, match="/W|not at its xref offset|missing"):
        extract_pdf_pages(bad)
    # predictor the decoder does not vendor
    bad = good.replace(b"/Predictor 12", b"/Predictor 2")
    with pytest.raises(ValueError, match="predictor"):
        extract_pdf_pages(bad)
    # cyclic /Prev chain: point startxref's section at itself
    chained = encode_pdf_15(["a page", "b page"], prev_chain=True)
    import re as _re

    m = _re.search(rb"startxref\n(\d+)\n%%EOF$", chained)
    self_off = m.group(1)
    m2 = _re.search(rb"/Prev (\d+)", chained)
    cyclic = chained.replace(b"/Prev " + m2.group(1), b"/Prev " + self_off)
    # the cycle is detected and ignored (only older data lost) -> the
    # un-covered objects are then reported missing
    with pytest.raises(ValueError, match="missing from xref|not at its xref"):
        extract_pdf_pages(cyclic)


def test_pdf15_truncated_objstm_quarantines_cleanly():
    good = encode_pdf_15(["alpha beta", "gamma delta"], predictor=1)
    # truncate inside the ObjStm stream body
    i = good.find(b"/Type /ObjStm")
    j = good.find(b"endstream", i)
    bad = good[: j - 8] + good[j:]
    with pytest.raises(ValueError):
        extract_pdf_pages(bad)


def test_pdf15_fuzz_byte_flips_never_escape():
    rng = np.random.default_rng(12)
    base = bytearray(
        encode_pdf_15(["fuzz target page", "page 2 (x)"], prev_chain=True)
    )
    for _ in range(300):
        b = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            pages = extract_pdf_pages(bytes(b))
            assert isinstance(pages, list)
            assert all(isinstance(p, str) for p in pages)
        except ValueError:
            pass


def test_pdf15_pages_table_through_spark(spark):
    from hive_udf_spark.operators.pdfcodec import pdf15_doc_encoder_udf

    docs = spark.createDataFrame(
        [(i, f"document number {i} body text") for i in range(8)],
        "doc_id long, text string",
    )
    enc = pdf15_doc_encoder_udf()
    blobs = docs.select("doc_id", enc("doc_id", "text").alias("blob"))
    out = pdf_pages_table(blobs).collect()
    assert len(out) == 16
    for r in out:
        t = f"document number {r.doc_id} body text"
        mid = len(t) // 2
        want = t[:mid] if r.page_idx == 0 else t[mid:]
        assert r.text == want


# ---------------------------------------------------------------------------
# Type0 / ToUnicode CMap (r9)
# ---------------------------------------------------------------------------


def test_type0_round_trip_matrix():
    from hive_udf_spark.operators.pdfcodec import encode_pdf_type0

    cases = [
        ["hello world", "the quick brown fox"],
        ["", "x"],
        ["aaaa", "aaaa"],
        ["héllo wörld — “smart” quotes", "日本語テキスト plus ASCII"],
        ["astral 𝒜𝔅𝒞 mixed in", "plain"],
        ["single page only"],
    ]
    for pages in cases:
        for flate in (True, False):
            assert extract_pdf_pages(encode_pdf_type0(pages, flate=flate)) == pages


def test_type0_bfrange_successive_value_rule():
    """Consecutive codepoints become bfrange entries whose destinations
    increment per the successive-value rule; a long CJK run must decode
    through them exactly."""
    from hive_udf_spark.operators.pdfcodec import encode_pdf_type0

    pages = ["".join(chr(0x4E00 + i) for i in range(300))]
    blob = encode_pdf_type0(pages, flate=False)
    assert b"beginbfrange" in blob
    assert extract_pdf_pages(blob) == pages


def test_type0_astral_chars_stay_bfchar():
    """Astral codepoints must not join bfrange runs (the +k rule on the
    raw UTF-16BE integer would jump the surrogate gap)."""
    from hive_udf_spark.operators.pdfcodec import encode_pdf_type0

    pages = ["".join(chr(0x1D7F8 + i) for i in range(16))]
    assert extract_pdf_pages(encode_pdf_type0(pages)) == pages


def test_cmap_parser_forms():
    from hive_udf_spark.operators.pdfcodec import _parse_cmap

    cm = _parse_cmap(
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n<0001> <0041>\n<0002> <00E9>\nendbfchar\n"
        b"1 beginbfrange\n<0010> <0012> <0061>\nendbfrange\n"
        b"1 beginbfrange\n<0020> <0022> [<0058> <0059> <005A>]\nendbfrange\n"
    )
    assert cm.decode(b"\x00\x01\x00\x02") == "Aé"
    assert cm.decode(b"\x00\x10\x00\x11\x00\x12") == "abc"
    assert cm.decode(b"\x00\x20\x00\x21\x00\x22") == "XYZ"
    # multi-code-unit destination (surrogate pair)
    cm2 = _parse_cmap(
        b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfchar\n<41> <D835DC9C>\nendbfchar\n"
    )
    assert cm2.decode(b"\x41") == "\U0001d49c"


def test_cmap_quarantine_paths():
    import pytest

    from hive_udf_spark.operators.pdfcodec import _parse_cmap

    with pytest.raises(ValueError, match="no codespace"):
        _parse_cmap(b"1 beginbfchar\n<01> <0041>\nendbfchar\n")
    base = b"1 begincodespacerange\n<0000> <00FF>\nendcodespacerange\n"
    cm = _parse_cmap(base + b"1 beginbfchar\n<0001> <0041>\nendbfchar\n")
    with pytest.raises(ValueError, match="no mapping"):
        cm.decode(b"\x00\x02")  # in codespace, unmapped
    with pytest.raises(ValueError, match="outside every codespace"):
        cm.decode(b"\x01\x00")  # outside the range
    with pytest.raises(ValueError, match="odd length"):
        _parse_cmap(base + b"1 beginbfchar\n<001> <0041>\nendbfchar\n")
    with pytest.raises(ValueError, match="descending"):
        _parse_cmap(base + b"1 beginbfrange\n<0005> <0001> <0041>\nendbfrange\n")
    with pytest.raises(ValueError, match="length mismatch"):
        _parse_cmap(base + b"1 beginbfrange\n<0001> <0003> [<0041>]\nendbfrange\n")
    with pytest.raises(ValueError, match="not terminated"):
        _parse_cmap(base + b"1 beginbfrange\n<0001> <0002> [<0041> <0042>\nendbfrange\n")
    with pytest.raises(ValueError, match="not UTF-16BE"):
        _parse_cmap(base + b"1 beginbfchar\n<0001> <41>\nendbfchar\n")


def test_type0_without_tounicode_quarantines():
    """An Identity-H font with no ToUnicode CMap cannot be mapped to
    unicode — the document must raise, not emit CID garbage."""
    import pytest

    from hive_udf_spark.operators.pdfcodec import encode_pdf_type0

    blob = encode_pdf_type0(["some text", "more text"], flate=False)
    stripped = blob.replace(b"/ToUnicode 9 0 R ", b"")
    # offsets shifted -> rebuild is overkill; the xref check may trip
    # first, but either way the contract is ValueError, never garbage
    with pytest.raises(ValueError):
        extract_pdf_pages(stripped)


def test_undeclared_font_and_no_tf_quarantine():
    import pytest

    from hive_udf_spark.operators.pdfcodec import encode_pdf

    blob = encode_pdf(["page text"], flate=False)
    with pytest.raises(ValueError, match="undeclared font"):
        extract_pdf_pages(blob.replace(b"BT /F1 12 Tf", b"BT /F9 12 Tf"))
    with pytest.raises(ValueError, match="before any Tf"):
        # same-length replacement keeps the xref offsets valid
        extract_pdf_pages(blob.replace(b"BT /F1 12 Tf", b"BT          "))


def test_type0_fuzz_byte_flips_never_escape():
    import numpy as np

    from hive_udf_spark.operators.pdfcodec import encode_pdf_type0

    rng = np.random.default_rng(9)
    base = bytearray(encode_pdf_type0(["fuzz target pagé", "ページ 2"]))
    for _ in range(300):
        b = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            pages = extract_pdf_pages(bytes(b))
            assert isinstance(pages, list)
        except ValueError:
            pass


def test_type0_pages_table_through_spark(spark):
    from hive_udf_spark.operators.pdfcodec import pdf_type0_doc_encoder_udf

    docs = spark.createDataFrame(
        [(i, f"döcument numérο {i} ボディ text") for i in range(8)],
        "doc_id long, text string",
    )
    enc = pdf_type0_doc_encoder_udf()
    blobs = docs.select("doc_id", enc("text").alias("blob"))
    out = pdf_pages_table(blobs).collect()
    assert len(out) == 16
    for r in out:
        t = f"döcument numérο {r.doc_id} ボディ text"
        mid = len(t) // 2
        want = t[:mid] if r.page_idx == 0 else t[mid:]
        assert r.text == want
