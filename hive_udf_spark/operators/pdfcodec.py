"""Vendored minimal-PDF text extractor (PDF 1.4 subset).

Crawled corpora carry a large PDF fraction; the text tier of a
training-data pipeline needs the page text out of them without a
rendering stack.  This is the dependency-free subset that handles the
classically-structured files: ``%PDF-`` header, a REAL cross-reference
table walk (``startxref`` → xref subsections → trailer ``/Root``),
catalog → page tree → per-page ``/Contents`` streams, ``/FlateDecode``
(bounded inflate with stream-completeness checks, the zipcodec
discipline) or raw streams, and the text-showing operators ``Tj``,
``'`` and ``TJ`` (kerning arrays), with full PDF string syntax: nested
balanced parens, all escape forms (``\\n \\r \\t \\b \\f \\( \\) \\\\``,
octal ``\\ddd``, line continuations, drop-unknown-escape per spec) and
hex strings ``<…>`` (odd length zero-padded).

Deliberately NOT vendored (raise explicitly, quarantine-routable):
cross-reference STREAMS (PDF 1.5 compressed xref), object streams,
incremental updates (``/Prev`` chains), indirect ``/Length`` values,
filters other than FlateDecode, nested page-tree nodes, and font
encodings beyond the latin-1-compatible range (text extraction returns
the content-stream string bytes decoded latin-1 — exact for the ASCII
fixtures, and the common case for Type1 text PDFs).

``encode_pdf`` is the fixture twin: a syntactically complete PDF
(catalog, page tree, Helvetica Type1 font resource, content streams
with ``Tj`` on one page and a kerned ``TJ`` on the next, correct xref
byte offsets, optional FlateDecode) whose extraction round-trips the
page text byte-for-byte, so the standard text-stats oracle applies.

Every public entry point follows the valid-output-or-ValueError
contract (``_codec_util.untrusted_decoder``); ``pdf_pages_table``
exposes whole-document quarantine like the ZIP/WARC table operators.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java:1) — this extends the
mandated multimodal/text extension surface.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd

from hive_udf_spark.operators._codec_util import untrusted_decoder

__all__ = [
    "encode_pdf",
    "extract_pdf_pages",
    "pdf_pages_table",
    "pdf_doc_encoder_udf",
]

# bounded-inflate cap: PDF carries no decompressed-size metadata, so the
# bound is absolute — far above any sane content stream, far below a
# memory-exhausting bomb
_MAX_STREAM = 16 * 1024 * 1024

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


# ---------------------------------------------------------------------------
# Object parser (the subset of COS syntax the walk needs)
# ---------------------------------------------------------------------------


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


def _skip_ws(b: bytes, i: int) -> int:
    n = len(b)
    while i < n:
        c = b[i : i + 1]
        if c in b"%":  # comment to end of line
            while i < n and b[i] not in b"\r\n":
                i += 1
        elif c in _WS:
            i += 1
        else:
            break
    return i


def _parse(b: bytes, i: int):
    """Parse one COS object at ``i`` → (value, next_index)."""
    i = _skip_ws(b, i)
    if i >= len(b):
        raise ValueError("PDF object truncated")
    c = b[i : i + 1]
    if b[i : i + 2] == b"<<":
        d = {}
        i += 2
        while True:
            i = _skip_ws(b, i)
            if b[i : i + 2] == b">>":
                return d, i + 2
            if b[i : i + 1] != b"/":
                raise ValueError("PDF dict key is not a name")
            key, i = _parse(b, i)
            val, i = _parse(b, i)
            d[key] = val
    if c == b"[":
        arr = []
        i += 1
        while True:
            i = _skip_ws(b, i)
            if b[i : i + 1] == b"]":
                return arr, i + 1
            v, i = _parse(b, i)
            arr.append(v)
    if c == b"/":
        j = i + 1
        while j < len(b) and b[j] not in _WS and b[j : j + 1] not in _DELIM:
            j += 1
        return "/" + b[i + 1 : j].decode("latin-1"), j
    if c == b"(":
        s, j = _parse_string(b, i)
        return s, j
    if c == b"<":
        j = b.index(b">", i)
        return _decode_hex_string(b[i + 1 : j]), j + 1
    m = re.match(rb"[+-]?\d+(\.\d*)?|[+-]?\.\d+", b[i:])
    if m:
        tok = m.group(0)
        j = i + len(tok)
        # reference?  N G R
        if b"." not in tok:
            m2 = re.match(rb"\s+(\d+)\s+R\b", b[j:])
            if m2:
                return _Ref(int(tok)), j + m2.end()
            return int(tok), j
        return float(tok), j
    for lit, val in ((b"true", True), (b"false", False), (b"null", None)):
        if b[i : i + len(lit)] == lit:
            return val, i + len(lit)
    raise ValueError(f"PDF syntax at byte {i}: {b[i:i+12]!r}")


def _parse_string(b: bytes, i: int) -> tuple[str, int]:
    """PDF literal string at ``b[i] == '('``: balanced nesting + escapes."""
    assert b[i : i + 1] == b"("
    out = bytearray()
    depth = 1
    i += 1
    n = len(b)
    while i < n:
        c = b[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                raise ValueError("PDF string ends inside escape")
            e = b[i]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                v = 0
                k = 0
                while k < 3 and i < n and 0x30 <= b[i] <= 0x37:
                    v = v * 8 + (b[i] - 0x30)
                    i += 1
                    k += 1
                out.append(v & 0xFF)
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and b[i] == 0x0A:
                    i += 1
            else:  # unknown escape: drop the backslash (spec §7.3.4.2)
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return out.decode("latin-1"), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("PDF string not terminated")


def _decode_hex_string(h: bytes) -> str:
    hx = bytes(c for c in h if bytes([c]) not in _WS)
    if not re.fullmatch(rb"[0-9A-Fa-f]*", hx):
        raise ValueError("PDF hex string has non-hex characters")
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")).decode("latin-1")


# ---------------------------------------------------------------------------
# Document walk
# ---------------------------------------------------------------------------


def _read_xref(b: bytes) -> tuple[dict[int, int], dict]:
    tail = b[-2048:]
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", tail):
        pass
    if m is None:
        raise ValueError("PDF has no startxref")
    off = int(m.group(1))
    if off >= len(b):
        raise ValueError("PDF startxref offset out of bounds")
    i = _skip_ws(b, off)
    if b[i : i + 4] != b"xref":
        raise ValueError(
            "PDF cross-reference streams not vendored (classic xref tables only)"
        )
    i += 4
    xref: dict[int, int] = {}
    while True:
        i = _skip_ws(b, i)
        if b[i : i + 7] == b"trailer":
            i += 7
            trailer, _ = _parse(b, i)
            if not isinstance(trailer, dict):
                raise ValueError("PDF trailer is not a dictionary")
            if "/Prev" in trailer:
                raise ValueError("PDF incremental updates (/Prev) not vendored")
            return xref, trailer
        m = re.match(rb"(\d+)\s+(\d+)\s*", b[i:])
        if not m:
            raise ValueError("PDF xref subsection header malformed")
        start, count = int(m.group(1)), int(m.group(2))
        i += m.end()
        for k in range(count):
            ent = b[i : i + 20]
            m2 = re.match(rb"(\d{10})\s+(\d{5})\s+([nf])", ent)
            if not m2:
                raise ValueError(f"PDF xref entry {start + k} malformed")
            if m2.group(3) == b"n":
                xref[start + k] = int(m2.group(1))
            i += 20
            # tolerate 19-byte lines (LF-only writers)
            if b[i - 1 : i] not in (b"\r", b"\n", b" ") and b[i - 2 : i - 1] in (
                b"\r",
                b"\n",
            ):
                i -= 1


def _get_obj(b: bytes, xref: dict[int, int], ref) -> tuple[object, int]:
    """Fetch indirect object → (value, index just past the value) —
    the index lets stream readers find the stream keyword."""
    num = ref.num if isinstance(ref, _Ref) else ref
    if num not in xref:
        raise ValueError(f"PDF object {num} missing from xref")
    i = xref[num]
    m = re.match(rb"(\d+)\s+(\d+)\s+obj\b", b[i:])
    if not m or int(m.group(1)) != num:
        raise ValueError(f"PDF object {num} not at its xref offset")
    val, j = _parse(b, i + m.end())
    return val, j


def _stream_bytes(b: bytes, d: dict, j: int) -> bytes:
    """Stream content following a stream dict that ends at ``j``."""
    i = _skip_ws(b, j)
    if b[i : i + 6] != b"stream":
        raise ValueError("PDF /Contents object has no stream")
    i += 6
    if b[i : i + 2] == b"\r\n":
        i += 2
    elif b[i : i + 1] == b"\n":
        i += 1
    length = d.get("/Length")
    if not isinstance(length, int) or length < 0:
        raise ValueError("PDF indirect or invalid /Length not vendored")
    raw = b[i : i + length]
    if len(raw) != length:
        raise ValueError("PDF stream shorter than its /Length")
    filt = d.get("/Filter")
    if filt is None:
        return raw
    if filt == "/FlateDecode" or filt == ["/FlateDecode"]:
        dec = zlib.decompressobj()
        try:
            data = dec.decompress(raw, _MAX_STREAM + 1)
        except zlib.error as exc:
            raise ValueError(f"PDF inflate failed: {exc}") from exc
        if len(data) > _MAX_STREAM:
            raise ValueError("PDF stream inflates past the vendored cap")
        if not dec.eof:
            raise ValueError("PDF deflate stream truncated")
        if dec.unused_data:
            raise ValueError("PDF trailing bytes after deflate stream end")
        return data
    raise ValueError(f"PDF filter {filt!r} not vendored (FlateDecode only)")


_TEXT_OP = re.compile(rb"Tj|TJ|'|\"")


def _page_text(content: bytes) -> str:
    """Concatenate the strings shown by Tj / ' / \" / TJ, in stream
    order.  A tiny operand-stack walk: strings and arrays are tracked,
    numbers/names/other operators clear nothing (PDF content streams
    are postfix; text-showing operators consume the latest string or
    array operand)."""
    out: list[str] = []
    i = 0
    n = len(content)
    last_str: str | None = None
    last_arr: list | None = None
    while i < n:
        c = content[i : i + 1]
        if c in _WS:
            i += 1
            continue
        if c == b"(":
            last_str, i = _parse_string(content, i)
            continue
        if c == b"<" and content[i : i + 2] != b"<<":
            j = content.index(b">", i)
            last_str = _decode_hex_string(content[i + 1 : j])
            i = j + 1
            continue
        if c == b"[":
            last_arr, i = _parse(content, i)
            continue
        if c == b"%":
            while i < n and content[i] not in b"\r\n":
                i += 1
            continue
        m = re.match(rb"[A-Za-z'\"*]{1,3}\b|[A-Za-z'\"*]{1,3}", content[i:])
        if m:
            op = m.group(0)
            if op in (b"Tj", b"'", b'"'):
                if last_str is None:
                    raise ValueError("PDF text operator with no string operand")
                out.append(last_str)
                last_str = None
            elif op == b"TJ":
                if last_arr is None:
                    raise ValueError("PDF TJ with no array operand")
                out.append("".join(x for x in last_arr if isinstance(x, str)))
                last_arr = None
            i += len(op)
            continue
        # numbers, names, dict tokens: skip one token
        m = re.match(rb"/[^\s()<>\[\]{}/%]*|[+-]?[\d.]+|<<|>>", content[i:])
        if not m:
            raise ValueError(f"PDF content syntax at byte {i}: {content[i:i+8]!r}")
        i += len(m.group(0))
    return "".join(out)


@untrusted_decoder
def extract_pdf_pages(b: bytes) -> list[str]:
    """Extract per-page text from a classic-xref PDF → list of page
    strings (page-tree order)."""
    if not b.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    xref, trailer = _read_xref(b)
    root = trailer.get("/Root")
    if not isinstance(root, _Ref):
        raise ValueError("PDF trailer /Root missing or not a reference")
    catalog, _ = _get_obj(b, xref, root)
    if not isinstance(catalog, dict) or not isinstance(catalog.get("/Pages"), _Ref):
        raise ValueError("PDF catalog has no /Pages reference")
    pages_node, _ = _get_obj(b, xref, catalog["/Pages"])
    if not isinstance(pages_node, dict) or pages_node.get("/Type") != "/Pages":
        raise ValueError("PDF page tree root is not /Pages")
    kids = pages_node.get("/Kids")
    if not isinstance(kids, list):
        raise ValueError("PDF /Kids is not an array")
    texts: list[str] = []
    for kid in kids:
        if not isinstance(kid, _Ref):
            raise ValueError("PDF /Kids entry is not a reference")
        page, _ = _get_obj(b, xref, kid)
        if not isinstance(page, dict):
            raise ValueError("PDF page object is not a dictionary")
        if page.get("/Type") == "/Pages":
            raise ValueError("PDF nested page-tree nodes not vendored")
        contents = page.get("/Contents")
        if contents is None:
            texts.append("")
            continue
        if not isinstance(contents, _Ref):
            raise ValueError("PDF page /Contents must be a single reference")
        cdict, j = _get_obj(b, xref, contents)
        if not isinstance(cdict, dict):
            raise ValueError("PDF /Contents object is not a stream dict")
        texts.append(_page_text(_stream_bytes(b, cdict, j)))
    return texts


# ---------------------------------------------------------------------------
# Encoder (fixture twin)
# ---------------------------------------------------------------------------


def _escape_pdf_string(s: str) -> bytes:
    out = bytearray()
    for ch in s.encode("latin-1"):
        if ch in b"()\\":
            out += b"\\" + bytes([ch])
        elif ch in (10, 13):
            out += b"\\n" if ch == 10 else b"\\r"
        else:
            out.append(ch)
    return bytes(out)


def encode_pdf(pages: list[str], flate: bool = False) -> bytes:
    """Pages of text → a complete classic-xref PDF 1.4.  Even page
    indexes show their text with one ``Tj``; odd indexes split it into
    a kerned two-element ``TJ`` array — both extraction paths exercised
    in every multi-page fixture.  ``flate`` wraps content streams in
    FlateDecode."""
    objs: list[bytes] = []  # body of object k+1

    def content_for(idx: int, text: str) -> bytes:
        if idx % 2 == 0 or len(text) < 2:
            shown = b"(" + _escape_pdf_string(text) + b") Tj"
        else:
            mid = len(text) // 2
            shown = (
                b"[("
                + _escape_pdf_string(text[:mid])
                + b") -250 ("
                + _escape_pdf_string(text[mid:])
                + b")] TJ"
            )
        return b"BT /F1 12 Tf 72 720 Td " + shown + b" ET"

    n = len(pages)
    font_num = 3 + 2 * n
    kids = " ".join(f"{3 + 2 * k} 0 R" for k in range(n))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode())
    for k, text in enumerate(pages):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {4 + 2 * k} 0 R "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
        data = content_for(k, text)
        filt = b""
        if flate:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        objs.append(
            b"<< /Length "
            + str(len(data)).encode()
            + b" "
            + filt
            + b">>\nstream\n"
            + data
            + b"\nendstream"
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(buf)
    total = len(objs) + 1
    buf += f"xref\n0 {total}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {total} /Root 1 0 R >>\nstartxref\n{xref_off}\n%%EOF"
    ).encode()
    return bytes(buf)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

PDF_PAGES_SCHEMA = (
    "doc_id long, page_idx int, n_pages int, text string, n_chars long"
)
PDF_PAGES_QUARANTINE_SCHEMA = PDF_PAGES_SCHEMA + ", decode_error string"


def pdf_pages_table(blobs, on_error: str = "raise"):
    """(doc_id, blob) → one row per PDF page via mapInPandas:
    (doc_id, page_idx, n_pages, text, n_chars).  Map-side only — blobs
    never cross a shuffle; page text leaves the operator as ordinary
    string columns for the text tier (quality, dedup, language-ID).

    ``on_error="quarantine"``: a malformed PDF becomes ONE row with
    page_idx = -1 and the message in ``decode_error`` (whole-document
    quarantine — a broken xref invalidates every page offset)."""
    from collections.abc import Iterator

    if on_error not in ("raise", "quarantine"):
        raise ValueError("on_error must be 'raise' or 'quarantine'")
    quarantine = on_error == "quarantine"
    cols = ["doc_id", "page_idx", "n_pages", "text", "n_chars"] + (
        ["decode_error"] if quarantine else []
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in cols}

            def emit(**kv) -> None:
                for k in cols:
                    rows[k].append(kv.get(k))

            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                try:
                    pages = extract_pdf_pages(bytes(blob))
                except ValueError as exc:
                    if not quarantine:
                        raise
                    emit(doc_id=int(doc_id), page_idx=-1, decode_error=str(exc))
                    continue
                for i, text in enumerate(pages):
                    emit(
                        doc_id=int(doc_id),
                        page_idx=i,
                        n_pages=len(pages),
                        text=text,
                        n_chars=len(text),
                    )
            yield pd.DataFrame(rows)

    schema = PDF_PAGES_QUARANTINE_SCHEMA if quarantine else PDF_PAGES_SCHEMA
    return blobs.mapInPandas(extract, schema=schema)


def pdf_doc_encoder_udf(flate: bool = False):
    """Arrow-batched PDF fixture encoder: (text) → a two-page PDF whose
    first page shows the first half of the text via ``Tj`` and whose
    second shows the rest via a kerned ``TJ`` — xref, page tree, font
    resource and (optionally) FlateDecode all present, so extraction
    exercises the full walk on every row."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def enc(text: pd.Series) -> pd.Series:
        def one(t: str) -> bytes:
            mid = len(t) // 2
            return encode_pdf([t[:mid], t[mid:]], flate=flate)

        return pd.Series([one(t) for t in text])

    return enc
