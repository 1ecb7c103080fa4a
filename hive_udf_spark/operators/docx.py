"""DOCX text extraction: ZIP container walk + WordprocessingML runs.

A .docx is a ZIP archive whose main part, ``word/document.xml``, holds
paragraphs (``<w:p>``) of text runs (``<w:r><w:t>…</w:t></w:r>``).
Extraction reuses the vendored ZIP machinery (``operators/zipcodec`` —
central-directory walk, stored+deflate, CRC) and replays the
WordprocessingML text layer: runs concatenate within a paragraph,
paragraphs join with newlines, XML entities decode.  Everything else
(styles, tables-as-paragraphs, headers) is out of scope — unknown parts
are simply not text, and a container/XML shape the parser doesn't
recognize raises ValueError so ``on_error='quarantine'`` can route it
(the multimodal decoder contract: valid output or ValueError, never a
silent wrong answer).

Scale: same shape as every codec path — map-side Arrow-batched
``mapInPandas``, features/texts are small, blobs never cross a shuffle.

Reference parity: the reference engine (MLnick/hive-udf,
``UDAFCardinalityEstimator.java``) has no document codecs; this is part
of the mandated multimodal extension surface (SURVEY.md §2.3).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

__all__ = ["extract_docx_text", "docx_text_table", "encode_docx"]

_P_RE = re.compile(rb"<w:p[ >/].*?</w:p>|<w:p/>", re.DOTALL)
_T_RE = re.compile(rb"<w:t(?: [^>]*)?>(.*?)</w:t>", re.DOTALL)

# order matters: &amp; LAST on decode (and FIRST on encode)
_XML_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&apos;")]


def _xml_escape(s: str) -> str:
    for raw, ent in _XML_ESCAPES:
        s = s.replace(raw, ent)
    return s


def _xml_unescape(s: str) -> str:
    for raw, ent in reversed(_XML_ESCAPES):
        s = s.replace(ent, raw)
    return s


def extract_docx_text(blob: bytes) -> tuple[str, int]:
    """→ (text, n_paragraphs).  Paragraphs join with ``\\n``; runs within
    a paragraph concatenate in document order; entities decode."""
    from hive_udf_spark.operators.zipcodec import split_zip_entries

    entries = dict(split_zip_entries(blob))
    xml = entries.get("word/document.xml")
    if xml is None:
        raise ValueError("no word/document.xml part in archive")
    if b"<w:document" not in xml:
        raise ValueError("word/document.xml is not WordprocessingML")
    paras = _P_RE.findall(xml)
    # no silent data loss: an opened paragraph the regex can't close
    # (malformed nesting, truncated part) must raise for quarantine,
    # never quietly drop text.
    n_open = len(re.findall(rb"<w:p[ >/]", xml))
    if n_open != len(paras):
        raise ValueError(
            f"document has {n_open} paragraph opens but {len(paras)} parse"
        )
    out = []
    for p in paras:
        runs = _T_RE.findall(p)
        out.append("".join(_xml_unescape(t.decode("utf-8")) for t in runs))
    return "\n".join(out), len(out)


DOCX_TEXT_SCHEMA = "doc_id bigint, text string, n_paragraphs int, n_chars bigint"


def docx_text_table(blobs, on_error: str = "raise"):
    """(doc_id, blob) → (doc_id, text, n_paragraphs, n_chars) via
    map-side Arrow batches; ``on_error='quarantine'`` emits a NULL-text
    row with n_paragraphs = −1 instead of failing the task."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError("on_error must be 'raise' or 'quarantine'")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k: [] for k in ("doc_id", "text", "n_paragraphs", "n_chars")
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                try:
                    text, n_p = extract_docx_text(bytes(blob))
                except ValueError:
                    if on_error == "raise":
                        raise
                    text, n_p = None, -1
                rows["doc_id"].append(int(doc_id))
                rows["text"].append(text)
                rows["n_paragraphs"].append(n_p)
                rows["n_chars"].append(len(text) if text is not None else -1)
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(extract, schema=DOCX_TEXT_SCHEMA)


_DOCX_CONTENT_TYPES = (
    '<?xml version="1.0"?><Types '
    'xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>'
)
_DOCX_RELS = (
    '<?xml version="1.0"?><Relationships '
    'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/></Relationships>'
)


def encode_docx(paragraphs: list[list[str]]) -> bytes:
    """Encoder twin: paragraphs of runs → a minimal valid .docx (the
    three standard parts, deflated), entities escaped."""
    from hive_udf_spark.operators.zipcodec import encode_zip

    body = "".join(
        "<w:p>"
        + "".join(f"<w:r><w:t>{_xml_escape(r)}</w:t></w:r>" for r in runs)
        + "</w:p>"
        for runs in paragraphs
    )
    doc = (
        '<?xml version="1.0"?><w:document xmlns:w="http://schemas.'
        'openxmlformats.org/wordprocessingml/2006/main"><w:body>'
        + body
        + "</w:body></w:document>"
    )
    return encode_zip(
        [
            ("[Content_Types].xml", _DOCX_CONTENT_TYPES.encode()),
            ("_rels/.rels", _DOCX_RELS.encode()),
            ("word/document.xml", doc.encode("utf-8")),
        ]
    )
