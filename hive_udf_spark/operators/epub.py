"""EPUB chapter extraction: ZIP container walk → XHTML chapter strings.

An .epub is a ZIP archive of XHTML chapter documents plus OCF plumbing
(``mimetype``, ``META-INF/container.xml``).  This operator does the
CONTAINER tier in Python (vendored zipcodec — the only part with no
Spark built-in) and hands each chapter's XHTML back as a STRING COLUMN,
so the markup→text tier runs JVM-side through the existing
``functions/html.html_to_text`` codegen chain — the layered shape every
container format here follows: Python only where a byte format demands
it, Catalyst for everything expressible.

Chapters are ``.xhtml``/``.html`` entries in archive order; an archive
with none, or without the EPUB ``mimetype`` marker, raises ValueError
for quarantine routing.

No reference analogue (the reference is a cardinality-UDAF package);
mandated multimodal extension surface (SURVEY.md §2.3).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

__all__ = ["epub_chapters", "epub_chapters_table", "encode_epub"]

_MIMETYPE = b"application/epub+zip"
_CONTAINER_XML = (
    '<?xml version="1.0"?><container version="1.0" xmlns="urn:oasis:names:'
    'tc:opendocument:xmlns:container"><rootfiles><rootfile '
    'full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/>'
    "</rootfiles></container>"
)


def epub_chapters(blob: bytes) -> list[tuple[str, str]]:
    """→ [(entry_name, xhtml)] for every chapter document, archive order."""
    from hive_udf_spark.operators.zipcodec import split_zip_entries

    entries = split_zip_entries(blob)
    mt = dict(entries).get("mimetype")
    if mt is None or mt.strip() != _MIMETYPE:
        raise ValueError("not an EPUB: missing/foreign mimetype entry")
    chapters = [
        (name, data.decode("utf-8"))
        for name, data in entries
        if name.endswith((".xhtml", ".html"))
    ]
    if not chapters:
        raise ValueError("EPUB has no XHTML chapter entries")
    return chapters


EPUB_CHAPTERS_SCHEMA = "doc_id bigint, chapter_idx int, name string, xhtml string"


def epub_chapters_table(blobs, on_error: str = "raise"):
    """(doc_id, blob) → one row per chapter; quarantine emits a single
    (doc_id, -1, NULL, NULL) marker row instead of failing the task."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError("on_error must be 'raise' or 'quarantine'")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k: [] for k in ("doc_id", "chapter_idx", "name", "xhtml")
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                try:
                    chapters = epub_chapters(bytes(blob))
                except ValueError:
                    if on_error == "raise":
                        raise
                    rows["doc_id"].append(int(doc_id))
                    rows["chapter_idx"].append(-1)
                    rows["name"].append(None)
                    rows["xhtml"].append(None)
                    continue
                for i, (name, xhtml) in enumerate(chapters):
                    rows["doc_id"].append(int(doc_id))
                    rows["chapter_idx"].append(i)
                    rows["name"].append(name)
                    rows["xhtml"].append(xhtml)
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(extract, schema=EPUB_CHAPTERS_SCHEMA)


def encode_epub(chapters: list[str]) -> bytes:
    """Encoder twin: XHTML chapter bodies → a minimal OCF archive
    (mimetype first, then container.xml and chapters).  The title is
    left empty: the regexp extraction tier keeps element CONTENT, and a
    head title would leak into the chapter text."""
    from hive_udf_spark.operators.zipcodec import encode_zip

    entries: list[tuple[str, bytes]] = [
        ("mimetype", _MIMETYPE),
        ("META-INF/container.xml", _CONTAINER_XML.encode()),
    ]
    for i, body in enumerate(chapters, start=1):
        doc = (
            '<?xml version="1.0"?><html xmlns="http://www.w3.org/1999/xhtml">'
            f"<head><title></title></head><body>{body}</body></html>"
        )
        entries.append((f"OEBPS/chapter{i}.xhtml", doc.encode("utf-8")))
    return encode_zip(entries)
