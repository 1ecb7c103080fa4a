"""XLSX cell extraction: ZIP container walk + SpreadsheetML + shared strings.

An .xlsx is a ZIP archive; sheet cells live in
``xl/worksheets/sheet1.xml`` as ``<c r="A1" t="s"><v>0</v></c>`` where a
``t="s"`` cell's ``<v>`` is an INDEX into ``xl/sharedStrings.xml``
(``<si><t>…</t></si>`` in order) — the indirection that makes naive
grep-the-xml extraction return row numbers instead of text.  Numeric
cells carry their value inline.  Extraction reuses the vendored ZIP
machinery (central directory, stored+deflate, CRC) and resolves the
indirection; unknown shapes raise ValueError for quarantine routing
(the multimodal valid-output-or-ValueError contract).

Scale: map-side Arrow-batched ``mapInPandas``; one output row per cell,
blobs never cross a shuffle.

No reference analogue (the reference is a cardinality-UDAF package);
mandated multimodal extension surface (SURVEY.md §2.3).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

__all__ = ["extract_xlsx_cells", "xlsx_cells_table", "encode_xlsx"]

_CELL_RE = re.compile(
    rb'<c r="([A-Z]+[0-9]+)"( t="(s|str)")?>\s*<v>(.*?)</v>\s*</c>', re.DOTALL
)
_SI_RE = re.compile(rb"<si><t(?: [^>]*)?>(.*?)</t></si>", re.DOTALL)

_XML_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&apos;")]


def _esc(s: str) -> str:
    for raw, ent in _XML_ESCAPES:
        s = s.replace(raw, ent)
    return s


def _unesc(s: str) -> str:
    for raw, ent in reversed(_XML_ESCAPES):
        s = s.replace(ent, raw)
    return s


def extract_xlsx_cells(blob: bytes) -> list[tuple[str, str | None, float | None]]:
    """→ [(cell_ref, string_value, numeric_value)] in sheet order.
    ``t="s"`` cells resolve through sharedStrings; plain cells parse as
    numbers.  Raises ValueError on missing parts, out-of-range shared
    indexes, or non-numeric plain values."""
    from hive_udf_spark.operators.zipcodec import split_zip_entries

    entries = dict(split_zip_entries(blob))
    sheet = entries.get("xl/worksheets/sheet1.xml")
    if sheet is None:
        raise ValueError("no xl/worksheets/sheet1.xml part in archive")
    if b"<worksheet" not in sheet:
        raise ValueError("sheet1.xml is not SpreadsheetML")
    shared = [
        _unesc(t.decode("utf-8"))
        for t in _SI_RE.findall(entries.get("xl/sharedStrings.xml", b""))
    ]
    cells = _CELL_RE.findall(sheet)
    # no silent data loss: a <c ...> shape the regex doesn't recognize
    # (attribute orders/kinds beyond the vendored scope) must raise so
    # quarantine can route the whole sheet, never drop cells quietly.
    n_c = len(re.findall(rb"<c[ >]", sheet))
    if n_c != len(cells):
        raise ValueError(
            f"sheet has {n_c} cells but only {len(cells)} parse "
            "(unsupported cell shape)"
        )
    out: list[tuple[str, str | None, float | None]] = []
    for ref, _, kind, raw in cells:
        ref_s = ref.decode()
        val = raw.decode("utf-8")
        if kind == b"s":
            try:
                idx = int(val)
            except ValueError as exc:
                raise ValueError(f"non-integer shared-string index {val!r}") from exc
            if not 0 <= idx < len(shared):
                raise ValueError(f"shared-string index {idx} out of range")
            out.append((ref_s, shared[idx], None))
        elif kind == b"str":
            out.append((ref_s, _unesc(val), None))
        else:
            try:
                out.append((ref_s, None, float(val)))
            except ValueError as exc:
                raise ValueError(f"non-numeric cell value {val!r}") from exc
    return out


XLSX_CELLS_SCHEMA = (
    "doc_id bigint, cell string, s_value string, n_value double"
)


def xlsx_cells_table(blobs, on_error: str = "raise"):
    """(doc_id, blob) → one row per cell; quarantine emits a single
    (doc_id, NULL, NULL, NULL) marker row instead of failing the task."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError("on_error must be 'raise' or 'quarantine'")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k: [] for k in ("doc_id", "cell", "s_value", "n_value")
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                try:
                    cells = extract_xlsx_cells(bytes(blob))
                except ValueError:
                    if on_error == "raise":
                        raise
                    cells = [(None, None, None)]
                for ref, sv, nv in cells:
                    rows["doc_id"].append(int(doc_id))
                    rows["cell"].append(ref)
                    rows["s_value"].append(sv)
                    rows["n_value"].append(nv)
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(extract, schema=XLSX_CELLS_SCHEMA)


def encode_xlsx(rows: list[list[object]]) -> bytes:
    """Encoder twin: rows of str/number cells → a minimal .xlsx.
    Strings dedupe through a REAL shared-strings table (so the decoder's
    index resolution is actually exercised); numbers inline."""
    from hive_udf_spark.operators.zipcodec import encode_zip

    shared: dict[str, int] = {}
    body = []
    for r_i, row in enumerate(rows, start=1):
        cells = []
        for c_i, v in enumerate(row):
            col = ""
            n = c_i
            while True:
                col = chr(ord("A") + n % 26) + col
                n = n // 26 - 1
                if n < 0:
                    break
            ref = f"{col}{r_i}"
            if isinstance(v, str):
                idx = shared.setdefault(v, len(shared))
                cells.append(f'<c r="{ref}" t="s"><v>{idx}</v></c>')
            else:
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
        body.append(f"<row>{''.join(cells)}</row>")
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.'
        'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        + "".join(body)
        + "</sheetData></worksheet>"
    )
    sst = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.'
        f'org/spreadsheetml/2006/main" count="{len(shared)}" '
        f'uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{_esc(s)}</t></si>" for s in shared)
        + "</sst>"
    )
    return encode_zip(
        [
            ("xl/worksheets/sheet1.xml", sheet.encode("utf-8")),
            ("xl/sharedStrings.xml", sst.encode("utf-8")),
        ]
    )
