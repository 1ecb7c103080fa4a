"""Vendored EXIF (APP1/TIFF-IFD) metadata extraction and stripping for
JPEG blobs, implemented from the public EXIF 2.x / TIFF 6.0 structure.

Training-data pipelines over crawled images need two metadata
operations the codec tier doesn't give them:

* **extract** — orientation (needed before any raster op), camera
  make/model (dedup/provenance features), and GPS coordinates (a PII
  signal to route on);
* **strip** — removing EXIF wholesale is the standard privacy scrub
  applied to every published image corpus (GPS, serial numbers,
  thumbnails all live there), and it must NOT touch the entropy-coded
  image data.

Surface:

* ``parse_exif(jpeg) -> dict`` — marker walk to the APP1 ``Exif\\0\\0``
  segment, TIFF header (both byte orders), IFD0 entry walk (ASCII /
  SHORT / LONG / RATIONAL), the GPS sub-IFD via tag 0x8825, and
  degree-minute-second RATIONAL triples folded to integer
  micro-degrees (exact: no float anywhere);
* ``strip_exif(jpeg) -> bytes`` — drops every APP1 Exif segment,
  byte-identical everywhere else (pixel data provably untouched);
* ``add_exif(jpeg, ...)`` — fixture twin building a real two-IFD APP1
  segment (IFD0 + GPS sub-IFD, computed offsets, both byte orders) so
  extraction and stripping are exercised against spec-valid metadata;
* ``exif_table`` / ``strip_exif_blobs`` — the mapInPandas operators
  (map-side only; blobs never cross a shuffle).

Every decode entry point follows the valid-output-or-ValueError
contract (``_codec_util.untrusted_decoder``).

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java:1) — this extends the
mandated multimodal extension surface.
"""

from __future__ import annotations

import struct

import pandas as pd

from hive_udf_spark.operators._codec_util import untrusted_decoder

__all__ = [
    "parse_exif",
    "strip_exif",
    "add_exif",
    "exif_table",
    "strip_exif_blobs",
    "parse_png_metadata",
    "strip_png_metadata",
    "add_png_metadata",
    "png_metadata_table",
]

_MAX_ENTRIES = 512

_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_GPS_IFD = 0x8825
_GPS_LAT_REF = 0x0001
_GPS_LAT = 0x0002
_GPS_LON_REF = 0x0003
_GPS_LON = 0x0004


def _iter_segments(b: bytes):
    """Yield (marker, start, total_len) for each JPEG marker segment up
    to (and excluding) SOS; the entropy stream is never entered."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (SOI missing)")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"expected JPEG marker at byte {pos}")
        marker = b[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            raise ValueError("unexpected bare marker before SOS")
        seg_len = struct.unpack_from(">H", b, pos + 2)[0]
        if seg_len < 2 or pos + 2 + seg_len > len(b):
            raise ValueError("JPEG segment overruns blob")
        yield marker, pos, 2 + seg_len
        if marker == 0xDA:  # SOS: stop — everything after is entropy data
            return
        pos += 2 + seg_len
    raise ValueError("JPEG ends before SOS")


def _read_ifd(b: bytes, base: int, off: int, endian: str) -> dict[int, tuple]:
    """One IFD → {tag: (type, count, raw_value_bytes)}."""
    if base + off + 2 > len(b):
        raise ValueError("EXIF IFD offset out of bounds")
    n = struct.unpack_from(endian + "H", b, base + off)[0]
    if n > _MAX_ENTRIES:
        raise ValueError("EXIF IFD exceeds the entry cap")
    out: dict[int, tuple] = {}
    pos = base + off + 2
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}
    for _ in range(n):
        if pos + 12 > len(b):
            raise ValueError("EXIF IFD entry truncated")
        tag, typ, count = struct.unpack_from(endian + "HHI", b, pos)
        size = sizes.get(typ, 0) * count
        if size == 0:
            pos += 12
            continue  # unknown type: skip, do not guess
        if size <= 4:
            raw = b[pos + 8 : pos + 8 + size]
        else:
            voff = struct.unpack_from(endian + "I", b, pos + 8)[0]
            if base + voff + size > len(b):
                raise ValueError("EXIF value offset out of bounds")
            raw = b[base + voff : base + voff + size]
        out[tag] = (typ, count, raw)
        pos += 12
    return out


def _ascii(v: tuple | None) -> str | None:
    if v is None or v[0] != 2:
        return None
    return v[2].split(b"\x00")[0].decode("ascii", "replace")


def _short(v: tuple | None, endian: str) -> int | None:
    if v is None or v[0] not in (3, 4):
        return None
    fmt = "H" if v[0] == 3 else "I"
    return struct.unpack_from(endian + fmt, v[2])[0]


def _dms_microdeg(v: tuple | None, endian: str) -> int | None:
    """3 RATIONALs (deg, min, sec) → integer micro-degrees, exact
    integer arithmetic (floats would split the oracle)."""
    if v is None or v[0] != 5 or v[1] != 3:
        return None
    vals = struct.unpack_from(endian + "IIIIII", v[2])
    (dn, dd), (mn, md), (sn, sd) = (
        (vals[0], vals[1]), (vals[2], vals[3]), (vals[4], vals[5])
    )
    if 0 in (dd, md, sd):
        raise ValueError("EXIF GPS rational has zero denominator")
    num = dn * md * sd * 3600 + mn * dd * sd * 60 + sn * dd * md
    den = dd * md * sd * 3600
    return num * 1_000_000 // den


def _parse_tiff_exif(b: bytes, base: int, out: dict) -> None:
    """TIFF-structured EXIF at ``b[base:]`` → fill make / model /
    orientation / GPS micro-degrees into ``out`` (shared by the JPEG
    APP1 payload and PNG's raw-TIFF ``eXIf`` chunk)."""
    hdr = b[base : base + 8]
    if hdr[:4] == b"II*\x00":
        endian = "<"
    elif hdr[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("EXIF TIFF header malformed")
    out["has_exif"] = True
    ifd0_off = struct.unpack_from(endian + "I", hdr, 4)[0]
    ifd0 = _read_ifd(b, base, ifd0_off, endian)
    out["make"] = _ascii(ifd0.get(_TAG_MAKE))
    out["model"] = _ascii(ifd0.get(_TAG_MODEL))
    out["orientation"] = _short(ifd0.get(_TAG_ORIENTATION), endian)
    gps_ptr = _short(ifd0.get(_TAG_GPS_IFD), endian)
    if gps_ptr is not None:
        gps = _read_ifd(b, base, gps_ptr, endian)
        lat = _dms_microdeg(gps.get(_GPS_LAT), endian)
        lon = _dms_microdeg(gps.get(_GPS_LON), endian)
        lat_ref = _ascii(gps.get(_GPS_LAT_REF)) or "N"
        lon_ref = _ascii(gps.get(_GPS_LON_REF)) or "E"
        if lat is not None:
            out["lat_udeg"] = -lat if lat_ref == "S" else lat
        if lon is not None:
            out["lon_udeg"] = -lon if lon_ref == "W" else lon


def _empty_exif() -> dict:
    return {
        "has_exif": False,
        "make": None,
        "model": None,
        "orientation": None,
        "lat_udeg": None,
        "lon_udeg": None,
    }


@untrusted_decoder
def parse_exif(b: bytes) -> dict:
    """JPEG or HEIF/AVIF → {has_exif, make, model, orientation,
    lat_udeg, lon_udeg} (lat/lon signed integer micro-degrees, None
    when no GPS IFD).  JPEG carries EXIF in an APP1 segment; HEIF
    carries it as a linked ``Exif`` item (r11 — the phone-camera
    layout), resolved through the real iloc walk."""
    out = _empty_exif()
    if len(b) >= 12 and b[4:8] == b"ftyp":
        from hive_udf_spark.operators.mp4codec import heif_exif_payload

        try:
            tiff = heif_exif_payload(b)
        except ValueError:
            return out  # HEIF without an Exif item: has_exif = False
        _parse_tiff_exif(tiff, 0, out)
        return out
    for marker, start, total in _iter_segments(b):
        if marker != 0xE1 or b[start + 4 : start + 10] != b"Exif\x00\x00":
            continue
        _parse_tiff_exif(b, start + 10, out)
        return out  # first Exif APP1 is authoritative per the spec
    return out


@untrusted_decoder
def strip_exif(b: bytes) -> bytes:
    """Remove every APP1 Exif segment from a JPEG; all other bytes —
    including the entropy-coded image data — pass through verbatim."""
    drops: list[tuple[int, int]] = []
    for marker, start, total in _iter_segments(b):
        if marker == 0xE1 and b[start + 4 : start + 10] == b"Exif\x00\x00":
            drops.append((start, start + total))
    if not drops:
        return b
    out = bytearray()
    pos = 0
    for s, e in drops:
        out += b[pos:s]
        pos = e
    out += b[pos:]
    return bytes(out)


# ---------------------------------------------------------------------------
# Fixture twin
# ---------------------------------------------------------------------------


def build_tiff_exif(
    make: str,
    model: str,
    orientation: int,
    lat_udeg: int | None = None,
    lon_udeg: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """A spec-valid raw TIFF EXIF structure (IFD0 + GPS sub-IFD with
    computed offsets) — the payload of a JPEG APP1 segment or a PNG
    ``eXIf`` chunk.  GPS DMS rationals are exact: micro-degrees →
    (deg/1, min/1, (udeg_remainder·60)/1000000)."""
    endian = ">" if big_endian else "<"
    make_b = make.encode("ascii") + b"\x00"
    model_b = model.encode("ascii") + b"\x00"

    def dms(udeg: int) -> bytes:
        u = abs(udeg)
        deg = u // 1_000_000
        rem = u - deg * 1_000_000
        mins = rem * 60 // 1_000_000
        rem_u = rem * 60 - mins * 1_000_000
        # seconds as rational (rem_u * 60) / 1_000_000 — exact
        return struct.pack(endian + "IIIIII", deg, 1, mins, 1, rem_u * 60, 1_000_000)

    has_gps = lat_udeg is not None and lon_udeg is not None

    def build_ifd(
        entries: list[tuple[int, int, int, bytes]], ifd_off: int
    ) -> bytes:
        """(tag, type, count, value_bytes) → serialized IFD at ifd_off;
        values over 4 bytes go to an area after the entry table, values
        that fit are INLINE (TIFF 6.0 mandates inline when they fit —
        an offset form there is what real parsers reject)."""
        ifd = bytearray(struct.pack(endian + "H", len(entries)))
        area = bytearray()
        area_off = ifd_off + 2 + 12 * len(entries) + 4
        for tag, typ, count, value in entries:
            if len(value) <= 4:
                ifd += struct.pack(endian + "HHI", tag, typ, count)
                ifd += value.ljust(4, b"\x00")
            else:
                ifd += struct.pack(
                    endian + "HHII", tag, typ, count, area_off + len(area)
                )
                area += value
        ifd += struct.pack(endian + "I", 0)  # next IFD
        return bytes(ifd) + bytes(area)

    ifd0_off = 8
    ifd0_entries = [
        (_TAG_MAKE, 2, len(make_b), make_b),
        (_TAG_MODEL, 2, len(model_b), model_b),
        (_TAG_ORIENTATION, 3, 1, struct.pack(endian + "H", orientation)),
    ]
    if has_gps:
        # two-pass: GPS pointer value depends on IFD0's serialized size
        probe = [*ifd0_entries, (_TAG_GPS_IFD, 4, 1, struct.pack(endian + "I", 0))]
        gps_off = ifd0_off + len(build_ifd(probe, ifd0_off))
        ifd0_entries.append((_TAG_GPS_IFD, 4, 1, struct.pack(endian + "I", gps_off)))
    body = bytearray()
    body += (b"II*\x00" if endian == "<" else b"MM\x00*")
    body += struct.pack(endian + "I", ifd0_off)
    body += build_ifd(ifd0_entries, ifd0_off)
    if has_gps:
        gps_entries = [
            (_GPS_LAT_REF, 2, 2, (b"S" if lat_udeg < 0 else b"N") + b"\x00"),
            (_GPS_LAT, 5, 3, dms(lat_udeg)),
            (_GPS_LON_REF, 2, 2, (b"W" if lon_udeg < 0 else b"E") + b"\x00"),
            (_GPS_LON, 5, 3, dms(lon_udeg)),
        ]
        body += build_ifd(gps_entries, gps_off)
    return bytes(body)


def add_exif(
    jpeg: bytes,
    make: str,
    model: str,
    orientation: int,
    lat_udeg: int | None = None,
    lon_udeg: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """Insert a spec-valid APP1 Exif segment (``build_tiff_exif``)
    right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (SOI missing)")
    payload = b"Exif\x00\x00" + build_tiff_exif(
        make, model, orientation, lat_udeg, lon_udeg, big_endian
    )
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + seg + jpeg[2:]


# ---------------------------------------------------------------------------
# PNG textual metadata (tEXt / zTXt / iTXt) and the raw-TIFF eXIf chunk
# ---------------------------------------------------------------------------

_PNG_META_CHUNKS = (b"tEXt", b"zTXt", b"iTXt", b"eXIf", b"tIME")
_MAX_TEXT_BYTES = 1 << 20


def _bounded_zlib(data: bytes, what: str) -> bytes:
    import zlib

    d = zlib.decompressobj()
    try:
        out = d.decompress(data, _MAX_TEXT_BYTES + 1)
    except zlib.error as exc:
        raise ValueError(f"{what}: corrupt zlib stream: {exc}") from exc
    if len(out) > _MAX_TEXT_BYTES:
        raise ValueError(f"{what}: inflates past the text cap")
    if not d.eof:
        raise ValueError(f"{what}: zlib stream truncated")
    if d.unused_data:
        raise ValueError(f"{what}: trailing bytes after stream end")
    return out


@untrusted_decoder
def parse_png_metadata(b: bytes) -> dict:
    """PNG → {texts: [(key, value)...], has_exif, make, model,
    orientation, lat_udeg, lon_udeg} — tEXt (latin-1), zTXt
    (zlib-deflated latin-1), iTXt (UTF-8, optionally deflated,
    language/translated-key skipped), and the ``eXIf`` chunk (a raw
    TIFF structure, parsed by the same IFD walker as JPEG APP1).
    Chunk CRCs are validated by the shared imagecodec walker."""
    from hive_udf_spark.operators.imagecodec import _png_chunks

    out: dict = {"texts": [], **_empty_exif()}
    for ctype, off, length in _png_chunks(b):
        body = b[off : off + length]
        if ctype == b"tEXt":
            key, sep, val = body.partition(b"\x00")
            if not sep:
                raise ValueError("PNG tEXt missing key separator")
            out["texts"].append(
                (key.decode("latin-1"), val.decode("latin-1"))
            )
        elif ctype == b"zTXt":
            key, sep, rest = body.partition(b"\x00")
            if not sep or not rest or rest[0] != 0:
                raise ValueError("PNG zTXt malformed (method must be 0)")
            val = _bounded_zlib(rest[1:], "PNG zTXt")
            out["texts"].append(
                (key.decode("latin-1"), val.decode("latin-1"))
            )
        elif ctype == b"iTXt":
            key, sep, rest = body.partition(b"\x00")
            if not sep or len(rest) < 2:
                raise ValueError("PNG iTXt malformed")
            comp_flag, comp_method = rest[0], rest[1]
            lang, sep1, rest2 = rest[2:].partition(b"\x00")
            tkey, sep2, val = rest2.partition(b"\x00")
            if not sep1 or not sep2:
                raise ValueError("PNG iTXt missing language/translated-key")
            if comp_flag == 1:
                if comp_method != 0:
                    raise ValueError("PNG iTXt compression method must be 0")
                val = _bounded_zlib(val, "PNG iTXt")
            elif comp_flag != 0:
                raise ValueError("PNG iTXt compression flag invalid")
            out["texts"].append(
                (key.decode("latin-1"), val.decode("utf-8", "strict"))
            )
        elif ctype == b"eXIf":
            _parse_tiff_exif(b, off, out)
    return out


@untrusted_decoder
def strip_png_metadata(b: bytes) -> bytes:
    """Remove tEXt/zTXt/iTXt/eXIf/tIME chunks from a PNG — the
    pre-publication scrub (author, software, comments, timestamps, GPS
    all live there); every other chunk passes through verbatim, so the
    pixel data is provably untouched."""
    from hive_udf_spark.operators.imagecodec import _png_chunks

    drops = []
    for ctype, off, length in _png_chunks(b):
        start = off - 8
        end = off + length + 4
        if ctype in _PNG_META_CHUNKS:
            drops.append((start, end))
    if not drops:
        return b
    out = bytearray()
    pos = 0
    for s, e in drops:
        out += b[pos:s]
        pos = e
    out += b[pos:]
    return bytes(out)


def _png_chunk_bytes(ctype: bytes, payload: bytes) -> bytes:
    import zlib as _z

    return (
        len(payload).to_bytes(4, "big")
        + ctype
        + payload
        + (_z.crc32(ctype + payload) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def add_png_metadata(
    png: bytes,
    texts: list[tuple[str, str]] | None = None,
    ztxt: list[tuple[str, str]] | None = None,
    itxt: list[tuple[str, str]] | None = None,
    exif: bytes | None = None,
) -> bytes:
    """Insert metadata chunks (tEXt / zTXt / iTXt / raw-TIFF eXIf)
    right after IHDR — the fixture twin for parse/strip."""
    import zlib as _z

    if png[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    # IHDR: first chunk, fixed 13-byte payload
    ihdr_end = 8 + 8 + 13 + 4
    extra = bytearray()
    for k, v in texts or []:
        extra += _png_chunk_bytes(
            b"tEXt", k.encode("latin-1") + b"\x00" + v.encode("latin-1")
        )
    for k, v in ztxt or []:
        extra += _png_chunk_bytes(
            b"zTXt",
            k.encode("latin-1") + b"\x00\x00" + _z.compress(v.encode("latin-1")),
        )
    for k, v in itxt or []:
        extra += _png_chunk_bytes(
            b"iTXt",
            k.encode("latin-1") + b"\x00\x01\x00en\x00\x00"
            + _z.compress(v.encode("utf-8")),
        )
    if exif is not None:
        extra += _png_chunk_bytes(b"eXIf", exif)
    return png[:ihdr_end] + bytes(extra) + png[ihdr_end:]


PNG_META_SCHEMA = (
    "doc_id bigint, n_texts int, author string, comment string, "
    "software string, has_exif boolean, orientation int"
)


def png_metadata_table(blobs):
    """(doc_id, blob) → PNG metadata row via mapInPandas: text-chunk
    count, the conventional Author/Comment/Software keys, and the eXIf
    orientation — map-side only."""
    from collections.abc import Iterator

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id", "n_texts", "author", "comment", "software",
            "has_exif", "orientation",
        ]
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in cols}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                meta = parse_png_metadata(bytes(blob))
                kv = dict(meta["texts"])
                rows["doc_id"].append(int(doc_id))
                rows["n_texts"].append(len(meta["texts"]))
                rows["author"].append(kv.get("Author"))
                rows["comment"].append(kv.get("Comment"))
                rows["software"].append(kv.get("Software"))
                rows["has_exif"].append(meta["has_exif"])
                rows["orientation"].append(meta["orientation"])
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(extract, schema=PNG_META_SCHEMA)


def png_metadata_fixture_udf(width: int = 8, height: int = 8):
    """Arrow-batched fixture: (doc_id, payload) → a real Paeth-filtered
    PNG carrying metadata derived from doc_id — Author via tEXt,
    Comment alternating tEXt / zTXt / iTXt (all three chunk syntaxes
    exercised), Software, and an eXIf chunk (big-endian on odd rows) on
    the ``doc_id % 3 != 0`` stratum."""
    from pyspark.sql.functions import pandas_udf

    n = width * height

    @pandas_udf("binary")
    def enc(doc_id: pd.Series, s: pd.Series) -> pd.Series:
        import numpy as np

        from hive_udf_spark.operators.imagecodec import encode_png

        def one(did: int, t: str) -> bytes:
            a = np.frombuffer(t.encode("ascii"), dtype=np.uint8)
            if a.size != n:
                raise ValueError(f"payload must be exactly {n} ASCII chars")
            png = encode_png(a.reshape(height, width), filter_type=4)
            comment = f"c{did % 11}"
            kw = dict(
                texts=[("Author", f"A{did % 7}")],
                ztxt=[], itxt=[],
            )
            kind = did % 3
            if kind == 0:
                kw["texts"].append(("Comment", comment))
            elif kind == 1:
                kw["ztxt"].append(("Comment", comment))
            else:
                kw["itxt"].append(("Comment", comment))
            kw["texts"].append(("Software", "spark-graft"))
            exif = (
                None
                if did % 3 == 0
                else build_tiff_exif(
                    f"Cam{did % 5}", "P", 1 + did % 8, big_endian=bool(did % 2)
                )
            )
            return add_png_metadata(png, exif=exif, **kw)

        return pd.Series([one(int(d), t) for d, t in zip(doc_id, s)])

    return enc


def exif_fixture_udf(n_blocks_side: int = 8, quality: int = 100):
    """Arrow-batched fixture: (doc_id, payload) → a real baseline JPEG
    (jpegcodec flat blocks over the payload chars) carrying a spec-valid
    EXIF APP1 derived from doc_id — make/model/orientation rotate, byte
    order alternates, and a ``doc_id % 7 == 0`` stratum has NO GPS IFD
    (the absent-GPS path must not invent coordinates)."""
    from pyspark.sql.functions import pandas_udf

    n = n_blocks_side * n_blocks_side

    @pandas_udf("binary")
    def enc(doc_id: pd.Series, s: pd.Series) -> pd.Series:
        import numpy as np

        from hive_udf_spark.operators.jpegcodec import encode_jpeg

        def one(did: int, t: str) -> bytes:
            a = np.frombuffer(t.encode("ascii"), dtype=np.uint8)
            if a.size != n:
                raise ValueError(f"payload must be exactly {n} ASCII chars")
            px = np.repeat(
                np.repeat(a.reshape(n_blocks_side, n_blocks_side), 8, 0), 8, 1
            )
            base = encode_jpeg(px, quality=quality)
            if did % 7 == 0:
                lat = lon = None
            else:
                lat = (did * 7919) % 180_000_001 - 90_000_000
                lon = (did * 104729) % 360_000_001 - 180_000_000
            return add_exif(
                base,
                make=f"Cam{did % 5}",
                model=f"M{did % 3}",
                orientation=1 + did % 8,
                lat_udeg=lat,
                lon_udeg=lon,
                big_endian=bool(did % 2),
            )

        return pd.Series([one(int(d), t) for d, t in zip(doc_id, s)])

    return enc


def heic_exif_fixture_udf(side: int = 8):
    """Arrow-batched fixture (r11): (doc_id, payload) → a real LOSSLESS
    HEIC whose EXIF rides as a linked ``Exif`` item (libheif's
    add-metadata path — the phone-camera layout), same doc_id-derived
    field rotation as the JPEG twin so the two queries share an
    oracle."""
    from pyspark.sql.functions import pandas_udf

    n = side * side

    @pandas_udf("binary")
    def enc(doc_id: pd.Series, s: pd.Series) -> pd.Series:
        import numpy as np

        from hive_udf_spark.operators.native import (
            heif_native_encode_lossless_gray,
        )

        def one(did: int, t: str) -> bytes:
            a = np.frombuffer(t.encode("ascii"), dtype=np.uint8)
            if a.size != n:
                raise ValueError(f"payload must be exactly {n} ASCII chars")
            if did % 7 == 0:
                lat = lon = None
            else:
                lat = (did * 7919) % 180_000_001 - 90_000_000
                lon = (did * 104729) % 360_000_001 - 180_000_000
            tiff = build_tiff_exif(
                make=f"Cam{did % 5}",
                model=f"M{did % 3}",
                orientation=1 + did % 8,
                lat_udeg=lat,
                lon_udeg=lon,
                big_endian=bool(did % 2),
            )
            return heif_native_encode_lossless_gray(
                a.reshape(side, side), codec="hevc", exif=tiff
            )

        return pd.Series([one(int(d), t) for d, t in zip(doc_id, s)])

    return enc


# ---------------------------------------------------------------------------
# Spark table operators
# ---------------------------------------------------------------------------

EXIF_SCHEMA = (
    "doc_id bigint, has_exif boolean, make string, model string, "
    "orientation int, lat_udeg bigint, lon_udeg bigint"
)


def exif_table(blobs):
    """(doc_id, blob) → EXIF metadata row per JPEG via mapInPandas —
    map-side only, integer-exact GPS micro-degrees (PII routing
    signal)."""
    from collections.abc import Iterator

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id", "has_exif", "make", "model", "orientation",
            "lat_udeg", "lon_udeg",
        ]
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in cols}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                meta = parse_exif(bytes(blob))
                rows["doc_id"].append(int(doc_id))
                for k in cols[1:]:
                    rows[k].append(meta[k])
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(extract, schema=EXIF_SCHEMA)


def strip_exif_blobs(blobs):
    """(doc_id, blob) → (doc_id, blob) with APP1 Exif segments removed —
    the standard pre-publication privacy scrub, map-side only."""
    from collections.abc import Iterator

    def scrub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "blob": [strip_exif(bytes(b)) for b in pdf["blob"]],
                }
            )

    return blobs.mapInPandas(scrub, schema="doc_id bigint, blob binary")
