"""EXIF tests — APP1/TIFF-IFD metadata round-trips (both byte orders,
inline and offset value forms, exact integer micro-degree GPS), the
strip scrub's byte-exactness guarantee, quarantine paths, and the
Spark table operators.

No reference analogue (the reference is MLnick/hive-udf, a
cardinality-UDAF package) — mandated multimodal extension surface.
"""

from __future__ import annotations

import numpy as np
import pytest

from hive_udf_spark.operators.exif import (
    add_exif,
    exif_table,
    parse_exif,
    strip_exif,
    strip_exif_blobs,
)
from hive_udf_spark.operators.jpegcodec import decode_jpeg_gray, encode_jpeg

BASE = encode_jpeg(np.arange(64, dtype=np.uint8).reshape(8, 8), quality=90)


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize(
    "lat,lon",
    [
        (37_774_900, -122_419_400),
        (-33_865_100, 151_209_300),
        (0, 0),
        (89_999_999, 179_999_999),
        (None, None),
    ],
)
def test_roundtrip_exact_microdegrees(big_endian, lat, lon):
    j = add_exif(BASE, "CamCo", "X100", 6, lat, lon, big_endian=big_endian)
    m = parse_exif(j)
    assert m["has_exif"]
    assert (m["make"], m["model"], m["orientation"]) == ("CamCo", "X100", 6)
    assert m["lat_udeg"] == lat and m["lon_udeg"] == lon


@pytest.mark.parametrize(
    "make,model", [("C", "M"), ("Cam0", "M0"), ("LongMakerName", "LongModelName")]
)
def test_inline_and_offset_ascii_forms(make, model):
    """TIFF 6.0: values <= 4 bytes are inline, larger go through the
    value area — both forms must parse."""
    m = parse_exif(add_exif(BASE, make, model, 1))
    assert m["make"] == make and m["model"] == model


def test_no_exif():
    m = parse_exif(BASE)
    assert m == {
        "has_exif": False, "make": None, "model": None,
        "orientation": None, "lat_udeg": None, "lon_udeg": None,
    }


def test_strip_is_byte_exact_and_pixels_survive():
    j = add_exif(BASE, "CamCo", "X100", 3, 1_000_000, 2_000_000)
    assert strip_exif(j) == BASE  # exact restoration, not just "decodes"
    assert np.array_equal(decode_jpeg_gray(j), decode_jpeg_gray(BASE))
    assert not parse_exif(strip_exif(j))["has_exif"]
    # a JPEG without EXIF passes through untouched
    assert strip_exif(BASE) == BASE


def test_quarantine_paths():
    with pytest.raises(ValueError, match="SOI"):
        parse_exif(b"PNG...")
    j = bytearray(add_exif(BASE, "A", "B", 1, 5, 5))
    # SOI(2) + FFE1(2) + len(2) + "Exif\0\0"(6) → TIFF header at byte 12
    j[12:16] = b"XX*\x00"
    with pytest.raises(ValueError, match="TIFF header"):
        parse_exif(bytes(j))
    # zero GPS denominator
    k = bytearray(add_exif(BASE, "A", "B", 1, 5_000_000, 5_000_000))
    # find a rational denominator (the "1" after degree numerator) and zero it
    idx = bytes(k).find((5).to_bytes(4, "little") + (1).to_bytes(4, "little"))
    assert idx > 0
    k[idx + 4 : idx + 8] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="zero denominator"):
        parse_exif(bytes(k))
    # truncated segment
    with pytest.raises(ValueError):
        parse_exif(add_exif(BASE, "A", "B", 1)[:20])


def test_fuzz_byte_flips_never_escape():
    rng = np.random.default_rng(5)
    base = bytearray(add_exif(BASE, "CamCo", "X100", 6, 37_774_900, -122_419_400))
    for _ in range(300):
        b = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        for fn in (parse_exif, strip_exif):
            try:
                fn(bytes(b))
            except ValueError:
                pass


def test_tables_through_spark(spark):
    blobs = spark.createDataFrame(
        [
            (i, bytearray(add_exif(BASE, f"Cam{i}", "M", 1 + i, i * 1_000_000, -i * 1_000_000)))
            for i in range(4)
        ],
        "doc_id long, blob binary",
    )
    rows = {r.doc_id: r for r in exif_table(blobs).collect()}
    for i in range(4):
        r = rows[i]
        assert r.make == f"Cam{i}" and r.orientation == 1 + i
        assert r.lat_udeg == i * 1_000_000
        assert r.lon_udeg == (-i * 1_000_000 if i else 0)
    # strip: every blob loses EXIF, pixels identical
    stripped = strip_exif_blobs(blobs)
    out = {r.doc_id: r for r in exif_table(stripped).collect()}
    assert all(not out[i].has_exif for i in range(4))


# ---------------------------------------------------------------------------
# PNG textual metadata + eXIf (r9)
# ---------------------------------------------------------------------------


def _png():
    from hive_udf_spark.operators.imagecodec import encode_png

    return encode_png(np.arange(64, dtype=np.uint8).reshape(8, 8), filter_type=4)


def test_png_metadata_roundtrip_all_chunk_kinds():
    from hive_udf_spark.operators.exif import (
        add_png_metadata,
        build_tiff_exif,
        parse_png_metadata,
        strip_png_metadata,
    )
    from hive_udf_spark.operators.imagecodec import decode_to_gray

    png = _png()
    exif = build_tiff_exif("CamCo", "X9", 6, 1_500_000, -2_250_000, big_endian=True)
    j = add_png_metadata(
        png,
        texts=[("Author", "Ann"), ("Comment", "hi")],
        ztxt=[("Software", "zlibwriter")],
        itxt=[("Description", "unicode émoji ✓")],
        exif=exif,
    )
    m = parse_png_metadata(j)
    kv = dict(m["texts"])
    assert kv == {
        "Author": "Ann", "Comment": "hi",
        "Software": "zlibwriter", "Description": "unicode émoji ✓",
    }
    assert m["has_exif"] and m["make"] == "CamCo" and m["orientation"] == 6
    assert m["lat_udeg"] == 1_500_000 and m["lon_udeg"] == -2_250_000
    # strip restores the original byte-for-byte; decoder unaffected
    assert strip_png_metadata(j) == png
    assert strip_png_metadata(png) == png
    assert np.array_equal(
        decode_to_gray(j), np.arange(64, dtype=np.uint8).reshape(8, 8)
    )


def test_png_metadata_quarantine():
    from hive_udf_spark.operators.exif import (
        add_png_metadata,
        parse_png_metadata,
        strip_png_metadata,
    )

    png = _png()
    with pytest.raises(ValueError, match="not a PNG"):
        add_png_metadata(b"JPEG", texts=[("k", "v")])
    j = bytearray(add_png_metadata(png, texts=[("Author", "Ann")]))
    j[40] ^= 0xFF  # corrupt inside the tEXt chunk → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        parse_png_metadata(bytes(j))
    with pytest.raises(ValueError, match="CRC"):
        strip_png_metadata(bytes(j))
    # malformed zTXt method byte
    import zlib

    bad_ztxt = b"k\x00\x01" + zlib.compress(b"v")
    chunk = (
        len(bad_ztxt).to_bytes(4, "big") + b"zTXt" + bad_ztxt
        + (zlib.crc32(b"zTXt" + bad_ztxt) & 0xFFFFFFFF).to_bytes(4, "big")
    )
    blob = png[:33] + chunk + png[33:]
    with pytest.raises(ValueError, match="method must be 0"):
        parse_png_metadata(blob)


def test_png_metadata_fuzz():
    from hive_udf_spark.operators.exif import (
        add_png_metadata,
        build_tiff_exif,
        parse_png_metadata,
        strip_png_metadata,
    )

    rng = np.random.default_rng(6)
    base = bytearray(
        add_png_metadata(
            _png(),
            texts=[("Author", "Ann")],
            ztxt=[("C", "zzz")],
            exif=build_tiff_exif("M", "P", 1, 5, 5),
        )
    )
    for _ in range(200):
        b = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        for fn in (parse_png_metadata, strip_png_metadata):
            try:
                fn(bytes(b))
            except ValueError:
                pass


def test_png_metadata_table_through_spark(spark):
    from hive_udf_spark.operators.exif import (
        add_png_metadata,
        png_metadata_table,
    )

    blobs = spark.createDataFrame(
        [
            (i, bytearray(add_png_metadata(_png(), texts=[("Author", f"A{i}")])))
            for i in range(3)
        ],
        "doc_id long, blob binary",
    )
    rows = {r.doc_id: r for r in png_metadata_table(blobs).collect()}
    for i in range(3):
        assert rows[i].author == f"A{i}" and rows[i].n_texts == 1
        assert not rows[i].has_exif
