"""HEVC video decode tier (r11 — second half of verdict item 1):
libde265 native dispatch, HEVC-in-MP4 mux/demux with the 14496-15
length-prefix → Annex-B re-framing, hvcC record parsing, HEIC grid/idat
item extraction, probe agreement between the container's two
independent HEVC decode paths, fuzz."""

from __future__ import annotations

import numpy as np
import pytest

from hive_udf_spark.operators import native
from hive_udf_spark.operators.imagecodec import (
    decode_to_gray,
    split_container_frames,
)
from hive_udf_spark.operators.mp4codec import (
    _hvcc_config,
    encode_mp4_hevc,
    heif_item_payload,
    hevc_sample_to_annexb,
    hvcc_from_heic,
    split_mp4_frames,
)

pytestmark = pytest.mark.skipif(
    not (native.de265_available() and native.heif_native_available()),
    reason="libde265/libheif absent",
)

RNG = np.random.RandomState(5)
# 64x64 = exactly one CTU: libheif stores a single hvc1 item, no grid
FRAMES = [RNG.randint(0, 256, (64, 64), dtype=np.uint8) for _ in range(3)]


def _heic(gray: np.ndarray) -> bytes:
    return native.heif_native_encode_lossless_gray(gray, codec="hevc")


def _mp4(frames) -> bytes:
    heics = [_heic(f) for f in frames]
    return encode_mp4_hevc(
        [heif_item_payload(h) for h in heics],
        hvcc_from_heic(heics[0]),
        64, 64,
    )


def test_hevc_mp4_roundtrip_pixel_exact():
    mp4 = _mp4(FRAMES)
    samples = split_mp4_frames(mp4)
    assert len(samples) == 3
    for s, f in zip(samples, FRAMES):
        assert native.is_hevc_annexb(s)
        assert np.array_equal(decode_to_gray(s), f)
    assert len(split_container_frames(mp4)) == 3


def test_de265_agrees_with_libheif_on_same_payload():
    """Probe agreement: libde265 (direct binding, demuxer re-framing)
    and libheif's own decode of the identical coded item must produce
    identical pixels — the AV1 cross-check discipline applied to HEVC."""
    for f in FRAMES:
        heic = _heic(f)
        via_heif = native.heif_native_decode_gray(heic)
        ls, psets = _hvcc_config(hvcc_from_heic(heic))
        annexb = hevc_sample_to_annexb(heif_item_payload(heic), ls, psets)
        via_de265 = native.hevc_decode_annexb_gray(annexb)
        assert np.array_equal(via_heif, via_de265)
        assert np.array_equal(via_de265, f)  # and lossless = the input


def test_heic_grid_layout_decodes_and_idat_items_resolve():
    """Sub-CTU images: libheif pads the coded tile to 64 px and crops
    via a derived grid item whose descriptor lives in meta/idat (iloc
    construction method 1) — the phone-camera layout.  libheif decode
    must crop exactly; the primary-item payload is the 8-byte grid
    descriptor resolved through the idat path."""
    g = RNG.randint(0, 256, (16, 24), dtype=np.uint8)
    heic = _heic(g)
    assert np.array_equal(native.heif_native_decode_gray(heic), g)
    grid = heif_item_payload(heic)  # primary = the grid item, in idat
    assert len(grid) == 8
    # GridDescriptor: version 0, flags, rows-1, cols-1, w, h (16-bit)
    assert grid[0] == 0 and grid[2] == 0 and grid[3] == 0
    assert int.from_bytes(grid[4:6], "big") == 24
    assert int.from_bytes(grid[6:8], "big") == 16


def test_hvcc_record_parses_vps_sps_pps():
    hvcc = hvcc_from_heic(_heic(FRAMES[0]))
    length_size, nals = _hvcc_config(hvcc)
    assert length_size == 4
    assert [(n[0] >> 1) & 0x3F for n in nals] == [32, 33, 34]


def test_hvcc_malformed_raises():
    with pytest.raises(ValueError, match="truncated"):
        _hvcc_config(b"\x01" * 10)
    with pytest.raises(ValueError, match="configurationVersion"):
        _hvcc_config(b"\x07" + b"\x00" * 30)


def test_hevc_sample_truncated_nal_raises():
    with pytest.raises(ValueError, match="truncated|extends"):
        hevc_sample_to_annexb(b"\x00\x00\x00\x10abc", 4, [b"\x40\x01"])


def test_de265_absent_quarantines(monkeypatch):
    monkeypatch.setattr(native, "_de265", lambda: None)
    with pytest.raises(ValueError, match="libde265"):
        native.hevc_decode_annexb_gray(b"\x00\x00\x00\x01\x40\x01")


def test_hevc_byte_flip_fuzz_never_crashes():
    heic = _heic(FRAMES[0])
    ls, psets = _hvcc_config(hvcc_from_heic(heic))
    base = bytearray(hevc_sample_to_annexb(heif_item_payload(heic), ls, psets))
    rng = np.random.RandomState(9)
    for _ in range(120):
        i = int(rng.randint(0, len(base)))
        orig = base[i]
        base[i] ^= 1 << int(rng.randint(0, 8))
        try:
            out = native.hevc_decode_annexb_gray(bytes(base))
            assert out.dtype == np.uint8 and out.ndim == 2
        except ValueError:
            pass
        base[i] = orig


def test_hevc_truncation_fuzz_never_crashes():
    heic = _heic(FRAMES[0])
    ls, psets = _hvcc_config(hvcc_from_heic(heic))
    full = hevc_sample_to_annexb(heif_item_payload(heic), ls, psets)
    for cut in range(0, len(full), 97):
        try:
            native.hevc_decode_annexb_gray(full[:cut])
        except ValueError:
            pass


def test_mp4_hvc1_missing_hvcc_raises():
    """An hvc1 sample entry without the spec-required hvcC must raise at
    demux (quarantine), not emit undecodable samples."""
    mp4 = bytearray(_mp4(FRAMES[:1]))
    at = mp4.find(b"hvcC")
    mp4[at : at + 4] = b"xvcC"
    with pytest.raises(ValueError, match="missing hvcC"):
        split_mp4_frames(bytes(mp4))


def test_hevc_encoder_rejects_non_hevc_blob_payloads():
    with pytest.raises(ValueError):
        encode_mp4_hevc([], b"\x01" + b"\x00" * 22, 64, 64)
    with pytest.raises(ValueError, match="sample required"):
        encode_mp4_hevc(
            [], hvcc_from_heic(_heic(FRAMES[0])), 64, 64
        )


def test_hevc_in_matroska_roundtrip():
    """V_MPEGH/ISO/HEVC blocks (length-prefixed NALs, hvcC in
    CodecPrivate) re-frame to Annex-B and decode — the MP4 rule applied
    to EBML."""
    from hive_udf_spark.operators.mediaprobe import (
        encode_webm_hevc,
        split_webm_frames,
        webm_probe,
    )

    heics = [_heic(f) for f in FRAMES]
    mkv = encode_webm_hevc(
        [heif_item_payload(h) for h in heics], hvcc_from_heic(heics[0]),
        64, 64,
    )
    assert webm_probe(mkv)["tracks"][0]["codec"] == "V_MPEGH/ISO/HEVC"
    outs = split_webm_frames(mkv)
    assert len(outs) == 3
    for o, f in zip(outs, FRAMES):
        assert native.is_hevc_annexb(o)
        assert np.array_equal(decode_to_gray(o), f)


def test_hevc_matroska_missing_codecprivate_refuses():
    from hive_udf_spark.operators.mediaprobe import (
        encode_webm_hevc,
        split_webm_frames,
    )

    heics = [_heic(FRAMES[0])]
    mkv = bytearray(encode_webm_hevc(
        [heif_item_payload(h) for h in heics], hvcc_from_heic(heics[0]),
        64, 64,
    ))
    at = mkv.index(b"\x63\xa2")  # CodecPrivate id → corrupt it
    mkv[at : at + 2] = b"\x63\xa3"
    with pytest.raises(ValueError):
        split_webm_frames(bytes(mkv))


def test_heic_exif_item_roundtrip():
    """EXIF rides as a linked HEIF item (the phone layout): libheif's
    add-metadata path writes the ExifDataBlock, the vendored walk
    (iinf type lookup -> iloc -> tiff offset) recovers it exactly, and
    parse_exif magic-dispatches ISO-BMFF blobs through it."""
    from hive_udf_spark.operators.exif import build_tiff_exif, parse_exif
    from hive_udf_spark.operators.mp4codec import heif_exif_payload

    tiff = build_tiff_exif("CamX", "M9", 5,
                           lat_udeg=-1_234_567, lon_udeg=179_999_999,
                           big_endian=True)
    heic = native.heif_native_encode_lossless_gray(
        FRAMES[0], codec="hevc", exif=tiff
    )
    assert heif_exif_payload(heic) == tiff
    meta = parse_exif(heic)
    assert (meta["make"], meta["model"], meta["orientation"]) == ("CamX", "M9", 5)
    assert (meta["lat_udeg"], meta["lon_udeg"]) == (-1_234_567, 179_999_999)
    # pixels still decode exactly alongside the metadata item
    assert np.array_equal(native.heif_native_decode_gray(heic), FRAMES[0])


def test_heic_without_exif_reports_absent():
    from hive_udf_spark.operators.exif import parse_exif
    from hive_udf_spark.operators.mp4codec import heif_exif_payload

    heic = _heic(FRAMES[0])
    with pytest.raises(ValueError, match="no Exif item"):
        heif_exif_payload(heic)
    assert parse_exif(heic)["has_exif"] is False
