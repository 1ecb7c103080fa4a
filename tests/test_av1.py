"""AV1 video decode tier (r11, verdict item 1): dav1d native dispatch,
AV1-in-MP4 mux/demux, iloc item extraction, probe agreement, fuzz."""

from __future__ import annotations

import numpy as np
import pytest

from hive_udf_spark.operators import native
from hive_udf_spark.operators.imagecodec import (
    decode_to_gray,
    split_container_frames,
)
from hive_udf_spark.operators.mp4codec import (
    encode_mp4_av1,
    heif_item_payload,
    split_mp4_frames,
)

pytestmark = pytest.mark.skipif(
    not (native.dav1d_available() and native.heif_native_available()),
    reason="libdav1d/libheif absent",
)


def _tu(gray: np.ndarray) -> bytes:
    return heif_item_payload(native.heif_native_encode_lossless_gray(gray))


RNG = np.random.RandomState(5)
FRAMES = [RNG.randint(0, 256, (24, 32), dtype=np.uint8) for _ in range(3)]


def test_av1_mp4_roundtrip_pixel_exact():
    mp4 = encode_mp4_av1([_tu(f) for f in FRAMES], 32, 24)
    samples = split_mp4_frames(mp4)
    assert len(samples) == 3
    for s, f in zip(samples, FRAMES):
        assert native.is_av1_temporal_unit(s)
        assert np.array_equal(decode_to_gray(s), f)
    assert len(split_container_frames(mp4)) == 3


def test_dav1d_agrees_with_libheif_on_same_payload():
    """Probe agreement: the two independent AV1 decoders in the
    container must produce identical pixels for the same stream."""
    for f in FRAMES:
        avif = native.heif_native_encode_lossless_gray(f)
        via_heif = native.heif_native_decode_gray(avif)
        via_dav1d = native.dav1d_decode_obus_gray(heif_item_payload(avif))
        assert np.array_equal(via_heif, via_dav1d)


def test_av1c_config_carries_sequence_header():
    mp4 = encode_mp4_av1([_tu(FRAMES[0])], 32, 24)
    at = mp4.index(b"av1C")
    body = mp4[at + 4 :]
    assert body[0] == 0x81  # marker | version
    assert (body[4] >> 3) & 0x0F == 1  # configOBUs start with a seq header


def test_avc1_still_quarantines():
    """No H.264 decoder ships here: an avc1-shaped sample must raise
    (→ quarantine), never emit pixels."""
    fake_sample = b"\x00\x00\x00\x02\x09\x10"  # AVCC-ish access unit
    with pytest.raises(ValueError):
        decode_to_gray(fake_sample)


def test_dav1d_absent_quarantines(monkeypatch):
    monkeypatch.setattr(native, "_dav1d", lambda: None)
    with pytest.raises(ValueError, match="libdav1d"):
        native.dav1d_decode_obus_gray(b"\x12\x00\x0a\x06")


def test_av1_byte_flip_fuzz_never_crashes():
    base = bytearray(_tu(FRAMES[0]))
    rng = np.random.RandomState(9)
    for _ in range(120):
        i = int(rng.randint(0, len(base)))
        orig = base[i]
        base[i] ^= 1 << int(rng.randint(0, 8))
        try:
            out = native.dav1d_decode_obus_gray(bytes(base))
            assert out.dtype == np.uint8 and out.ndim == 2
        except ValueError:
            pass
        base[i] = orig


def test_heif_item_payload_matches_mdat():
    avif = native.heif_native_encode_lossless_gray(FRAMES[0])
    import struct

    pos, mdat = 0, None
    while pos + 8 <= len(avif):
        size = struct.unpack_from(">I", avif, pos)[0]
        if avif[pos + 4 : pos + 8] == b"mdat":
            mdat = avif[pos + 8 : pos + size]
        pos += size
    assert heif_item_payload(avif) == mdat
    with pytest.raises(ValueError, match="missing from iloc"):
        heif_item_payload(avif, item_id=999)


# ---------------------------------------------------------------------------
# AV1-in-WebM (r11): EBML cluster demux → the same dav1d tier
# ---------------------------------------------------------------------------


def _webm(frames):
    from hive_udf_spark.operators.mediaprobe import encode_webm_av1

    return encode_webm_av1([_tu(f) for f in frames], 32, 24)


def test_webm_av1_roundtrip_pixel_exact():
    from hive_udf_spark.operators.mediaprobe import split_webm_frames

    webm = _webm(FRAMES)
    outs = split_webm_frames(webm)
    assert len(outs) == 3
    for o, f in zip(outs, FRAMES):
        assert native.is_av1_temporal_unit(o)  # delimiter re-added
        assert np.array_equal(decode_to_gray(o), f)
    assert len(split_container_frames(webm)) == 3


def test_webm_blocks_stored_without_temporal_delimiter():
    """The AV1-in-Matroska mapping stores OBUs without the TD; the twin
    must comply and the demuxer must re-add it."""
    webm = _webm(FRAMES[:1])
    assert b"\xa3" in webm
    # the raw block payload inside the file must NOT start with 0x12 0x00
    tu = _tu(FRAMES[0])
    assert tu[:2] == b"\x12\x00"
    assert tu[2:] in webm and tu not in webm


def test_webm_laced_blocks_refuse():
    from hive_udf_spark.operators.mediaprobe import split_webm_frames

    webm = bytearray(_webm(FRAMES[:1]))
    # SimpleBlock layout: 0xA3 <size vint> 0x81 <i16 tc> <flags> ...
    # (search AFTER the Cluster id + its Timecode child: 0xE7 0x81 0x00)
    at = webm.index(b"\xa3", webm.index(b"\xe7\x81\x00", webm.index(b"\x1f\x43\xb6\x75")))
    # flags byte = after id(1) + size vint + track vint(1) + tc(2)
    size_len = 8 - webm[at + 1].bit_length() + 1
    flags_at = at + 1 + size_len + 1 + 2
    webm[flags_at] |= 0x06  # EBML lacing
    with pytest.raises(ValueError, match="laced"):
        split_webm_frames(bytes(webm))


def test_webm_fuzz_never_crashes():
    from hive_udf_spark.operators.mediaprobe import split_webm_frames

    base = bytearray(_webm(FRAMES[:2]))
    rng = np.random.RandomState(13)
    for _ in range(200):
        i = int(rng.randint(0, len(base)))
        orig = base[i]
        base[i] ^= 1 << int(rng.randint(0, 8))
        try:
            for fr in split_webm_frames(bytes(base)):
                assert isinstance(fr, bytes)
        except ValueError:
            pass
        base[i] = orig


def test_webm_probe_still_reads_clustered_files():
    from hive_udf_spark.operators.mediaprobe import webm_probe

    probe = webm_probe(_webm(FRAMES))
    assert probe["tracks"][0]["codec"] == "V_AV1"
    assert (probe["tracks"][0]["width"], probe["tracks"][0]["height"]) == (32, 24)
