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
