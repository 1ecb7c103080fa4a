"""Opportunistic native-codec dispatch (operators/native.py, r10):
vendored ≡ native equivalence on every fixture family, the lossy-VP8
luma mapping, and the bounded-decompress contract on the native paths.

All tests skip cleanly when the host image lacks the library — the
dispatch layer itself is what guarantees the vendored fallback then."""

from __future__ import annotations

import numpy as np
import pytest

from hive_udf_spark.operators import native

needs_webp = pytest.mark.skipif(
    not native.webp_native_available(), reason="libwebp absent"
)
needs_zstd = pytest.mark.skipif(
    not native.zstd_native_available(), reason="libzstd absent"
)
needs_brotli = pytest.mark.skipif(
    not native.brotli_native_available(), reason="libbrotli absent"
)


# ---------------------------------------------------------------------------
# lossy VP8: the flat-block luma mapping that makes the oracle hash-exact
# ---------------------------------------------------------------------------


@needs_webp
def test_lossy_flat_block_luma_mapping_all_levels():
    """Every gray level v painted as a flat 16×16 macroblock and pushed
    through real libwebp q100 encode→decode lands EXACTLY on
    (56318·v + 1081344) >> 16, position-independently — the identity
    the multimodal_webp_lossy_decode oracle is built on."""
    want = [(v * 56318 + 1081344) >> 16 for v in range(256)]
    for base in range(0, 256, 16):
        vals = [(base + i) % 256 for i in range(16)]
        img = np.zeros((64, 64), np.uint8)
        for i, v in enumerate(vals):
            r, c = divmod(i, 4)
            img[r * 16 : (r + 1) * 16, c * 16 : (c + 1) * 16] = v
        blob = native.webp_native_encode_lossy_gray(img, quality=100.0)
        assert blob[12:16] == b"VP8 "
        y = native.webp_native_decode_luma(blob)
        assert y.shape == (64, 64)
        for i, v in enumerate(vals):
            r, c = divmod(i, 4)
            blk = y[r * 16 : (r + 1) * 16, c * 16 : (c + 1) * 16]
            assert blk.min() == blk.max() == want[v], (v, blk.min(), blk.max())
    # shuffled placement: the mapping is position-independent
    vals2 = [7, 200, 7, 13, 255, 0, 128, 7, 99, 200, 1, 2, 3, 4, 5, 6]
    img2 = np.zeros((64, 64), np.uint8)
    for i, v in enumerate(vals2):
        r, c = divmod(i, 4)
        img2[r * 16 : (r + 1) * 16, c * 16 : (c + 1) * 16] = v
    y2 = native.webp_native_decode_luma(
        native.webp_native_encode_lossy_gray(img2, quality=100.0)
    )
    for i, v in enumerate(vals2):
        assert int(y2[(i // 4) * 16, (i % 4) * 16]) == want[v]


@needs_webp
def test_decode_webp_gray_routes_lossy_to_luma():
    """The production entry point decodes a lossy blob to the luma
    plane instead of quarantining (r9 verdict item 1)."""
    from hive_udf_spark.operators.webpcodec import decode_webp_gray

    img = np.full((32, 48), 77, np.uint8)
    blob = native.webp_native_encode_lossy_gray(img, quality=100.0)
    y = decode_webp_gray(blob)
    assert y.shape == (32, 48)
    assert int(y.min()) == int(y.max()) == (77 * 56318 + 1081344) >> 16


@needs_webp
def test_lossy_webp_byte_flip_fuzz_never_crashes():
    """Corrupt lossy blobs either decode (harmless flip) or raise
    ValueError → quarantine; never a crash or silent wrong shape."""
    from hive_udf_spark.operators.webpcodec import decode_webp_gray

    img = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64)
    blob = bytearray(native.webp_native_encode_lossy_gray(img, quality=100.0))
    rng = np.random.RandomState(7)
    for _ in range(60):
        i = int(rng.randint(0, len(blob)))
        orig = blob[i]
        blob[i] ^= 1 << int(rng.randint(0, 8))
        try:
            out = decode_webp_gray(bytes(blob))
            assert out.dtype == np.uint8 and out.ndim == 2
        except ValueError:
            pass
        blob[i] = orig


# ---------------------------------------------------------------------------
# VP8L: vendored decoder ≡ native libwebp on every encoder mode
# ---------------------------------------------------------------------------


@needs_webp
def test_vp8l_vendored_equals_native_on_all_modes():
    """The vendored VP8L decoder and real libwebp agree byte-for-byte
    (through the same BT.601 gray) on every fixture bitstream shape —
    independent-implementation evidence for the vendored decoder."""
    from hive_udf_spark.operators.webpcodec import (
        decode_webp_gray,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(42)
    for mode in ("plain", "subtract-green", "palette"):
        for trial in range(4):
            img = rng.randint(0, 256, size=(9, 13), dtype=np.uint8)
            if mode == "palette":  # palette mode wants few distinct values
                img = (img % 7) * 36
            blob = encode_webp_lossless(img, mode=mode)
            vendored = decode_webp_gray(blob)
            rgba = native.webp_native_decode_rgba(blob)
            r = rgba[..., 0].astype(np.int64)
            g = rgba[..., 1].astype(np.int64)
            b = rgba[..., 2].astype(np.int64)
            native_gray = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
            assert np.array_equal(vendored, native_gray), (mode, trial)


# ---------------------------------------------------------------------------
# zstd: vendored ≡ native, both directions, every frame shape
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# HEIF / AVIF: lossless AV1 round trip through libheif + libaom
# ---------------------------------------------------------------------------

needs_heif = pytest.mark.skipif(
    not native.heif_native_available(), reason="libheif absent"
)


@needs_heif
def test_avif_lossless_roundtrip_exact():
    rng = np.random.RandomState(5)
    for shape in ((8, 8), (24, 40), (17, 9)):
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        blob = native.heif_native_encode_lossless_gray(img)
        assert blob[8:12] == b"avif"
        got = native.heif_native_decode_gray(blob)
        assert np.array_equal(got, img), shape


@needs_heif
def test_avif_routes_through_decode_gray_and_probe_agrees():
    """The multimodal router decodes AVIF natively, and the r9
    structural probe agrees on geometry/codec for the same blob."""
    from hive_udf_spark.operators.mp4codec import heif_probe
    from hive_udf_spark.operators.multimodal import _decode_gray

    img = np.full((16, 32), 200, np.uint8)
    blob = native.heif_native_encode_lossless_gray(img)
    assert np.array_equal(_decode_gray(blob), img)
    probe = heif_probe(blob)
    probe = probe if isinstance(probe, dict) else probe._asdict()
    assert probe.get("width") in (32, None) or probe.get("codec")


@needs_heif
def test_avif_byte_flip_fuzz_never_crashes():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    base = native.heif_native_encode_lossless_gray(img)
    rng = np.random.RandomState(13)
    for _ in range(60):
        blob = bytearray(base)
        i = int(rng.randint(0, len(blob)))
        blob[i] ^= 1 << int(rng.randint(0, 8))
        try:
            out = native.heif_native_decode_gray(bytes(blob))
            assert out.dtype == np.uint8 and out.ndim == 2
        except ValueError:
            pass


@needs_zstd
def test_zstd_vendored_native_equivalence_both_directions():
    from hive_udf_spark.operators.zstdcodec import zstd_compress, zstd_decompress

    payloads = [
        b"",
        b"a" * 100,
        bytes(range(256)) * 40,
        ("the quick brown fox " * 200).encode(),
    ]
    for p in payloads:
        for shape in ("raw", "rle", "huf", "huf4", "seq", "full", "full4", "auto"):
            if shape == "rle" and len(set(p)) > 1:
                continue
            try:
                frame = zstd_compress(p, shape=shape)
            except ValueError:
                continue  # shape not expressible for this payload
            assert native.zstd_native_decompress(frame) == p, shape
        nat = native.zstd_native_compress(p, level=5)
        assert zstd_decompress(nat, max_output=1 << 24) == p


@needs_zstd
def test_zstd_native_bounded_and_corrupt():
    from hive_udf_spark.operators.zstdcodec import zstd_compress

    frame = zstd_compress(b"x" * 4096, shape="auto")
    with pytest.raises(ValueError, match="cap|failed"):
        native.zstd_native_decompress(frame, max_output=100)
    with pytest.raises(ValueError):
        native.zstd_native_decompress(frame[:10] + b"\x00\x01" + frame[12:])


# ---------------------------------------------------------------------------
# brotli: roundtrip, quality rotation, bounded contract
# ---------------------------------------------------------------------------


@needs_brotli
def test_brotli_roundtrip_and_bounds():
    payloads = [b"", b"hello brotli", ("corpus text " * 500).encode()]
    for p in payloads:
        for q in (1, 5, 9, 11):
            frame = native.brotli_native_compress(p, quality=q)
            assert native.brotli_native_decompress(frame) == p
    big = native.brotli_native_compress(b"z" * 100_000)
    with pytest.raises(ValueError, match="cap|failed"):
        native.brotli_native_decompress(big, max_output=1000)
    with pytest.raises(ValueError):
        native.brotli_native_decompress(b"\xff\xff\xff\xffnot brotli at all")


@needs_brotli
def test_warc_br_content_coding_decodes():
    """decode_content_encoding handles 'br' and stacked 'br, gzip'."""
    import zlib

    from hive_udf_spark.operators.warc import decode_content_encoding

    body = b"<html><body>br page</body></html>"
    br = native.brotli_native_compress(body)
    assert decode_content_encoding(br, {"content-encoding": "br"}) == body
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    stacked = co.compress(br) + co.flush()
    got = decode_content_encoding(stacked, {"content-encoding": "br, gzip"})
    assert got == body


def test_thread_pin_regression_guard():
    """r11 verdict task 8: per-blob codec thread pools MUST stay pinned
    to 1 (Spark's 32 parallel Python workers are the parallelism; the
    r11 batch-6 oversubscription cost 36x on dav1d, 6x on x265).  This
    guard fails loudly if a future binding change drops a pin."""
    import ctypes
    import struct

    import numpy as np

    from hive_udf_spark.operators import native

    # dav1d — the known 1.x ABI pokes n_threads/max_frame_delay to 1
    if native.dav1d_available():
        lib = native._dav1d()
        assert native._dav1d_abi_major(lib) == 1
        settings = ctypes.create_string_buffer(512)
        lib.dav1d_default_settings(settings)
        assert native._pin_dav1d_settings(lib, settings)
        assert struct.unpack_from("<ii", settings, 0) == (1, 1)

    # an unrecognized ABI major must NOT be poked (ADVICE r11)
    class _FakeLib:
        @staticmethod
        def dav1d_version():
            return b"0.9.2"

    buf = bytearray(b"\x7f" * 16)
    assert not native._pin_dav1d_settings(_FakeLib(), buf)
    assert bytes(buf) == b"\x7f" * 16

    # x265 encoder knobs — pools off, single frame thread, no WPP
    pins = dict(native._X265_PIN_PARAMS)
    assert pins[b"x265:pools"] == b"none"
    assert pins[b"x265:frame-threads"] == b"1"
    assert pins[b"x265:wpp"] == b"0"

    # libheif decode — every decode must cap decoding threads at 1
    if native.heif_native_available():
        lib = native._heif()
        calls = []
        orig = lib.heif_context_set_max_decoding_threads

        def rec(ctx, n):
            calls.append(n)
            return orig(ctx, n)

        lib.heif_context_set_max_decoding_threads = rec
        try:
            g = np.full((16, 16), 77, np.uint8)
            blob = native.heif_native_encode_lossless_gray(g, codec="av1")
            assert np.array_equal(native.heif_native_decode_gray(blob), g)
        finally:
            lib.heif_context_set_max_decoding_threads = orig
        assert calls and all(n == 1 for n in calls)
