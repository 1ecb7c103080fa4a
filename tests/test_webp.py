"""WebP lossless (VP8L) codec tests — encoder↔decoder round-trips for
all three container shapes, hand-built bitstreams for the decode paths
no simple encoder emits (LZ77 backward references, color cache,
meta-prefix groups, predictor + color transforms), C-semantics checks
for the spec's truncating division, and the quarantine contract for
lossy/extended/truncated blobs.

No reference analogue (the reference is MLnick/hive-udf, a
cardinality-UDAF package) — this covers the mandated multimodal
extension surface (r8 verdict item 4).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_udf_spark.operators.webpcodec import (
    _BitWriter,
    _cas_half,
    _huff_lengths,
    _PrefixCode,
    _write_prefix_code,
    decode_vp8l,
    decode_webp_gray,
    encode_webp_lossless,
)

MODES = ["plain", "subtract-green", "palette"]


# ---------------------------------------------------------------------------
# Round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize(
    "shape", [(1, 1), (8, 8), (3, 7), (16, 5), (1, 17), (17, 1)]
)
def test_roundtrip_shapes(mode, shape):
    rng = np.random.default_rng(hash((mode, shape)) % (1 << 32))
    g = rng.integers(0, 256, size=shape, dtype=np.uint8)
    if mode == "palette":
        g = (g % 13 * 19).astype(np.uint8)
    out = decode_webp_gray(encode_webp_lossless(g, mode=mode))
    assert out.dtype == np.uint8
    assert np.array_equal(out, g)


@pytest.mark.parametrize("mode", MODES)
def test_roundtrip_degenerate_images(mode):
    for g in [
        np.zeros((2, 3), dtype=np.uint8),
        np.full((4, 4), 255, dtype=np.uint8),
        np.arange(64, dtype=np.uint8).reshape(8, 8),
        np.arange(256, dtype=np.uint8).reshape(16, 16),
    ]:
        assert np.array_equal(decode_webp_gray(encode_webp_lossless(g, mode)), g)


@pytest.mark.parametrize("n_distinct", [2, 3, 4, 5, 16, 17, 200])
def test_palette_bundling_boundaries(n_distinct):
    """Sub-byte pixel bundling switches at 2/4/16 palette entries; cover
    both sides of every boundary plus the unbundled >16 case."""
    rng = np.random.default_rng(n_distinct)
    g = (
        rng.integers(0, n_distinct, size=(9, 11))
        * (255 // max(n_distinct - 1, 1))
    ).astype(np.uint8)
    assert np.array_equal(decode_webp_gray(encode_webp_lossless(g, "palette")), g)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    mode=st.sampled_from(MODES),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_property(w, h, mode, seed):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert np.array_equal(decode_webp_gray(encode_webp_lossless(g, mode)), g)


def test_dispatcher_routes_webp():
    from hive_udf_spark.operators.imagecodec import decode_to_gray, supported_magic

    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    b = encode_webp_lossless(g)
    assert supported_magic(b)
    assert np.array_equal(decode_to_gray(b), g)
    # RIFF that is NOT WebP (AVI/WAV) must not be claimed
    assert not supported_magic(b"RIFF\x04\x00\x00\x00AVI ")


# ---------------------------------------------------------------------------
# Hand-built bitstreams: decoder-only paths
# ---------------------------------------------------------------------------


def _wrap(bw: _BitWriter) -> bytes:
    payload = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _codes(bw: _BitWriter, greens, reds, blues, alphas, dists, cache_bits=0):
    """Write the 5 prefix codes from frequency dicts; return writer tabs."""
    gs = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    return (
        _write_prefix_code(bw, _huff_lengths(greens), gs),
        _write_prefix_code(bw, _huff_lengths(reds), 256),
        _write_prefix_code(bw, _huff_lengths(blues), 256),
        _write_prefix_code(bw, _huff_lengths(alphas), 256),
        _write_prefix_code(bw, _huff_lengths(dists), 40),
    )


def _gray(a: int, r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b) // 1000


def test_lz77_backward_reference():
    """Literal + length-3/distance-1 copy fills a 4x1 row (distance code
    2 → 2D map entry (1, 0); length prefix symbol 258 → length 3)."""
    bw = _BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    g_tab, r_tab, b_tab, a_tab, d_tab = _codes(
        bw, {10: 1, 258: 1}, {1: 1}, {5: 1}, {255: 1}, {1: 1}
    )
    bw.write_code(*g_tab[10])  # literal green=10
    bw.write_code(*r_tab[1])
    bw.write_code(*b_tab[5])
    bw.write_code(*a_tab[255])
    bw.write_code(*g_tab[258])  # length prefix 2 → length 3
    bw.write_code(*d_tab[1])  # distance prefix 1 → code 2 → (dx=1,dy=0) → 1
    out = decode_webp_gray(_wrap(bw))
    assert out.shape == (1, 4)
    assert np.all(out == _gray(255, 1, 10, 5))


def test_color_cache_hit():
    """Literal inserted into a 1-bit color cache, second pixel read back
    through a cache-index symbol."""
    px = (255 << 24) | (1 << 16) | (10 << 8) | 5
    slot = (0x1E35A7BD * px & 0xFFFFFFFF) >> 31  # cache_bits=1
    cache_sym = 256 + 24 + slot
    bw = _BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(1, 4)  # cache_bits = 1
    bw.write(0, 1)  # no meta prefix
    g_tab, r_tab, b_tab, a_tab, _ = _codes(
        bw, {10: 1, cache_sym: 1}, {1: 1}, {5: 1}, {255: 1}, {0: 1}, cache_bits=1
    )
    bw.write_code(*g_tab[10])
    bw.write_code(*r_tab[1])
    bw.write_code(*b_tab[5])
    bw.write_code(*a_tab[255])
    bw.write_code(*g_tab[cache_sym])  # cache hit → same pixel
    out = decode_webp_gray(_wrap(bw))
    assert np.all(out == _gray(255, 1, 10, 5))


def _sub_image_single(bw: _BitWriter, a, r, g, b) -> None:
    """A 1x1 sub-image (entropy-coded, no meta) holding one pixel."""
    bw.write(0, 1)  # no color cache
    tabs = _codes(bw, {g: 1}, {r: 1}, {b: 1}, {a: 1}, {0: 1})
    g_tab, r_tab, b_tab, a_tab, _ = tabs
    bw.write_code(*g_tab[g])
    bw.write_code(*r_tab[r])
    bw.write_code(*b_tab[b])
    bw.write_code(*a_tab[a])


def test_predictor_transform_mode_top():
    """2x2 image under PREDICTOR transform (one 4x4 tile, mode 2 = T):
    (0,0) predicts black, top row predicts L, left column predicts T,
    and (1,1) uses the tile mode. Residuals chosen so every output is
    hand-computable."""
    bw = _BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # PREDICTOR
    bw.write(0, 3)  # size_bits - 2 = 0 → tile 4x4 → 1x1 sub-image
    _sub_image_single(bw, 255, 0, 2, 0)  # mode 2 (green channel)
    bw.write(0, 1)  # end of transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    res = [(0, 10, 20, 30), (0, 1, 1, 1), (0, 2, 2, 2), (0, 3, 3, 3)]
    g_tab, r_tab, b_tab, a_tab, _ = _codes(
        bw,
        {g: 1 for _, _, g, _ in res},
        {r: 1 for _, r, _, _ in res},
        {b: 1 for _, _, _, b in res},
        {a: 1 for a, _, _, _ in res},
        {0: 1},
    )
    for a, r, g, b in res:
        bw.write_code(*g_tab[g])
        bw.write_code(*r_tab[r])
        bw.write_code(*b_tab[b])
        bw.write_code(*a_tab[a])
    out = decode_webp_gray(_wrap(bw))
    # out00 = res + ARGB(255,0,0,0); out10 = out00 + res (L);
    # out01 = out00 + res (T); out11 = out10 + res (mode 2: T)
    exp = np.array(
        [
            [_gray(255, 10, 20, 30), _gray(255, 11, 21, 31)],
            [_gray(255, 12, 22, 32), _gray(255, 14, 24, 34)],
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(out, exp)


def test_color_transform_inverse():
    """1x1 image under the COLOR transform: green_to_red in the blue
    channel of the cte pixel, green_to_blue in green, red_to_blue in
    red; inverse uses the UPDATED red for the red→blue delta."""
    bw = _BitWriter()
    _header(bw, 1, 1)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR
    bw.write(0, 3)  # tile 4x4 → 1x1 cte image
    _sub_image_single(bw, 255, 4, 3, 2)  # r2b=4, g2b=3, g2r=2
    bw.write(0, 1)  # end of transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    g_tab, r_tab, b_tab, a_tab, _ = _codes(
        bw, {50: 1}, {100: 1}, {200: 1}, {255: 1}, {0: 1}
    )
    bw.write_code(*g_tab[50])
    bw.write_code(*r_tab[100])
    bw.write_code(*b_tab[200])
    bw.write_code(*a_tab[255])
    out = decode_webp_gray(_wrap(bw))
    # r = 100 + (2*50 >> 5) = 103; b = 200 + (3*50 >> 5) + (4*103 >> 5) = 216
    assert out[0, 0] == _gray(255, 103, 50, 216)


def test_meta_prefix_groups():
    """8x1 image with meta_bits=2 (4-pixel tiles): two prefix-code
    groups selected per-tile through the meta image's (red<<8)|green."""
    bw = _BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix present
    bw.write(0, 3)  # meta_bits - 2 = 0 → tile 4 → 2x1 meta image
    # meta image: two pixels with green = group index 0 / 1
    bw.write(0, 1)  # meta image: no color cache
    m_tabs = _codes(bw, {0: 1, 1: 1}, {0: 1}, {0: 1}, {255: 1}, {0: 1})
    mg, mr, mb, ma, _ = m_tabs
    for grp in (0, 1):
        bw.write_code(*mg[grp])
        bw.write_code(*mr[0])
        bw.write_code(*mb[0])
        bw.write_code(*ma[255])
    # two groups: group 0 emits green=10, group 1 emits green=20
    tabs0 = _codes(bw, {10: 1}, {1: 1}, {5: 1}, {255: 1}, {0: 1})
    tabs1 = _codes(bw, {20: 1}, {2: 1}, {6: 1}, {255: 1}, {0: 1})
    for x in range(8):
        g_tab, r_tab, b_tab, a_tab, _ = tabs0 if x < 4 else tabs1
        sym = (10, 1, 5, 255) if x < 4 else (20, 2, 6, 255)
        bw.write_code(*g_tab[sym[0]])
        bw.write_code(*r_tab[sym[1]])
        bw.write_code(*b_tab[sym[2]])
        bw.write_code(*a_tab[sym[3]])
    out = decode_webp_gray(_wrap(bw))
    assert out.shape == (1, 8)
    assert np.all(out[0, :4] == _gray(255, 1, 10, 5))
    assert np.all(out[0, 4:] == _gray(255, 2, 20, 6))


def test_cas_half_truncates_toward_zero():
    """The spec pseudocode is C: (a - b) / 2 truncates toward zero.
    a=10, b=15 → 10 + trunc(-5/2) = 8 (floor division would give 7)."""
    avg = (10 << 24) | (10 << 16) | (10 << 8) | 10
    tl = (15 << 24) | (15 << 16) | (15 << 8) | 15
    out = _cas_half(avg, tl)
    assert all(((out >> s) & 0xFF) == 8 for s in (24, 16, 8, 0))


def test_prefix_code_completeness_enforced():
    with pytest.raises(ValueError, match="not complete"):
        _PrefixCode([2, 2, 2])  # kraft < 1
    with pytest.raises(ValueError, match="no symbols"):
        _PrefixCode([0, 0])


# ---------------------------------------------------------------------------
# Quarantine contract
# ---------------------------------------------------------------------------


def test_lossy_and_extended_quarantine():
    # an EMPTY lossy chunk quarantines on every path: native libwebp
    # rejects the malformed stream, and without the library the lossy
    # tier quarantines wholesale (r10: well-formed VP8 now decodes
    # natively — see test_native.py)
    vp8 = b"RIFF" + (12).to_bytes(4, "little") + b"WEBPVP8 " + (0).to_bytes(4, "little")
    with pytest.raises(ValueError, match="lossy|libwebp|probe|corrupt"):
        decode_webp_gray(vp8)
    # truncated VP8X header
    vp8x = b"RIFF" + (12).to_bytes(4, "little") + b"WEBPVP8X" + (0).to_bytes(4, "little")
    with pytest.raises(ValueError, match="truncated"):
        decode_webp_gray(vp8x)


def _vp8x_blob(flags: int, w: int, h: int, rest: bytes) -> bytes:
    body = bytes([flags]) + b"\x00\x00\x00" + (w - 1).to_bytes(3, "little") + (
        h - 1
    ).to_bytes(3, "little")
    chunk = b"VP8X" + (10).to_bytes(4, "little") + body + rest
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def test_vp8x_lossless_roundtrip():
    """Extended container with XMP metadata around a VP8L frame decodes
    identically to the simple container."""
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    for mode in MODES:
        blob = encode_webp_lossless(g, mode=mode, vp8x=True)
        assert blob[12:16] == b"VP8X"
        assert np.array_equal(decode_webp_gray(blob), g)
    from hive_udf_spark.operators.imagecodec import decode_to_gray, supported_magic

    b = encode_webp_lossless(g, vp8x=True)
    assert supported_magic(b)
    assert np.array_equal(decode_to_gray(b), g)


def test_vp8x_animation_rejected():
    g = np.arange(4, dtype=np.uint8).reshape(2, 2)
    simple = encode_webp_lossless(g)
    vp8l_chunk = simple[12:]
    with pytest.raises(ValueError, match="animation"):
        decode_webp_gray(_vp8x_blob(0x02, 2, 2, vp8l_chunk))


def test_vp8x_canvas_mismatch_rejected():
    g = np.arange(4, dtype=np.uint8).reshape(2, 2)
    vp8l_chunk = encode_webp_lossless(g)[12:]
    with pytest.raises(ValueError, match="disagrees"):
        decode_webp_gray(_vp8x_blob(0x04, 5, 5, vp8l_chunk))


def test_vp8x_without_image_data_rejected():
    with pytest.raises(ValueError, match="no VP8L"):
        decode_webp_gray(_vp8x_blob(0x00, 2, 2, b""))


def test_malformed_quarantine():
    good = encode_webp_lossless(np.arange(64, dtype=np.uint8).reshape(8, 8))
    with pytest.raises(ValueError):
        decode_webp_gray(b"")
    with pytest.raises(ValueError):
        decode_webp_gray(b"RIFX" + good[4:])
    with pytest.raises(ValueError):
        decode_webp_gray(good[:20])  # truncated mid-stream
    with pytest.raises(ValueError):
        decode_vp8l(b"\x30\x00\x00")  # wrong signature byte
    # RIFF size larger than the buffer
    bad = bytearray(good)
    bad[4:8] = (len(good) * 2).to_bytes(4, "little")
    with pytest.raises(ValueError):
        decode_webp_gray(bytes(bad))


def test_dimension_bomb_rejected():
    """A header declaring 16384x16384 must be rejected by the pixel cap
    before any allocation-sized work."""
    bw = _BitWriter()
    _header(bw, 16384, 16384)
    bw.write(0, 1)
    with pytest.raises(ValueError, match="pixel cap"):
        decode_webp_gray(_wrap(bw))


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="2-D uint8"):
        encode_webp_lossless(np.zeros((2, 2), dtype=np.int32))
    with pytest.raises(ValueError, match="mode"):
        encode_webp_lossless(np.zeros((2, 2), dtype=np.uint8), mode="lossy")


# ---------------------------------------------------------------------------
# PIL parity (skipped when PIL absent — mirrors the PNG tier's gate)
# ---------------------------------------------------------------------------


def test_pil_parity():
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(7)
    for mode in MODES:
        g = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
        if mode == "palette":
            g = (g % 13 * 19).astype(np.uint8)
        blob = encode_webp_lossless(g, mode=mode)
        with PIL.open(io.BytesIO(blob)) as im:
            ref = np.asarray(im.convert("RGB"), dtype=np.uint8)
        assert np.array_equal(ref[..., 0], g)
        assert np.array_equal(ref[..., 1], g)
        assert np.array_equal(ref[..., 2], g)


# ---------------------------------------------------------------------------
# Animated WebP (r10)
# ---------------------------------------------------------------------------


def test_anim_roundtrip_full_canvas_frames():
    from hive_udf_spark.operators.webpcodec import (
        encode_webp_anim,
        split_webp_anim_frames,
    )

    rng = np.random.RandomState(8)
    frames = [rng.randint(0, 256, (8, 8), dtype=np.uint8) for _ in range(3)]
    for mode in ("plain", "subtract-green"):
        blob = encode_webp_anim(
            [(0, 0, f) for f in frames], (8, 8), mode=mode
        )
        got = split_webp_anim_frames(blob)
        assert len(got) == 3
        for want, g in zip(frames, got):
            assert np.array_equal(want, g), mode


def test_anim_compositing_offsets_and_disposal():
    """Partial-canvas frames paste at their (even) offsets over the
    background; dispose-to-background refills the rect after emit."""
    from hive_udf_spark.operators.webpcodec import (
        encode_webp_anim,
        split_webp_anim_frames,
    )

    patch = np.full((2, 2), 9, np.uint8)
    patch2 = np.full((2, 2), 200, np.uint8)
    blob = encode_webp_anim(
        [(0, 0, patch), (4, 2, patch2)], (8, 6), bg_gray=50, dispose_bg=True
    )
    f1, f2 = split_webp_anim_frames(blob)
    want1 = np.full((6, 8), 50, np.uint8)
    want1[0:2, 0:2] = 9
    assert np.array_equal(f1, want1)
    # dispose=background: frame 1's rect refills with bg before frame 2
    want2 = np.full((6, 8), 50, np.uint8)
    want2[2:4, 4:6] = 200
    assert np.array_equal(f2, want2)


def test_anim_quarantine_contracts():
    from hive_udf_spark.operators.webpcodec import (
        encode_webp_anim,
        split_webp_anim_frames,
    )

    img = np.zeros((4, 4), np.uint8)
    blob = encode_webp_anim([(0, 0, img)], (4, 4))
    # still-image tier refuses animation with a routing message
    with pytest.raises(ValueError, match="container tier"):
        decode_webp_gray(blob)
    # a still lossless file refuses the animation tier
    still = encode_webp_lossless(img)
    with pytest.raises(ValueError, match="not animated|VP8X|no ANMF"):
        split_webp_anim_frames(still)
    # frame rect overrunning the canvas is malformed
    with pytest.raises(ValueError, match="canvas"):
        split_webp_anim_frames(
            encode_webp_anim([(2, 0, np.zeros((4, 4), np.uint8))], (4, 4))
        )


def test_anim_frame_amplification_capped():
    """r10 advice: each ANMF frame appends a full canvas copy, so tiny
    frames on a big canvas amplify (~40 input bytes → canvas-sized
    output per frame).  The cumulative frames × canvas pixel cap must
    quarantine past _MAX_ANIM_PIXELS — and admit a legitimate
    many-frame animation on a small canvas."""
    from hive_udf_spark.operators.webpcodec import (
        _MAX_ANIM_PIXELS,
        encode_webp_anim,
        split_webp_anim_frames,
    )

    # 1 MPix canvas (within _MAX_PIXELS): 65 frames > 64 MPix cumulative
    big = 1024
    n_over = _MAX_ANIM_PIXELS // (big * big) + 1
    patch = np.zeros((2, 2), np.uint8)
    blob = encode_webp_anim([(0, 0, patch)] * n_over, (big, big))
    with pytest.raises(ValueError, match="cumulative"):
        split_webp_anim_frames(blob)

    # same frame count on a 16x16 canvas is fine
    small = encode_webp_anim([(0, 0, patch)] * n_over, (16, 16))
    assert len(split_webp_anim_frames(small)) == n_over


def test_anim_byte_flip_fuzz():
    from hive_udf_spark.operators.webpcodec import (
        encode_webp_anim,
        split_webp_anim_frames,
    )

    rng = np.random.RandomState(9)
    frames = [rng.randint(0, 256, (8, 8), dtype=np.uint8) for _ in range(2)]
    base = bytearray(encode_webp_anim([(0, 0, f) for f in frames], (8, 8)))
    for _ in range(120):
        i = int(rng.randint(0, len(base)))
        orig = base[i]
        base[i] ^= 1 << int(rng.randint(0, 8))
        try:
            out = split_webp_anim_frames(bytes(base))
            assert all(f.dtype == np.uint8 for f in out)
        except ValueError:
            pass
        base[i] = orig
