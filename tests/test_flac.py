"""FLAC codec tests — encoder↔decoder round-trips over the
encoder-reachable surface (CONSTANT / FIXED 0-2 / Rice / escape),
hand-built bitstreams for the decoder-only paths (VERBATIM, FIXED 3-4,
LPC, wasted bits, partition orders, the 5-bit Rice method, left/side,
right/side, mid/side stereo decorrelation), CRC and truncation
quarantine, and the magic-dispatch into the audio feature tier.

No reference analogue (the reference is MLnick/hive-udf, a
cardinality-UDAF package) — this covers the mandated multimodal
extension surface.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_udf_spark.operators.flaccodec import (
    _BitWriter,
    _crc8,
    _crc16,
    _FIXED_COEFS,
    _write_utf8_coded,
    decode_flac,
    encode_flac,
    flac_info,
)

# ---------------------------------------------------------------------------
# Round-trips (encoder-reachable paths)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bits", [8, 12, 16, 24])
@pytest.mark.parametrize("n", [1, 17, 100, 5000])
def test_roundtrip_mono(bits, n):
    rng = np.random.default_rng(bits * 1000 + n)
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    x = rng.integers(lo // 4, hi // 4, size=n).astype(np.int32)
    y, rate = decode_flac(encode_flac(x, sample_rate=8000, bits=bits))
    assert rate == 8000
    assert np.array_equal(y[:, 0], x)


@pytest.mark.parametrize("channels", [2, 3, 5, 8])
def test_roundtrip_multichannel(channels):
    rng = np.random.default_rng(channels)
    x = rng.integers(-2000, 2000, size=(1000, channels)).astype(np.int32)
    y, _ = decode_flac(encode_flac(x, bits=16, block_size=256))
    assert np.array_equal(y, x)


def test_roundtrip_predictor_shapes():
    # constant → CONSTANT subframe; ramp → FIXED-1 exact; curve → FIXED-2
    for x in [
        np.full(3000, 123, dtype=np.int32),
        np.arange(3000, dtype=np.int32),
        (1000 * np.sin(np.arange(5000) / 20)).astype(np.int32),
        np.zeros(16, dtype=np.int32),
    ]:
        assert np.array_equal(decode_flac(encode_flac(x))[0][:, 0], x)


def test_roundtrip_escape_path():
    # white noise at full amplitude: raw beats rice in some blocks
    rng = np.random.default_rng(1)
    x = rng.integers(-30000, 30000, size=2000).astype(np.int32)
    assert np.array_equal(decode_flac(encode_flac(x, bits=16))[0][:, 0], x)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 600),
    bits=st.sampled_from([8, 16]),
    seed=st.integers(0, 2**31),
    block=st.sampled_from([16, 192, 4096]),
)
def test_roundtrip_property(n, bits, seed, block):
    rng = np.random.default_rng(seed)
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    x = rng.integers(lo, hi + 1, size=n).astype(np.int32)
    y, _ = decode_flac(encode_flac(x, bits=bits, block_size=block))
    assert np.array_equal(y[:, 0], x)


def test_flac_info():
    b = encode_flac(np.arange(100, dtype=np.int32), sample_rate=44100, bits=16)
    i = flac_info(b)
    assert i["sample_rate"] == 44100
    assert i["channels"] == 1 == i["n_channels"]
    assert i["bits_per_sample"] == 16
    assert i["total_samples"] == 100


# ---------------------------------------------------------------------------
# Hand-built streams: decoder-only paths
# ---------------------------------------------------------------------------


def _stream(channels, bits, rate, total, frame_builder) -> bytes:
    """Minimal STREAMINFO + one hand-built frame from frame_builder(bw)."""
    si = _BitWriter()
    si.write(16, 16)
    si.write(65535, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(total, 36)
    out = bytearray(b"fLaC")
    out += b"\x80\x00\x00\x22" + si.getvalue() + b"\x00" * 16
    out += frame_builder()
    return bytes(out)


def _frame_header(bw: _BitWriter, blocksize: int, ch_code: int, bits: int):
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)  # 16-bit end-of-header blocksize
    bw.write(0, 4)  # rate from STREAMINFO
    bw.write(ch_code, 4)
    bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits], 3)
    bw.write(0, 1)
    _write_utf8_coded(bw, 0)
    bw.write(blocksize - 1, 16)
    assert bw.n == 0
    bw.write(_crc8(bytes(bw.buf)), 8)


def _finish_frame(bw: _BitWriter) -> bytes:
    bw.align()
    bw.write(_crc16(bytes(bw.buf)), 16)
    return bw.getvalue()


def _verbatim_subframe(bw: _BitWriter, x, bps):
    bw.write(0, 1)
    bw.write(1, 6)  # VERBATIM
    bw.write(0, 1)
    for v in x:
        bw.write_signed(int(v), bps)


def test_verbatim_and_high_fixed_orders():
    """VERBATIM plus FIXED orders 3 and 4 (the encoder stops at 2)."""
    x = [5, -3, 100, -120, 7, 8, 9, -10, 11, 12, -1, 0, 3, 4, -5, 6]

    def build():
        bw = _BitWriter()
        _frame_header(bw, 16, 0, 16)
        _verbatim_subframe(bw, x, 16)
        return _finish_frame(bw)

    y, _ = decode_flac(_stream(1, 16, 8000, 16, build))
    assert y[:, 0].tolist() == x

    for order in (3, 4):
        coefs = _FIXED_COEFS[order]

        def build_fixed():
            bw = _BitWriter()
            _frame_header(bw, 16, 0, 16)
            bw.write(0, 1)
            bw.write(8 + order, 6)
            bw.write(0, 1)
            for v in x[:order]:
                bw.write_signed(v, 16)
            bw.write(0, 2)  # 4-bit rice method
            bw.write(0, 4)  # partition order 0
            bw.write(15, 4)  # escape
            bw.write(20, 5)  # raw width 20 (order-4 residuals grow)
            for i in range(order, 16):
                r = x[i] - sum(c * x[i - k - 1] for k, c in enumerate(coefs))
                bw.write_signed(r, 20)
            return _finish_frame(bw)

        y, _ = decode_flac(_stream(1, 16, 8000, 16, build_fixed))
        assert y[:, 0].tolist() == x, order


def test_lpc_subframe():
    """LPC order 2 with shifted quantized coefficients equal to the
    FIXED-2 predictor (coefs [2,-1] << 9, shift 9)."""
    x = [int(1000 * np.sin(i / 3)) for i in range(64)]
    order, prec, shift = 2, 12, 9
    coefs = [2 << 9, -(1 << 9)]

    def build():
        bw = _BitWriter()
        _frame_header(bw, 64, 0, 16)
        bw.write(0, 1)
        bw.write(0x20 | (order - 1), 6)  # LPC, order 2
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(v, 16)
        bw.write(prec - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, prec)
        bw.write(0, 2)
        bw.write(0, 4)
        bw.write(15, 4)
        bw.write(18, 5)
        for i in range(order, 64):
            pred = (coefs[0] * x[i - 1] + coefs[1] * x[i - 2]) >> shift
            bw.write_signed(x[i] - pred, 18)
        return _finish_frame(bw)

    y, _ = decode_flac(_stream(1, 16, 8000, 64, build))
    assert y[:, 0].tolist() == x


def test_wasted_bits():
    """Samples that are multiples of 4 coded at bps-2 with wasted=2."""
    x = [v * 4 for v in [5, -3, 10, -12, 7, 8, 9, -10, 1, 2, 3, 4, 5, 6, 7, 8]]

    def build():
        bw = _BitWriter()
        _frame_header(bw, 16, 0, 16)
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(1, 1)  # wasted-bits flag
        bw.write_unary(1)  # wasted = 1 + 1 = 2
        for v in x:
            bw.write_signed(v >> 2, 14)
        return _finish_frame(bw)

    y, _ = decode_flac(_stream(1, 16, 8000, 16, build))
    assert y[:, 0].tolist() == x


def test_partition_orders_and_5bit_rice():
    """FIXED-1 residual split into 4 partitions (order 2) under the
    5-bit-parameter method, each partition with its own parameter."""
    x = list(range(0, 32, 2))  # ramp: order-1 residuals all 2

    def build():
        bw = _BitWriter()
        _frame_header(bw, 16, 0, 16)
        bw.write(0, 1)
        bw.write(8 + 1, 6)  # FIXED order 1
        bw.write(0, 1)
        bw.write_signed(x[0], 16)
        bw.write(1, 2)  # 5-bit rice method
        bw.write(2, 4)  # partition order 2 → 4 partitions of 4
        for p in range(4):
            n = 4 - (1 if p == 0 else 0)
            param = p  # different parameter per partition
            bw.write(param, 5)
            for _ in range(n):
                z = 4  # zigzag(residual 2) = 4
                bw.write_unary(z >> param)
                bw.write(z & ((1 << param) - 1), param)
        return _finish_frame(bw)

    y, _ = decode_flac(_stream(1, 16, 8000, 16, build))
    assert y[:, 0].tolist() == x


@pytest.mark.parametrize("ch_code", [8, 9, 10])
def test_stereo_decorrelation(ch_code):
    """left/side (8), right/side (9), mid/side (10) reconstruction, side
    channel at bps+1 — including odd L+R (mid's dropped low bit)."""
    rng = np.random.default_rng(ch_code)
    L = rng.integers(-2000, 2000, size=16).astype(int).tolist()
    R = rng.integers(-2000, 2000, size=16).astype(int).tolist()

    def build():
        bw = _BitWriter()
        _frame_header(bw, 16, ch_code, 16)
        side = [l - r for l, r in zip(L, R)]
        if ch_code == 8:
            _verbatim_subframe(bw, L, 16)
            _verbatim_subframe(bw, side, 17)
        elif ch_code == 9:
            _verbatim_subframe(bw, side, 17)
            _verbatim_subframe(bw, R, 16)
        else:
            mid = [(l + r) >> 1 for l, r in zip(L, R)]
            _verbatim_subframe(bw, mid, 16)
            _verbatim_subframe(bw, side, 17)
        return _finish_frame(bw)

    y, _ = decode_flac(_stream(2, 16, 8000, 16, build))
    assert y[:, 0].tolist() == L
    assert y[:, 1].tolist() == R


# ---------------------------------------------------------------------------
# Quarantine contract
# ---------------------------------------------------------------------------


def test_crc_mismatches_detected():
    x = np.arange(200, dtype=np.int32)
    good = bytearray(encode_flac(x, bits=16))
    # flip a byte in the frame payload (after the 42-byte metadata)
    bad = bytearray(good)
    bad[60] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))


def test_malformed_rejections():
    with pytest.raises(ValueError, match="fLaC marker"):
        decode_flac(b"RIFFxxxx")
    with pytest.raises(ValueError, match="STREAMINFO"):
        decode_flac(b"fLaC" + b"\x81\x00\x00\x04abcd")
    good = encode_flac(np.arange(100, dtype=np.int32))
    with pytest.raises(ValueError):
        decode_flac(good[:30])  # truncated metadata
    with pytest.raises(ValueError):
        decode_flac(good[:60])  # truncated mid-frame


def test_encoder_validation():
    with pytest.raises(ValueError, match="range"):
        encode_flac(np.array([1 << 20], dtype=np.int32), bits=16)
    with pytest.raises(ValueError, match="1-8 channels"):
        encode_flac(np.zeros((4, 9), dtype=np.int32))
    with pytest.raises(ValueError, match="block size"):
        encode_flac(np.zeros(4, dtype=np.int32), block_size=8)


def test_fuzz_byte_flips_never_escape():
    rng = np.random.default_rng(3)
    base = bytearray(
        encode_flac((500 * np.sin(np.arange(600) / 9)).astype(np.int32))
    )
    for _ in range(300):
        b = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            y, _ = decode_flac(bytes(b))
            assert y.dtype == np.int32
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# Spark tier
# ---------------------------------------------------------------------------


def test_audio_features_flac_through_spark(spark):
    from pyspark.sql import functions as F

    from hive_udf_spark.operators.multimodal import (
        decode_audio_features,
        flac_encoder_udf,
    )

    docs = spark.createDataFrame(
        [(i, f"audio payload number {i} with enough characters to fill!!!"[:48].ljust(48, "x")) for i in range(6)],
        "doc_id long, text string",
    )
    enc = flac_encoder_udf(48, sample_rate=8000, bits=16)
    blobs = docs.select("doc_id", enc(F.col("text")).alias("blob"))
    out = {r.doc_id: r for r in decode_audio_features(blobs, fake=False).collect()}
    assert len(out) == 6
    for i in range(6):
        t = f"audio payload number {i} with enough characters to fill!!!"[:48].ljust(48, "x")
        vals = [ord(c) - 128 for c in t]
        r = out[i]
        assert r.n_samples == 48
        assert r.sample_rate == 8000
        assert r.mean_amp == sum(vals) / 48
        assert r.max_abs == max(abs(v) for v in vals)


def test_audio_dispatch_wav_still_works():
    from hive_udf_spark.operators.audiocodec import (
        audio_info,
        decode_audio,
        encode_wav_pcm,
    )

    x = np.arange(-32, 32, dtype=np.int32)
    b = encode_wav_pcm(x, sample_rate=8000, bits=16)
    y, rate = decode_audio(b)
    assert rate == 8000 and np.array_equal(y[:, 0], x)
    assert audio_info(b)["bits_per_sample"] == 16
    f = encode_flac(x, sample_rate=8000, bits=16)
    y2, _ = decode_audio(f)
    assert np.array_equal(y2[:, 0], x)
    assert audio_info(f)["bits_per_sample"] == 16
