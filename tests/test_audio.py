"""PCM WAV bit-depth coverage (operators/audiocodec.py, r8)."""

from __future__ import annotations

import numpy as np

from hive_udf_spark.operators.audiocodec import decode_wav, encode_wav_pcm


def test_pcm_24_and_32_bit_roundtrip():
    """r8: 24-bit packed-triple and 32-bit PCM — boundary values survive
    exactly, the stdlib wave module agrees on the 24-bit layout."""
    import io
    import wave

    rng = np.random.default_rng(8)
    for bits, lo, hi in [(24, -(1 << 23), (1 << 23) - 1), (32, -(1 << 31), (1 << 31) - 1)]:
        for nch in (1, 2):
            s = rng.integers(lo, hi + 1, (137, nch)).astype(np.int64)
            x, rate = decode_wav(encode_wav_pcm(s, 44100, bits=bits))
            assert rate == 44100 and x.shape == (137, nch)
            assert np.array_equal(x.astype(np.int64), s), (bits, nch)
        vals = np.array([lo, hi, -1, 0, 1], dtype=np.int64)
        x, _ = decode_wav(encode_wav_pcm(vals, 8000, bits=bits))
        assert x.reshape(-1).astype(np.int64).tolist() == vals.tolist(), bits
    # out-of-range samples clip, never wrap
    over = np.array([1 << 30, -(1 << 30)], dtype=np.int64)
    x, _ = decode_wav(encode_wav_pcm(over, 8000, bits=24))
    assert x.reshape(-1).tolist() == [(1 << 23) - 1, -(1 << 23)]
    # stdlib cross-check of the 3-byte little-endian packing
    s = rng.integers(-(1 << 23), 1 << 23, 64).astype(np.int64)
    blob = encode_wav_pcm(s, 8000, bits=24)
    with wave.open(io.BytesIO(blob)) as w:
        assert w.getsampwidth() == 3 and w.getnframes() == 64
        frames = w.readframes(64)
    trip = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3)
    wide = np.zeros((64, 4), dtype=np.uint8)
    wide[:, 1:] = trip
    assert np.array_equal(wide.view("<i4").reshape(-1) >> 8, s)


# ---------------------------------------------------------------------------
# decode_audio_quality (r8)
# ---------------------------------------------------------------------------


def test_audio_quality_metrics(spark):
    import numpy as np
    from hive_udf_spark.operators.audiocodec import encode_wav_pcm
    from hive_udf_spark.operators.multimodal import decode_audio_quality

    # centered 8-bit samples: two +rail, one -rail (-127: at FS-1), two
    # silent (0, +1 at threshold), one plain (40)
    x = np.array([127, 127, -127, 0, 1, 40], dtype=np.int32)
    blob = encode_wav_pcm(x, sample_rate=8000, bits=8)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id bigint, blob binary")
    r = decode_audio_quality(df, silence_threshold=1).collect()[0]
    assert r.n_samples == 6
    assert r.n_clipped == 3
    assert r.n_silent == 2
    assert r.energy == 127 * 127 * 2 + 127 * 127 + 0 + 1 + 1600
    assert r.sample_rate == 8000


def test_audio_quality_16bit_rails(spark):
    import numpy as np
    from hive_udf_spark.operators.audiocodec import encode_wav_pcm
    from hive_udf_spark.operators.multimodal import decode_audio_quality

    x = np.array([32767, -32768, -32767, 5], dtype=np.int32)
    blob = encode_wav_pcm(x, sample_rate=16000, bits=16)
    df = spark.createDataFrame([(7, bytearray(blob))], "doc_id bigint, blob binary")
    r = decode_audio_quality(df).collect()[0]
    # |amp| >= 2^15-1 catches both rails AND the true minimum
    assert r.n_clipped == 3
    assert r.n_silent == 0
    assert r.energy == 32767**2 + 32768**2 + 32767**2 + 25


def test_mp3_native_decode_or_quarantine():
    """MP3 decode dispatch (r11): when libmpg123 is present the feed
    API must decode a structurally-valid frame stream to PCM; when
    absent (this container) the call must quarantine with a clear
    message — never silent garbage.  The vendored-decoder alternative
    was deliberately rejected: ISO 11172-3's Huffman tables cannot be
    transcribed offline without risking wrong-but-plausible samples
    (the lossy-VP8 lesson, operators/native.py docstring)."""
    import pytest

    from hive_udf_spark.operators import native

    if not native.mp3_native_available():
        with pytest.raises(ValueError, match="libmpg123"):
            native.mp3_native_decode_pcm(b"\xff\xfb\x90\x00" + b"\x00" * 417)
        return
    # library present: decode the mediaprobe fixture's frame stream
    from hive_udf_spark.operators.mediaprobe import encode_mp3_id3

    blob = encode_mp3_id3(n_frames=4)
    samples, chans, rate = native.mp3_native_decode_pcm(blob)
    assert chans in (1, 2) and rate in (8000, 11025, 16000, 22050,
                                        24000, 32000, 44100, 48000)
    assert samples.size > 0
