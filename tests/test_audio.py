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


# ---------------------------------------------------------------------------
# Sun AU + AIFF containers (r11)
# ---------------------------------------------------------------------------


def test_mp3_native_feature_row_both_regimes(monkeypatch):
    """r13 (r12 verdict task 3): the dispatch row logic — quarantine
    with probe facts when no decoder ships; decoded with real PCM shape
    when one does (simulated decoder, so the branch is exercised on
    this box too)."""
    import numpy as np

    from hive_udf_spark.operators import mpegaudio, native
    from hive_udf_spark.operators.multimodal import mp3_native_feature_row

    blob = mpegaudio.encode_mpeg1_l1({0: [(ord(c) - 80) * 128
                                          for c in "x" * 24]}, 3)

    # regime 1: decoder absent (this container) -> quarantined + probe
    monkeypatch.setattr(native, "mp3_native_available", lambda: False)
    row = mp3_native_feature_row(blob)
    assert row == {"status": "quarantined", "layer": 1, "n_frames": 2,
                   "sample_rate": 32000, "n_channels": None,
                   "n_samples": None}

    # regime 2: decoder present -> decoded with the real PCM shape
    monkeypatch.setattr(native, "mp3_native_available", lambda: True)
    monkeypatch.setattr(
        native, "mp3_native_decode_pcm",
        lambda b: (np.zeros(768, dtype=np.int16), 1, 32000),
    )
    row = mp3_native_feature_row(blob)
    assert row == {"status": "decoded", "layer": 1, "n_frames": 2,
                   "sample_rate": 32000, "n_channels": 1,
                   "n_samples": 768}

    # regime 3: decoder present but the stream fails -> quarantined
    def boom(b):
        raise ValueError("mp3: mpg123 decode error (-1)")

    monkeypatch.setattr(native, "mp3_native_decode_pcm", boom)
    row = mp3_native_feature_row(blob)
    assert row["status"] == "quarantined"
    assert row["n_samples"] is None


def test_mp3_dispatch_query_quarantine_end_to_end(spark):
    """The registry query's Spark path on this (decoder-less) box:
    every row quarantines with probe facts, nothing crashes."""
    from hive_udf_spark.operators import native
    from hive_udf_spark.operators.multimodal import (
        decode_mp3_native_features,
        mpeg1_l1_encoder_udf,
    )

    if native.mp3_native_available():  # pragma: no cover - lib present
        pytest.skip("system decoder present; covered by decode tests")
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta xx"), (2, "the quick brown fox jump")],
        "doc_id long, text string",
    )
    enc = mpeg1_l1_encoder_udf(24)
    blobs = docs.select(
        "doc_id",
        enc(F.rpad(F.substring("text", 1, 24), 24, " ")).alias("blob"),
    )
    got = {r.doc_id: r for r in decode_mp3_native_features(blobs).collect()}
    assert set(got) == {1, 2}
    for r in got.values():
        assert (r.status, r.layer, r.n_frames, r.sample_rate) \
            == ("quarantined", 1, 2, 32000)
        assert r.n_channels is None and r.n_samples is None


def test_au_roundtrips_every_encoding():
    import numpy as np

    from hive_udf_spark.operators.audiocodec import (
        au_info,
        decode_audio,
        encode_au,
        g711_decode,
    )

    codes = bytes(range(128))
    for enc, law in ((1, "ulaw"), (27, "alaw")):
        x, rate = decode_audio(encode_au(codes, enc, 8000))
        assert np.array_equal(x.ravel(), g711_decode(codes, law))
        assert rate == 8000
    x, rate = decode_audio(encode_au([-32768, 0, 32767, 7], 3, 44100, 2))
    assert x.tolist() == [[-32768, 0], [32767, 7]] and rate == 44100
    x, _ = decode_audio(encode_au([-128, 127], 2, 8000))
    assert x.ravel().tolist() == [-128, 127]
    info = au_info(encode_au(codes, 1, 8000))
    assert (info["encoding"], info["n_samples"]) == (1, 128)


def test_au_malformed_and_unvendored():
    import pytest

    from hive_udf_spark.operators.audiocodec import decode_au, encode_au

    with pytest.raises(ValueError, match="not a Sun AU"):
        decode_au(b"RIFF" + b"\x00" * 32)
    au = bytearray(encode_au(bytes(8), 1, 8000))
    au[15] = 23  # G.721 ADPCM: not vendored
    with pytest.raises(ValueError, match="not vendored"):
        decode_au(bytes(au))
    # declared size past EOF
    au2 = bytearray(encode_au(bytes(8), 1, 8000))
    au2[8:12] = (999).to_bytes(4, "big")
    with pytest.raises(ValueError, match="past EOF"):
        decode_au(bytes(au2))


def test_aiff_roundtrips_and_f80_rate():
    import numpy as np

    from hive_udf_spark.operators.audiocodec import (
        aiff_info,
        decode_audio,
        encode_aiff_pcm,
    )

    for bits in (8, 16, 24):
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        a = encode_aiff_pcm([lo, 0, hi, 42], 48000, bits, 2)
        y, rate = decode_audio(a)
        assert y.ravel().tolist() == [lo, 0, hi, 42] and rate == 48000
    # the 80-bit extended sample rate parses exactly at odd rates too
    assert aiff_info(encode_aiff_pcm([0], 11025, 8))["sample_rate"] == 11025


def test_aiff_malformed():
    import pytest

    from hive_udf_spark.operators.audiocodec import decode_aiff, encode_aiff_pcm

    with pytest.raises(ValueError, match="not an AIFF"):
        decode_aiff(b"FORM\x00\x00\x00\x04WAVE")
    a = bytearray(encode_aiff_pcm([1, 2, 3, 4], 8000, 16))
    at = a.index(b"COMM") + 10  # numSampleFrames field
    a[at : at + 4] = (99).to_bytes(4, "big")
    with pytest.raises(ValueError, match="shorter than COMM"):
        decode_aiff(bytes(a))
