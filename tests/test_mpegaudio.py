"""Vendored MPEG-1 audio tier (operators/mpegaudio.py, r12): frame
probe (all layers), Layer I bitstream decode to exact requantized
subband samples, refusal posture (Layer II/III, joint stereo, PCM
synthesis), framing fuzz."""

from __future__ import annotations

import numpy as np
import pytest

from hive_udf_spark.operators.mpegaudio import (
    decode_mpeg1_layer1,
    encode_mpeg1_l1,
    layer1_scalefactor,
    probe_mpeg_audio,
    synthesize_pcm,
)

RNG = np.random.RandomState(11)


def _blob(n_gran=24, sbs=(0, 5), nb=15, bitrate=64):
    codes = {sb: RNG.randint(-(1 << (nb - 1)), 1 << (nb - 1), n_gran).tolist()
             for sb in sbs}
    return codes, encode_mpeg1_l1(
        codes, {sb: 3 * (i + 1) for i, sb in enumerate(sbs)},
        nb=nb, bitrate_kbps=bitrate,
    )


def test_probe_fields_and_duration():
    _, blob = _blob()
    p = probe_mpeg_audio(blob)
    assert p == {
        "layer": 1, "sample_rate": 32000, "channels": 1,
        "mode": "single_channel", "frames": 2, "samples": 768,
        "duration_ms": 24, "bitrate_kbps": 64, "vbr": False,
    }
    # ID3v2 prefix is skipped (10-byte header, syncsafe size 0)
    assert probe_mpeg_audio(b"ID3\x04\x00\x00\x00\x00\x00\x00" + blob)[
        "frames"] == 2


def test_layer1_codes_roundtrip_exact():
    codes, blob = _blob(n_gran=36, sbs=(0, 5, 17), nb=15, bitrate=96)
    d = decode_mpeg1_layer1(blob)
    assert d["frames"] == 3 and d["nch"] == 1
    for sb, want in codes.items():
        assert d["codes"][:, 0, sb].tolist() == want
    quiet = [sb for sb in range(32) if sb not in codes]
    assert (d["codes"][:, 0, quiet] == 0).all()
    assert (d["subbands"][:, 0, quiet] == 0.0).all()


def test_layer1_requantization_formula_exact():
    """The decoded value must equal the spec expression computed the
    same way the oracle computes it — bit-for-bit."""
    codes, blob = _blob(n_gran=12, sbs=(0,), nb=15, bitrate=32)
    d = decode_mpeg1_layer1(blob)
    sf = layer1_scalefactor(3)
    for g, c in enumerate(codes[0]):
        s3 = c / float(1 << 14)
        want = (s3 + 2.0 / (1 << 15)) * ((1 << 15) / float((1 << 15) - 1)) * sf
        assert d["subbands"][g, 0, 0] == want
        # dyadic identity used by the oracle: (c+1)/16384 * k
        assert d["subbands"][g, 0, 0] == (c + 1) / 16384.0 * (
            32768.0 / 32767.0) * sf


def test_layer1_narrow_quantizers():
    for nb in (2, 3, 8):
        codes = {0: RNG.randint(-(1 << (nb - 1)), 1 << (nb - 1), 12).tolist()}
        d = decode_mpeg1_layer1(encode_mpeg1_l1(codes, 0, nb=nb))
        assert d["codes"][:, 0, 0].tolist() == codes[0]


def test_scalefactor_closed_form_and_bounds():
    assert layer1_scalefactor(0) == 2.0
    assert layer1_scalefactor(3) == 1.0
    assert layer1_scalefactor(6) == 0.5
    with pytest.raises(ValueError, match="forbidden"):
        layer1_scalefactor(63)


def test_refusal_posture():
    _, blob = _blob()
    # Layer II header (layer bits 10) — refuse decode, probe fine
    l2 = bytearray(blob[:4])
    l2[1] = (l2[1] & ~0b110) | 0b100
    with pytest.raises(ValueError, match="not vendored"):
        decode_mpeg1_layer1(bytes(l2) + b"\x00" * 1000)
    # joint stereo — refuse (intensity bound handling)
    js = bytearray(blob)
    js[3] = (js[3] & 0x3F) | (0b01 << 6)
    with pytest.raises(ValueError, match="joint"):
        decode_mpeg1_layer1(bytes(js))
    # PCM synthesis is the documented non-goal
    with pytest.raises(NotImplementedError, match="window"):
        synthesize_pcm(np.zeros((12, 1, 32)))


def test_framing_fuzz_never_crashes():
    _, blob = _blob()
    for _ in range(300):
        m = bytearray(blob)
        m[RNG.randint(len(m))] ^= 1 << RNG.randint(8)
        for fn in (probe_mpeg_audio, decode_mpeg1_layer1):
            try:
                fn(bytes(m))
            except ValueError:
                pass
    for cut in range(0, len(blob), 5):
        try:
            decode_mpeg1_layer1(blob[:cut])
        except ValueError:
            pass


def test_mp1_oracle_sql_matches_duckdb():
    """The registry query's oracle arithmetic agrees with the decoder
    on a hand-built payload (the same identity the driver hashes)."""
    import duckdb

    from hive_udf_spark.operators.mpegaudio import decode_mpeg1_layer1

    s = "The quick brown fox jump"  # 24 ASCII chars
    codes = [(ord(c) - 80) * 128 for c in s]
    d = decode_mpeg1_layer1(encode_mpeg1_l1({0: codes}, 3))
    total = int(d["codes"][:, 0, 0].sum())
    mean_amp = (total / 24 + 1.0) / 16384.0 * (32768.0 / 32767.0)
    peak_abs = float(np.abs(d["subbands"]).max())
    got = duckdb.sql(f"""
        WITH c AS (SELECT [(unicode(c) - 80) * 128
                           for c in string_split('{s}', '')] AS codes)
        SELECT (CAST(list_sum(codes) AS DOUBLE) / 24 + 1.0) / 16384.0
                 * (32768.0 / 32767.0) AS mean_amp,
               CAST(list_max([abs(x + 1) for x in codes]) AS DOUBLE)
                 / 16384.0 * (32768.0 / 32767.0) AS peak_abs
        FROM c
    """).fetchone()
    assert got == (mean_amp, peak_abs)
