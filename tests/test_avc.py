"""H.264 I_PCM-subset decode tier (r11): spec-derived NAL/Exp-Golomb/
slice parsing, avcC plumbing, MP4 round trip, golden parameter-set
bytes, entropy-coded-input quarantine, fuzz."""

from __future__ import annotations

import numpy as np
import pytest

from hive_udf_spark.operators.avccodec import (
    _sps_nal,
    _pps_nal,
    avc_sample_to_annexb,
    avcc_config,
    build_avcc,
    decode_avc_annexb_gray,
    encode_avc_ipcm,
    is_avc_annexb,
)
from hive_udf_spark.operators.imagecodec import decode_to_gray
from hive_udf_spark.operators.mp4codec import encode_mp4_avc, split_mp4_frames

RNG = np.random.RandomState(7)
FRAMES = [RNG.randint(0, 256, (32, 48), dtype=np.uint8) for _ in range(3)]


def _annexb(gray: np.ndarray) -> bytes:
    sample, psets = encode_avc_ipcm(gray)
    return avc_sample_to_annexb(sample, 4, psets)


def test_ipcm_roundtrip_pixel_exact_multi_mb():
    for f in FRAMES:  # 2x3 macroblocks: exercises raster placement
        assert np.array_equal(decode_avc_annexb_gray(_annexb(f)), f)


def test_golden_parameter_set_bytes():
    """The twin's serialized SPS/PPS are pinned to hand-derived bit
    layouts (ITU-T H.264 §7.3.2).  The PPS bytes 68 CE 3C 80 are the
    canonical default-PPS real encoders emit — an external
    confirmation the Exp-Golomb writer is not self-consistently wrong."""
    assert _sps_nal(1, 1) == bytes.fromhex("67420028da79")
    assert _pps_nal() == bytes.fromhex("68ce3c80")


def test_emulation_prevention_roundtrip():
    """An all-zeros frame forces maximal 00-runs: the escaped bitstream
    must carry emulation-prevention bytes and still decode exactly."""
    z = np.zeros((16, 16), np.uint8)
    ab = _annexb(z)
    assert ab.count(b"\x00\x00\x03") > 100
    assert np.array_equal(decode_avc_annexb_gray(ab), z)


def test_mp4_roundtrip_through_avcc():
    encs = [encode_avc_ipcm(f) for f in FRAMES]
    sps, pps = encs[0][1]
    mp4 = encode_mp4_avc([e[0] for e in encs], sps, pps, 48, 32)
    samples = split_mp4_frames(mp4)
    assert len(samples) == 3
    for s, f in zip(samples, FRAMES):
        assert is_avc_annexb(s)
        assert np.array_equal(decode_to_gray(s), f)


def test_avcc_record_parses():
    sample, (sps, pps) = encode_avc_ipcm(FRAMES[0])
    length_size, nals = avcc_config(build_avcc(sps, pps))
    assert length_size == 4
    assert [n[0] & 0x1F for n in nals] == [7, 8]
    assert nals == [sps, pps]


def test_entropy_coded_streams_quarantine():
    """The honest posture: any non-I_PCM macroblock, CABAC PPS, or
    inter slice raises — real-web H.264 must never emit wrong pixels."""
    sample, (sps, pps) = encode_avc_ipcm(np.zeros((16, 16), np.uint8))
    # CABAC PPS: flip entropy_coding_mode (bit 2 of the payload's
    # first byte: ue(0), ue(0), then the flag) — 0xCE -> 0xEE
    cabac_pps = bytes([pps[0], 0xEE]) + pps[2:]
    ab = (b"\x00\x00\x00\x01" + sps + b"\x00\x00\x00\x01" + cabac_pps
          + b"\x00\x00\x00\x01" + sample[4:])
    with pytest.raises(ValueError, match="CABAC"):
        decode_avc_annexb_gray(ab)
    # an Intra_16x16 mb_type (not 25): rebuild the slice with mb_type 1
    from hive_udf_spark.operators.avccodec import _Writer, _escape

    w = _Writer()
    w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
    w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
    w.ue(1)  # mb_type Intra_16x16 — entropy-coded residuals follow
    bad = (b"\x00\x00\x00\x01" + sps + b"\x00\x00\x00\x01" + pps
           + b"\x00\x00\x00\x01\x65" + _escape(w.trailing()))
    with pytest.raises(ValueError, match="I_PCM"):
        decode_avc_annexb_gray(bad)


def test_byte_flip_fuzz_never_crashes():
    base = bytearray(_annexb(FRAMES[0]))
    rng = np.random.RandomState(11)
    for _ in range(300):
        i = int(rng.randint(0, len(base)))
        orig = base[i]
        base[i] ^= 1 << int(rng.randint(0, 8))
        try:
            out = decode_avc_annexb_gray(bytes(base))
            assert out.dtype == np.uint8 and out.ndim == 2
        except ValueError:
            pass
        base[i] = orig


def test_truncation_fuzz_never_crashes():
    full = _annexb(FRAMES[0])
    for cut in range(0, len(full), 61):
        try:
            decode_avc_annexb_gray(full[:cut])
        except ValueError:
            pass


def test_dimension_and_input_guards():
    with pytest.raises(ValueError, match="16-multiple"):
        encode_avc_ipcm(np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError, match="no NAL units"):
        decode_avc_annexb_gray(b"\xff" * 32)
    huge = bytearray(_sps_nal(200, 200))  # 40000 MBs > the cap
    ab = b"\x00\x00\x00\x01" + bytes(huge)
    with pytest.raises(ValueError, match="out of bounds"):
        decode_avc_annexb_gray(ab)


def test_avcc_malformed_raises():
    with pytest.raises(ValueError, match="truncated"):
        avcc_config(b"\x01\x42\x00\x28")
    with pytest.raises(ValueError, match="configurationVersion"):
        avcc_config(b"\x02" + b"\x00" * 10)


def test_ipcm_roundtrip_property():
    """Hypothesis: any uint8 frame with 16-multiple sides round-trips
    bit-exact through encode_avc_ipcm -> Annex-B -> decode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=0, max_value=2 ** 32 - 1),
    )
    def prop(wm, hm, seed):
        rng = np.random.RandomState(seed % (2 ** 31))
        g = rng.randint(0, 256, (16 * hm, 16 * wm), dtype=np.uint8)
        assert np.array_equal(decode_avc_annexb_gray(_annexb(g)), g)

    prop()


def test_non_reference_i_slice_has_no_ref_pic_marking():
    """ADVICE r11: a spec-valid NON-REFERENCE I slice (NAL type 1,
    nal_ref_idc 0) carries NO dec_ref_pic_marking (§7.3.3 — present
    only when nal_ref_idc != 0); it must decode, not false-quarantine."""
    from hive_udf_spark.operators.avccodec import _Writer, _escape, _sps_nal

    g = RNG.randint(0, 256, (16, 16), dtype=np.uint8)
    w = _Writer()
    w.ue(0)      # first_mb_in_slice
    w.ue(2)      # slice_type: I (this slice only)
    w.ue(0)      # pps_id
    w.u(0, 4)    # frame_num (twin SPS: log2_max_frame_num = 4)
    # nal_ref_idc == 0: NO dec_ref_pic_marking here
    w.se(0)      # slice_qp_delta
    w.ue(1)      # disable_deblocking_filter_idc
    w.ue(25)     # mb_type I_PCM
    w.align_zero()
    w.raw(g.tobytes())
    w.raw(b"\x80" * 128)
    slice_nal = b"\x01" + _escape(w.trailing())  # nri=0, type=1
    ab = (b"\x00\x00\x00\x01" + _sps_nal(1, 1)
          + b"\x00\x00\x00\x01" + _pps_nal()
          + b"\x00\x00\x00\x01" + slice_nal)
    assert np.array_equal(decode_avc_annexb_gray(ab), g)
