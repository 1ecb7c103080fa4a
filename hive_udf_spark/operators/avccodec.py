"""Vendored H.264/AVC decoder for the I_PCM raw-macroblock subset,
plus the ISO 14496-15 avcC plumbing real demuxers need (r11).

Posture — why a SUBSET and not a full decoder: no H.264 decoder ships
in this container (no libopenh264/libavcodec), and a spec-true CAVLC/
CABAC entropy decoder needs the ITU-T H.264 coefficient token tables
and context-initialization tables, which cannot be reproduced offline
without transcribing them — inventing values would decode real-web
video into silent garbage, the one thing the quarantine discipline
exists to prevent (the lossy-VP8 note in ``operators/native.py``).
I_PCM is different in kind: macroblock type 25 in I slices carries its
samples as RAW BYTES after a byte-alignment (ITU-T H.264 §7.3.5 /
§8.3.5 — no prediction, no transform, no entropy coding, and the
deblocking thresholds α(0)=β(0)=0 at the I_PCM QP mean no filtering
alters them), so an I_PCM stream has exactly ONE correct decode and a
spec-derived parser can produce it with zero invented tables.  The
decoder therefore accepts what it can PROVE — SPS/PPS/IDR slice headers
parsed per §7.3, every macroblock I_PCM, CAVLC-mode bitstream —
and raises ValueError (→ quarantine, never wrong pixels) for anything
entropy-coded.

What this buys at the container level: the avc1 MP4 path is now REAL
end-to-end — avcC AVCDecoderConfigurationRecord parse, parameter-set
extraction, 14496-15 length-prefix → Annex-B re-framing (the exact
demuxer → decoder hand-off every H.264 consumer performs) — proven by
pixels, not just probes, and ready to route to a system decoder the
moment one exists in the image.

The encoder twin (``encode_avc_ipcm``) writes spec-shaped SPS/PPS/IDR
NALs with emulation-prevention escaping, so the round trip crosses a
genuine Annex-B bitstream with Exp-Golomb headers.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated multimodal extension surface.
"""

from __future__ import annotations

import numpy as np

from hive_udf_spark.operators._codec_util import untrusted_decoder

__all__ = [
    "decode_avc_annexb_gray",
    "encode_avc_ipcm",
    "avcc_config",
    "avc_sample_to_annexb",
    "is_avc_annexb",
]

_MAX_MBS = 16384  # 2^14 macroblocks = 4 Mpix — untrusted-header guard


# ---------------------------------------------------------------------------
# Bit I/O over RBSP (raw byte sequence payload)
# ---------------------------------------------------------------------------


def _unescape(nal: bytes) -> bytes:
    """Strip emulation-prevention bytes: 00 00 03 -> 00 00 (§7.4.1.1)."""
    out = bytearray()
    i, n = 0, len(nal)
    while i < n:
        if i + 2 < n and nal[i] == 0 and nal[i + 1] == 0 and nal[i + 2] == 3:
            out += b"\x00\x00"
            i += 3
        else:
            out.append(nal[i])
            i += 1
    return bytes(out)


class _Bits:
    __slots__ = ("b", "pos")

    def __init__(self, b: bytes):
        self.b = b
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        if self.pos + n > 8 * len(self.b):
            raise ValueError("H.264: bitstream truncated")
        v = 0
        for _ in range(n):
            v = (v << 1) | ((self.b[self.pos >> 3] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("H.264: Exp-Golomb code out of range")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self) -> None:
        while self.pos & 7:
            if self.u(1) != 0:
                raise ValueError("H.264: nonzero pcm_alignment bit")

    def bytes_raw(self, n: int) -> bytes:
        if self.pos & 7:
            raise ValueError("H.264: raw read while unaligned")
        start = self.pos >> 3
        if start + n > len(self.b):
            raise ValueError("H.264: bitstream truncated in PCM samples")
        self.pos += 8 * n
        return self.b[start : start + n]


class _Writer:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = self.nbits = 0

    def ue(self, v: int) -> None:
        v += 1
        n = v.bit_length()
        self.u(0, n - 1)
        self.u(v, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self) -> None:
        while self.nbits:
            self.u(0, 1)

    def raw(self, b: bytes) -> None:
        assert self.nbits == 0
        self.out += b

    def trailing(self) -> bytes:
        self.u(1, 1)
        self.align_zero()
        return bytes(self.out)


def _escape(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes so no 00 00 0x (x<=3) runs
    survive (§7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for byte in rbsp:
        if zeros >= 2 and byte <= 3:
            out.append(3)
            zeros = 0
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
    return bytes(out)


# ---------------------------------------------------------------------------
# Parameter-set parsing (§7.3.2.1 / §7.3.2.2) — exactly the fields,
# with explicit refusals for shapes outside the provable subset
# ---------------------------------------------------------------------------

_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


def _parse_sps(rbsp: bytes) -> dict:
    r = _Bits(rbsp)
    profile = r.u(8)
    r.u(8)  # constraint flags + reserved
    r.u(8)  # level_idc
    sps = {"profile": profile, "id": r.ue()}
    if profile in _HIGH_PROFILES:
        chroma = r.ue()
        if chroma != 1:
            raise ValueError(f"H.264: chroma_format_idc {chroma} not vendored")
        if r.ue() != 0 or r.ue() != 0:
            raise ValueError("H.264: >8-bit depth not vendored")
        r.u(1)  # qpprime_y_zero_transform_bypass
        if r.u(1) != 0:
            raise ValueError("H.264: seq scaling matrices not vendored")
    sps["log2_max_frame_num"] = r.ue() + 4
    poc_type = r.ue()
    sps["poc_type"] = poc_type
    if poc_type == 0:
        sps["log2_max_poc_lsb"] = r.ue() + 4
    elif poc_type != 2:
        raise ValueError("H.264: pic_order_cnt_type 1 not vendored")
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed
    sps["width_mbs"] = r.ue() + 1
    sps["height_units"] = r.ue() + 1
    if r.u(1) != 1:
        raise ValueError("H.264: interlaced (frame_mbs_only=0) not vendored")
    r.u(1)  # direct_8x8_inference
    crop = [0, 0, 0, 0]
    if r.u(1):  # frame_cropping_flag
        crop = [r.ue(), r.ue(), r.ue(), r.ue()]
    sps["crop"] = crop
    if sps["width_mbs"] * sps["height_units"] > _MAX_MBS:
        raise ValueError("H.264: picture dimensions out of bounds")
    return sps


def _parse_pps(rbsp: bytes) -> dict:
    r = _Bits(rbsp)
    pps = {"id": r.ue(), "sps_id": r.ue()}
    if r.u(1) != 0:
        raise ValueError(
            "H.264: CABAC streams not vendored (no entropy tables offline); "
            "only the I_PCM raw subset decodes"
        )
    pps["pic_order_present"] = r.u(1)
    if r.ue() != 0:
        raise ValueError("H.264: slice groups (FMO) not vendored")
    r.ue()  # num_ref_idx_l0_active_minus1
    r.ue()  # num_ref_idx_l1_active_minus1
    r.u(1)  # weighted_pred
    r.u(2)  # weighted_bipred_idc
    r.se()  # pic_init_qp_minus26
    r.se()  # pic_init_qs_minus26
    r.se()  # chroma_qp_index_offset
    pps["deblocking_control_present"] = r.u(1)
    r.u(1)  # constrained_intra_pred
    pps["redundant_pic_cnt_present"] = r.u(1)
    return pps


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _split_annexb(b: bytes) -> list[bytes]:
    """Annex-B byte stream → NAL units (3- and 4-byte start codes)."""
    nals, i, n = [], 0, len(b)
    while i + 3 <= n:
        if b[i] == 0 and b[i + 1] == 0 and (
            b[i + 2] == 1 or (i + 4 <= n and b[i + 2] == 0 and b[i + 3] == 1)
        ):
            start = i + (3 if b[i + 2] == 1 else 4)
            j = start
            while j + 3 <= n and not (
                b[j] == 0 and b[j + 1] == 0 and b[j + 2] in (0, 1)
            ):
                j += 1
            end = j if j + 3 <= n else n
            if end > start:
                nals.append(b[start:end])
            i = end
        else:
            i += 1
    if not nals:
        raise ValueError("H.264: no NAL units in the byte stream")
    return nals


def is_avc_annexb(b: bytes) -> bool:
    """Structural probe for an Annex-B H.264 stream as our MP4 demuxer
    emits it: a 4-byte start code followed by an SPS NAL (type 7,
    forbidden-zero bit clear)."""
    return (
        len(b) >= 6
        and b[:4] == b"\x00\x00\x00\x01"
        and (b[4] & 0x80) == 0
        and b[4] & 0x1F == 7
    )


@untrusted_decoder
def decode_avc_annexb_gray(b: bytes) -> np.ndarray:
    """Annex-B H.264 access unit → (h, w) uint8 LUMA plane — for the
    provable I_PCM subset; entropy-coded slices raise ValueError
    (→ quarantine, never wrong pixels — see the module docstring)."""
    sps_by_id: dict[int, dict] = {}
    pps_by_id: dict[int, dict] = {}
    luma: np.ndarray | None = None
    for nal in _split_annexb(b):
        if nal[0] & 0x80:
            raise ValueError("H.264: forbidden_zero_bit set")
        ntype = nal[0] & 0x1F
        rbsp = _unescape(nal[1:])
        if ntype == 7:
            sps = _parse_sps(rbsp)
            sps_by_id[sps["id"]] = sps
        elif ntype == 8:
            pps = _parse_pps(rbsp)
            pps_by_id[pps["id"]] = pps
        elif ntype in (1, 5):
            nri = (nal[0] >> 5) & 0x3
            luma = _decode_slice(rbsp, ntype, nri, sps_by_id, pps_by_id)
        elif ntype in (6, 9, 10, 11, 12):  # SEI / AU delimiter / end-of-*
            continue
        else:
            raise ValueError(f"H.264: NAL type {ntype} not vendored")
    if luma is None:
        raise ValueError("H.264: byte stream carries no coded slice")
    return luma


def _decode_slice(
    rbsp: bytes, ntype: int, nal_ref_idc: int, sps_by_id: dict,
    pps_by_id: dict,
) -> np.ndarray:
    r = _Bits(rbsp)
    if r.ue() != 0:
        raise ValueError("H.264: multi-slice pictures not vendored")
    slice_type = r.ue()
    if slice_type % 5 != 2:  # I slice (2 or 7)
        raise ValueError(
            "H.264: inter-coded slices not vendored (I_PCM subset only)"
        )
    pps = pps_by_id.get(r.ue())
    if pps is None:
        raise ValueError("H.264: slice references an unseen PPS")
    sps = sps_by_id.get(pps["sps_id"])
    if sps is None:
        raise ValueError("H.264: PPS references an unseen SPS")
    r.u(sps["log2_max_frame_num"])  # frame_num
    if ntype == 5:
        r.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])
        if pps["pic_order_present"]:
            r.se()  # delta_pic_order_cnt_bottom
    if pps["redundant_pic_cnt_present"]:
        r.ue()
    # dec_ref_pic_marking is present only for REFERENCE pictures
    # (nal_ref_idc != 0, §7.3.3) — a non-reference I slice has none
    if nal_ref_idc != 0:
        if ntype == 5:  # dec_ref_pic_marking for IDR
            r.u(1)  # no_output_of_prior_pics
            r.u(1)  # long_term_reference_flag
        elif r.u(1):  # adaptive_ref_pic_marking_mode_flag on non-IDR
            raise ValueError("H.264: adaptive ref-pic marking not vendored")
    r.se()  # slice_qp_delta
    if pps["deblocking_control_present"]:
        idc = r.ue()
        if idc != 1:
            # α(0)=β(0)=0 at the I_PCM QP means no filtering ONLY when
            # the slice offsets don't raise the thresholds
            a_off, b_off = r.se(), r.se()
            if a_off > 0 or b_off > 0:
                raise ValueError(
                    "H.264: deblocking with positive offsets would filter "
                    "I_PCM edges — not vendored"
                )
    w_mb, h_mb = sps["width_mbs"], sps["height_units"]
    luma = np.empty((16 * h_mb, 16 * w_mb), dtype=np.uint8)
    for mb in range(w_mb * h_mb):
        mb_type = r.ue()
        if mb_type != 25:
            raise ValueError(
                f"H.264: mb_type {mb_type} is entropy-coded — only the "
                "I_PCM raw subset (type 25) decodes"
            )
        r.byte_align()
        samples = np.frombuffer(r.bytes_raw(256), np.uint8).reshape(16, 16)
        my, mx = 16 * (mb // w_mb), 16 * (mb % w_mb)
        luma[my : my + 16, mx : mx + 16] = samples
        r.bytes_raw(128)  # chroma Cb+Cr (4:2:0) — consumed, luma-only out
    cl, cr, ct, cb = sps["crop"]
    h, w = luma.shape
    if 2 * (cl + cr) >= w or 2 * (ct + cb) >= h:
        raise ValueError("H.264: cropping window out of bounds")
    return luma[2 * ct : h - 2 * cb, 2 * cl : w - 2 * cr].copy()


# ---------------------------------------------------------------------------
# Encoder twin
# ---------------------------------------------------------------------------


def _sps_nal(w_mb: int, h_mb: int) -> bytes:
    w = _Writer()
    w.u(66, 8)   # profile_idc: Baseline
    w.u(0, 8)    # constraint flags
    w.u(40, 8)   # level_idc 4.0
    w.ue(0)      # sps_id
    w.ue(0)      # log2_max_frame_num_minus4
    w.ue(2)      # pic_order_cnt_type
    w.ue(1)      # max_num_ref_frames
    w.u(0, 1)    # gaps_in_frame_num_value_allowed
    w.ue(w_mb - 1)
    w.ue(h_mb - 1)
    w.u(1, 1)    # frame_mbs_only
    w.u(1, 1)    # direct_8x8_inference
    w.u(0, 1)    # frame_cropping
    w.u(0, 1)    # vui_parameters_present
    return b"\x67" + _escape(w.trailing())


def _pps_nal() -> bytes:
    w = _Writer()
    w.ue(0)      # pps_id
    w.ue(0)      # sps_id
    w.u(0, 1)    # entropy_coding_mode: CAVLC
    w.u(0, 1)    # bottom_field_pic_order_in_frame_present
    w.ue(0)      # num_slice_groups_minus1
    w.ue(0)      # num_ref_idx_l0_active_minus1
    w.ue(0)      # num_ref_idx_l1_active_minus1
    w.u(0, 1)    # weighted_pred
    w.u(0, 2)    # weighted_bipred_idc
    w.se(0)      # pic_init_qp_minus26
    w.se(0)      # pic_init_qs_minus26
    w.se(0)      # chroma_qp_index_offset
    w.u(1, 1)    # deblocking_filter_control_present
    w.u(0, 1)    # constrained_intra_pred
    w.u(0, 1)    # redundant_pic_cnt_present
    return b"\x68" + _escape(w.trailing())


def _idr_nal(gray: np.ndarray) -> bytes:
    h, wd = gray.shape
    w_mb, h_mb = wd // 16, h // 16
    w = _Writer()
    w.ue(0)      # first_mb_in_slice
    w.ue(7)      # slice_type: I (all slices in picture)
    w.ue(0)      # pps_id
    w.u(0, 4)    # frame_num
    w.ue(0)      # idr_pic_id
    w.u(0, 1)    # no_output_of_prior_pics
    w.u(0, 1)    # long_term_reference_flag
    w.se(0)      # slice_qp_delta
    w.ue(1)      # disable_deblocking_filter_idc: disabled
    for mb in range(w_mb * h_mb):
        w.ue(25)  # mb_type I_PCM
        w.align_zero()
        my, mx = 16 * (mb // w_mb), 16 * (mb % w_mb)
        w.raw(gray[my : my + 16, mx : mx + 16].tobytes())
        w.raw(b"\x80" * 128)  # neutral chroma
    return b"\x65" + _escape(w.trailing())


def encode_avc_ipcm(gray: np.ndarray) -> tuple[bytes, list[bytes]]:
    """(h, w) uint8 gray (16-multiple sides) → (IDR sample as 4-byte
    length-prefixed NAL, [SPS, PPS] parameter sets) — the 14496-15
    shapes ``encode_mp4_avc`` muxes.  The twin writes real Exp-Golomb
    headers and emulation-escaped payloads, so the decode round trip
    crosses a genuine Annex-B bitstream."""
    if gray.ndim != 2 or gray.dtype != np.uint8:
        raise ValueError("gray must be a 2-D uint8 array")
    h, wd = gray.shape
    if h % 16 or wd % 16 or not h or not wd:
        raise ValueError("I_PCM twin needs 16-multiple dimensions")
    idr = _idr_nal(np.ascontiguousarray(gray))
    sample = len(idr).to_bytes(4, "big") + idr
    return sample, [_sps_nal(wd // 16, h // 16), _pps_nal()]


# ---------------------------------------------------------------------------
# avcC (ISO 14496-15 §5.3.3.1) — the MP4 side
# ---------------------------------------------------------------------------


def avcc_config(avcc: bytes) -> tuple[int, list[bytes]]:
    """Parse an avcC AVCDecoderConfigurationRecord payload →
    (NAL length-prefix size, parameter-set NALs: SPS then PPS)."""
    if len(avcc) < 7:
        raise ValueError("avcC record truncated")
    if avcc[0] != 1:
        raise ValueError(f"avcC configurationVersion {avcc[0]} unsupported")
    length_size = (avcc[4] & 0x03) + 1
    nals: list[bytes] = []
    pos = 5
    n_sps = avcc[pos] & 0x1F
    pos += 1
    for _ in range(n_sps):
        ln = int.from_bytes(avcc[pos : pos + 2], "big")
        pos += 2
        if pos + ln > len(avcc):
            raise ValueError("avcC SPS extends past the record")
        nals.append(avcc[pos : pos + ln])
        pos += ln
    if pos >= len(avcc):
        raise ValueError("avcC record missing the PPS array")
    n_pps = avcc[pos]
    pos += 1
    for _ in range(n_pps):
        ln = int.from_bytes(avcc[pos : pos + 2], "big")
        pos += 2
        if pos + ln > len(avcc):
            raise ValueError("avcC PPS extends past the record")
        nals.append(avcc[pos : pos + ln])
        pos += ln
    if not nals:
        raise ValueError("avcC record carries no parameter sets")
    return length_size, nals


def avc_sample_to_annexb(
    sample: bytes, length_size: int, param_sets: list[bytes]
) -> bytes:
    """Length-prefixed H.264 sample NALs → a self-contained Annex-B
    access unit: 4-byte start codes, parameter sets first."""
    out = bytearray()
    for n in param_sets:
        out += b"\x00\x00\x00\x01" + n
    pos = 0
    while pos < len(sample):
        if pos + length_size > len(sample):
            raise ValueError("H.264 sample: NAL length prefix truncated")
        ln = int.from_bytes(sample[pos : pos + length_size], "big")
        pos += length_size
        if ln == 0 or pos + ln > len(sample):
            raise ValueError("H.264 sample: NAL extends past the sample")
        out += b"\x00\x00\x00\x01" + sample[pos : pos + ln]
        pos += ln
    return bytes(out)


def build_avcc(sps: bytes, pps: bytes) -> bytes:
    """AVCDecoderConfigurationRecord payload from one SPS + one PPS
    (profile/level lifted from the SPS as the spec requires)."""
    if len(sps) < 4 or sps[0] & 0x1F != 7 or pps[0] & 0x1F != 8:
        raise ValueError("build_avcc needs an SPS and a PPS NAL")
    return (
        bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
        + len(sps).to_bytes(2, "big") + sps
        + b"\x01" + len(pps).to_bytes(2, "big") + pps
    )
