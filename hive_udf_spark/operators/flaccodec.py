"""Vendored FLAC decoder + fixture encoder twin, implemented from the
public FLAC format specification (RFC 9639), dependency-free.

FLAC is the dominant lossless audio codec in crawled/archived audio
corpora; an audio tier that only parses RIFF/WAV quarantines all of it.
This module vendors the full decode surface:

* ``fLaC`` marker + metadata blocks (STREAMINFO parsed — block sizes,
  sample rate, channels, bits per sample, total samples; other blocks
  skipped by length, last-block flag honored);
* frame headers: 14-bit sync, blocking strategy, all blocksize /
  sample-rate / sample-size code forms (incl. the 8/16-bit
  end-of-header extras), the UTF-8-style coded frame/sample number,
  and the CRC-8 check over the header bytes;
* all four channel assignments: independent (1-8 channels),
  left/side, right/side, mid/side (side channel decoded at +1 bit);
* all four subframe types: CONSTANT, VERBATIM, FIXED (orders 0-4,
  exact integer predictors), LPC (orders 1-32, quantized coefficient
  precision 2-15 bits, signed shift) — plus wasted-bits unary coding;
* Rice-coded residuals: 4- and 5-bit parameter methods, partition
  orders 0-15, the all-ones escape to raw fixed-width samples,
  zigzag mapping;
* frame footer CRC-16 verified over the whole frame (bit-exactness is
  checked, not assumed).

``encode_flac`` is the fixture twin: int32 samples → a spec-valid
stream using REAL machinery — per-block best-of FIXED order 0-2
prediction with optimally-parameterized Rice residuals, CONSTANT
collapse, stereo via independent channels — so decode exercises the
same paths real encoders hit, and lossless round-trip means the
standard sample-stats oracle discipline applies unchanged (the WAV
tier's model).

Every entry point follows the valid-output-or-ValueError contract
(``_codec_util.untrusted_decoder``); byte-flip fuzz runs in tests.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java:1) — this extends the
mandated multimodal extension surface.
"""

from __future__ import annotations

import numpy as np

from hive_udf_spark.operators._codec_util import untrusted_decoder

__all__ = ["decode_flac", "flac_info", "encode_flac"]

_MAX_SAMPLES = 1 << 26  # decode bomb cap (per stream, samples × channels
_MAX_BLOCK = 1 << 16

_BLOCKSIZE_CODE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384,
    15: 32768,
}
_RATE_CODE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZE_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# FIXED predictor coefficients by order (RFC 9639 §9.2.2): the residual
# is sample minus this linear combination of the previous `order` samples
_FIXED_COEFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x^1 + x^0 (0x07), init 0."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + x^0 (0x8005), init 0."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


# ---------------------------------------------------------------------------
# Bit I/O (MSB-first — FLAC is big-endian bit order, unlike VP8L)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        if self.pos + n > len(self.data) * 8:
            raise ValueError("FLAC bitstream truncated")
        p = self.pos
        self.pos += n
        # one C-level window read instead of n Python bit probes —
        # same MSB-first value
        lo = p >> 3
        hi = (p + n + 7) >> 3
        chunk = int.from_bytes(self.data[lo:hi], "big")
        return (chunk >> ((hi << 3) - p - n)) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self, cap: int = 1 << 20) -> int:
        # byte-at-a-time scan for the terminating 1 bit (the old form
        # probed one bit per Python iteration); q counts the zeros, and
        # the cap/truncation outcomes are unchanged
        data = self.data
        pos = self.pos
        nbits = len(data) * 8
        q = 0
        while True:
            if pos >= nbits:
                raise ValueError("FLAC bitstream truncated in unary code")
            rem = data[pos >> 3] & (0xFF >> (pos & 7))
            if rem:
                first = 8 - rem.bit_length()  # bit index of the 1 in its byte
                q += first - (pos & 7)
                if q > cap:
                    raise ValueError("FLAC unary run exceeds sanity cap")
                self.pos = (pos & ~7) + first + 1
                return q
            q += 8 - (pos & 7)
            pos = (pos | 7) + 1
            if q > cap:
                raise ValueError("FLAC unary run exceeds sanity cap")

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def getvalue(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


def _read_utf8_coded(br: _BitReader) -> int:
    """The frame header's UTF-8-style variable-length number (up to 36
    bits / 7 bytes, RFC 9639 §9.1.5)."""
    first = br.read(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    if n_extra < 1 or n_extra > 6:
        raise ValueError("FLAC coded number has invalid lead byte")
    v = first & (mask - 1)
    for _ in range(n_extra):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC coded number has invalid continuation byte")
        v = (v << 6) | (b & 0x3F)
    return v


def _write_utf8_coded(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    # count 6-bit payload groups
    groups = []
    while v > 0:
        groups.append(v & 0x3F)
        v >>= 6
    n = len(groups)
    lead_payload_bits = 7 - (n + 1)
    if groups and groups[-1] >> lead_payload_bits:
        groups.append(0)
        n += 1
        lead_payload_bits = 7 - (n + 1)
    if n > 6:
        raise ValueError("FLAC coded number too large")
    lead = (0xFF << (7 - n)) & 0xFF | groups[-1]
    bw.write(lead, 8)
    for g in reversed(groups[:-1]):
        bw.write(0x80 | g, 8)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _parse_streaminfo(body: bytes) -> dict:
    if len(body) != 34:
        raise ValueError("FLAC STREAMINFO must be 34 bytes")
    br = _BitReader(body)
    info = {
        "min_blocksize": br.read(16),
        "max_blocksize": br.read(16),
        "min_framesize": br.read(24),
        "max_framesize": br.read(24),
        "sample_rate": br.read(20),
        "channels": br.read(3) + 1,
        "bits_per_sample": br.read(5) + 1,
        "total_samples": br.read(36),
    }
    info["n_channels"] = info["channels"]  # wav_info-compatible key
    if info["sample_rate"] == 0:
        raise ValueError("FLAC sample rate 0 is invalid")
    if info["min_blocksize"] < 16:
        raise ValueError("FLAC minimum block size below 16")
    return info


@untrusted_decoder
def flac_info(b: bytes) -> dict:
    """Parse the fLaC marker + STREAMINFO without decoding frames."""
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (fLaC marker missing)")
    if len(b) < 8:
        raise ValueError("FLAC metadata truncated")
    header = b[4]
    if header & 0x7F != 0:
        raise ValueError("FLAC first metadata block must be STREAMINFO")
    length = int.from_bytes(b[5:8], "big")
    return _parse_streaminfo(b[8 : 8 + length])


def _skip_metadata(b: bytes) -> tuple[dict, int]:
    """→ (streaminfo, byte offset of the first frame)."""
    info = flac_info(b)
    pos = 4
    while True:
        if pos + 4 > len(b):
            raise ValueError("FLAC metadata truncated")
        last = b[pos] & 0x80
        length = int.from_bytes(b[pos + 1 : pos + 4], "big")
        pos += 4 + length
        if pos > len(b):
            raise ValueError("FLAC metadata block overruns stream")
        if last:
            return info, pos


def _decode_residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC residual coding method reserved")
    pbits = 4 + method  # rice parameter width
    esc = (1 << pbits) - 1
    porder = br.read(4)
    if blocksize >> porder << porder != blocksize:
        raise ValueError("FLAC partition order does not divide block size")
    out: list[int] = []
    for p in range(1 << porder):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        param = br.read(pbits)
        if param == esc:
            width = br.read(5)
            for _ in range(n):
                out.append(br.read_signed(width) if width else 0)
        else:
            for _ in range(n):
                q = br.read_unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))  # un-zigzag
    return out


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted
        if bps <= 0:
            raise ValueError("FLAC wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        samples = [br.read_signed(bps)] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        if order > blocksize:
            raise ValueError("FLAC fixed order exceeds block size")
        samples = [br.read_signed(bps) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * samples[-k - 1] for k, c in enumerate(coefs))
            samples.append(r + pred)
    elif stype >= 32:  # LPC order 1-32
        order = (stype & 0x1F) + 1
        if order > blocksize:
            raise ValueError("FLAC LPC order exceeds block size")
        samples = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC LPC coefficient precision 15 is invalid")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC negative LPC shift is invalid")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        for r in res:
            acc = sum(c * samples[-k - 1] for k, c in enumerate(coefs))
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"FLAC subframe type {stype} reserved")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


@untrusted_decoder
def decode_flac(b: bytes) -> tuple[np.ndarray, int]:
    """FLAC stream → ((n_samples, n_channels) int32 array, sample_rate).

    Decodes every frame, verifying the header CRC-8 and the frame
    CRC-16; any mismatch, reserved code, or truncation raises
    ValueError (quarantine-routable, never silently wrong samples)."""
    info, pos = _skip_metadata(b)
    channels = info["channels"]
    out: list[list[int]] = []
    total = info["total_samples"]
    br = _BitReader(b, pos * 8)
    nbits = len(b) * 8
    while br.pos < nbits:
        if (nbits - br.pos) < 32:
            if total and sum(len(f) for f in out) < total:
                raise ValueError("FLAC stream ends before total_samples")
            break
        frame_start_byte = br.pos >> 3
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC frame sync code missing")
        if br.read(1):
            raise ValueError("FLAC frame reserved bit set")
        br.read(1)  # blocking strategy (informational: number is coded)
        bs_code = br.read(4)
        rate_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("FLAC frame header reserved bit set")
        _read_utf8_coded(br)
        if bs_code == 0:
            raise ValueError("FLAC block size code 0 reserved")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODE[bs_code]
        if rate_code == 0:
            rate = info["sample_rate"]
        elif rate_code in _RATE_CODE:
            rate = _RATE_CODE[rate_code]
        elif rate_code == 12:
            rate = br.read(8) * 1000
        elif rate_code == 13:
            rate = br.read(16)
        elif rate_code == 14:
            rate = br.read(16) * 10
        else:
            raise ValueError("FLAC sample rate code 15 is invalid")
        if ss_code == 0:
            bps = info["bits_per_sample"]
        elif ss_code in _SAMPLE_SIZE_CODE:
            bps = _SAMPLE_SIZE_CODE[ss_code]
        else:
            raise ValueError("FLAC sample size code reserved")
        hdr_end = br.pos >> 3
        if _crc8(b[frame_start_byte:hdr_end]) != br.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code < 8:
            n_ch = ch_code + 1
            side = None
        elif ch_code in (8, 9, 10):
            n_ch = 2
            side = ch_code
        else:
            raise ValueError("FLAC channel assignment reserved")
        if n_ch != channels:
            raise ValueError("FLAC frame channel count disagrees with STREAMINFO")
        if (sum(len(f) for f in out) + blocksize) * channels > _MAX_SAMPLES:
            raise ValueError("FLAC stream exceeds the vendored sample cap")
        chans: list[list[int]] = []
        for c in range(n_ch):
            ch_bps = bps
            if side == 8 and c == 1:  # left/side
                ch_bps += 1
            elif side == 9 and c == 0:  # right/side
                ch_bps += 1
            elif side == 10 and c == 1:  # mid/side
                ch_bps += 1
            chans.append(_decode_subframe(br, blocksize, ch_bps))
        br.align()
        if _crc16(b[frame_start_byte : br.pos >> 3]) != br.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        if side == 8:  # left/side: side = left - right
            left, s = chans
            chans = [left, [l - d for l, d in zip(left, s)]]
        elif side == 9:  # right/side: side = left - right
            s, right = chans
            chans = [[r + d for r, d in zip(right, s)], right]
        elif side == 10:  # mid/side: mid = (L+R)>>1 with the dropped low
            # bit recoverable from side's parity (RFC 9639 §9.2.1)
            mid, s = chans
            left, right = [], []
            for m, d in zip(mid, s):
                m2 = (m << 1) | (d & 1)
                left.append((m2 + d) >> 1)
                right.append((m2 - d) >> 1)
            chans = [left, right]
        out.append(list(map(list, zip(*chans))))  # (blocksize, channels) rows
    samples = [row for frame in out for row in frame]
    arr = (
        np.array(samples, dtype=np.int64).astype(np.int32)
        if samples
        else np.zeros((0, channels), dtype=np.int32)
    )
    if arr.ndim == 1:
        arr = arr.reshape(0, channels)
    if total and arr.shape[0] > total:
        arr = arr[:total]  # final partial block padding is not allowed in
        # FLAC, but total_samples is authoritative when set
    return arr, info["sample_rate"]


# ---------------------------------------------------------------------------
# Encoder (fixture twin)
# ---------------------------------------------------------------------------


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _best_rice_param(res: list[int], pbits: int) -> int:
    """Parameter minimizing the exact coded size over the scan range."""
    if not res:
        return 0
    zz = [2 * v if v >= 0 else -2 * v - 1 for v in res]  # zigzag
    best_p, best_cost = 0, None
    for p in range((1 << pbits) - 1):
        cost = sum((z >> p) + 1 + p for z in zz)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
    return best_p


def _write_residual(bw: _BitWriter, res: list[int], pbits: int = 4) -> None:
    bw.write(pbits - 4, 2)  # method
    bw.write(0, 4)  # partition order 0 (single partition)
    param = _best_rice_param(res, pbits)
    esc = (1 << pbits) - 1
    zz = [2 * v if v >= 0 else -2 * v - 1 for v in res]
    rice_cost = sum((z >> param) + 1 + param for z in zz)
    width = max((max(abs(v) for v in res).bit_length() + 1) if res else 1, 1)
    if 5 + width * len(res) < rice_cost:  # raw beats rice: use the escape
        bw.write(esc, pbits)
        bw.write(width, 5)
        for v in res:
            bw.write_signed(v, width)
        return
    bw.write(param, pbits)
    for z in zz:
        bw.write_unary(z >> param)
        bw.write(z & ((1 << param) - 1), param)


def _encode_subframe(bw: _BitWriter, x: list[int], bps: int) -> None:
    bw.write(0, 1)  # padding
    if all(v == x[0] for v in x):
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(x[0], bps)
        return
    # best FIXED order 0-2 by residual magnitude sum
    best_order, best_res, best_cost = None, None, None
    for order in (0, 1, 2):
        if order > len(x) - 1:
            break
        coefs = _FIXED_COEFS[order]
        res = [
            x[i] - sum(c * x[i - k - 1] for k, c in enumerate(coefs))
            for i in range(order, len(x))
        ]
        cost = sum(abs(r) for r in res)
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    bw.write(8 + best_order, 6)  # FIXED
    bw.write(0, 1)  # no wasted bits
    for v in x[:best_order]:
        bw.write_signed(v, bps)
    _write_residual(bw, best_res)


def encode_flac(
    samples: np.ndarray, sample_rate: int = 8000, bits: int = 16,
    block_size: int = 4096,
) -> bytes:
    """int32 samples (1-D mono or (n, channels)) → a spec-valid FLAC
    stream: STREAMINFO + fixed-blocking frames, per-channel best-of
    FIXED order 0-2 subframes (CONSTANT collapse when flat) with
    optimally-parameterized Rice residuals, real header CRC-8 / frame
    CRC-16.  Lossless: ``decode_flac`` returns the input exactly."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2:
        raise ValueError("samples must be 1-D or (n, channels)")
    n, channels = x.shape
    if not 1 <= channels <= 8:
        raise ValueError("FLAC supports 1-8 channels")
    if not 4 <= bits <= 32:
        raise ValueError("bits per sample out of range")
    if not 16 <= block_size <= 65535:
        raise ValueError("block size out of FLAC range")
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if n and (x.min() < lo or x.max() > hi):
        raise ValueError(f"samples exceed {bits}-bit range")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    streaminfo = si.getvalue() + b"\x00" * 16  # MD5 unset (all zero = unknown)
    out = bytearray(b"fLaC")
    out += b"\x80\x00\x00\x22" + streaminfo  # last-block STREAMINFO, len 34
    frame_idx = 0
    for start in range(0, max(n, 1), block_size):
        block = x[start : start + block_size]
        bs = block.shape[0]
        if bs == 0:
            break
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking: frame number coded
        bw.write(6 if bs <= 256 else 7, 4)  # 8/16-bit end-of-header blocksize
        bw.write(0, 4)  # rate: from STREAMINFO
        bw.write(channels - 1, 4)  # independent channels
        ss = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}.get(bits, 0)
        bw.write(ss, 3)
        bw.write(0, 1)
        _write_utf8_coded(bw, frame_idx)
        if bs <= 256:
            bw.write(bs - 1, 8)
        else:
            bw.write(bs - 1, 16)
        header = bw
        hdr_bytes_tmp = bytearray(header.buf)
        assert header.n == 0, "frame header must be byte-aligned pre-CRC"
        bw.write(_crc8(bytes(hdr_bytes_tmp)), 8)
        for c in range(channels):
            _encode_subframe(bw, [int(v) for v in block[:, c]], bits)
        bw.align()
        frame_wo_crc = bytes(bw.buf)
        bw.write(_crc16(frame_wo_crc), 16)
        out += bw.getvalue()
        frame_idx += 1
    return bytes(out)
