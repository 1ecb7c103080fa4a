"""Vendored dependency-free WAV (RIFF) decoder: PCM, G.711, IMA ADPCM.

The audio twin of ``operators.imagecodec``: a REAL container parse —
RIFF header walk, fmt/data chunk discovery by id (not fixed offsets, so
extra chunks like LIST/INFO are handled), PCM 8-bit unsigned and 16-bit
signed little-endian, mono or interleaved multi-channel — with explicit
errors for anything else.

Compressed audio (r6): G.711 µ-law (WAV format 7) and A-law (format 6)
companding — the telephony standard, a pure integer segment/mantissa
expansion cross-checked bit-exact against CPython's ``audioop`` — and
IMA/DVI ADPCM (format 0x11): block-structured 4-bit differential coding
whose decoder is an exact integer state machine (step-size table walk
from each block header's predictor/index). ADPCM is lossy, but a
PER-BLOCK-CONSTANT signal encodes to all-zero nibbles at step index 0
and decodes bit-exactly — the audio analogue of the JPEG flat-block
construction that lets SQL oracles hold lossy codecs to hash-exact
answers.

Everything is integer-exact: samples come back as int32 numpy arrays
(8-bit data is centered by subtracting 128), so downstream statistics
are reproducible bit-for-bit by any engine that sums the same integers.

No reference analogue (the reference is a cardinality UDAF); this is
part of the mandated multimodal extension surface (SURVEY.md §2.3).
"""

from __future__ import annotations

import struct as _struct

import numpy as np

from hive_udf_spark.operators._codec_util import untrusted_decoder

__all__ = [
    "decode_audio",
    "audio_info",
    "decode_wav",
    "encode_wav_pcm",
    "encode_wav_g711",
    "encode_wav_ima_adpcm",
    "wav_info",
    "g711_decode",
    "g711_encode",
    "decode_au",
    "encode_au",
    "au_info",
    "decode_aiff",
    "encode_aiff_pcm",
    "aiff_info",
]


def decode_audio(b: bytes):
    """Magic-dispatched audio decode → (int32 (n, channels), rate):
    RIFF/WAV (PCM, G.711, IMA ADPCM), FLAC (operators.flaccodec),
    Sun AU (µ-law/A-law/PCM — r11) or AIFF (BE PCM — r11).
    Anything else raises ValueError — quarantine-routable."""
    if b[:4] == b"fLaC":
        from hive_udf_spark.operators.flaccodec import decode_flac

        return decode_flac(b)
    if b[:4] == b".snd":
        return decode_au(b)
    if len(b) >= 12 and b[:4] == b"FORM" and b[8:12] == b"AIFF":
        return decode_aiff(b)
    return decode_wav(b)


def audio_info(b: bytes) -> dict:
    """Magic-dispatched header parse; every container reports
    ``bits_per_sample``, ``sample_rate`` and ``channels``."""
    if b[:4] == b"fLaC":
        from hive_udf_spark.operators.flaccodec import flac_info

        return flac_info(b)
    if b[:4] == b".snd":
        return au_info(b)
    if len(b) >= 12 and b[:4] == b"FORM" and b[8:12] == b"AIFF":
        return aiff_info(b)
    return wav_info(b)


def _chunks(b: bytes):
    """Yield (chunk_id, payload_offset, payload_size) for every top-level
    RIFF sub-chunk, validating extents."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    (riff_size,) = _struct.unpack_from("<I", b, 4)
    end = min(len(b), 8 + riff_size)
    pos = 12
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        (size,) = _struct.unpack_from("<I", b, pos + 4)
        payload = pos + 8
        if payload + size > len(b):
            raise ValueError(f"chunk {cid!r} truncated ({payload + size - len(b)} bytes short)")
        yield cid, payload, size
        pos = payload + size + (size & 1)  # chunks are word-aligned


@untrusted_decoder
def wav_info(b: bytes) -> dict:
    """Parsed fmt header: {audio_format, n_channels, sample_rate,
    bits_per_sample, n_samples} (n_samples = per-channel frame count)."""
    fmt = None
    data_size = None
    for cid, off, size in _chunks(b):
        if cid == b"fmt " and fmt is None:
            if size < 16:
                raise ValueError("fmt chunk too small")
            audio_format, n_channels, sample_rate = _struct.unpack_from("<HHI", b, off)
            block_align = _struct.unpack_from("<H", b, off + 12)[0]
            bits = _struct.unpack_from("<H", b, off + 14)[0]
            fmt = {
                "audio_format": audio_format,
                "n_channels": n_channels,
                "sample_rate": sample_rate,
                "block_align": block_align,
                "bits_per_sample": bits,
            }
        elif cid == b"data" and data_size is None:
            data_size = size
    if fmt is None:
        raise ValueError("no fmt chunk")
    if data_size is None:
        raise ValueError("no data chunk")
    bytes_per_sample = fmt["bits_per_sample"] // 8
    denom = bytes_per_sample * fmt["n_channels"]
    fmt["n_samples"] = data_size // denom if denom else 0
    return fmt


# ---------------------------------------------------------------------------
# G.711 companding (WAV formats 6 = A-law, 7 = µ-law). Pure integer
# segment/mantissa expansion per the classic reference implementation;
# cross-checked bit-exact against CPython's audioop in tests.
# ---------------------------------------------------------------------------

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def _ulaw_decode_lut() -> np.ndarray:
    codes = np.arange(256, dtype=np.int64)
    c = ~codes & 0xFF
    sign = (c & 0x80) != 0
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(sign, -mag, mag).astype(np.int32)


def _alaw_decode_lut() -> np.ndarray:
    codes = np.arange(256, dtype=np.int64)
    c = codes ^ 0x55
    sign = (c & 0x80) != 0
    seg = (c >> 4) & 0x07
    mant = c & 0x0F
    t = (mant << 4) + 8
    t = np.where(seg >= 1, (mant << 4) + 0x108, t)
    t = np.where(seg >= 2, t << np.maximum(seg - 1, 0), t)
    # G.711 A-law: sign bit SET means positive (inverted vs µ-law)
    return np.where(sign, t, -t).astype(np.int32)


_ULAW_LUT = _ulaw_decode_lut()
_ALAW_LUT = _alaw_decode_lut()


def g711_decode(codes: np.ndarray | bytes, law: str = "ulaw") -> np.ndarray:
    """Expand G.711 code bytes to int32 16-bit-range samples (exact
    integer LUT; ``law`` is 'ulaw' or 'alaw')."""
    lut = {"ulaw": _ULAW_LUT, "alaw": _ALAW_LUT}.get(law)
    if lut is None:
        raise ValueError("law must be 'ulaw' or 'alaw'")
    idx = np.frombuffer(codes, dtype=np.uint8) if isinstance(codes, bytes) else np.asarray(codes, dtype=np.uint8)
    return lut[idx]


def g711_encode(samples: np.ndarray, law: str = "ulaw") -> np.ndarray:
    """Compress int16-range samples to G.711 code bytes (uint8).

    Exact vectorized transcriptions of the Sun reference encoders as
    CPython's ``audioop`` carries them (14-bit µ-law pipeline with
    arithmetic ``>>2`` pre-shift, 13-bit A-law with ``>>3`` and the
    ``-x-1`` negative fold, inclusive segment ends) — pytest asserts
    byte equality against audioop over random samples, and
    encode∘decode is the identity on codes (modulo µ-law's two zero
    codes)."""
    x = np.clip(np.asarray(samples, dtype=np.int64), -32768, 32767)
    if law == "ulaw":
        pcm = x >> 2  # arithmetic shift: floor, per the reference
        mask = np.where(pcm < 0, 0x7F, 0xFF)
        mag = np.minimum(np.abs(pcm), 8158) + 0x21  # 14-bit CLIP per the reference
        seg = np.searchsorted(
            np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int64),
            mag,
            side="left",
        )
        uval = (seg << 4) | ((mag >> (seg + 1)) & 0x0F)
        return ((uval ^ mask) & 0xFF).astype(np.uint8)
    if law == "alaw":
        mask = np.where(x >= 0, 0xD5, 0x55)
        pcm = np.where(x >= 0, x, -x - 1) >> 3  # 13-bit magnitude
        seg = np.searchsorted(
            np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF], dtype=np.int64),
            pcm,
            side="left",
        )
        shift = np.where(seg < 2, 1, seg)
        aval = (seg << 4) | ((pcm >> shift) & 0x0F)
        return ((aval ^ mask) & 0xFF).astype(np.uint8)
    raise ValueError("law must be 'ulaw' or 'alaw'")


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (WAV format 0x11): 4-bit differential coding, exact
# integer state machine, block headers carry (predictor, step index).
# ---------------------------------------------------------------------------

_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
_IMA_INDEX_STEP = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_decode_block(raw: bytes, n_samples: int) -> list[int]:
    """One mono IMA block: 4-byte header (predictor int16, step index,
    reserved) + packed nibbles (low nibble first)."""
    if len(raw) < 4:
        raise ValueError("IMA ADPCM block shorter than its header")
    (pred,) = _struct.unpack_from("<h", raw, 0)
    index = raw[2]
    if index > 88:
        raise ValueError(f"IMA ADPCM step index {index} out of range 0-88")
    out = [pred]
    steps = _IMA_STEPS
    for k in range(n_samples - 1):
        byte = raw[4 + (k >> 1)]
        nib = (byte >> 4) if k & 1 else (byte & 0x0F)
        step = int(steps[index])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        out.append(pred)
        index = max(0, min(88, index + _IMA_INDEX_STEP[nib & 7]))
    return out


def _ima_encode_block(x: list[int], index: int) -> tuple[bytes, int]:
    """Encode one mono block: header predictor = first sample; returns
    (block bytes without padding, final step index)."""
    pred = x[0]
    out = bytearray(_struct.pack("<hBB", pred, index, 0))
    nibbles = []
    steps = _IMA_STEPS
    for s in x[1:]:
        step = int(steps[index])
        delta = s - pred
        nib = 0
        if delta < 0:
            nib = 8
            delta = -delta
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        # reconstruct exactly as the decoder will
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + _IMA_INDEX_STEP[nib & 7]))
        nibbles.append(nib)
    if len(nibbles) & 1:
        nibbles.append(0)
    for lo, hi in zip(nibbles[::2], nibbles[1::2]):
        out.append(lo | (hi << 4))
    return bytes(out), index


@untrusted_decoder
def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """→ (samples int32 array of shape (n_frames, n_channels), rate).

    PCM (format 1: 8-bit unsigned centered, 16/24/32-bit signed LE —
    24-bit packed triples widen via a zero low byte + arithmetic shift),
    G.711 A-law (6) / µ-law (7), and mono IMA ADPCM (0x11); anything
    else raises explicitly.
    """
    info = wav_info(b)
    afmt, nch = info["audio_format"], info["n_channels"]
    if afmt not in (1, 6, 7, 0x11):
        raise ValueError(
            f"unsupported WAV audio format {afmt} "
            "(PCM=1, A-law=6, u-law=7, IMA ADPCM=0x11 vendored)"
        )
    if nch < 1:
        raise ValueError("channel count must be >= 1")
    bits = info["bits_per_sample"]
    if afmt == 1 and bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported PCM bit depth {bits} (8/16/24/32 vendored)")
    if afmt in (6, 7) and bits != 8:
        raise ValueError("G.711 WAV must declare 8 bits per sample")
    if afmt == 0x11 and nch != 1:
        raise ValueError("multi-channel IMA ADPCM not vendored (mono only)")
    for cid, off, size in _chunks(b):
        if cid != b"data":
            continue
        raw = b[off : off + size]
        if afmt == 1:
            if bits == 8:
                x = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
            elif bits == 16:
                n = size // 2
                x = np.frombuffer(raw, dtype="<i2", count=n).astype(np.int32)
            elif bits == 24:
                # packed little-endian 3-byte signed samples: widen via a
                # zero low byte then arithmetic-shift back down
                n = size // 3
                trip = np.frombuffer(raw, dtype=np.uint8, count=n * 3).reshape(n, 3)
                wide = np.zeros((n, 4), dtype=np.uint8)
                wide[:, 1:] = trip
                x = wide.view("<i4").reshape(n) >> 8
            else:  # 32-bit signed PCM (int32 holds it exactly)
                n = size // 4
                x = np.frombuffer(raw, dtype="<i4", count=n).astype(np.int32)
        elif afmt in (6, 7):
            x = g711_decode(raw, "alaw" if afmt == 6 else "ulaw")
        else:  # IMA ADPCM, mono
            block_align = info.get("block_align") or 0
            if block_align < 5:
                raise ValueError("IMA ADPCM requires block_align >= 5")
            spb = 1 + (block_align - 4) * 2
            out: list[int] = []
            for p in range(0, len(raw), block_align):
                block = raw[p : p + block_align]
                n_s = spb if len(block) == block_align else 1 + (len(block) - 4) * 2
                out.extend(_ima_decode_block(block, n_s))
            x = np.array(out, dtype=np.int32)
        frames = x.size // nch
        return x[: frames * nch].reshape(frames, nch), info["sample_rate"]
    raise ValueError("no data chunk")  # pragma: no cover - wav_info already checks


def encode_wav_pcm(
    samples: np.ndarray, sample_rate: int = 8000, bits: int = 16
) -> bytes:
    """Encode (n_frames,) or (n_frames, n_channels) integer samples as a
    canonical PCM WAV blob (the test-fixture twin of decode_wav)."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n_frames, nch = x.shape
    if bits == 8:
        payload = (x.astype(np.int32) + 128).clip(0, 255).astype(np.uint8).tobytes()
    elif bits == 16:
        # clip like the 8-bit path — astype('<i2') alone would silently
        # wrap out-of-range samples
        payload = x.astype(np.int64).clip(-32768, 32767).astype("<i2").tobytes()
    elif bits == 24:
        v = x.astype(np.int64).clip(-(1 << 23), (1 << 23) - 1).astype("<i4")
        # little-endian 3-byte packing: drop each int32's high byte
        payload = (
            v.reshape(-1).view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
        )
    elif bits == 32:
        payload = (
            x.astype(np.int64)
            .clip(-(1 << 31), (1 << 31) - 1)
            .astype("<i4")
            .tobytes()
        )
    else:
        raise ValueError("bits must be 8, 16, 24, or 32")
    byte_rate = sample_rate * nch * bits // 8
    block_align = nch * bits // 8
    fmt = _struct.pack("<HHIIHH", 1, nch, sample_rate, byte_rate, block_align, bits)
    data = payload
    riff = (
        b"WAVE"
        + b"fmt "
        + _struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + _struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + _struct.pack("<I", len(riff)) + riff


def _wrap_riff(fmt: bytes, data: bytes) -> bytes:
    riff = (
        b"WAVE"
        + b"fmt "
        + _struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + _struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + _struct.pack("<I", len(riff)) + riff


def encode_wav_g711(
    codes: np.ndarray | bytes, law: str = "ulaw", sample_rate: int = 8000
) -> bytes:
    """Wrap raw G.711 code bytes in a canonical mono WAV (format 7 µ-law
    or 6 A-law) — the fixture twin of the companded decode path. Taking
    CODES (not samples) keeps fixtures exactly representable: every byte
    value is a valid code, so a payload string can BE the stream."""
    if law not in ("ulaw", "alaw"):
        raise ValueError("law must be 'ulaw' or 'alaw'")
    payload = (
        codes.astype(np.uint8).tobytes()
        if isinstance(codes, np.ndarray)
        else bytes(codes)
    )
    afmt = 7 if law == "ulaw" else 6
    fmt = _struct.pack("<HHIIHH", afmt, 1, sample_rate, sample_rate, 1, 8)
    return _wrap_riff(fmt, payload)


def encode_wav_ima_adpcm(
    samples: np.ndarray, sample_rate: int = 8000, block_align: int = 256
) -> bytes:
    """Encode mono int16-range samples as a WAV-format-0x11 IMA ADPCM
    stream: each block's header carries (first sample, running step
    index), followed by 4-bit nibbles. A signal that is CONSTANT within
    each block (and starts at step index 0) encodes to all-zero nibbles
    and decodes bit-exactly — the lossy-codec-exact-oracle regime."""
    if block_align < 5:
        raise ValueError("block_align must be >= 5")
    x = [int(v) for v in np.asarray(samples, dtype=np.int64).ravel()]
    if not x:
        raise ValueError("at least one sample required")
    spb = 1 + (block_align - 4) * 2
    tail = len(x) % spb
    if tail and (tail - 1) % 2:
        raise ValueError(
            "partial final IMA block must hold an odd sample count "
            "(whole nibble bytes; pad the signal or pick a block_align "
            "that divides it)"
        )
    out = bytearray()
    index = 0
    for p in range(0, len(x), spb):
        block, index = _ima_encode_block(x[p : p + spb], index)
        out += block
    fmt = _struct.pack(
        "<HHIIHH",
        0x11,
        1,
        sample_rate,
        sample_rate * block_align // spb,
        block_align,
        4,
    )
    return _wrap_riff(fmt, bytes(out))


# ---------------------------------------------------------------------------
# Sun AU (.snd) — the big-endian telephony/Unix legacy container (r11).
# Header per the public Sun/NeXT audio file format: magic ".snd",
# data_offset, data_size (0xFFFFFFFF = unknown), encoding, sample_rate,
# channels, all uint32 big-endian.  Encodings vendored: 1 = G.711 µ-law
# (the format's raison d'etre), 2 = signed PCM8, 3 = signed PCM16 BE,
# 27 = G.711 A-law — every one an exact integer decode.
# ---------------------------------------------------------------------------

_AU_MAGIC = b".snd"
_AU_ULAW, _AU_PCM8, _AU_PCM16, _AU_ALAW = 1, 2, 3, 27


@untrusted_decoder
def au_info(b: bytes) -> dict:
    if b[:4] != _AU_MAGIC or len(b) < 24:
        raise ValueError("not a Sun AU blob")
    off, size, enc, rate, ch = _struct.unpack_from(">IIIII", b, 4)
    if off < 24 or off > len(b):
        raise ValueError("AU: data offset out of range")
    if ch < 1 or ch > 64:
        raise ValueError("AU: channel count out of range")
    avail = len(b) - off
    if size != 0xFFFFFFFF and size > avail:
        raise ValueError("AU: declared data size past EOF")
    nbytes = avail if size == 0xFFFFFFFF else size
    width = 2 if enc == _AU_PCM16 else 1
    return {
        "data_offset": off, "data_bytes": nbytes, "encoding": enc,
        "sample_rate": rate, "channels": ch,
        "bits_per_sample": 8 * width,
        "n_samples": nbytes // (width * ch),
    }


@untrusted_decoder
def decode_au(b: bytes) -> tuple[np.ndarray, int]:
    """Sun AU → (int32 (n, channels), rate) — exact integer decode for
    µ-law/A-law/PCM8/PCM16; other encodings (e.g. 23 = G.721 ADPCM)
    raise → quarantine."""
    info = au_info(b)
    enc, ch = info["encoding"], info["channels"]
    data = b[info["data_offset"] : info["data_offset"] + info["data_bytes"]]
    if enc == _AU_ULAW:
        x = g711_decode(data, "ulaw")
    elif enc == _AU_ALAW:
        x = g711_decode(data, "alaw")
    elif enc == _AU_PCM8:
        x = np.frombuffer(data, np.int8).astype(np.int32)
    elif enc == _AU_PCM16:
        n = len(data) // 2
        x = np.frombuffer(data, ">i2", n).astype(np.int32)
    else:
        raise ValueError(f"AU: encoding {enc} not vendored")
    n = (x.size // ch) * ch
    return x[:n].reshape(-1, ch), info["sample_rate"]


def encode_au(
    samples_or_codes, encoding: int = _AU_ULAW, sample_rate: int = 8000,
    channels: int = 1,
) -> bytes:
    """Writer twin: raw code bytes (µ-law/A-law) or int samples
    (PCM8/PCM16) → a spec-shaped AU blob."""
    if encoding in (_AU_ULAW, _AU_ALAW):
        data = bytes(samples_or_codes)
    elif encoding == _AU_PCM8:
        data = np.asarray(samples_or_codes, np.int64).astype(np.int8).tobytes()
    elif encoding == _AU_PCM16:
        data = np.asarray(samples_or_codes, np.int64).astype(">i2").tobytes()
    else:
        raise ValueError(f"AU twin: encoding {encoding} unsupported")
    head = _AU_MAGIC + _struct.pack(
        ">IIIII", 24, len(data), encoding, sample_rate, channels
    )
    return head + data


# ---------------------------------------------------------------------------
# AIFF (Apple IFF) — big-endian PCM in a FORM/AIFF container (r11).
# COMM carries channels / frame count / sample size and the sample rate
# as an 80-bit IEEE 754 extended float (the format's one quirk); SSND
# carries offset/blockSize then the signed big-endian PCM frames.
# ---------------------------------------------------------------------------


def _f80_to_int(b10: bytes) -> int:
    """80-bit extended float → int (sample rates are small integers;
    non-integral or out-of-range values refuse)."""
    if len(b10) != 10:
        raise ValueError("AIFF: sampleRate is not 80-bit extended")
    (se,) = _struct.unpack(">H", b10[:2])
    (mant,) = _struct.unpack(">Q", b10[2:])
    if se & 0x8000:
        raise ValueError("AIFF: negative sample rate")
    exp = (se & 0x7FFF) - 16383 - 63
    if exp < -63 or exp > 20:
        raise ValueError("AIFF: sample rate out of range")
    val = mant * (2 ** exp) if exp >= 0 else mant / (2 ** -exp)
    rate = int(val)
    if rate != val or rate <= 0:
        raise ValueError("AIFF: non-integral sample rate")
    return rate


def _int_to_f80(v: int) -> bytes:
    if v <= 0:
        raise ValueError("AIFF twin: rate must be positive")
    exp = v.bit_length() - 1
    mant = v << (63 - exp)
    return _struct.pack(">HQ", 16383 + exp, mant)


@untrusted_decoder
def aiff_info(b: bytes) -> dict:
    if len(b) < 12 or b[:4] != b"FORM" or b[8:12] != b"AIFF":
        raise ValueError("not an AIFF blob")
    (form_size,) = _struct.unpack_from(">I", b, 4)
    end = min(len(b), 8 + form_size)
    pos = 12
    comm = None
    ssnd = None
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        (size,) = _struct.unpack_from(">I", b, pos + 4)
        payload = pos + 8
        if payload + size > end:
            raise ValueError(f"AIFF chunk {cid!r} truncated")
        if cid == b"COMM" and comm is None:
            if size < 18:
                raise ValueError("AIFF COMM chunk too small")
            ch, frames, bits = _struct.unpack_from(">HIH", b, payload)
            rate = _f80_to_int(b[payload + 8 : payload + 18])
            comm = {"channels": ch, "n_samples": frames,
                    "bits_per_sample": bits, "sample_rate": rate}
        elif cid == b"SSND" and ssnd is None:
            if size < 8:
                raise ValueError("AIFF SSND chunk too small")
            off, _block = _struct.unpack_from(">II", b, payload)
            ssnd = (payload + 8 + off, size - 8 - off)
        pos = payload + size + (size & 1)
    if comm is None:
        raise ValueError("AIFF: no COMM chunk")
    if ssnd is None:
        raise ValueError("AIFF: no SSND chunk")
    if comm["channels"] < 1 or comm["channels"] > 64:
        raise ValueError("AIFF: channel count out of range")
    comm["data_start"], comm["data_bytes"] = ssnd
    return comm


@untrusted_decoder
def decode_aiff(b: bytes) -> tuple[np.ndarray, int]:
    """AIFF → (int32 (n, channels), rate): signed big-endian PCM at
    8/16/24 bits — exact integers, the WAV conventions mirrored."""
    info = aiff_info(b)
    bits, ch = info["bits_per_sample"], info["channels"]
    data = b[info["data_start"] : info["data_start"] + info["data_bytes"]]
    if bits == 8:
        x = np.frombuffer(data, np.int8).astype(np.int32)
    elif bits == 16:
        x = np.frombuffer(data, ">i2", len(data) // 2).astype(np.int32)
    elif bits == 24:
        n = len(data) // 3
        raw = np.frombuffer(data, np.uint8, n * 3).reshape(n, 3).astype(np.int64)
        x = (raw[:, 0] << 16) | (raw[:, 1] << 8) | raw[:, 2]
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.int32)
    else:
        raise ValueError(f"AIFF: {bits}-bit PCM not vendored")
    want = info["n_samples"] * ch
    if x.size < want:
        raise ValueError("AIFF: SSND shorter than COMM numSampleFrames")
    return x[:want].reshape(-1, ch), info["sample_rate"]


def encode_aiff_pcm(
    samples, sample_rate: int = 8000, bits: int = 8, channels: int = 1
) -> bytes:
    """Writer twin: int samples → spec-shaped AIFF (signed BE PCM)."""
    x = np.asarray(samples, np.int64).ravel()
    if x.size % channels:
        raise ValueError("sample count must divide by channels")
    if bits == 8:
        data = x.astype(np.int8).tobytes()
    elif bits == 16:
        data = x.astype(">i2").tobytes()
    elif bits == 24:
        u = np.where(x < 0, x + (1 << 24), x).astype(np.int64)
        b3 = np.empty((x.size, 3), np.uint8)
        b3[:, 0] = (u >> 16) & 0xFF
        b3[:, 1] = (u >> 8) & 0xFF
        b3[:, 2] = u & 0xFF
        data = b3.tobytes()
    else:
        raise ValueError("AIFF twin: bits must be 8/16/24")
    comm = (b"COMM" + _struct.pack(">I", 18)
            + _struct.pack(">HIH", channels, x.size // channels, bits)
            + _int_to_f80(sample_rate))
    ssnd = b"SSND" + _struct.pack(">I", 8 + len(data)) + _struct.pack(">II", 0, 0) + data
    if len(data) & 1:
        ssnd += b"\x00"
    body = b"AIFF" + comm + ssnd
    return b"FORM" + _struct.pack(">I", len(body)) + body
