"""Vendored dependency-free WAV (RIFF PCM) decoder.

The audio twin of ``operators.imagecodec``: a REAL container parse —
RIFF header walk, fmt/data chunk discovery by id (not fixed offsets, so
extra chunks like LIST/INFO are handled), PCM 8-bit unsigned and 16-bit
signed little-endian, mono or interleaved multi-channel — with explicit
errors for anything else (compressed codecs are out of scope for a
sandbox without audio libs; the point is that the CONTAINER math is real
and the Spark-side plumbing is production-shaped).

Everything is integer-exact: samples come back as int32 numpy arrays
(8-bit data is centered by subtracting 128), so downstream statistics
are reproducible bit-for-bit by any engine that sums the same integers.

No reference analogue (the reference is a cardinality UDAF); this is
part of the mandated multimodal extension surface (SURVEY.md §2.3).
"""

from __future__ import annotations

import struct as _struct

import numpy as np

__all__ = ["decode_wav", "encode_wav_pcm", "wav_info"]


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
            bits = _struct.unpack_from("<H", b, off + 14)[0]
            fmt = {
                "audio_format": audio_format,
                "n_channels": n_channels,
                "sample_rate": sample_rate,
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


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """→ (samples int32 array of shape (n_frames, n_channels), rate).

    PCM (format 1) 8-bit unsigned (centered to [-128, 127]) or 16-bit
    signed LE only; anything else raises explicitly.
    """
    info = wav_info(b)
    if info["audio_format"] != 1:
        raise ValueError(
            f"unsupported WAV audio format {info['audio_format']} (only PCM=1 is vendored)"
        )
    bits, nch = info["bits_per_sample"], info["n_channels"]
    if bits not in (8, 16):
        raise ValueError(f"unsupported PCM bit depth {bits} (8/16 vendored)")
    if nch < 1:
        raise ValueError("channel count must be >= 1")
    for cid, off, size in _chunks(b):
        if cid == b"data":
            raw = b[off : off + size]
            if bits == 8:
                x = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
            else:
                n = size // 2
                x = np.frombuffer(raw, dtype="<i2", count=n).astype(np.int32)
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
    else:
        raise ValueError("bits must be 8 or 16")
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
