"""Vendored pure-Python GIF codec (GIF87a/89a, LZW).

Third compressed vendored image family (after PNG's DEFLATE and JPEG's
Huffman+DCT): variable-width LZW with clear/EOI codes and 12-bit
dictionary cap, global and local color tables, Adam-style 4-pass
interlacing, and the GIF89a animation machinery (graphic control
extensions: disposal methods, transparency index; frames composited at
their own offsets onto the logical-screen canvas).

Frame model: GIF frames are NOT standalone blobs (they share palettes
and composite against prior canvas state), so the container surface
``split_gif_frames`` returns each COMPOSITED frame re-encoded as a
canonical binary PGM — which keeps ``split_container_frames``'s
contract (a list of blobs individually decodable by
``imagecodec.decode_to_gray``) honest instead of leaking GIF
internals.

Grayscale exactness: ``encode_gif`` writes an identity grayscale
palette (entry i = (i,i,i)), whose integer 601 luma is
``(299i+587i+114i)//1000 = i`` exactly — LZW is lossless, so gray
frames round-trip bit-exactly and the SQL pixel-stats oracle applies
unchanged (``multimodal_gif_decode``).

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated multimodal-columns extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

from hive_udf_spark.operators._codec_util import untrusted_decoder

__all__ = ["decode_gif_gray", "decode_gif_rgb", "split_gif_frames", "encode_gif"]

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(h: int) -> np.ndarray:
    """Row permutation: storage order → display order for interlaced
    frames (GIF's 4-pass scheme)."""
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    inv = np.empty(h, dtype=np.int64)
    inv[np.array(order, dtype=np.int64)] = np.arange(h, dtype=np.int64)
    return inv


def _palette_rgb(pal: np.ndarray) -> np.ndarray:
    """(n, 3) palette → (256, 3) uint8 RGB LUT (indices past the table
    read as black, the convention renderers use)."""
    lut = np.zeros((256, 3), dtype=np.uint8)
    lut[: len(pal)] = pal
    return lut


def _palette_gray(pal: np.ndarray) -> np.ndarray:
    """(n, 3) palette → (256,) uint8 gray LUT via integer 601 luma."""
    lut = np.zeros(256, dtype=np.uint8)
    lut[: len(pal)] = (
        (
            299 * pal[:, 0].astype(np.int64)
            + 587 * pal[:, 1].astype(np.int64)
            + 114 * pal[:, 2].astype(np.int64)
        )
        // 1000
    ).astype(np.uint8)
    return lut


def _read_subblocks(b: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate length-prefixed data sub-blocks; returns (data, pos
    after the 0x00 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(b):
            raise ValueError("GIF sub-blocks truncated")
        n = b[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(b):
            raise ValueError("GIF sub-block payload truncated")
        out += b[pos : pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """GIF variable-width LZW → exactly ``expected`` palette indices.
    LSB-first bit packing; dictionary capped at 12 bits until a clear
    code resets it."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF LZW minimum code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                if len(out) != expected:
                    raise ValueError(
                        f"GIF LZW ended with {len(out)} of {expected} pixels"
                    )
                return np.frombuffer(bytes(out), dtype=np.uint8)
            if prev is None:
                if code >= len(table):
                    raise ValueError("GIF LZW first code not in table")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("GIF LZW code beyond table")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) > expected:
                raise ValueError("GIF LZW produced more pixels than the frame holds")
    raise ValueError("GIF LZW stream ended without EOI")


def _parse_frames(
    b: bytes, rgb: bool = False
) -> tuple[int, int, list[np.ndarray]]:
    """Walk the GIF stream; returns (width, height, composited frames —
    gray (h, w), or palette-RGB (h, w, 3) with ``rgb=True``). Raises on
    malformed/truncated streams."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    if len(b) < 13:
        raise ValueError("GIF logical screen descriptor truncated")
    w, h, packed, bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    if w == 0 or h == 0:
        raise ValueError("GIF zero dimension")
    pos = 13
    global_lut = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(b):
            raise ValueError("GIF global color table truncated")
        pal = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        global_lut = _palette_rgb(pal) if rgb else _palette_gray(pal)
        pos += 3 * n
    canvas = np.zeros((h, w, 3) if rgb else (h, w), dtype=np.uint8)
    if global_lut is not None:
        canvas[:] = global_lut[bg]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while True:
        if pos >= len(b):
            raise ValueError("GIF stream ended without trailer (0x3B)")
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            if not frames:
                raise ValueError("GIF has no image frames")
            return w, h, frames
        if block == 0x21:  # extension
            if pos >= len(b):
                raise ValueError("GIF extension truncated")
            label = b[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                data, pos = _read_subblocks(b, pos)
                if len(data) < 4:
                    raise ValueError("GIF graphic control extension too short")
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else None
            else:  # comment / plain text / application: skip
                _, pos = _read_subblocks(b, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        # image descriptor
        if pos + 9 > len(b):
            raise ValueError("GIF image descriptor truncated")
        fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        if fx + fw > w or fy + fh > h:
            raise ValueError("GIF frame extends beyond the logical screen")
        lut = global_lut
        if fpacked & 0x80:  # local color table
            n = 2 << (fpacked & 0x07)
            if pos + 3 * n > len(b):
                raise ValueError("GIF local color table truncated")
            pal = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=pos).reshape(
                n, 3
            )
            lut = _palette_rgb(pal) if rgb else _palette_gray(pal)
            pos += 3 * n
        if lut is None:
            raise ValueError("GIF frame has neither global nor local color table")
        if pos >= len(b):
            raise ValueError("GIF image data truncated")
        min_code_size = b[pos]
        pos += 1
        data, pos = _read_subblocks(b, pos)
        idx = _lzw_decode(data, min_code_size, fw * fh).reshape(fh, fw)
        if fpacked & 0x40:  # interlaced
            idx = idx[_deinterlace_rows(fh)]
        if disposal == 3:
            raise ValueError("GIF disposal method 3 (restore previous) not vendored")
        under = canvas[fy : fy + fh, fx : fx + fw]
        px = lut[idx]
        if transparent is not None:
            mask = idx == transparent
            px = np.where(mask[..., None] if rgb else mask, under, px)
        canvas[fy : fy + fh, fx : fx + fw] = px
        frames.append(canvas.copy())
        if disposal == 2:  # restore the frame region to background
            canvas[fy : fy + fh, fx : fx + fw] = (
                global_lut[bg] if global_lut is not None else 0
            )
        transparent = None
        disposal = 0


@untrusted_decoder
def decode_gif_gray(b: bytes) -> np.ndarray:
    """First composited frame of a GIF as a (h, w) uint8 gray array."""
    _, _, frames = _parse_frames(b)
    return frames[0]


@untrusted_decoder
def decode_gif_rgb(b: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8 palette-RGB (r11)."""
    _, _, frames = _parse_frames(b, rgb=True)
    return frames[0]


@untrusted_decoder
def split_gif_frames(b: bytes) -> list[bytes]:
    """Animated-GIF container surface: each COMPOSITED frame re-encoded
    as a canonical binary PGM blob — individually decodable by
    ``imagecodec.decode_to_gray``, like every other container's
    frames."""
    from hive_udf_spark.operators.imagecodec import encode_pgm

    _, _, frames = _parse_frames(b)
    return [encode_pgm(f) for f in frames]


# ---------------------------------------------------------------------------
# Encoder (fixture twin)
# ---------------------------------------------------------------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = b""
    for v in indices.ravel().tolist():
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([v])
    if prev:
        emit(table[prev])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray] | np.ndarray, interlace: bool = False
) -> bytes:
    """Grayscale GIF89a fixture encoder: one or more (h, w) uint8 frames
    (equal shapes) with an identity 256-gray global palette — integer
    601 luma of (i,i,i) is exactly i, so decode round-trips bit-exactly.
    ``interlace=True`` stores rows in 4-pass interlaced order to
    exercise the decoder's deinterlacer."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("at least one frame required")
    first = np.ascontiguousarray(frames[0], dtype=np.uint8)
    if first.ndim != 2:
        raise ValueError("encode_gif takes (h, w) grayscale frames")
    h, w = first.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # 256-entry GCT
    out += bytes(v for i in range(256) for v in (i, i, i))
    for f in frames:
        arr = np.ascontiguousarray(f, dtype=np.uint8)
        if arr.shape != (h, w):
            raise ValueError("all GIF frames must share the logical screen size")
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0x00)
        if interlace:
            order = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
            arr = arr[np.array(order, dtype=np.int64)]
        out += bytes([8])  # min LZW code size for a 256-entry palette
        data = _lzw_encode(arr, 8)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
