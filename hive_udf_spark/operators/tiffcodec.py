"""Vendored TIFF (baseline, TIFF 6.0) reader.

Scanned-document corpora ship as TIFFs; this is the dependency-free
baseline subset: a real IFD walk in EITHER byte order (``II``
little-endian and ``MM`` big-endian — a format where endianness is data,
not convention), strip assembly via StripOffsets × StripByteCounts × RowsPerStrip,
uncompressed (1), LZW (5 — r8: MSB-first codes with the TIFF
early-change width schedule, bounded output, plus the
horizontal-differencing predictor tag 317) and PackBits (32773)
compression, 8-bit grayscale and RGB(A) plus 1-bit bilevel and 16-bit
samples (high-byte reduction, the PNG decoder's 16→8 policy), both
photometric interpretations (WhiteIsZero inverts — the classic
fax-TIFF trap), and BOTH layouts: strips (StripOffsets ×
StripByteCounts × RowsPerStrip) and tiles (r8: tags 322-325, the
layout large scanned/geo TIFFs use — tile dims are multiples of 16 per
TIFF 6.0 §15, so tile boundaries stay byte-aligned and edge tiles crop
their zero padding; the horizontal predictor restarts per TILE row).
Multi-IFD files decode their first image. Other compressions
(CCITT/JPEG-in-TIFF) raise explicitly.

``encode_tiff`` is the fixture twin (gray or RGB, uint8 or uint16,
either byte order, optional PackBits or LZW±predictor, multi-strip or
tiled). Gray is lossless end-to-end, so the standard pixel-stats SQL
oracle applies unchanged (``multimodal_tiff_decode``).

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated multimodal-columns extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

from hive_udf_spark.operators._codec_util import untrusted_decoder

__all__ = ["decode_tiff_gray", "decode_tiff_rgb", "encode_tiff"]

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_tag_values(b: bytes, endian: str, ttype: int, count: int, off: int) -> list[int]:
    """Values of a SHORT/LONG/BYTE tag; reads inline or from the offset
    area per the 4-byte rule."""
    fmt = {1: "B", 3: "H", 4: "I"}.get(ttype)
    if fmt is None:
        raise ValueError(f"TIFF tag type {ttype} not vendored (BYTE/SHORT/LONG)")
    size = _TYPE_SIZES[ttype] * count
    if size <= 4:
        pos = off  # the value slot itself
    else:
        (pos,) = struct.unpack_from(endian + "I", b, off)
    if pos + size > len(b):
        raise ValueError("TIFF tag values out of bounds")
    return list(struct.unpack_from(f"{endian}{count}{fmt}", b, pos))


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first code packing, ClearCode=256, EOI=257,
    9→12-bit codes with the TIFF "early change" (the width bumps when
    the NEXT table slot is 2^width − 1, one code earlier than GIF's
    LSB-first variant in ``gifcodec``).  Output is bounded by
    ``expected`` — a crafted stream cannot balloon past the strip's
    declared raster size."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    pos = acc = nbits = 0
    width = 9
    table: list[bytes] | None = None
    prev: bytes | None = None
    next_code = 258

    def read_code() -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW stream truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        return (acc >> nbits) & ((1 << width) - 1)

    while True:
        code = read_code()
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width, next_code, prev = 9, 258, None
            continue
        if table is None:
            raise ValueError("TIFF LZW data before initial Clear code")
        if prev is None:
            if code > 255:
                raise ValueError("TIFF LZW first code after Clear not a root")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("TIFF LZW code beyond table")
        out += entry
        if len(out) > expected:
            raise ValueError("TIFF LZW inflates past the strip's raster size")
        if prev is not None:
            if next_code > 4093:
                raise ValueError("TIFF LZW table overflow without Clear")
            table.append(prev + entry[:1])
            next_code += 1
            # The decoder lags the encoder by exactly one table add, so
            # its early-change fires one entry earlier: creating slot
            # 510/1022/2046 bumps the width here while the encoder bumps
            # after creating 511/1023/2047 — the TIFF 6.0 "early change"
            # schedule (libtiff: decoder maxcode = MAXCODE(n)-1, encoder
            # maxcode = MAXCODE(n)).
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Fixture-twin LZW compressor (real string table, Clear emitted
    before the 12-bit table fills).

    Code width is driven by a DECODER-TWIN counter, not the encoder's
    own table: the decoder adds one table entry after every data code
    it reads EXCEPT the first after a Clear, and widens when its next
    slot is 2^width − 1 (the TIFF early change).  The encoder's own
    add schedule differs at exactly one point — the final flushed code
    gets no add — so width derived from the encoder table desyncs the
    EOI (and any post-flush Clear) whenever the table size lands on a
    bump boundary at stream end (empirically: one 256-byte random tile
    in ~3 hits 511 exactly).  Simulating the decoder makes the two bit
    streams agree by construction, for every input."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0
    width = 9
    twin_next = 258
    first_since_clear = True

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    def emit_data(code: int) -> None:
        # emit at the current width, then advance the decoder twin
        nonlocal width, twin_next, first_since_clear
        emit(code)
        if first_since_clear:
            first_since_clear = False
            return
        twin_next += 1
        if twin_next == (1 << width) - 1 and width < 12:
            width += 1

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(256)}

    emit(CLEAR)
    table = fresh()
    next_code = 258
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit_data(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code == 4094:  # table nearly full: restart
            emit(CLEAR)
            table = fresh()
            next_code, width = 258, 9
            twin_next, first_since_clear = 258, True
        w = bytes([byte])
    if w:
        emit_data(table[w])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE per TIFF 6.0 §9."""
    out = bytearray()
    pos = 0
    while len(out) < expected:
        if pos >= len(data):
            raise ValueError(
                f"PackBits stream ended with {len(out)} of {expected} bytes"
            )
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n+1 bytes
            if pos + n + 1 > len(data):
                raise ValueError("PackBits literal run truncated")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("PackBits repeat run truncated")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op per spec
    if len(out) != expected:
        raise ValueError("PackBits produced more bytes than the strip holds")
    return bytes(out)


@untrusted_decoder
def decode_tiff_gray(b: bytes) -> np.ndarray:
    """Decode a baseline TIFF's first IFD to a (h, w) uint8 gray array."""
    return _decode_tiff(b)


@untrusted_decoder
def decode_tiff_rgb(b: bytes) -> np.ndarray:
    """First IFD as (h, w, 3) uint8 RGB (r11): RGB rasters keep their
    channels, gray/bilevel rasters replicate."""
    return _decode_tiff(b, rgb=True)


def _decode_tiff(b: bytes, rgb: bool = False) -> np.ndarray:
    if b[:4] == b"II*\x00":
        endian = "<"
    elif b[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF stream (bad byte-order/magic header)")
    (ifd_off,) = struct.unpack_from(endian + "I", b, 4)
    if ifd_off + 2 > len(b):
        raise ValueError("TIFF first IFD offset out of bounds")
    (n_tags,) = struct.unpack_from(endian + "H", b, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n_tags):
        base = ifd_off + 2 + 12 * i
        if base + 12 > len(b):
            raise ValueError("TIFF IFD truncated")
        tag, ttype, count = struct.unpack_from(endian + "HHI", b, base)
        tags[tag] = (ttype, count, base + 8)

    def val(tag: int, default: int | None = None) -> int:
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        ttype, count, off = tags[tag]
        return _read_tag_values(b, endian, ttype, count, off)[0]

    w = val(256)
    h = val(257)
    if w == 0 or h == 0:
        raise ValueError("TIFF zero dimension")
    spp = val(277, 1)
    if 258 in tags:
        ttype, count, off = tags[258]
        bps = _read_tag_values(b, endian, ttype, count, off)
        if any(v != bps[0] for v in bps):
            raise ValueError("TIFF mixed bits-per-sample not vendored")
        bits = bps[0]
    else:
        bits = 1
    compression = val(259, 1)
    photometric = val(262)
    if compression not in (1, 5, 32773):
        raise ValueError(
            f"TIFF compression {compression} not vendored (none/LZW/PackBits)"
        )
    predictor = val(317, 1)
    if predictor not in (1, 2):
        raise ValueError(f"TIFF predictor {predictor} not vendored (none/horizontal)")
    if predictor == 2 and bits != 8:
        raise ValueError("TIFF horizontal predictor needs 8-bit samples")
    if bits not in (1, 8, 16):
        raise ValueError(f"{bits}-bit TIFF samples not vendored (1/8/16)")
    if bits == 1 and spp != 1:
        raise ValueError("TIFF bilevel must be single-sample")
    if photometric not in (0, 1, 2):
        raise ValueError(f"TIFF photometric {photometric} not vendored")
    if photometric == 2 and spp not in (3, 4):
        raise ValueError("TIFF RGB needs 3 or 4 samples per pixel")
    row_bytes = (w * spp * bits + 7) // 8

    def unit(blob: bytes, expected: int, what: str) -> bytes:
        if compression == 32773:
            blob = _packbits_decode(blob, expected)
        elif compression == 5:
            blob = _lzw_decode(blob, expected)
        if len(blob) < expected:
            raise ValueError(f"TIFF {what} shorter than its rows")
        return blob[:expected]

    tiled = 322 in tags or 323 in tags
    if tiled:
        if not (322 in tags and 323 in tags and 324 in tags and 325 in tags):
            raise ValueError("tiled TIFF missing one of tags 322/323/324/325")
        tw, th = val(322), val(323)
        # TIFF 6.0 §15: tile dimensions must be multiples of 16
        if tw < 16 or th < 16 or tw % 16 or th % 16:
            raise ValueError(f"TIFF tile size {tw}x{th} not a multiple of 16")
        ttype, count, off = tags[324]
        offsets = _read_tag_values(b, endian, ttype, count, off)
        ttype2, count2, off2 = tags[325]
        counts = _read_tag_values(b, endian, ttype2, count2, off2)
        across, down = -(-w // tw), -(-h // th)
        if len(offsets) != len(counts) or len(offsets) != across * down:
            raise ValueError(
                f"TIFF has {len(offsets)} tiles; {across * down} expected"
            )
        # tile grid columns start at multiples of tw (a multiple of 16),
        # so every tile boundary is byte-aligned even for bilevel rasters
        # and byte-space assembly is exact
        tile_row_bytes = (tw * spp * bits + 7) // 8
        raster = np.zeros((h, row_bytes), dtype=np.uint8)
        for t, (o, c) in enumerate(zip(offsets, counts)):
            if o + c > len(b):
                raise ValueError(f"TIFF tile {t} extends past end of file")
            blob = unit(b[o : o + c], th * tile_row_bytes, f"tile {t}")
            arr = np.frombuffer(blob, dtype=np.uint8).reshape(th, tile_row_bytes)
            if predictor == 2:
                # horizontal differencing restarts at each TILE row —
                # undo per tile, before edge cropping (bits==8 here)
                arr = (
                    arr.reshape(th, tw, spp)
                    .cumsum(axis=1, dtype=np.uint8)
                    .reshape(th, tile_row_bytes)
                )
            ty, tx = divmod(t, across)
            r0, c0 = ty * th, tx * tile_row_bytes
            rows = min(th, h - r0)
            cols = min(tile_row_bytes, row_bytes - c0)
            if rows <= 0 or cols <= 0:
                raise ValueError(f"TIFF tile {t} lies outside the raster")
            raster[r0 : r0 + rows, c0 : c0 + cols] = arr[:rows, :cols]
        data = raster.reshape(-1)
    else:
        rows_per_strip = val(278, h)
        if rows_per_strip < 1:
            raise ValueError(f"TIFF RowsPerStrip {rows_per_strip} < 1")
        ttype, count, off = tags.get(273) or (None, None, None)
        if ttype is None:
            raise ValueError("TIFF missing StripOffsets")
        offsets = _read_tag_values(b, endian, ttype, count, off)
        ttype2, count2, off2 = tags.get(279) or (None, None, None)
        if ttype2 is None:
            raise ValueError("TIFF missing StripByteCounts")
        counts = _read_tag_values(b, endian, ttype2, count2, off2)
        if len(offsets) != len(counts):
            raise ValueError("TIFF strip offset/count tables disagree")
        n_strips = -(-h // rows_per_strip)
        if len(offsets) != n_strips:
            raise ValueError(
                f"TIFF has {len(offsets)} strips; {n_strips} expected for "
                f"{h} rows at {rows_per_strip}/strip"
            )
        raw = bytearray()
        for s, (o, c) in enumerate(zip(offsets, counts)):
            if o + c > len(b):
                raise ValueError(f"TIFF strip {s} extends past end of file")
            rows = min(rows_per_strip, h - s * rows_per_strip)
            raw += unit(b[o : o + c], rows * row_bytes, f"strip {s}")
        data = np.frombuffer(bytes(raw), dtype=np.uint8)
        if predictor == 2:
            # horizontal differencing: undo with a per-channel cumulative
            # sum along each row; uint8 accumulation wraps mod 256 by
            # itself (bits==8 here, so row_bytes == w*spp exactly)
            data = (
                data.reshape(h, w, spp).cumsum(axis=1, dtype=np.uint8).reshape(-1)
            )
    if bits == 16:
        # high-byte reduction, the same 16→8 policy as the PNG decoder:
        # samples are file-endian uint16, the display byte is the high one
        data = (
            (np.frombuffer(data.tobytes(), dtype=endian + "u2") >> 8)
            .astype(np.uint8)
        )
        row_bytes = w * spp  # one byte per sample from here on
    def _rep3(gray: np.ndarray) -> np.ndarray:
        return np.repeat(gray[:, :, None], 3, axis=2)

    if bits == 1:
        px = np.unpackbits(data.reshape(h, row_bytes), axis=1)[:, :w]
        gray = np.where(px == 1, 0 if photometric == 0 else 255,
                        255 if photometric == 0 else 0).astype(np.uint8)
        return _rep3(gray) if rgb else gray
    img = data.reshape(h, row_bytes)[:, : w * spp]
    if photometric == 2:
        px = img.reshape(h, w, spp)[..., :3]
        if rgb:
            return np.ascontiguousarray(px)
        wide = px.astype(np.int64)
        return (
            (299 * wide[..., 0] + 587 * wide[..., 1] + 114 * wide[..., 2]) // 1000
        ).astype(np.uint8)
    gray = img.reshape(h, w)
    if photometric == 0:  # WhiteIsZero: invert
        gray = (255 - gray.astype(np.int64)).astype(np.uint8)
    return _rep3(gray) if rgb else gray


# ---------------------------------------------------------------------------
# Encoder (fixture twin)
# ---------------------------------------------------------------------------


def _packbits_encode(row: bytes) -> bytes:
    """Simple valid PackBits: emit repeat runs ≥ 3, literals otherwise."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 128 and row[i + run] == row[i]:
                run += 1
            if run >= 3:
                break
            i += run
        out += bytes([i - lit_start - 1]) + row[lit_start:i]
    return bytes(out)


def encode_tiff(
    img: np.ndarray,
    big_endian: bool = False,
    packbits: bool = False,
    rows_per_strip: int | None = None,
    lzw: bool = False,
    predictor: int = 1,
    tiles: tuple[int, int] | None = None,
) -> bytes:
    """(h, w) gray or (h, w, 3) RGB → baseline TIFF (II or MM byte
    order, optional PackBits OR LZW — with the horizontal-differencing
    predictor when ``predictor=2`` — multi-strip when ``rows_per_strip``
    is set, TILED when ``tiles=(tile_w, tile_h)``: edge tiles
    zero-padded to full size per TIFF 6.0 §15).  A uint16 array emits
    16-bit samples in the file's byte order (the decoder reduces them
    to their high byte); uint8 emits the 8-bit baseline."""
    if packbits and lzw:
        raise ValueError("choose at most one of packbits/lzw")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 (none) or 2 (horizontal)")
    if predictor == 2 and not lzw:
        raise ValueError("predictor=2 is only emitted with LZW here")
    if tiles is not None and rows_per_strip is not None:
        raise ValueError("choose at most one of tiles/rows_per_strip")
    img = np.asarray(img)
    bits = 16 if img.dtype == np.uint16 else 8
    if predictor == 2 and bits != 8:
        raise ValueError("predictor=2 is emitted for 8-bit samples only")
    arr = np.ascontiguousarray(img, dtype=np.uint16 if bits == 16 else np.uint8)
    if arr.ndim == 2:
        spp, photometric = 1, 1
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        spp, photometric = 3, 2
        h, w = arr.shape[:2]
    else:
        raise ValueError("encode_tiff takes (h,w) gray or (h,w,3) RGB")
    e = ">" if big_endian else "<"
    itemsize = bits // 8

    def row_major_bytes(a: np.ndarray, nrows: int, ncols_px: int) -> np.ndarray:
        """(nrows, ncols_px, spp) samples → (nrows, bytes) uint8 in the
        file's byte order."""
        if bits == 16:
            a = a.astype(e + "u2")
        return np.frombuffer(
            np.ascontiguousarray(a).tobytes(), dtype=np.uint8
        ).reshape(nrows, ncols_px * spp * itemsize)

    def hdiff(a: np.ndarray) -> np.ndarray:
        """Forward horizontal differencing per channel, mod 256."""
        d = a.astype(np.int64)
        d[:, 1:, :] = (d[:, 1:, :] - d[:, :-1, :]) % 256
        return d.astype(np.uint8)

    strips = []
    if tiles is not None:
        tw, th = tiles
        if tw < 16 or th < 16 or tw % 16 or th % 16:
            raise ValueError("tile dimensions must be multiples of 16")
        across, down = -(-w // tw), -(-h // th)
        padded = np.zeros((down * th, across * tw, spp), dtype=arr.dtype)
        padded[:h, :w, :] = arr.reshape(h, w, spp)
        if predictor == 2:
            # differencing restarts at each TILE row, not each raster row
            for tx in range(across):
                padded[:, tx * tw : (tx + 1) * tw, :] = hdiff(
                    padded[:, tx * tw : (tx + 1) * tw, :]
                )
        for ty in range(down):
            for tx in range(across):
                t = padded[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw, :]
                blob = row_major_bytes(t, th, tw).tobytes()
                if packbits:
                    blob = _packbits_encode(blob)
                elif lzw:
                    blob = _lzw_encode(blob)
                strips.append(blob)
    else:
        rps = rows_per_strip or h
        samples = arr.reshape(h, w, spp)
        if predictor == 2:
            samples = hdiff(samples)
        flat = row_major_bytes(samples, h, w)
        for s in range(0, h, rps):
            strip = flat[s : s + rps].tobytes()
            if packbits:
                strip = _packbits_encode(strip)
            elif lzw:
                strip = _lzw_encode(strip)
            strips.append(strip)

    data_off = 8
    strip_offsets = []
    body = bytearray()
    for strip in strips:
        strip_offsets.append(data_off + len(body))
        body += strip
    ifd_off = data_off + len(body)
    header = (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(
        e + "I", ifd_off
    )

    entries = []  # (tag, type, count, packed-value-or-offset bytes)

    def short(tag: int, v: int) -> None:
        entries.append((tag, 3, 1, struct.pack(e + "H", v) + b"\x00\x00"))

    def long_(tag: int, v: int) -> None:
        entries.append((tag, 4, 1, struct.pack(e + "I", v)))

    # offset/bytecount tables: inline when a single unit, else post-IFD
    short(256, w) if w < 0x10000 else long_(256, w)
    short(257, h) if h < 0x10000 else long_(257, h)
    if spp == 3:
        entries.append((258, 3, 3, None))  # placed in the extra area
    else:
        short(258, bits)
    short(259, 32773 if packbits else (5 if lzw else 1))
    short(262, photometric)
    if predictor == 2:
        short(317, 2)
    off_tag, cnt_tag = (324, 325) if tiles is not None else (273, 279)
    if len(strips) == 1:
        long_(off_tag, strip_offsets[0])
    else:
        entries.append((off_tag, 4, len(strips), None))
    short(277, spp)
    if tiles is not None:
        short(322, tiles[0])
        short(323, tiles[1])
    else:
        short(278, rps)
    if len(strips) == 1:
        long_(cnt_tag, len(strips[0]))
    else:
        entries.append((cnt_tag, 4, len(strips), None))
    entries.sort(key=lambda t: t[0])

    ifd = struct.pack(e + "H", len(entries))
    extra = bytearray()
    extra_base = ifd_off + 2 + 12 * len(entries) + 4
    for tag, ttype, count, packed in entries:
        if packed is not None:
            ifd += struct.pack(e + "HHI", tag, ttype, count) + packed
            continue
        off = extra_base + len(extra)
        ifd += struct.pack(e + "HHI", tag, ttype, count) + struct.pack(e + "I", off)
        if tag == 258:
            extra += struct.pack(e + "3H", bits, bits, bits) + b"\x00\x00"
        elif tag in (273, 324):
            extra += struct.pack(f"{e}{len(strips)}I", *strip_offsets)
        elif tag in (279, 325):
            extra += struct.pack(f"{e}{len(strips)}I", *[len(s) for s in strips])
    ifd += struct.pack(e + "I", 0)  # no next IFD
    return header + bytes(body) + ifd + bytes(extra)
